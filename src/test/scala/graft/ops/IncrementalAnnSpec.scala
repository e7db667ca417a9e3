package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.queries.Tables

/** The n63 incremental IVF-PQ index: per-row deterministic encode means
  * the streaming index must equal the batch n61 index EXACTLY — per row,
  * not merely per converged fixpoint — for any batching, any replay, and
  * any maintenance position; and the probed-cell read must return the
  * same rows pruned (bucketed levels) and unpruned (raw parts). */
class IncrementalAnnSpec extends AnyFunSuite {
  lazy val spark = T.spark

  private def emb = Tables.embeddings(spark, T.sf0001)

  private def queryVec: Seq[Float] =
    emb.filter(col("vec_id") === 0L).select("embedding").head().getSeq[Float](0)

  test("streaming index answers the n61 query identically to the batch plan") {
    val got = IncrementalAnn.streamingIvfPqQuery(spark, T.sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val want = Similarity.ivfPqTopK(emb)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("the two-stage IVFADC-R query over the index equals the batch n75 plan (round 16)") {
    // shortlist from the pruned codes read, exact re-rank against the
    // source vectors — must equal the batch two-stage result per row
    val got = IncrementalAnn.streamingIvfPqRerankQuery(spark, T.sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val want = Similarity.ivfPqRerankTopK(emb)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("index state is row-identical to the batch encode, replay is a no-op, pruning loses nothing") {
    val base = T.tmpDir("ann")
    val index = new IncrementalIvfPqIndex(base.resolve("state"))
    // ingest in 3 manual batches (no stream harness — exercise the state
    // machine directly), with batch 1 replayed after its commit
    (0 until 3).foreach { b =>
      val slice = emb.filter(pmod(col("vec_id"), lit(3)) === b)
      index.processBatch(slice, b.toLong)
    }
    assert(index.isCommitted(1L))
    index.processBatch(emb.limit(0), 1L) // committed ⇒ short-circuits
    val v = transform(col("embedding"), x => x.cast("double"))
    val want = emb.select(col("vec_id"),
        Similarity.ivfCellCol(v).cast("long").as("cell"),
        Similarity.pqEncodeCol(v).as("codes"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2))).sortBy(_._1)

    def codesNow() = index.debugCodes(spark)
      .select("vec_id", "cell", "codes").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2))).sortBy(_._1)

    assert(codesNow() === want, "pre-compaction parts differ from the batch encode")
    index.maintain(spark) // parts -> cell-bucketed level
    assert(codesNow() === want, "compacted level differs from the batch encode")

    // pruned probed-cell read == unpruned read filtered to the same cells
    val q = graft.functions.ProductQuantization.quantize(queryVec.map(_.toDouble))
    val cells = Similarity.probeCellsLocal(q)
    val pruned = index.topK(spark, queryVec, k = 1000, excludeVecId = 0L)
      .collect().map(_.getLong(0)).sorted
    val unpruned = want.filter(t => cells.contains(t._2)).map(_._1)
      .filterNot(_ == 0L).sorted
    assert(pruned === unpruned,
      "listing-pruned probe dropped or invented candidate rows")
  }

  test("the probed-cell read plans PartitionFilters on pb — IVF pruning at listing time") {
    val base = T.tmpDir("ann-prune")
    val index = new IncrementalIvfPqIndex(base.resolve("state"))
    (0 until 2).foreach { b =>
      index.processBatch(emb.filter(pmod(col("vec_id"), lit(2)) === b), b.toLong)
    }
    index.maintain(spark) // full merge -> cell-bucketed level
    val top = index.topK(spark, queryVec, excludeVecId = 0L)
    val p = top.queryExecution.executedPlan.toString
    val partFilters = "PartitionFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(p)
    assert(partFilters.isDefined, s"no PartitionFilters list in probe plan:\n$p")
    assert(partFilters.get.group(1).contains("pb"),
      s"probed read not pruned on pb:\n$p")
    // pruning is listing-time: pb must NOT appear as a row-level filter
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(p)
    assert(pushed.isDefined, s"no PushedFilters list in probe plan:\n$p")
    assert(!pushed.get.group(1).contains("pb"), p)
  }

  test("a planted duplicate arriving in a LATER batch is found by the index query") {
    val base = T.tmpDir("ann-late")
    val index = new IncrementalIvfPqIndex(base.resolve("state"))
    index.processBatch(emb, 0L)
    val dup = emb.filter(col("vec_id") === 0L)
      .select(lit(999999L).as("vec_id"), col("embedding"), col("label"))
    index.processBatch(dup, 1L)
    index.maintain(spark)
    val top = index.topK(spark, queryVec, k = 3, excludeVecId = 0L).collect()
    // the n61 floor theorem, across the ingest boundary: the duplicate
    // shares the query's codes, attains the ADC minimum, ranks first
    assert(top.head.getLong(0) === 999999L, s"got ${top.toSeq}")
  }
}
