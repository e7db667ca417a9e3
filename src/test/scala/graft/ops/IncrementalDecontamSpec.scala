package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.queries.Tables

/** The n69 streaming decontamination gate: verdicts are per-row functions
  * of (document, benchmark), so the admitted union must equal the batch
  * n44 answer EXACTLY — for any batching, any replay, and any maintenance
  * position — and a contaminated document must be rejected no matter how
  * late it arrives. */
class IncrementalDecontamSpec extends AnyFunSuite {
  lazy val spark = T.spark

  private def docs = Tables.documents(spark, T.sf0001)

  private def admittedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("streaming gate answers the n44 query identically to the batch plan") {
    val got = admittedRows(IncrementalDecontam.streamingDecontamQuery(spark, T.sf0001))
    val want = admittedRows(Corpus.bloomDecontamQuery(spark, T.sf0001))
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("any batching converges, replay is a no-op, compaction changes nothing") {
    val want = admittedRows(Corpus.bloomDecontamQuery(spark, T.sf0001))
    val base = T.tmpDir("decontam")
    val gate = new IncrementalDecontam(base.resolve("state"),
      IncrementalDecontam.benchGramSet(docs))
    val corpus = docs.filter(col("doc_id") % 101 =!= 0)
    (0 until 5).foreach { b =>
      gate.processBatch(corpus.filter(pmod(col("doc_id"), lit(5)) === b), b.toLong)
    }
    assert(gate.isCommitted(3L))
    gate.processBatch(corpus.limit(0), 3L) // committed ⇒ short-circuits
    assert(admittedRows(gate.finalAdmitted(spark)) === want,
      "pre-compaction admitted set differs from the batch answer")
    gate.maintain(spark)
    assert(admittedRows(gate.finalAdmitted(spark)) === want,
      "compacted admitted set differs from the batch answer")
    gate.release()
  }

  test("a contaminated document arriving LATE is still rejected") {
    val base = T.tmpDir("decontam-late")
    val gate = new IncrementalDecontam(base.resolve("state"),
      IncrementalDecontam.benchGramSet(docs))
    val corpus = docs.filter(col("doc_id") % 101 =!= 0)
    gate.processBatch(corpus, 0L)
    // a verbatim copy of a benchmark document under a fresh corpus id:
    // its 3-grams are all benchmark grams, so the gate must reject it
    val leak = docs.filter(col("doc_id") % 101 === 0).limit(1)
      .select(lit(999998L).as("doc_id"), col("source"), col("lang"), col("text"))
    gate.processBatch(leak, 1L)
    gate.maintain(spark)
    val ids = gate.finalAdmitted(spark).collect().map(_.getLong(0)).toSet
    assert(!ids.contains(999998L), "a late benchmark copy slipped through the gate")
    // and a clean late arrival is admitted (gibberish shares no 3-gram)
    val clean = leak.select(lit(999997L).as("doc_id"), col("source"),
      col("lang"), lit("zqx wvv kjj pqr mno abc def ghi").as("text"))
    gate.processBatch(clean, 2L)
    val ids2 = gate.finalAdmitted(spark).collect().map(_.getLong(0)).toSet
    assert(ids2.contains(999997L), "a clean late arrival was rejected")
    gate.release()
  }
}
