package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.queries.Tables

/** The n67 incremental per-domain quota: bounded selection is associative,
  * so the streaming quota must equal the batch n62 answer EXACTLY — for
  * any batching, any replay, and any maintenance position; full merges
  * must collapse the level to the resolved (≤ hosts × perHost) keeper
  * set; and the per-host admission probe must return the same rows pruned
  * (host-bucketed levels) and unpruned. */
class IncrementalQuotaSpec extends AnyFunSuite {
  lazy val spark = T.spark

  private def docs = Tables.documents(spark, T.sf0001)

  private def quotaRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

  test("streaming quota answers the n62 query identically to the batch plan") {
    val got = quotaRows(IncrementalQuota.streamingDomainCapQuery(spark, T.sf0001))
    val want = quotaRows(Pipeline.domainCapQuery(spark, T.sf0001))
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("any batching converges; replay is a no-op; full merge collapses to the resolved set") {
    val want = quotaRows(Pipeline.domainCapQuery(spark, T.sf0001))
    // a batching DIFFERENT from the gated query's 4-way doc_id split
    val base = T.tmpDir("quota")
    val quota = new IncrementalQuota(base.resolve("state"))
    (0 until 5).foreach { b =>
      quota.processBatch(docs.filter(pmod(col("doc_id"), lit(5)) === b), b.toLong)
    }
    assert(quota.isCommitted(2L))
    quota.processBatch(docs.limit(0), 2L) // committed ⇒ short-circuits
    assert(quotaRows(quota.finalQuota(spark)) === want,
      "pre-compaction quota differs from the batch answer")
    quota.maintain(spark) // first pass is a FULL merge -> resolved level
    assert(quotaRows(quota.finalQuota(spark)) === want,
      "compacted quota differs from the batch answer")
    // the bin-packed level IS the resolved keeper set: raw committed rows
    // == admitted rows (bounded at hosts × perHost no matter the ingest)
    assert(quota.debugCands(spark).count() === want.size.toLong,
      "full merge did not collapse the level to the resolved keeper set")
  }

  test("a better document arriving in a LATER batch displaces an admitted one") {
    val base = T.tmpDir("quota-late")
    val quota = new IncrementalQuota(base.resolve("state"), perHost = 3)
    quota.processBatch(docs, 0L)
    val before = quotaRows(quota.finalQuota(spark))
    // re-ingest the corpus's best-quality doc under a fresh id on the
    // quota's largest host: it must enter that host's admitted set
    val host = before.groupBy(_._1).maxBy(_._2.size)._1
    val donor = docs
      .withColumn("qs", TextAnalysis.qualityScoreCol(col("text")))
      .orderBy(col("qs").desc).limit(1)
      .select(lit(999999L).as("doc_id"),
        // keep the donor's text (its quality score), re-keyed to `host`
        col("text"),
        split(lit(host), "\\.example-").getItem(0).as("source"),
        regexp_extract(lit(host), "\\.example-([^.]*)\\.com", 1).as("lang"))
    quota.processBatch(donor, 1L)
    quota.maintain(spark)
    val after = quotaRows(quota.finalQuota(spark)).filter(_._1 == host)
    assert(after.exists(_._3 == 999999L),
      s"late high-quality arrival not admitted on $host: $after")
    assert(after.size === 3)
    assert(before.filter(_._1 == host).map(_._3).toSet
      .diff(after.map(_._3).toSet).nonEmpty, "no admitted doc was displaced")
  }

  test("the per-host admission probe prunes at listing time and loses nothing") {
    val base = T.tmpDir("quota-probe")
    val quota = new IncrementalQuota(base.resolve("state"))
    (0 until 2).foreach { b =>
      quota.processBatch(docs.filter(pmod(col("doc_id"), lit(2)) === b), b.toLong)
    }
    quota.maintain(spark) // full merge -> host-bucketed level
    val all = quotaRows(quota.finalQuota(spark))
    val host = all.head._1
    val probe = quota.hostTopK(spark, host)
    val got = probe.collect().map(_.getLong(1)).toSeq
    assert(got === all.filter(_._1 == host).sortBy(_._2).map(_._3),
      "pruned probe differs from the full quota's rows for the host")
    val p = probe.queryExecution.executedPlan.toString
    val partFilters = "PartitionFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(p)
    assert(partFilters.isDefined, s"no PartitionFilters list in probe plan:\n$p")
    assert(partFilters.get.group(1).contains("pb"),
      s"probe read not pruned on pb:\n$p")
  }

  test("driver-side XXH64 host buckets agree with Spark's xxhash64") {
    val buckets = 64L
    val got = docs.select(Corpus.hostCol.as("host")).distinct()
      .withColumn("pb", pmod(xxhash64(col("host")), lit(buckets)))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    got.foreach { case (host, pb) =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(host)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      assert(((h % buckets) + buckets) % buckets === pb,
        s"driver bucket diverges from Spark for host $host")
    }
  }
}
