package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

/** Every registered query runs at sf0.001 and returns rows; the flagship
  * entry returns rows (the driver's t1 smoke contract). */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = T.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has a distinct name and every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  // fast representative subset (full inventory is covered by the driver's
  // oracle gate; streaming queries are exercised by their own machinery)
  for (name <- Seq("d01_pricing_summary", "d06_rank_windows", "d13_json",
      "d15_tumbling", "d18_word_topk", "n01_dedup_fingerprint",
      "n09_quality_score", "n12_multimodal_meta")) {
    test(s"$name returns rows at sf0.001") {
      assert(SparkEntry.queries(name)(spark, T.sf0001).count() > 0)
    }
  }
}
