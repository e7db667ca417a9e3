package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.scalacheck.rng.Seed

import graft.{SparkTestSession => T}
import graft.queries.Tables

/**
 * The n67 core claim as a property: the incremental quota converges to
 * the batch n62 answer for ANY partition of the corpus into batches —
 * bounded selection is associative (a global top-perHost row survives
 * its own batch's cut no matter which batch that is), so the union of
 * batch-local cuts re-cut equals the cut of the union.
 * `IncrementalQuotaSpec` drives the real file stream and one alternate
 * batching; this property drives `processBatch` directly over
 * randomized batch counts, hash-salted batch assignments (arbitrarily
 * splitting each host's rows across batches), random maintenance
 * positions, and a randomized perHost.
 *
 * Seed policy (round 6, repo-wide): pinned initial seed.
 */
object IncrementalQuotaProps extends Properties("IncrementalQuota") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withInitialSeed(Seed(20260817L)).withMinSuccessfulTests(4)

  private lazy val spark = T.spark
  private lazy val docs = Tables.documents(spark, T.sf0001)

  private def expected(perHost: Int): Set[(String, Long, Long)] =
    Pipeline.domainCapQuery(spark, T.sf0001, perHost = perHost)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private lazy val expect3 = expected(3)
  private lazy val expect10 = expected(10)

  private val caseGen: Gen[(Int, Int, Int, Int)] = for {
    batches <- Gen.choose(1, 5)
    salt <- Gen.choose(0, 1000000)
    perHost <- Gen.oneOf(3, 10)
    maintainAfter <- Gen.choose(0, 5) // compact() position; > batches = never
  } yield (batches, salt, perHost, maintainAfter)

  property("finalQuota equals the batch n62 quota for any batching and maintenance position") =
    forAll(caseGen) { case (batches, salt, perHost, maintainAfter) =>
      val root = T.tmpDir("n67-prop")
      try {
        val quota = new IncrementalQuota(root.resolve("state"),
          perHost = perHost)
        (0 until batches).foreach { j =>
          quota.processBatch(
            docs.filter(pmod(xxhash64(col("doc_id"), lit(salt)),
              lit(batches)) === j), j.toLong)
          if (j == maintainAfter) quota.maintain(spark)
        }
        val got = quota.finalQuota(spark)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
        got == (if (perHost == 3) expect3 else expect10)
      } finally T.deleteTree(root)
    }
}
