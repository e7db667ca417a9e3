package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.queries.Tables

/** Scale utilities: salted joins must be result-identical to plain joins;
  * bucketed tables must sort-merge-join without a shuffle exchange. */
class ScaleSpec extends AnyFunSuite with graft.SoakTagged {
  lazy val spark = T.spark

  test("saltedJoin equals the plain join") {
    val li = Tables.lineitem(spark, T.sf0001)
    val o = Tables.orders(spark, T.sf0001)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, Seq("l_orderkey"))
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedJoin(li, o, "l_orderkey", buckets = 8)
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("topKPerKey matches window-filter semantics") {
    val o = Tables.orders(spark, T.sf0001)
    val top2 = Scale.topKPerKey(o, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey")), 2)
    val counts = top2.groupBy("o_custkey").count().collect()
    assert(counts.forall(_.getLong(1) <= 2))
    assert(top2.count() > 0)
  }

  test("n42 recall vs exact n39 holds on the x10 amplified corpus") {
    // round-9 verdict #4: the recall gate ran only at base SF. The x10
    // corpus uses the sign-flip isometry (ScaleCurve.amplifyEmbeddings):
    // within-replica cosines are exact, cross-replica cosines fall in the
    // random bulk — so the TRUE top-3 stays intra-replica while the KMeans
    // coarse quantizer must now carve 10x the vectors into the same
    // nlist=8 cells, the regime where IVF recall would degrade first.
    val dir = graft.SparkTestSession.tmpDir("n42x10")
    graft.tools.ScaleCurve
      .amplifyEmbeddings(Tables.embeddings(spark, T.sf0001), 10)
      .write.mode("overwrite")
      .parquet(dir.resolve("embeddings.parquet").toString)
    val exact = Similarity.knnGraphQuery(spark, dir.toString)
      .select("vec_id", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.knnJoinQuery(spark, dir.toString)
      .select("vec_id", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache() // both queries persist unit-vector frames
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"n42 recall vs exact n39 at x10: $recall%.3f")
    assert(recall >= 0.6, s"recall $recall (${approx.size} approx, ${exact.size} exact)")
    assert(approx.map(_._1).size == exact.map(_._1).size,
      "some query vector lost its full top-k at x10")
  }

  test("bucketed tables sort-merge-join without a shuffle") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Tables.lineitem(spark, T.sf0001)
        .write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.orders(spark, T.sf0001)
        .write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("o_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      // co-located bucketed sides: no shuffle exchange anywhere in the plan
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
      assert(joined.count() == Tables.lineitem(spark, T.sf0001).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
