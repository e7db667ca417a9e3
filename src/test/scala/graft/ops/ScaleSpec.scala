package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.queries.Tables

/** Scale utilities: salted joins must be result-identical to plain joins;
  * bucketed tables must sort-merge-join without a shuffle exchange. */
class ScaleSpec extends AnyFunSuite {
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
