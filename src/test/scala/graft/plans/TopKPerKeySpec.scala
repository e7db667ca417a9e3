package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.queries.Tables

/** The custom operator must equal the row_number window formulation and
  * plan as partial-heap → exchange → final-heap. */
class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark = T.spark

  private def byWindow(k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, T.sf0001)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  private def byOperator(k: Int) =
    TopKPerKey(
      Tables.orders(spark, T.sf0001)
        .select("o_orderpriority", "o_orderkey", "o_totalprice"),
      Seq(col("o_orderpriority")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), k)

  private def asSet(rows: Array[Row]): Set[(String, Long, Double)] =
    rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("matches the window formulation for several k") {
    Seq(1, 3, 10).foreach { k =>
      val exp = asSet(byWindow(k).collect())
      val got = asSet(byOperator(k).collect())
      assert(got == exp, s"k=$k diff: ${got.diff(exp)} / ${exp.diff(got)}")
    }
  }

  test("plans as partial heap below the exchange, final above") {
    val plan = byOperator(3).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(plan.contains("TopKPerKeyFinal"), plan)
    val iPartial = plan.indexOf("TopKPerKeyPartial")
    val iFinal = plan.indexOf("TopKPerKeyFinal")
    val iExchange = plan.indexOf("Exchange")
    assert(iFinal < iExchange && iExchange < iPartial,
      s"expected Final above Exchange above Partial:\n$plan")
  }

  test("k larger than any group returns everything") {
    val n = Tables.orders(spark, T.sf0001).count()
    assert(byOperator(Int.MaxValue).count() == n)
  }

  test("null keys and null order values follow SortOrder null placement") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 5L), (1L, null), (1L, 1L), (null, 3L), (null, 7L))
      .toDF("g", "x")
    // asc nulls-first: per group the 2 smallest with null first
    val got = TopKPerKey(df, Seq(col("g")), Seq(col("x").asc), 2)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    val expected = Set(
      (Some(1L): Option[Any], None: Option[Any]),
      (Some(1L): Option[Any], Some(1L): Option[Any]),
      (None: Option[Any], Some(3L): Option[Any]),
      (None: Option[Any], Some(7L): Option[Any]))
    assert(got == expected, got)
  }

  test("empty keys = global top-k: exactly k rows across all partitions") {
    import spark.implicits._
    val df = spark.range(0, 1000).repartition(8)
      .select(col("id"), (col("id") * 37 % 101).as("score"))
    val got = TopKPerKey(df, Seq.empty, Seq(col("score").desc, col("id")), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, s) => (-s, id) }.take(5).toSet
    assert(got == expected)
  }

  test("empty input yields empty output") {
    val empty = Tables.orders(spark, T.sf0001).filter(lit(false))
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
    assert(TopKPerKey(empty, Seq(col("o_orderpriority")),
      Seq(col("o_totalprice").desc), 3).count() == 0)
  }
}
