package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** A session built with spark.sql.extensions=graft.GraftExtensions exposes
  * the codegen kernels as SQL functions without any per-session
  * registration call. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extension-built session has the graft SQL functions") {
    // make sure the shared suite session exists first, then clear the
    // default so getOrCreate actually constructs a session with the
    // extensions applied (it would otherwise return the existing default,
    // silently skipping extension injection)
    val shared = SparkTestSession.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions is the programmatic injection path; the equivalent
    // spark.sql.extensions=graft.GraftExtensions static conf only applies
    // when the SparkContext is built fresh (spark-submit), not when a test
    // JVM reuses one
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val cos = spark.sql(
        """SELECT cosine_similarity(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
          |                         array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS c""".stripMargin)
        .head().getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      val sh = spark.sql("SELECT simhash64(array(CAST(5 AS BIGINT))) AS s").head().getLong(0)
      assert(sh == 5L) // single token: majority vote == the token's bits
      val sig = spark.sql(
        "SELECT size(minhash_signature(array(CAST(5 AS BIGINT), CAST(9 AS BIGINT)), 16)) AS n")
        .head().getInt(0)
      assert(sig == 16)
      val dp = spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .head().getDouble(0)
      assert(dp == 11.0)

      // the injected optimizer rule rewrites the row_number()<=k idiom onto
      // the custom top-k operator, and results match the window formulation
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val df = spark.range(0, 1000).select(
        (col("id") % 7).as("g"), col("id"),
        (col("id") * 37 % 101).as("score"))
      val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
      val topk = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).drop("rn")
      val planStr = topk.queryExecution.executedPlan.toString
      assert(planStr.contains("TopKPerKeyFinal"), planStr)
      assert(!planStr.contains("Window"), planStr)
      val expected = df.collect().groupBy(_.getLong(0)).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r.getLong(2), r.getLong(1))).take(3).toSeq
      }.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val got = topk.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected)

      // a filter that keeps the rn column must NOT be rewritten
      val keepRn = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      assert(keepRn.queryExecution.executedPlan.toString.contains("Window"))
    } finally {
      // leave the shared-context default session as the suites expect it
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
