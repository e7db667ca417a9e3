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
    } finally {
      // leave the shared-context default session as the suites expect it
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
