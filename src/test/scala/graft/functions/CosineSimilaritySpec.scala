package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.queries.Tables

/** The codegen expression must be bit-identical to the declarative
  * higher-order-function formulation it replaces (that formulation is what
  * the DuckDB oracle mirrors). */
class CosineSimilaritySpec extends AnyFunSuite {
  lazy val spark = T.spark

  private def hofCosine = {
    val ad = transform(col("embedding"), x => x.cast("double"))
    val bd = transform(col("qv"), x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(ad, lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(bd, lit(0.0), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  test("codegen kernel matches the interpreted HOF fold bit-for-bit") {
    val e = Tables.embeddings(spark, T.sf0001)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select(col("vec_id"),
        CosineSimilarity(col("embedding"), col("qv")).as("fast"),
        hofCosine.as("ref"))
      .collect()
    assert(both.length > 0)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
  }

  test("registers as a SQL function") {
    CosineSimilarity.register(spark)
    val out = spark.sql(
      "SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head().getDouble(0)
    assert(math.abs(out - 1.0) < 1e-12)
  }

  test("null input yields null; mismatched types rejected at analysis") {
    val df = spark.sql("SELECT CAST(NULL AS ARRAY<FLOAT>) AS a, array(CAST(1.0 AS FLOAT)) AS b")
    val r = df.select(CosineSimilarity(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
    val bad = spark.sql("SELECT array(1.0) AS a, array(CAST(1.0 AS FLOAT)) AS b")
    assertThrows[Exception](bad.select(CosineSimilarity(col("a"), col("b"))).collect())
  }
}
