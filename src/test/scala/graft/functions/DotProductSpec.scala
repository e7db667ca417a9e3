package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.queries.Tables

/** The codegen dot-product must be bit-identical to the
  * aggregate(zip_with(...)) fold it replaces (the DuckDB oracle mirrors
  * that fold's sequential index order). */
class DotProductSpec extends AnyFunSuite {
  lazy val spark = T.spark

  test("codegen kernel matches the interpreted HOF fold bit-for-bit") {
    val e = Tables.embeddings(spark, T.sf0001)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("dv"))
    val q = e.filter(col("vec_id") === 0).select(col("dv").as("qv"))
    val hof = aggregate(zip_with(col("dv"), col("qv"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val both = e.crossJoin(broadcast(q))
      .select(col("vec_id"),
        DotProduct(col("dv"), col("qv")).as("fast"), hof.as("ref"))
      .collect()
    assert(both.length > 0)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
  }

  test("null input and null elements yield null; bad types rejected") {
    val r1 = spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) AS a, array(1.0D) AS b")
      .select(DotProduct(col("a"), col("b"))).head()
    assert(r1.isNullAt(0))
    val r2 = spark.sql("SELECT array(1.0D, CAST(NULL AS DOUBLE)) AS a, array(2.0D, 3.0D) AS b")
      .select(DotProduct(col("a"), col("b"))).head()
    assert(r2.isNullAt(0))
    val bad = spark.sql("SELECT array('x') AS a, array(1.0D) AS b")
    assertThrows[Exception](bad.select(DotProduct(col("a"), col("b"))).collect())
  }

  test("registers as a SQL function") {
    DotProduct.register(spark)
    val out = spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(out == 11.0)
  }
}
