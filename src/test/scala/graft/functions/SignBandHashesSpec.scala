package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.queries.Tables

/** The codegen band-hash kernel must reproduce the interpreted HOF
  * formulation it replaced (transform over a planes literal → sign bits →
  * per-band slice/aggregate MSB-first packing) exactly — same planes, same
  * packing, same band values. */
class SignBandHashesSpec extends AnyFunSuite {
  lazy val spark = T.spark

  private val dim = 4
  private val bits = 3
  private val bands = 2
  // fixed planes exercising sign boundaries: includes an exact-zero dot
  // (plane orthogonal to a vector) which must pack as 0 (dot > 0 is strict)
  private val planes: Seq[Seq[Double]] = Seq(
    Seq(1.0, 0.0, 0.0, 0.0), Seq(-1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
    Seq(0.0, 0.0, 1.0, 0.0), Seq(0.0, 0.0, -1.0, 0.0), Seq(0.5, 0.5, -0.5, 0.25))

  test("codegen kernel matches the interpreted HOF packing exactly") {
    val vecs = Tables.embeddings(spark, T.sf0001)
      .select(col("vec_id"),
        slice(transform(col("embedding"), x => x.cast("double")), 1, dim).as("u"))
    val planesLit = typedlit(planes)
    val bitsArr = transform(planesLit, p =>
      when(DotProduct(col("u"), p) > 0, lit(1L)).otherwise(lit(0L)))
    val hof = element_at(transform(array(bitsArr), ba =>
      transform(sequence(lit(0), lit(bands - 1)), b =>
        aggregate(slice(ba, b * bits + 1, lit(bits)), lit(0L),
          (acc, bit) => acc * 2 + bit))), 1)
    val fast = SignBandHashes(col("u"), planes.flatten.toArray, dim, bits, bands)
    val rows = vecs.select(col("vec_id"), fast.as("fast"), hof.as("ref")).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"vec ${r.getLong(0)}: ${r.getSeq[Long](1)} != ${r.getSeq[Long](2)}")
    }
  }

  test("deterministic across evaluations and bounded by the bit width") {
    val vecs = Tables.embeddings(spark, T.sf0001)
      .select(col("vec_id"),
        slice(transform(col("embedding"), x => x.cast("double")), 1, dim).as("u"))
    val fast = SignBandHashes(col("u"), planes.flatten.toArray, dim, bits, bands)
    val a = vecs.select(col("vec_id"), fast.as("h")).collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = vecs.select(col("vec_id"), fast.as("h")).collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
    a.values.foreach { hs =>
      assert(hs.length == bands)
      hs.foreach(h => assert(h >= 0 && h < (1L << bits)))
    }
  }

  test("null input and null elements yield null") {
    val r1 = spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) AS u")
      .select(SignBandHashes(col("u"), planes.flatten.toArray, dim, bits, bands)).head()
    assert(r1.isNullAt(0))
    val r2 = spark.sql("SELECT array(1.0D, CAST(NULL AS DOUBLE), 2.0D, 3.0D) AS u")
      .select(SignBandHashes(col("u"), planes.flatten.toArray, dim, bits, bands)).head()
    assert(r2.isNullAt(0))
  }
}
