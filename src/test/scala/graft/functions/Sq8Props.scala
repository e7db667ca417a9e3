package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.scalacheck.rng.Seed

import graft.{SparkTestSession => T}

/**
 * The SQ8 kernels as properties over RANDOM vectors — the fixture table
 * only exercises unit vectors of ±0.5 uniform data, so these generators
 * add what it cannot: components outside [−1, 1] (the clamp must engage,
 * not overflow the byte), near-zero magnitudes (floor sign behavior),
 * wrong-length vectors (⇒ NULL, the shared length contract), and
 * mismatched code lengths (⇒ NULL dot) — asserting the distributed
 * kernels (codegen path, via collect) equal the driver references for
 * every draw, plus the algebraic symmetry dot(a,b) = dot(b,a) and the
 * clamp's range invariant (every code in [−127, 127]).
 *
 * Seed policy (round 6, repo-wide): pinned initial seed.
 */
object Sq8Props extends Properties("ScalarQuantization") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withInitialSeed(Seed(20260816L)).withMinSuccessfulTests(10)

  private lazy val spark = T.spark

  private val dim = 16

  private val component: Gen[Double] = Gen.oneOf(
    Gen.choose(-1.0, 1.0),             // the unit-vector contract's range
    Gen.choose(-4.0, 4.0),             // clamp territory
    Gen.choose(-0.01, 0.01),           // near-zero (floor sign behavior)
    Gen.const(0.0), Gen.const(1.0), Gen.const(-1.0))

  private val caseGen: Gen[Seq[Seq[Double]]] = for {
    nVecs <- Gen.choose(2, 12)
    lens <- Gen.listOfN(nVecs, Gen.oneOf(Gen.const(dim), Gen.choose(0, dim)))
    vecs <- Gen.sequence[Seq[Seq[Double]], Seq[Double]](
      lens.map(l => Gen.listOfN(l, component).map(_.toSeq)))
  } yield vecs

  private def toDf(vecs: Seq[Seq[Double]]) = {
    val schema = StructType(Seq(
      StructField("i", IntegerType),
      StructField("v", ArrayType(DoubleType, containsNull = false))))
    spark.createDataFrame(
      java.util.Arrays.asList(vecs.zipWithIndex.map {
        case (v, i) => Row(i, v) }: _*), schema)
  }

  property("codegen encode == driver encode; wrong lengths are NULL; codes in range") =
    forAll(caseGen) { vecs =>
      val rows = toDf(vecs)
        .select(col("i"), ScalarQuantization.encode(col("v"), dim).as("c"))
        .collect().sortBy(_.getInt(0))
      rows.zip(vecs).forall { case (r, v) =>
        if (v.length != dim) r.isNullAt(1)
        else {
          val got = r.getAs[Array[Byte]](1)
          java.util.Arrays.equals(got, ScalarQuantization.encodeLocal(v)) &&
            got.forall(b => b >= -127 && b <= 127)
        }
      }
    }

  property("codegen dot == driver dot and is symmetric; mismatched lengths are NULL") =
    forAll(caseGen) { vecs =>
      val full = vecs.filter(_.length == dim)
      val codes = full.map(ScalarQuantization.encodeLocal)
      val pairs = for (a <- codes; b <- codes) yield (a, b)
      val schema = StructType(Seq(
        StructField("a", BinaryType), StructField("b", BinaryType)))
      val df = spark.createDataFrame(
        java.util.Arrays.asList(pairs.map { case (a, b) => Row(a, b) }: _*),
        schema)
      val got = df.select(ScalarQuantization.dot(col("a"), col("b")).as("d"))
        .collect().map(_.getLong(0))
      val want = pairs.map { case (a, b) => ScalarQuantization.dotLocal(a, b) }
      val sym = pairs.zip(want).forall { case ((a, b), d) =>
        ScalarQuantization.dotLocal(b, a) == d }
      val mismatched =
        if (codes.isEmpty) true
        else spark.createDataFrame(
            java.util.Arrays.asList(Row(codes.head, Array[Byte](1, 2, 3))),
            schema)
          .select(ScalarQuantization.dot(col("a"), col("b")).as("d"))
          .collect().head.isNullAt(0)
      got.toSeq == want.toSeq && sym && mismatched
    }
}
