package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.queries.Tables

/** The integer projection kernels behind the n06/n07 oracle hash match:
  * the banding/assignment decision must be a 64-bit integer computation so
  * NO summation order — Spark's sequential fold, DuckDB's hash-join-probe
  * SUM, a future parallel aggregation — can change a sign or an argmax
  * (round-10 verdict task 2: the float formulation only *documented* the
  * order assumption; these kernels delete it). */
class QuantizedDotsSpec extends AnyFunSuite {
  lazy val spark = T.spark

  private val dim = 64
  private val nOut = 6

  // md5-derived integer planes — the Similarity construction verbatim
  private val planes: Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nOut * dim) { idx =>
      val p = idx / dim
      val i = idx % dim
      val hex = md.digest(s"t_${p}_${i}".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) - 2147483648L
    }
  }

  private def vecs() = Tables.embeddings(spark, T.sf0001)
    .select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("u"))

  /** Driver-side reference dot with an arbitrary index visit order. */
  private def refDots(xs: Seq[Double], order: Seq[Int]): Array[Long] =
    Array.tabulate(nOut) { p =>
      var dot = 0L
      order.foreach { i =>
        dot += math.floor(xs(i) * QuantizedDots.Scale).toLong * planes(p * dim + i)
      }
      dot
    }

  test("kernel matches the driver reference under ANY summation order") {
    val rows = vecs()
      .select(col("vec_id"), col("u"),
        QuantizedDots(col("u"), planes, dim, nOut).as("dots"))
      .collect()
    assert(rows.length > 0)
    val rnd = new scala.util.Random(7L)
    rows.foreach { r =>
      val xs = r.getSeq[Double](1)
      val got = r.getSeq[Long](2)
      val asc = refDots(xs, 0 until dim)
      val desc = refDots(xs, (0 until dim).reverse)
      val shuffled = refDots(xs, rnd.shuffle((0 until dim).toList))
      // integer adds are associative+commutative: all visit orders agree,
      // and the kernel reproduces them exactly
      assert(asc.sameElements(desc) && asc.sameElements(shuffled),
        s"vec ${r.getLong(0)}: integer dots varied with summation order")
      assert(got == asc.toSeq,
        s"vec ${r.getLong(0)}: kernel ${got} != reference ${asc.toSeq}")
    }
  }

  test("sign_band_hashes_q packs exactly the signs of quantized_dots") {
    val bits = 3
    val bands = 2
    val rows = vecs()
      .select(
        QuantizedDots(col("u"), planes, dim, nOut).as("dots"),
        SignBandHashesQ(col("u"), planes, dim, bits, bands).as("bh"))
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val dots = r.getSeq[Long](0)
      val bh = r.getSeq[Long](1)
      val expected = (0 until bands).map { b =>
        (0 until bits).foldLeft(0L) { (acc, k) =>
          (acc << 1) | (if (dots(b * bits + k) > 0) 1L else 0L)
        }
      }
      assert(bh == expected, s"$bh != $expected for dots $dots")
    }
  }

  test("quantization is the exact floor(x*2^20) both kernels share") {
    // exercises the exactness claim: float→double→*2^20→floor must be the
    // same integer the oracle's floor(x*1048576.0) computes; spot-check on
    // boundary-ish values including negatives and an exact integer product
    val df = spark.sql(
      """SELECT array(CAST(-1.0 AS DOUBLE), CAST(0.5 AS DOUBLE),
        |  CAST(-0.25 AS DOUBLE), CAST(0.00000095367431640625 AS DOUBLE)) AS u
        |""".stripMargin)
    val p = Array.fill(4)(1L) // identity-ish plane: dot = sum of q_i
    val got = df.select(QuantizedDots(col("u"), p, 4, 1)).collect()(0).getSeq[Long](0)
    val q = Seq(-1.0, 0.5, -0.25, 0.00000095367431640625)
      .map(x => math.floor(x * 1048576.0).toLong)
    assert(got == Seq(q.sum))
    assert(q == Seq(-1048576L, 524288L, -262144L, 1L))
  }

  test("null input and null elements yield null") {
    val r1 = spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) AS u")
      .select(QuantizedDots(col("u"), planes, dim, nOut).as("d"),
        SignBandHashesQ(col("u"), planes, dim, 3, 2).as("b"))
      .collect()(0)
    assert(r1.isNullAt(0) && r1.isNullAt(1))
    val r2 = spark.sql("SELECT array(CAST(1.0 AS DOUBLE), CAST(NULL AS DOUBLE)) AS u")
      .select(QuantizedDots(col("u"), planes, dim, nOut).as("d"),
        SignBandHashesQ(col("u"), planes, dim, 3, 2).as("b"))
      .collect()(0)
    assert(r2.isNullAt(0) && r2.isNullAt(1))
  }
}
