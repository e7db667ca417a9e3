package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}

/**
 * Integer-exact INT8 scalar-quantization kernels — the middle rung of the
 * vector-compression ladder the similarity family ships (the FAISS "SQ8"
 * layout): raw unit vectors are 64 doubles = 512 B, PQ codes (n61/n65)
 * are 8 ints ≈ 32 B but discard per-dimension resolution, SQ8 keeps every
 * dimension at 8-bit resolution in a 64-byte BINARY — ×8 smaller than the
 * floats with near-exact ranking fidelity (measured: top-3 agreement with
 * the exact-rank n60 join ≈ 1.0 where PQ recall needs a trained codebook
 * to clear 0.12; see `Sq8Spec` + BASELINE round 15). Reference behavior
 * anchor: the reference carries opaque embedding columns end to end
 * (`tests/conftest.py`); the compression itself is public-literature
 * standard (scalar quantization per e.g. Jégou et al. TPAMI 2011 §II).
 *
 * Determinism treatment (the repo's no-float-accumulation rule):
 *
 *   code_i    = clamp(floor(u_i · 127), −127, 127)   (one double product,
 *               exact in both engines — u is the shared bit-identical
 *               unit vector)
 *   dot(a, b) = Σ_i a_i · b_i                        (64-bit integer)
 *
 * so codes and scores rebuild bit-for-bit in DuckDB and the n68 join is
 * HASH-checked. Overflow headroom: |code| ≤ 127 ⇒ each product ≤ 16129,
 * a 64-dim sum ≤ 2²⁰ — integer-exact with room for 2⁴³ more dimensions.
 */
object ScalarQuantization {

  /** `sq8_encode(vec, dim)`: the int8 code vector as a dim-byte BINARY.
    * Null when the input is null, has a null element, a NON-FINITE
    * element (NaN/±Inf — a zero-norm embedding's unit vector), or its
    * length is not `dim` (the PqEncodeExpr length contract — a malformed
    * vector must surface as a droppable null, not a divergent hash). */
  def encode(vec: Column, dim: Int): Column =
    ColumnBridge.column(Sq8EncodeExpr(ColumnBridge.expression(vec), dim))

  /** `sq8_dot(a, b)`: the integer dot product of two code vectors. Null
    * when either side is null or the lengths differ (malformed rows rank
    * out, the defensive-null convention of [[PqAdcExpr]]). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      Sq8DotExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Driver-side twin of the encode step (spec reference). Requires
    * finite components — the kernel returns NULL for a non-finite
    * element (see [[Sq8EncodeExpr]]); the twin throws instead of
    * silently encoding `(long) floor(NaN) == 0`. */
  def encodeLocal(xs: Seq[Double]): Array[Byte] =
    xs.map { x =>
      require(java.lang.Double.isFinite(x),
        s"sq8 encodeLocal on a non-finite component $x — the kernel nulls here")
      val v = math.floor(x * 127.0).toLong
      math.max(-127L, math.min(127L, v)).toByte
    }.toArray

  /** Driver-side twin of the dot kernel (spec reference). */
  def dotLocal(a: Array[Byte], b: Array[Byte]): Long = {
    require(a.length == b.length)
    var s = 0L
    var i = 0
    while (i < a.length) { s += a(i).toLong * b(i).toLong; i += 1 }
    s
  }
}

/**
 * `sq8_encode`: array<double> → BINARY of per-component int8 codes.
 * Whole-stage-codegen'd: one fused clamp/floor loop, no boxing.
 */
case class Sq8EncodeExpr(child: Expression, dim: Int)
  extends UnaryExpression {

  require(dim > 0, s"sq8_encode needs dim > 0, got $dim")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<double> argument, got ${other.simpleString}")
    }

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    if (xs.numElements() != dim) return null
    var j = 0
    while (j < dim) {
      if (xs.isNullAt(j)) return null
      j += 1
    }
    val out = new Array[Byte](dim)
    var i = 0
    while (i < dim) {
      val x = xs.getDouble(i)
      // non-finite components (a zero-norm embedding unit-normalizes to
      // NaN) encode to NULL like null elements, not to a silent code 0:
      // `(long) floor(NaN)` is 0 on the JVM while the DuckDB oracle's
      // CAST(floor(NaN*127) AS BIGINT) errors — the defensive-null
      // contract keeps both engines agreeing that the row ranks out
      // (round-15 advice; shared with the PqEncodeExpr length contract)
      if (!java.lang.Double.isFinite(x)) return null
      var v = math.floor(x * 127.0).toLong
      if (v < -127L) v = -127L
      if (v > 127L) v = 127L
      out(i) = v.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val hasNull = ctx.freshName("hasNull")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |boolean $hasNull = $xs.numElements() != $dim;
         |for (int $j = 0; !$hasNull && $j < $dim; $j++) {
         |  if ($xs.isNullAt($j)) { $hasNull = true; }
         |}
         |byte[] $out = new byte[$dim];
         |for (int $i = 0; !$hasNull && $i < $dim; $i++) {
         |  double $x = $xs.getDouble($i);
         |  if (!java.lang.Double.isFinite($x)) {
         |    $hasNull = true;
         |  } else {
         |    long $v = (long) java.lang.Math.floor($x * 127.0);
         |    if ($v < -127L) $v = -127L;
         |    if ($v > 127L) $v = 127L;
         |    $out[$i] = (byte) $v;
         |  }
         |}
         |if ($hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "sq8_encode"
}

/**
 * `sq8_dot`: the 64-bit integer dot product of two int8 code BINARYs
 * (Java bytes sign-extend in arithmetic, so the multiply-accumulate is
 * exact with no unpack step). Null when the lengths differ — a malformed
 * row must rank out, never throw in generated code.
 */
case class Sq8DotExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two binary arguments, got ${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]
    val b = r.asInstanceOf[Array[Byte]]
    if (a.length != b.length) return null
    var s = 0L
    var i = 0
    while (i < a.length) { s += a(i).toLong * b(i).toLong; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    $s += (long) $a[$i] * (long) $b[$i];
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sq8_dot"
}
