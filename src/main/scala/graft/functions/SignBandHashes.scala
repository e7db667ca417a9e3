package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/**
 * Native Catalyst expression: sign-random-projection LSH band hashes of a
 * double-vector column. For band b (0 ≤ b < bands), the value packs `bits`
 * sign bits — bit k is `dot(vec, planes[b·bits + k]) > 0` — MSB-first, the
 * exact arithmetic of the HOF formulation it replaces
 * (`aggregate(slice(transform(planes, p -> dot > 0 ? 1 : 0), ...), 0L,
 * (acc, bit) -> acc·2 + bit)`), but whole-stage-codegen'd into three
 * primitive loops. The interpreted HOF pays per-element lambda machinery on
 * bands×bits×dim ≈ 37k steps per row — measured as the dominant cost of the
 * n26 banding stage; this kernel is a plain fused multiply-accumulate.
 *
 * `planes` is row-major flat: plane p occupies [p·dim, (p+1)·dim). Folds
 * each dot product over min(dim, len(vec)) elements — fixed-dimension
 * embeddings are the caller's schema contract. Null if the input vector or
 * any element is null (DotProduct's convention).
 *
 * Scale note: the planes array (bands·bits·dim doubles, ~288 KB at n26's
 * geometry) rides into each task as part of the serialized expression —
 * broadcast-sized constant state, no driver round-trips.
 */
case class SignBandHashes(child: Expression, planes: Array[Double],
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

  // null via null input or null elements, as in DotProduct
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = math.min(dim, xs.numElements())
    var j = 0
    while (j < n) { // null elements poison every band: bail to SQL NULL
      if (xs.isNullAt(j)) return null
      j += 1
    }
    val out = new Array[Long](bands)
    var p = 0
    var b = 0
    while (b < bands) {
      var v = 0L
      var k = 0
      while (k < bits) {
        val off = p * dim
        var dot = 0.0
        var i = 0
        while (i < n) { dot += xs.getDouble(i) * planes(off + i); i += 1 }
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
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val hasNull = ctx.freshName("hasNull")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
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
         |  long[] $out = new long[$bands];
         |  int $p = 0;
         |  for (int $b = 0; $b < $bands; $b++) {
         |    long $v = 0L;
         |    for (int $k = 0; $k < $bits; $k++) {
         |      int $off = $p * $dim;
         |      double $dot = 0.0;
         |      for (int $i = 0; $i < $n; $i++) {
         |        $dot += $xs.getDouble($i) * $planesRef[$off + $i];
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

  override def prettyName: String = "sign_band_hashes"
}

object SignBandHashes {
  /** Column-level entry point: `sign_band_hashes(vec)` for a fixed plane set. */
  def apply(vec: Column, planes: Array[Double], dim: Int, bits: Int,
            bands: Int): Column =
    ColumnBridge.column(
      SignBandHashes(ColumnBridge.expression(vec), planes, dim, bits, bands))
}
