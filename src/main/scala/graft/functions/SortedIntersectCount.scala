package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native Catalyst expression: |a ∩ b| for two SORTED long-array columns
 * with distinct elements, as a two-pointer merge — the codegen replacement
 * for `size(array_intersect(a, b))` in the Jaccard verify stage.
 * ArrayIntersect is interpreted (no doGenCode), builds a hash set per
 * evaluation, and materializes the intersection array just to take its
 * size; over the candidate-pair stream of the n02/n03 pipelines
 * (arrays of ~10²–10³ once-hashed shingles per document) the merge count is
 * allocation-free and branch-predictable. Sorting the shingle-hash arrays
 * once at creation is free correctness-wise: every consumer (minhash
 * signature, inverted-index explode, set intersection) is order-invariant.
 *
 * Contract: both inputs ascending-sorted with distinct elements (the
 * `array_sort(array_distinct(...))`-shaped producer in
 * [[graft.ops.Dedup]]); unsorted input silently undercounts — guarded by
 * the parity spec, not at runtime (a per-eval sortedness check would cost
 * the pass it saves). Null if either input is null or contains a null
 * element (DotProduct's convention; a null element cannot participate in a
 * sorted-distinct set anyway). Null-element detection is merge-scoped: a
 * null is reported only if the two-pointer merge reaches it before one
 * side is exhausted (e.g. `a=[1], b=[2,null]` returns 0, not null) —
 * unlike [[SignBandHashes]], the tail beyond the shorter run is never
 * scanned, because under the sorted-distinct producer contract null
 * elements cannot occur and a full-tail scan would be pure overhead.
 */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val m = ys.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      if (xs.isNullAt(i) || ys.isNullAt(j)) return null
      val x = xs.getLong(i)
      val y = ys.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0;
         |long $c = 0L;
         |boolean $hasNull = false;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { $hasNull = true; break; }
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |if ($hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $c;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersectCount {
  /** Column-level entry point: `sorted_intersect_count(a, b)`. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
