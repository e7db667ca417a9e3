package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Codegen'd sketch kernels over pre-hashed token arrays (`array<bigint>`,
 * e.g. `transform(words, w -> xxhash64(w))`). Both replace interpreted
 * nested higher-order-function folds in the dedup hot paths with primitive
 * loops (SURVEY §7.3 extension point (b)).
 */

/** 64-bit SimHash of a hash multiset: per bit position, the majority vote of
  * the token hashes' bits. O(tokens × 64) in a primitive loop. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint>, got ${t.simpleString}")
    }

  override def dataType: DataType = LongType

  // result can be null via null array elements even when the input is non-null
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) return null // match the HOF null propagation
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[64];
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $hasNull = true; break; }
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $votes[$b] += (((($h >>> $b) & 1L) == 1L) ? 1 : -1);
         |  }
         |}
         |if ($hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $out = 0L;
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ($votes[$b] > 0) $out |= (1L << $b);
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  def apply(hashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashes)))
}

/** k-permutation MinHash signature: for each seed 0..k-1, the minimum of
  * `XXH64(tokenHash, seed)` over the token set — the "hash once, mix k
  * times" scheme, k × tokens long-mixes in a primitive loop. */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) if k > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint> and k > 0, got ${t.simpleString}, k=$k")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // result can be null via null array elements even when the input is non-null
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    var j = 0
    while (j < n) { // match the HOF null propagation
      if (hs.isNullAt(j)) return null
      j += 1
    }
    val sig = new Array[Long](k)
    var s = 0
    while (s < k) {
      var best = Long.MaxValue
      var i = 0
      while (i < n) {
        val m = MinHashSignature.mix(hs.getLong(i), s)
        if (m < best) best = m
        i += 1
      }
      sig(s) = best
      s += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val m = ctx.freshName("m")
      // call through the companion object's MODULE$ — static forwarders on
      // case classes are not guaranteed
      val cls = "graft.functions.MinHashSignature$.MODULE$"
      val hasNull = ctx.freshName("hasNull")
      val j = ctx.freshName("j")
      s"""
         |int $n = $a.numElements();
         |boolean $hasNull = false;
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($a.isNullAt($j)) { $hasNull = true; break; }
         |}
         |if ($hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $sig = new long[$k];
         |  for (int $s = 0; $s < $k; $s++) {
         |    long $best = Long.MAX_VALUE;
         |    for (int $i = 0; $i < $n; $i++) {
         |      long $m = $cls.mix($a.getLong($i), $s);
         |      if ($m < $best) $best = $m;
         |    }
         |    $sig[$s] = $best;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {
  /** SplitMix64-style finalizer over (hash ^ seed-spread) — a cheap, well
    * mixed 64→64 permutation family (public-domain SplitMix64 constants). */
  def mix(h: Long, seed: Int): Long = {
    var z = h + (seed.toLong * 0x9E3779B97F4A7C15L) + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def apply(hashes: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hashes), k))
}
