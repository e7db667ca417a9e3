package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, MinHashSignature, SimHash64}

/**
 * Session-extension hook: `spark.sql.extensions=graft.GraftExtensions`
 * registers the engine's codegen kernels as SQL functions at session build
 * time (the construction-time counterpart of the per-session
 * `CosineSimilarity.register(spark)` path, which covers already-built
 * sessions).
 *
 * SQL surface:
 *   cosine_similarity(array<float>, array<float>) → double
 *   dot_product(array<double>, array<double>)     → double
 *   simhash64(array<bigint>)                      → bigint
 *   minhash_signature(array<bigint>, k)           → array<bigint>
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension (§7.3(c)): per-key top-k planner strategy
    // plus the optimizer rewrite of the row_number()<=k window idiom onto it
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", classOf[CosineSimilarity]),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", classOf[DotProduct]),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", classOf[SimHash64]),
      (args: Seq[Expression]) => SimHash64(args.head)))
    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", classOf[MinHashSignature]),
      (args: Seq[Expression]) => {
        // USER_RAISED_EXCEPTION renders the message plainly (SQLSTATE P0001)
        // — INTERNAL_ERROR would frame a user mistake as an engine bug
        def fail(msg: String): Nothing = throw new AnalysisException(
          "USER_RAISED_EXCEPTION",
          Map("errorMessage" -> s"minhash_signature(array<bigint>, k): $msg"),
          Option.empty[Throwable])
        if (args.length != 2)
          fail(s"expects 2 arguments, got ${args.length}")
        if (!args(1).foldable)
          fail("k must be a literal (foldable) integer, got " + args(1).sql)
        args(1).eval() match {
          case n: Number if n.intValue() > 0 => MinHashSignature(args(0), n.intValue())
          case other => fail(s"k must be a positive integer literal, got $other")
        }
      }))
  }
}
