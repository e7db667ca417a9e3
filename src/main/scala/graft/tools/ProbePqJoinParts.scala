package graft.tools

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.functions._

/** Dev scratch: isolate where the n65 time goes at 20k (verify kernel vs
  * join/heap machinery). Not referenced by tests. */
object ProbePqJoinParts {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000L)
    val spark = Sessions.local(32, logLevel = "ERROR")
    val base = graft.queries.Tables.scratchDir("pqjoinparts")
    val comps = transform(sequence(lit(0), lit(63)), i =>
      (pmod(xxhash64(col("id"), i), lit(1000001L)).cast("double")
        / 1000000.0 - 0.5).cast("float"))
    spark.range(n).select(col("id").as("vec_id"), comps.as("embedding"),
        lit(0).as("label"))
      .repartition(32).write.mode("overwrite").parquet(base.resolve("e").toString)
    val emb = spark.read.parquet(base.resolve("e").toString)

    def t(label: String)(thunk: => Unit): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        thunk
        println(f"PARTS $label run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.catalog.clearCache()
      }
    }
    val (subDim, nSub, nCode) = graft.ops.Similarity.debugPqGeometry
    val cb = graft.ops.Similarity.debugPqCodebook
    val pt = graft.functions.ProductQuantization.pairDistanceTable(cb, subDim, nSub, nCode)
    t("n65_full") {
      graft.ops.Similarity.pqKnnJoin(emb).write.format("noop").mode("overwrite").save()
    }
    t("n65_constverify") {
      graft.ops.Similarity.pqKnnJoinDev(emb,
        (_: Column, _: Column) => lit(0L)).write.format("noop").mode("overwrite").save()
    }
    t("n65_adcverify") { // ADC-style single-array lookup on the left codes only
      graft.ops.Similarity.pqKnnJoinDev(emb,
        (a: Column, _: Column) => graft.functions.ProductQuantization
          .adc(a, pt.take(nSub * nCode), nSub, nCode))
        .write.format("noop").mode("overwrite").save()
    }
    t("n65_stagebreak") { // index exchanged on cell: the join+verify stage
      // no longer inlines the scan-side pq_encode loop nest
      graft.ops.Similarity.pqKnnJoinDev(emb,
        (a: Column, b: Column) => graft.functions.ProductQuantization
          .sdc(a, b, pt, nSub, nCode), breakIndexStage = true)
        .write.format("noop").mode("overwrite").save()
    }
    t("n65_mergejoin") { // force SMJ: the n60-at-20k shape (tight sorted
      // per-cell merge loop instead of hash-bucket iteration per pair)
      graft.ops.Similarity.pqKnnJoinDev(emb,
        (a: Column, b: Column) => graft.functions.ProductQuantization
          .sdc(a, b, pt, nSub, nCode), mergeJoin = true)
        .write.format("noop").mode("overwrite").save()
    }
    t("n60_mergejoin_check") { // and confirm n60's 20k speed IS the SMJ
      graft.ops.Similarity.knnJoinDet(emb)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
