package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.queries.Tables._

/** Dev-only: isolate d01's cost — parquet scan vs double aggs vs decimal
  * aggs. Usage: runMain graft.tools.ProfileD01 <sfDir> */
object ProfileD01 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val cutoff = lit("1998-09-01 00:00:00").cast("timestamp_ntz")
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      val li = lineitem(spark, sfDir).filter(col("l_shipdate") <= cutoff)
      t("scan+count")(noop(li.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))))
      t("double-aggs")(noop(li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")).as("a"),
          sum(col("l_extendedprice")).as("b"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("c"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("d"),
          avg(col("l_quantity")).as("e"), avg(col("l_extendedprice")).as("f"),
          avg(col("l_discount")).as("g"), count(lit(1)).as("h"))))
      t("decimal-aggs")(noop(li.groupBy("l_returnflag", "l_linestatus")
        .agg(moneySum(col("l_quantity")).as("a"),
          moneySum(col("l_extendedprice")).as("b"),
          moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("c"),
          moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("d"),
          moneyAvg(col("l_quantity")).as("e"), moneyAvg(col("l_extendedprice")).as("f"),
          (sum(col("l_discount").cast(DecimalType(18, 6))).cast("double") / count(col("l_discount"))).as("g"),
          count(lit(1)).as("h"))))
      t("long-cents-aggs")(noop(li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(org.apache.spark.sql.functions.round(col("l_quantity") * 10000, 0).cast("long")).as("a"),
          sum(org.apache.spark.sql.functions.round(col("l_extendedprice") * 10000, 0).cast("long")).as("b"),
          sum(org.apache.spark.sql.functions.round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000, 0).cast("long")).as("c"),
          sum(org.apache.spark.sql.functions.round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")) * 1000000, 0).cast("long")).as("d"),
          count(lit(1)).as("h"))))
    }
    spark.stop()
  }
}
/** Equivalence probe: does round(x·10⁴) as long equal the long value of
  * CAST(x AS DECIMAL(18,4)) for every money expression in the testdata? */
object CentsEquivalence {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{round => rnd}
    for (sf <- args) {
      val li = lineitem(spark, sf)
      val exprs = Seq(
        ("qty", col("l_quantity"), 4),
        ("price", col("l_extendedprice"), 4),
        ("disc_price", col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4),
        ("charge", col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6),
        ("discount6", col("l_discount"), 6))
      exprs.foreach { case (name, c, s) =>
        val p = math.pow(10, s)
        val viaRound = rnd(c * p, 0).cast("long")
        val viaDecimal = (c.cast(DecimalType(18, s)) * p).cast("long")
        val n = li.filter(viaRound =!= viaDecimal).count()
        println(s"EQUIV $sf lineitem.$name mismatches=$n")
      }
      val ev = events(spark, sf)
      val n = ev.filter(rnd(col("value") * 1e4, 0).cast("long") =!=
        (col("value").cast(DecimalType(18, 4)) * 1e4).cast("long")).count()
      println(s"EQUIV $sf events.value mismatches=$n")
    }
    spark.stop()
  }
}
