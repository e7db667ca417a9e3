package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.queries.Tables

/** Scratch probe for round-5 API uncertainties. NOT part of the library. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse-").toString)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"

    // 1. statestore reader over a dropDuplicates checkpoint
    try {
      val base = Tables.scratchDir("probe-ss")
      val input = base.resolve("input")
      val ev = Tables.events(spark, dir).select("event_id", "user_id", "event_type")
      ev.coalesce(1).write.parquet(input.toString)
      val q = spark.readStream.schema(spark.read.parquet(input.toString).schema)
        .parquet(input.toString)
        .dropDuplicates("event_type")
        .writeStream.format("noop")
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val ss = spark.read.format("statestore").load(base.resolve("ckpt").toString)
      println("== statestore schema ==")
      ss.printSchema()
      ss.show(5, false)
    } catch { case e: Throwable => println(s"STATESTORE FAIL: $e") }

    // 2. _metadata on a plain file read
    try {
      val li = spark.read.parquet(s"$dir/lineitem.parquet", s"$dir/orders.parquet")
      // mixed schema union won't work; read separately
    } catch { case e: Throwable => println(s"multi-path expected fail: ${e.getClass}") }
    try {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("_metadata.file_name").as("f"), col("_metadata.file_size").as("sz"))
      println("== _metadata ==")
      li.groupBy("f", "sz").count().show(false)
    } catch { case e: Throwable => println(s"METADATA FAIL: $e") }

    // 3. crosstab naming
    try {
      val ct = Tables.orders(spark, dir).stat.crosstab("o_orderstatus", "o_orderpriority")
      println("== crosstab ==")
      ct.printSchema()
      ct.show(false)
    } catch { case e: Throwable => println(s"CROSSTAB FAIL: $e") }

    // 4. xpath
    try {
      spark.sql("""SELECT xpath_string('<a><b>hi</b></a>', '/a/b') s,
        xpath_long('<a><b>7</b></a>', '/a/b') n,
        xpath('<a><b>1</b><b>2</b></a>', '/a/b/text()') arr""").show(false)
    } catch { case e: Throwable => println(s"XPATH FAIL: $e") }

    // 5. bucketBy external table with path
    try {
      spark.sql("DROP TABLE IF EXISTS probe_bkt")
      val loc = Tables.scratchDir("probe-bkt").resolve("tbl")
      Tables.orders(spark, dir).write
        .bucketBy(4, "o_custkey").sortBy("o_custkey")
        .option("path", loc.toString)
        .saveAsTable("probe_bkt")
      println("== bucketed table ==")
      spark.sql("DESCRIBE EXTENDED probe_bkt").show(60, false)
    } catch { case e: Throwable => println(s"BUCKET FAIL: $e") }

    // 6. skewness/kurtosis quick formula check vs manual
    try {
      Tables.lineitem(spark, dir).agg(
        skewness(col("l_quantity")).as("sk"),
        kurtosis(col("l_quantity")).as("ku"),
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("s1"),
        sum(pow(col("l_quantity"), 2).cast("long")).as("s2"),
        sum(pow(col("l_quantity"), 3).cast("long")).as("s3"),
        sum(pow(col("l_quantity"), 4).cast("long")).as("s4")).show(false)
    } catch { case e: Throwable => println(s"MOMENTS FAIL: $e") }

    spark.stop()
  }
}
