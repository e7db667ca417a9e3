package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Loaders for the driver-generated testdata tables (TESTDATA.md) plus the
 * determinism helpers shared by every oracle-checked query.
 *
 * Determinism contract (SURVEY §2.3): engine results are hash-compared with a
 * DuckDB oracle, so every floating-point aggregate must be bit-identical
 * across engines. Plain double summation is order-dependent (partial
 * aggregation sums in partition order), so monetary aggregates go through an
 * exact decimal accumulator: cast each input to DECIMAL(18,4) (deterministic
 * nearest-value rounding of the double in both engines), sum exactly, cast
 * the final sum back to double (again deterministic). Averages are derived
 * from the exact sum divided by the count, one IEEE division in both engines.
 */
object Tables {

  /**
   * Scratch directory for query-local staging (stream inputs, checkpoints,
   * sink outputs): RAM-backed `/dev/shm` when present, else the system tmp
   * dir. Micro-batch latency is dominated by fsync of tiny offset/commit/
   * state files; on a shared VM, disk-backed /tmp adds multi-second jitter
   * that has nothing to do with the engine. Production deployments put
   * checkpoints on object storage — local scratch placement is a bench
   * environment choice, not a semantics change.
   */
  def scratchDir(label: String): java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val dir =
      if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm))
        java.nio.file.Files.createTempDirectory(shm, s"graft-$label-")
      else java.nio.file.Files.createTempDirectory(s"graft-$label-")
    // tmpfs space is RAM: reclaim every scratch tree when the JVM exits
    // (repeated bench/verify sessions would otherwise accumulate staged
    // copies of the test tables until /dev/shm fills)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
          val s = java.nio.file.Files.list(p)
          try s.forEach(rm(_)) finally s.close()
        }
        java.nio.file.Files.deleteIfExists(p)
      }
      try rm(dir) catch { case _: Throwable => () }
    }))
    dir
  }

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /**
   * The events table's `ts` column has shipped in two physical layouts
   * across driver rounds: parquet TIMESTAMP(NANOS) — which Spark's parquet
   * reader rejects outright unless the legacy nanosAsLong flag is on, read
   * as a raw long and truncated ns → µs with integral division (a double
   * division would lose precision at 1.7e18) — and, since round 8, plain
   * TIMESTAMP(MICROS) without UTC adjustment, which Spark reads as
   * TIMESTAMP_NTZ. Both normalize to session-zoned TimestampType at
   * microsecond precision (session timezone is UTC everywhere), and
   * DuckDB's reader lands on the same microsecond values — so `ts` stays
   * value-identical across engines and across testdata vintages.
   */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) as long
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType => // TIMESTAMP(MICROS)
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Exact order-independent money sum: decimal accumulate, double result. */
  def moneySum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact average: one IEEE division of the exact sum by the count. */
  def moneyAvg(c: Column, scale: Int = 4): Column =
    moneySum(c, scale) / count(c)

  /** Microsecond-precision UTC timestamp rendering, matching DuckDB
    * `strftime(ts, '%Y-%m-%d %H:%M:%S.%f')`. */
  def tsString(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Second-precision rendering for window boundaries, matching DuckDB
    * `strftime(ts, '%Y-%m-%d %H:%M:%S')`. */
  def tsSecondString(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
