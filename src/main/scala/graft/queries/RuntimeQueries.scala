package graft.queries

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import Tables._

/**
 * Runtime/catalog surface closure (SURVEY §2.2): observed metrics, on-disk
 * partition layout with pruning, the DataFrameWriterV2 + session-catalog
 * path, and user-defined scalar/aggregate functions — each oracle-checked.
 */
object RuntimeQueries {

  import BatchQueries.QueryFn

  // ---------------------------------------------------------------- d72
  /** Observed metrics (`Dataset.observe` + `Observation`): accumulator-based
    * dataset metrics collected during a pass, with NO second scan — the
    * in-flight data-quality counters of a production pipeline. The observed
    * values are returned as the result row and checked against the oracle's
    * full aggregate of the same input. */
  def d72Observe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val obs = new org.apache.spark.sql.Observation("d72")
    events(spark, dir)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(round(col("value") * 10000.0, 0).cast("long")).as("value_u"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
      .write.format("noop").mode("overwrite").save()
    val m = obs.get
    Seq((m("n_rows").asInstanceOf[Long],
      m("value_u").asInstanceOf[Long] / 10000.0,
      m("min_id").asInstanceOf[Long],
      m("max_id").asInstanceOf[Long]))
      .toDF("n_rows", "sum_value", "min_id", "max_id")
  }

  val d72Oracle: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(round(value * 10000.0, 0) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_value,
      |  MIN(event_id) AS min_id,
      |  MAX(event_id) AS max_id
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- d73
  /** Hive-style partitioned data layout: events written `partitionBy`
    * (event_type directories), read back with a partition predicate that
    * must prune at FILE LISTING time — the physical-layout half of
    * partition pruning (`PlanShapeSpec` asserts the pruned scan). At 100 TB
    * the partition column IS the dominant access path; an unpartitioned
    * layout re-lists and re-reads everything. */
  def d73PartitionedLayout(spark: SparkSession, dir: String): DataFrame = {
    val staging = Tables.scratchDir("d73").resolve("by_type")
    events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      .write.mode("overwrite").partitionBy("event_type").parquet(staging.toString)
    partitionedRead(spark, staging.toString)
  }

  /** The read half, callable on an existing layout (used by the plan spec). */
  private[graft] def partitionedRead(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 10000.0, 0).cast("long")).cast("double") / 10000.0).as("sum_value"))
      .orderBy("event_type")

  val d73Oracle: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(round(value * 10000.0, 0) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_value
      |FROM events
      |WHERE event_type IN ('click', 'purchase')
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- d74
  /** DataFrameWriterV2 + session catalog: `writeTo(...).using("parquet")`
    * CTAS with an explicit path option (an EXTERNAL table — the reserved
    * "location" table property is silently ignored by the v1 fallback and
    * would land the table under spark-warehouse), then query through
    * `spark.table` — the catalog-managed-table path the reference's managed
    * Delta tables (R4) resolve through. Fresh location per invocation keeps
    * reruns idempotent (the session catalog's parquet tables are v1, which
    * rejects `writeTo().append()` and RTAS — CTAS `.create()` after a drop
    * IS the supported v2 write). */
  def d74WriteTo(spark: SparkSession, dir: String): DataFrame = {
    val loc = Tables.scratchDir("d74").resolve("tbl")
    spark.sql("DROP TABLE IF EXISTS graft_d74")
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .writeTo("graft_d74").using("parquet")
      .option("path", loc.toString)
      .create()
    spark.table("graft_d74")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  val d74Oracle: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- d75
  /** Typed sum-of-squares for the UDAF registration path. */
  private val sumSq: Aggregator[Long, Long, Long] = new Aggregator[Long, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: Long): Long = b + a * a
    def merge(a: Long, b: Long): Long = a + b
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** User-defined scalar + aggregate functions, registered and invoked
    * through SQL: a vowel-count UDF and a sum-of-squares UDAF
    * (`functions.udaf`). UDFs are the LAST resort in this engine (opaque to
    * Catalyst: no pushdown through them, no codegen) — this query exists to
    * close the §2.2 UDF/UDAF surface row, not as a pattern to copy; every
    * other query uses native expressions. */
  def d75Udf(spark: SparkSession, dir: String): DataFrame = {
    spark.udf.register("graft_vowels",
      udf((s: String) => if (s == null) 0L else s.toLowerCase.count("aeiou".contains(_)).toLong))
    spark.udf.register("graft_sumsq", udaf(sumSq))
    part(spark, dir).createOrReplaceTempView("part_d75")
    spark.sql(
      """SELECT p_brand,
        |  CAST(SUM(graft_vowels(p_name)) AS BIGINT) AS n_vowels,
        |  graft_sumsq(p_partkey) AS sumsq_key
        |FROM part_d75
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin)
  }

  val d75Oracle: String =
    """SELECT p_brand,
      |  CAST(SUM(len(regexp_extract_all(lower(p_name), '[aeiou]'))) AS BIGINT) AS n_vowels,
      |  CAST(SUM(p_partkey * p_partkey) AS BIGINT) AS sumsq_key
      |FROM part
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- d86
  /** Clustered-table declaration (`writeTo(...).clusterBy(...)`, the
    * liquid-clustering-style layout hint): CTAS records the clustering
    * columns in the catalog (`clusteringColumns` table property — asserted
    * in `RuntimeQueriesSpec`), and the data is written pre-sorted on the
    * clustering key so scans over a key range touch a contiguous file
    * subset. With the Delta/Iceberg connectors the same declaration drives
    * incremental re-clustering; the parquet v1 fallback keeps the metadata +
    * sorted layout. */
  def d86ClusterBy(spark: SparkSession, dir: String): DataFrame = {
    val loc = Tables.scratchDir("d86").resolve("tbl")
    spark.sql("DROP TABLE IF EXISTS graft_d86")
    lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_returnflag"))
      .sortWithinPartitions("l_returnflag", "l_orderkey")
      .writeTo("graft_d86").using("parquet")
      .option("path", loc.toString)
      .clusterBy("l_returnflag")
      .create()
    spark.table("graft_d86")
      .filter(col("l_returnflag") === "R")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_quantity") * 100, 0).cast("long")).as("qty_c"))
      .orderBy("l_returnflag")
  }

  val d86Oracle: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS qty_c
      |FROM lineitem
      |WHERE l_returnflag = 'R'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- d92
  /** Dynamic partition overwrite (`partitionOverwriteMode=dynamic`): a full
    * partitioned layout, then an overwrite that carries only ONE partition's
    * (filtered) rows — dynamic mode replaces just the partitions present in
    * the write and leaves every other directory untouched, where static mode
    * (the default) would wipe the whole table. The partition-scoped rewrite
    * is how 100 TB tables absorb backfills: rewriting one day/type never
    * touches (or re-lists) the rest. Edge to respect when reusing the
    * pattern: an EMPTY backfill frame carries zero partitions, so dynamic
    * mode overwrites nothing and the stale partition survives — a caller
    * that means "replace with nothing" must delete the partition
    * explicitly (here the filtered click set is non-empty at every SF). */
  def d92DynamicOverwrite(spark: SparkSession, dir: String): DataFrame = {
    val staging = Tables.scratchDir("d92").resolve("by_type")
    val ev = events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
    ev.write.mode("overwrite").partitionBy("event_type").parquet(staging.toString)
    val modeKey = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(modeKey)
    spark.conf.set(modeKey, "dynamic")
    try {
      // backfill: the click partition rewritten with only its high-value rows
      ev.filter(col("event_type") === "click" && col("value") > 50.0)
        .write.mode("overwrite").partitionBy("event_type").parquet(staging.toString)
    } finally prev match {
      case Some(v) => spark.conf.set(modeKey, v)
      case None => spark.conf.unset(modeKey)
    }
    spark.read.parquet(staging.toString)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 10000.0, 0).cast("long")).cast("double") / 10000.0)
          .as("sum_value"))
      .orderBy("event_type")
  }

  val d92Oracle: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(round(value * 10000.0, 0) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_value
      |FROM events
      |WHERE event_type <> 'click' OR value > 50.0
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- registry

  val queries: Map[String, QueryFn] = Map(
    "d72_observe" -> (d72Observe _),
    "d73_partitioned_layout" -> (d73PartitionedLayout _),
    "d74_writeto_catalog" -> (d74WriteTo _),
    "d75_udf_udaf" -> (d75Udf _),
    "d86_clusterby" -> (d86ClusterBy _),
    "d92_dynamic_overwrite" -> (d92DynamicOverwrite _),
  )

  val oracles: Map[String, String] = Map(
    "d72_observe" -> d72Oracle,
    "d73_partitioned_layout" -> d73Oracle,
    "d74_writeto_catalog" -> d74Oracle,
    "d75_udf_udaf" -> d75Oracle,
    "d86_clusterby" -> d86Oracle,
    "d92_dynamic_overwrite" -> d92Oracle,
  )
}
