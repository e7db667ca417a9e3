package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._

/**
 * The declared batch query inventory D01–D19 (SURVEY §2.3): each query is a
 * Spark Dataset program plus an equivalent DuckDB SQL oracle over the same
 * parquet tables. Column names and value determinism (explicit total ORDER
 * BY, exact decimal money aggregates, NULLS FIRST parity) are aligned in both
 * dialects — see [[Tables]] for the determinism helpers.
 *
 * Scale notes (100 TB posture) are per query: dimension joins are broadcast,
 * aggregations are partial+final hash aggregates, top-k goes through
 * TakeOrderedAndProject, and nothing materializes on the driver.
 */
object BatchQueries {

  type QueryFn = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- D01
  /** Pricing summary (TPC-H Q1 shape): filter → partial+final hash agg → sort.
    * Scales as a single scan + one shuffle on a 6-value grouping key. */
  def d01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    val cutoff = lit("1998-09-01 00:00:00").cast("timestamp_ntz")
    // Exact integer-unit accumulation: each money expression is rounded to
    // its decimal scale as a LONG (`round(x·10^s)`, the d37 pattern), summed
    // exactly as longs (codegen'd primitive adds, ~2× the decimal
    // aggregate's throughput), and converted once at the end (long→double is
    // correctly rounded IEEE in both engines, as is the final division).
    // Rounding caveat: Spark rounds the SHORTEST-DECIMAL repr of the double
    // (BigDecimal.valueOf) where DuckDB rounds the BINARY value — they can
    // diverge when the shortest repr lands exactly on .5 but the binary
    // value sits below it. No x·10^s in this data hits that knife-edge; the
    // CentsEquivalence probe in the test gate asserts exactly that, and must
    // stay in the gate whenever testdata or scales change.
    // Long capacity check at 100 TB: sf100 charge sums reach ~6e16 micro-
    // units, three orders below the 9.2e18 overflow line.
    def cents(c: Column, s: Int): Column =
      round(c * lit(math.pow(10, s)), 0).cast("long")
    li.filter(col("l_shipdate") <= cutoff)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(cents(col("l_quantity"), 4)).as("qty_u"),
        sum(cents(col("l_extendedprice"), 4)).as("price_u"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)).as("disc_u"),
        // scale 6: price/discount/tax each carry 2 decimals, so the triple
        // product's true value has 6 decimal places to preserve
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6)).as("charge_u"),
        sum(cents(col("l_discount"), 6)).as("disc6_u"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        (col("qty_u").cast("double") / 10000.0).as("sum_qty"),
        (col("price_u").cast("double") / 10000.0).as("sum_base_price"),
        (col("disc_u").cast("double") / 10000.0).as("sum_disc_price"),
        (col("charge_u").cast("double") / 1000000.0).as("sum_charge"),
        (col("qty_u").cast("double") / 10000.0 / col("count_order")).as("avg_qty"),
        (col("price_u").cast("double") / 10000.0 / col("count_order")).as("avg_price"),
        (col("disc6_u").cast("double") / 1000000.0 / col("count_order")).as("avg_disc"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val d01Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(round(l_quantity * 10000.0, 0) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_qty,
      |  CAST(SUM(CAST(round(l_extendedprice * 10000.0, 0) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_base_price,
      |  CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0, 0) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
      |  CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 1000000.0, 0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
      |  CAST(SUM(CAST(round(l_quantity * 10000.0, 0) AS BIGINT)) AS DOUBLE) / 10000.0 / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(round(l_extendedprice * 10000.0, 0) AS BIGINT)) AS DOUBLE) / 10000.0 / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(round(l_discount * 1000000.0, 0) AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- D02
  /** Revenue by nation (Q5 shape). region/nation are broadcast (tiny dims);
    * customer joins orders on the shuffle; AQE picks BHJ where the filtered
    * side fits. At 100 TB the only large shuffle is orders⋈lineitem on the
    * order key. */
  def d02RevenueNation(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    val o = orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    val c = customer(spark, dir)
    val n = nation(spark, dir)
    val r = region(spark, dir).filter(col("r_name") === "ASIA")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  val d02Oracle: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- D03
  /** Top-10 parts by revenue: broadcast part-dim join, agg, then
    * `orderBy.limit` which Spark plans as TakeOrderedAndProject (per-partition
    * top-k, no global sort — the right shape at any scale). */
  def d03TopParts(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    val p = part(spark, dir)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_partkey", "p_name")
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), col("p_partkey"))
      .limit(10)
  }

  val d03Oracle: String =
    """SELECT p_partkey, p_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_partkey, p_name
      |ORDER BY revenue DESC, p_partkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- D04
  /** Customers with/without orders per market segment: left_semi and
    * left_anti joins (EXISTS / NOT EXISTS), then a tiny full-outer merge of
    * the two per-segment counts. */
  def d04SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
    val o = orders(spark, dir)
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("with_orders"))
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("without_orders"))
    semi.join(anti, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("with_orders"), lit(0L)).as("with_orders"),
        coalesce(col("without_orders"), lit(0L)).as("without_orders"))
      .orderBy("c_mktsegment")
  }

  val d04Oracle: String =
    """SELECT c_mktsegment,
      |  CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS with_orders,
      |  CAST(SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS without_orders
      |FROM customer c
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- D05
  /** Left outer join with null handling: orders against high-quantity
    * lineitems; orders with no match keep a 0 revenue via coalesce. */
  def d05LeftJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    val li = lineitem(spark, dir).filter(col("l_quantity") > 45)
    o.join(li, col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy("o_orderkey", "o_orderstatus")
      .agg(
        count(col("l_orderkey")).as("n_big_items"),
        coalesce(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), lit(0.0)).as("big_revenue"))
      .orderBy("o_orderkey")
  }

  val d05Oracle: String =
    """SELECT o_orderkey, o_orderstatus,
      |  COUNT(l_orderkey) AS n_big_items,
      |  COALESCE(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS big_revenue
      |FROM orders LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity > 45) li
      |  ON o_orderkey = li.l_orderkey
      |GROUP BY o_orderkey, o_orderstatus
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- D06
  /** Ranking window functions per customer, keep top-3 orders by value.
    * One shuffle on o_custkey; WindowExec sorts within partitions. */
  def d06RankWindows(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
    orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "rnk", "drnk")
      .orderBy("o_custkey", "rn")
  }

  val d06Oracle: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
      |    CAST(RANK() OVER w AS BIGINT) AS rnk,
      |    CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |) WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------- D07
  /** Running sum + lag/lead per customer in order-date order. The running sum
    * accumulates exact decimals row-by-row, so it is bit-identical across
    * engines at every row, not just the last. */
  def d07RunningLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(spark, dir)
      .withColumn("running_total",
        sum(col("o_totalprice").cast(DecimalType(18, 4))).over(wRun).cast("double"))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_totalprice"), col("running_total"), col("prev_price"), col("next_price"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  val d07Oracle: String =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
      |  LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
      |  LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
      |FROM orders
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- D08
  /** 7-day moving average of daily revenue via a RANGE frame over the epoch
    * day. Two-phase: exact daily aggregate, then a single-partition window
    * over the (small) per-day series — at 100 TB the day cardinality is tiny,
    * so the unpartitioned window is fine. */
  def d08MovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val daily = orders(spark, dir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(moneySum(col("o_totalprice")).as("daily_revenue"))
    val wRange = Window.orderBy(col("epoch_day")).rangeBetween(-6, 0)
    daily
      .withColumn("epoch_day", datediff(col("day"), to_date(lit("1970-01-01"))).cast("long"))
      .withColumn("ma7",
        sum(col("daily_revenue").cast(DecimalType(18, 4))).over(wRange).cast("double") /
          count(lit(1)).over(wRange))
      .select("day", "daily_revenue", "ma7")
      .orderBy("day")
  }

  val d08Oracle: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS daily_revenue
      |  FROM orders GROUP BY 1
      |), d AS (
      |  SELECT day, daily_revenue, datediff('day', DATE '1970-01-01', day) AS epoch_day FROM daily
      |)
      |SELECT day, daily_revenue,
      |  CAST(SUM(CAST(daily_revenue AS DECIMAL(18,4)))
      |        OVER (ORDER BY epoch_day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / COUNT(*) OVER (ORDER BY epoch_day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma7
      |FROM d
      |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- D09
  /** Rollup over (priority, status) with grouping indicators. */
  def d09Rollup(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .rollup("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("sum_price"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"))
      .orderBy(col("g_priority"), col("g_status"), col("o_orderpriority"), col("o_orderstatus"))

  val d09RollupOracle: String =
    """SELECT o_orderpriority, o_orderstatus,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
      |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status
      |FROM orders
      |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      |ORDER BY g_priority, g_status,
      |  o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  /** Cube variant of D09. */
  def d09Cube(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .cube("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("sum_price"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"))
      .orderBy(col("g_priority"), col("g_status"), col("o_orderpriority"), col("o_orderstatus"))

  val d09CubeOracle: String =
    """SELECT o_orderpriority, o_orderstatus,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
      |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status
      |FROM orders
      |GROUP BY CUBE (o_orderpriority, o_orderstatus)
      |ORDER BY g_priority, g_status,
      |  o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- D10
  /** Exact distinct counts per priority (hash-matched). The HLL variant is a
    * separate non-oracle query (approx values are engine-specific). */
  def d10Distinct(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  val d10Oracle: String =
    """SELECT o_orderpriority,
      |  COUNT(DISTINCT o_custkey) AS n_customers,
      |  COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** HLL approximate distinct — asserted by relative-error bound in tests,
    * excluded from hash-match (SURVEY §2.3 determinism rules). */
  def d10ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(approx_count_distinct(col("o_custkey")).as("approx_customers"))
      .orderBy("o_orderpriority")

  // ---------------------------------------------------------------- D11
  /** Set operations: BUILDING-segment customers vs frequent customers. */
  def d11SetOps(spark: SparkSession, dir: String): DataFrame = {
    val building = customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val frequent = orders(spark, dir)
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .filter(col("n") > 12)
      .select(col("o_custkey").as("custkey"))
    building.union(frequent).distinct().select(lit("union").as("op"), col("custkey"))
      .unionAll(building.intersect(frequent).select(lit("intersect").as("op"), col("custkey")))
      .unionAll(building.except(frequent).select(lit("except").as("op"), col("custkey")))
      .orderBy("op", "custkey")
  }

  val d11Oracle: String =
    """WITH building AS (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      |     frequent AS (SELECT o_custkey AS custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) > 12)
      |SELECT 'union' AS op, custkey FROM (SELECT custkey FROM building UNION SELECT custkey FROM frequent)
      |UNION ALL
      |SELECT 'intersect' AS op, custkey FROM (SELECT custkey FROM building INTERSECT SELECT custkey FROM frequent)
      |UNION ALL
      |SELECT 'except' AS op, custkey FROM (SELECT custkey FROM building EXCEPT SELECT custkey FROM frequent)
      |ORDER BY op, custkey""".stripMargin

  // ---------------------------------------------------------------- D12
  /** Scalar string-function sweep over part (codegen'd built-ins only). */
  def d12ScalarString(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir)
      .select(col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_type"), 1, 3).as("type_prefix"),
        concat(col("p_brand"), lit("-"), col("p_type")).as("brand_type"),
        col("p_name").like("%bolt%").as("is_bolt"),
        length(col("p_name")).cast("long").as("name_len"))
      .orderBy("p_partkey")

  val d12StringOracle: String =
    """SELECT p_partkey,
      |  UPPER(p_name) AS name_upper,
      |  SUBSTRING(p_type, 1, 3) AS type_prefix,
      |  p_brand || '-' || p_type AS brand_type,
      |  p_name LIKE '%bolt%' AS is_bolt,
      |  CAST(LENGTH(p_name) AS BIGINT) AS name_len
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** Scalar date/math/conditional sweep over orders. */
  def d12ScalarDateMath(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        tsSecondString(date_trunc("month", col("o_orderdate"))).as("month_start"),
        datediff(to_date(lit("2002-01-01")), col("o_orderdate").cast("date")).cast("long").as("days_to_2002"),
        // whole-number round: .5 ties on 2-decimal money are exactly
        // representable doubles, so both engines round them identically;
        // fractional-digit rounds of computed doubles are engine-ambiguous
        round(col("o_totalprice"), 0).as("price_rounded"),
        abs(col("o_totalprice") - 100000.0).as("dist_100k"),
        when(col("o_totalprice") < 50000.0, "small")
          .when(col("o_totalprice") < 150000.0, "medium")
          .otherwise("large").as("bucket"))
      .orderBy("o_orderkey")

  val d12DateMathOracle: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(month(o_orderdate) AS BIGINT) AS o_month,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
      |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002,
      |  ROUND(o_totalprice, 0) AS price_rounded,
      |  ABS(o_totalprice - 100000.0) AS dist_100k,
      |  CASE WHEN o_totalprice < 50000.0 THEN 'small'
      |       WHEN o_totalprice < 150000.0 THEN 'medium'
      |       ELSE 'large' END AS bucket
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- D13
  /** JSON extraction from events.props: from_json into a struct, group by the
    * extracted key. get_json_object path included as a projected check. */
  def d13Json(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", LongType)))
    events(spark, dir)
      .withColumn("js", from_json(col("props"), schema))
      .withColumn("k", col("js.k"))
      .withColumn("k_str", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"),
        moneySum(col("value")).as("sum_value"),
        sum(when(col("k") === col("k_str"), 1L).otherwise(0L)).as("n_path_match"))
      .orderBy("k")
  }

  val d13Oracle: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
      |  CAST(COUNT(*) AS BIGINT) AS n_path_match
      |FROM events
      |GROUP BY 1
      |ORDER BY k""".stripMargin

  // ---------------------------------------------------------------- D14
  /** Array construction + predicates on part names. */
  def d14Arrays(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir)
      .select(col("p_partkey"),
        // array built + operated on natively; rendered as a delimited string
        // because the driver's comparator hashes scalar cells only
        array_join(split(col("p_name"), " "), "|").as("words"),
        size(split(col("p_name"), " ")).cast("long").as("n_words"),
        array_contains(split(col("p_name"), " "), "bolt").as("has_bolt"))
      .orderBy("p_partkey")

  val d14ArraysOracle: String =
    """SELECT p_partkey,
      |  array_to_string(string_split(p_name, ' '), '|') AS words,
      |  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
      |  list_contains(string_split(p_name, ' '), 'bolt') AS has_bolt
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** Generator (UDTF-shaped) explode of the word arrays. */
  def d14Explode(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir)
      .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("word"))
      .orderBy("p_partkey", "word")

  val d14ExplodeOracle: String =
    """SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
      |FROM part
      |ORDER BY p_partkey, word""".stripMargin

  /** collect_list per customer, array_sort'ed for determinism (SURVEY §2.3). */
  def d14CollectList(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .groupBy(col("o_custkey"))
      // collect_list is the operator under test; the sorted array is rendered
      // as a comma string so the comparator can hash the cell
      .agg(array_join(transform(array_sort(collect_list(col("o_orderkey"))),
          x => x.cast("string")), ",").as("order_keys"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")

  val d14CollectOracle: String =
    """SELECT o_custkey,
      |  array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
      |  COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- D15
  /** Tumbling 1-hour windows on event time (batch form; D20/D21 replay the
    * same aggregation through the streaming path). */
  def d15Tumbling(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .select(tsSecondString(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("window_start", "event_type")

  val d15Oracle: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  // ---------------------------------------------------------------- D16
  /** Sliding windows (1 h window, 15 min slide): every event lands in 4
    * windows. The oracle reconstructs the window set arithmetically. */
  def d16Sliding(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"),
        (moneySum(col("value")) / count(col("value"))).as("avg_value"))
      .select(tsSecondString(col("window.start")).as("window_start"), col("n"), col("avg_value"))
      .orderBy("window_start")

  val d16Oracle: String =
    """WITH e AS (
      |  SELECT epoch_us(ts) // 900000000 AS bucket, value FROM events
      |), expanded AS (
      |  SELECT make_timestamp((e.bucket - s.s) * 900000000) AS window_start, value
      |  FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS s) s
      |)
      |SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(value) AS avg_value
      |FROM expanded
      |GROUP BY 1
      |ORDER BY window_start""".stripMargin

  // ---------------------------------------------------------------- D17
  /** Exact dedup keeping the first event by (ts, event_id) per
    * (user_id, event_type, value) key — the deterministic window form of
    * dropDuplicates (SURVEY §2.3 D17). */
  def d17DedupExact(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type", "value")
      .orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        tsString(col("ts")).as("ts"))
      .orderBy("event_id")
  }

  val d17Oracle: String =
    """SELECT event_id, user_id, event_type, value,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts
      |FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type, value
      |                               ORDER BY ts, event_id) AS rn
      |  FROM events
      |) WHERE rn = 1
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- D18
  /** Text analysis: tokenize, stopword-filter, top-20 words with tie-break.
    * One shared stopword list with the quality/TF-IDF operators — two copies
    * would silently drift and desynchronize the shared oracle semantics. */
  val d18Stopwords: Seq[String] = graft.ops.TextAnalysis.qualityStopwords

  def d18WordTopK(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("word"))
      .filter(col("word") =!= "" && !col("word").isin(d18Stopwords: _*))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("word"))
      .limit(20)

  val d18Oracle: String =
    s"""SELECT word, COUNT(*) AS cnt
       |FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word FROM documents)
       |WHERE word <> '' AND word NOT IN (${d18Stopwords.map(w => s"'$w'").mkString(", ")})
       |GROUP BY word
       |ORDER BY cnt DESC, word
       |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- D19
  /** Similarity search: exact top-5 cosine neighbors of vec_id 0. The query
    * vector is broadcast; the scoring kernel is the codegen'd
    * [[graft.functions.CosineSimilarity]] expression, whose double
    * index-order fold is bit-identical to the oracle's SQL formulation.
    * No rounding: both engines produce identical doubles, and rounding
    * identical doubles is itself the cross-engine-ambiguous operation.
    * [[graft.ops.Similarity]] adds the LSH/IVF variants for scale. */
  def d19CosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        graft.functions.CosineSimilarity(col("embedding"), col("qv")).as("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(5)
  }

  val d19Oracle: String =
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |ex AS (
      |  SELECT vec_id, label,
      |    unnest(CAST(embedding AS DOUBLE[])) AS a,
      |    generate_subscripts(embedding, 1) AS i
      |  FROM embeddings WHERE vec_id <> 0
      |),
      |qx AS (
      |  SELECT unnest(CAST(qv AS DOUBLE[])) AS b,
      |    generate_subscripts(qv, 1) AS i
      |  FROM q
      |),
      |s AS (
      |  SELECT vec_id, any_value(label) AS label,
      |    SUM(a * b) AS dot, SUM(a * a) AS na2, SUM(b * b) AS nb2
      |  FROM ex JOIN qx USING (i) GROUP BY vec_id
      |)
      |SELECT vec_id, label, dot / (SQRT(na2) * SQRT(nb2)) AS score
      |FROM s
      |ORDER BY score DESC, vec_id
      |LIMIT 5""".stripMargin

  // ---------------------------------------------------------------- registry

  val queries: Map[String, QueryFn] = Map(
    "d01_pricing_summary" -> (d01PricingSummary _),
    "d02_revenue_nation" -> (d02RevenueNation _),
    "d03_top_parts" -> (d03TopParts _),
    "d04_semi_anti" -> (d04SemiAnti _),
    "d05_left_join" -> (d05LeftJoin _),
    "d06_rank_windows" -> (d06RankWindows _),
    "d07_running_lag" -> (d07RunningLag _),
    "d08_moving_avg" -> (d08MovingAvg _),
    "d09_rollup" -> (d09Rollup _),
    "d09_cube" -> (d09Cube _),
    "d10_distinct" -> (d10Distinct _),
    "d10_approx_distinct" -> (d10ApproxDistinct _),
    "d11_setops" -> (d11SetOps _),
    "d12_scalar_string" -> (d12ScalarString _),
    "d12_scalar_datemath" -> (d12ScalarDateMath _),
    "d13_json" -> (d13Json _),
    "d14_arrays" -> (d14Arrays _),
    "d14_explode" -> (d14Explode _),
    "d14_collect_list" -> (d14CollectList _),
    "d15_tumbling" -> (d15Tumbling _),
    "d16_sliding" -> (d16Sliding _),
    "d17_dedup_exact" -> (d17DedupExact _),
    "d18_word_topk" -> (d18WordTopK _),
    "d19_cosine_topk" -> (d19CosineTopK _),
  )

  val oracles: Map[String, String] = Map(
    "d01_pricing_summary" -> d01Oracle,
    "d02_revenue_nation" -> d02Oracle,
    "d03_top_parts" -> d03Oracle,
    "d04_semi_anti" -> d04Oracle,
    "d05_left_join" -> d05Oracle,
    "d06_rank_windows" -> d06Oracle,
    "d07_running_lag" -> d07Oracle,
    "d08_moving_avg" -> d08Oracle,
    "d09_rollup" -> d09RollupOracle,
    "d09_cube" -> d09CubeOracle,
    "d10_distinct" -> d10Oracle,
    "d11_setops" -> d11Oracle,
    "d12_scalar_string" -> d12StringOracle,
    "d12_scalar_datemath" -> d12DateMathOracle,
    "d13_json" -> d13Oracle,
    "d14_arrays" -> d14ArraysOracle,
    "d14_explode" -> d14ExplodeOracle,
    "d14_collect_list" -> d14CollectOracle,
    "d15_tumbling" -> d15Oracle,
    "d16_sliding" -> d16Oracle,
    "d17_dedup_exact" -> d17Oracle,
    "d18_word_topk" -> d18Oracle,
    "d19_cosine_topk" -> d19Oracle,
  )
}
