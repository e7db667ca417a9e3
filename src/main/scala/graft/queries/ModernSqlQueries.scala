package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/**
 * Modern SQL surface closure (SURVEY §2.2, Spark 4 additions): unpivot,
 * regression/boolean aggregates, recursive CTEs, SQL scripting, pipe syntax,
 * collations, parameterized SQL / EXECUTE IMMEDIATE, IGNORE NULLS window
 * functions, datetime arithmetic, and listagg / GROUP BY ALL — each
 * oracle-checked against the DuckDB formulation of the same semantics.
 *
 * These are all driver-side *language* surfaces: every query still plans to
 * the same distributed operators as the rest of the engine (the recursion in
 * d78 is a driver-unrolled union loop over a 31-row virtual table, the
 * scripting loop in d79 re-plans a full distributed aggregate per iteration),
 * so the 100 TB posture is inherited from the operators underneath.
 */
object ModernSqlQueries {

  import BatchQueries.QueryFn

  // ---------------------------------------------------------------- d76
  /** `Dataset.unpivot` (wide → long, the inverse of d36's pivot): two
    * metric columns melted into (metric, v) rows. */
  def d76Unpivot(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_custkey").cast("double").as("custkey_d"))
      .unpivot(Array(col("o_orderkey")),
        Array(col("o_totalprice"), col("custkey_d")), "metric", "v")
      .orderBy("o_orderkey", "metric")

  val d76Oracle: String =
    """SELECT o_orderkey, 'o_totalprice' AS metric, o_totalprice AS v FROM orders
      |UNION ALL
      |SELECT o_orderkey, 'custkey_d', CAST(o_custkey AS DOUBLE) FROM orders
      |ORDER BY o_orderkey, metric""".stripMargin

  // ---------------------------------------------------------------- d77
  /** Linear-regression and boolean aggregates (regr_slope / regr_intercept /
    * regr_r2 / regr_count, corr, count_if, bool_and, bool_or) per brand over
    * integer-valued x/y. Both engines stream moments in different orders, so
    * the double outputs are rounded to 6 decimals on both sides — the
    * remaining ~1e-12 relative drift cannot cross a 5e-7 rounding boundary
    * except on exact ties, which integer inputs make measure-zero. */
  def d77StatAggs(spark: SparkSession, dir: String): DataFrame = {
    val x = col("p_size").cast("double")
    val y = (col("p_partkey") % 211).cast("double")
    part(spark, dir)
      .groupBy("p_brand")
      .agg(
        round(regr_slope(y, x), 6).as("slope"),
        round(regr_intercept(y, x), 6).as("intercept"),
        round(regr_r2(y, x), 6).as("r2"),
        regr_count(y, x).as("n_pairs"),
        round(corr(y, x), 6).as("xy_corr"),
        count_if(col("p_size") > 25).as("n_large"),
        bool_and(col("p_size") >= 1).as("all_sized"),
        bool_or(col("p_size") > 49).as("any_max"))
      .orderBy("p_brand")
  }

  val d77Oracle: String =
    """SELECT p_brand,
      |  round(regr_slope(CAST(p_partkey % 211 AS DOUBLE), CAST(p_size AS DOUBLE)), 6) AS slope,
      |  round(regr_intercept(CAST(p_partkey % 211 AS DOUBLE), CAST(p_size AS DOUBLE)), 6) AS intercept,
      |  round(regr_r2(CAST(p_partkey % 211 AS DOUBLE), CAST(p_size AS DOUBLE)), 6) AS r2,
      |  regr_count(CAST(p_partkey % 211 AS DOUBLE), CAST(p_size AS DOUBLE)) AS n_pairs,
      |  round(corr(CAST(p_partkey % 211 AS DOUBLE), CAST(p_size AS DOUBLE)), 6) AS xy_corr,
      |  CAST(count_if(p_size > 25) AS BIGINT) AS n_large,
      |  bool_and(p_size >= 1) AS all_sized,
      |  bool_or(p_size > 49) AS any_max
      |FROM part
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- d78
  /** Recursive CTE (Spark 4 `WITH RECURSIVE`): generate the January-2024
    * calendar recursively, left-join to events, count per day — the
    * gap-preserving time-series shape (days with zero events still appear). */
  def d78RecursiveCte(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir).createOrReplaceTempView("v_events_d78")
    spark.sql(
      """WITH RECURSIVE cal AS (
        |  SELECT DATE '2024-01-01' AS d
        |  UNION ALL
        |  SELECT date_add(d, 1) FROM cal WHERE d < DATE '2024-01-31'
        |)
        |SELECT c.d, COUNT(e.event_id) AS n_events,
        |  CAST(COALESCE(SUM(CAST(round(e.value * 10000, 0) AS BIGINT)), 0) AS DOUBLE) / 10000.0 AS sum_value
        |FROM cal c LEFT JOIN v_events_d78 e ON CAST(e.ts AS DATE) = c.d
        |GROUP BY c.d
        |ORDER BY c.d""".stripMargin)
  }

  val d78Oracle: String =
    """WITH RECURSIVE cal AS (
      |  SELECT DATE '2024-01-01' AS d
      |  UNION ALL
      |  SELECT d + 1 FROM cal WHERE d < DATE '2024-01-31'
      |)
      |SELECT c.d, COUNT(e.event_id) AS n_events,
      |  CAST(COALESCE(SUM(CAST(round(e.value * 10000, 0) AS BIGINT)), 0) AS DOUBLE) / 10000.0 AS sum_value
      |FROM cal c LEFT JOIN events e ON CAST(e.ts AS DATE) = c.d
      |GROUP BY c.d
      |ORDER BY c.d""".stripMargin

  // ---------------------------------------------------------------- d79
  /** SQL scripting (Spark 4 `BEGIN … END` with DECLARE / WHILE / SET): a
    * control-flow loop that re-plans a distributed aggregate per iteration
    * and returns the accumulated scalar. The oracle unrolls the loop as a
    * correlated subquery over the same thresholds. */
  def d79SqlScripting(spark: SparkSession, dir: String): DataFrame = {
    orders(spark, dir).createOrReplaceTempView("v_orders_d79")
    spark.sql(
      """BEGIN
        |  DECLARE i INT DEFAULT 1;
        |  DECLARE acc BIGINT DEFAULT 0;
        |  WHILE i <= 5 DO
        |    SET acc = acc + (SELECT COUNT(*) FROM v_orders_d79 WHERE o_totalprice > i * 50000);
        |    SET i = i + 1;
        |  END WHILE;
        |  SELECT acc AS n_weighted;
        |END""".stripMargin)
  }

  val d79Oracle: String =
    """SELECT CAST(SUM(cnt) AS BIGINT) AS n_weighted FROM (
      |  SELECT (SELECT COUNT(*) FROM orders o WHERE o.o_totalprice > t.i * 50000) AS cnt
      |  FROM range(1, 6) t(i))""".stripMargin

  // ---------------------------------------------------------------- d80
  /** SQL pipe syntax (Spark 4 `|>` operators): the D01 pricing-summary shape
    * written as a left-to-right pipeline — FROM |> WHERE |> EXTEND |>
    * AGGREGATE … GROUP BY |> ORDER BY — with the same exact integer-unit
    * accumulation as d01. */
  def d80PipeSyntax(spark: SparkSession, dir: String): DataFrame = {
    lineitem(spark, dir).createOrReplaceTempView("v_lineitem_d80")
    spark.sql(
      """FROM v_lineitem_d80
        ||> WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        ||> EXTEND CAST(round(l_quantity * 100, 0) AS BIGINT) AS qty_c,
        |          CAST(round(l_extendedprice * 10000, 0) AS BIGINT) AS price_u
        ||> AGGREGATE COUNT(*) AS n,
        |             CAST(SUM(qty_c) AS DOUBLE) / 100.0 AS sum_qty,
        |             CAST(SUM(price_u) AS DOUBLE) / 10000.0 AS sum_price
        |   GROUP BY l_returnflag, l_linestatus
        ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  val d80Oracle: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
      |  CAST(SUM(CAST(round(l_extendedprice * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_price
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- d81
  /** Collation-aware grouping (Spark 4 collations): market segments mangled
    * into mixed case, grouped under UTF8_LCASE so case variants collapse.
    * The group key itself is projected through lower() — the collated
    * representative an engine keeps per group is implementation-defined, its
    * lowercase image is not. */
  def d81Collation(spark: SparkSession, dir: String): DataFrame = {
    val mixed = when(col("c_custkey") % 2 === 0, upper(col("c_mktsegment")))
      .otherwise(lower(col("c_mktsegment")))
    customer(spark, dir)
      .select(mixed.as("seg_mixed"))
      .groupBy(collate(col("seg_mixed"), "UTF8_LCASE").as("seg_ci"))
      .agg(count(lit(1)).as("n"), min(col("seg_mixed")).as("min_mixed"))
      .select(lower(col("seg_ci")).as("segment"), col("n"), col("min_mixed"))
      .orderBy("segment")
  }

  val d81Oracle: String =
    """WITH m AS (
      |  SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
      |              ELSE lower(c_mktsegment) END AS seg_mixed
      |  FROM customer
      |)
      |SELECT lower(seg_mixed) AS segment, COUNT(*) AS n, MIN(seg_mixed) AS min_mixed
      |FROM m
      |GROUP BY lower(seg_mixed)
      |ORDER BY segment""".stripMargin

  // ---------------------------------------------------------------- d82
  /** Parameterized SQL (named `:param` binding) composed with EXECUTE
    * IMMEDIATE (positional `?` binding) — the injection-safe SQL entry
    * points. */
  def d82ParamSql(spark: SparkSession, dir: String): DataFrame = {
    orders(spark, dir).createOrReplaceTempView("v_orders_d82")
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n_big
        |FROM v_orders_d82 WHERE o_totalprice > :thresh
        |GROUP BY o_orderpriority""".stripMargin,
      Map("thresh" -> Int.box(150000)))
      .createOrReplaceTempView("v_d82_inner")
    spark.sql(
      "EXECUTE IMMEDIATE 'SELECT o_orderpriority, n_big FROM v_d82_inner " +
        "WHERE n_big > ? ORDER BY o_orderpriority' USING 0")
  }

  val d82Oracle: String =
    """SELECT o_orderpriority, COUNT(*) AS n_big
      |FROM orders WHERE o_totalprice > 150000
      |GROUP BY o_orderpriority
      |HAVING COUNT(*) > 0
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- d83
  /** IGNORE NULLS window navigation: last-observation-carried-forward of the
    * purchase value per user (and the symmetric next-observation), the
    * classic sparse-to-dense time-series fill. Values pass through without
    * arithmetic, so doubles stay bit-identical. */
  def d83IgnoreNulls(spark: SparkSession, dir: String): DataFrame = {
    val pv = when(col("event_type") === "purchase", col("value"))
    val back = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        tsString(col("ts")).as("ts_s"),
        last(pv, ignoreNulls = true).over(back).as("last_purchase"),
        first(pv, ignoreNulls = true).over(fwd).as("next_purchase"))
      .orderBy("user_id", "event_id")
  }

  val d83Oracle: String =
    """SELECT user_id, event_id, event_type,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
      |  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase,
      |  first_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- d84
  /** Datetime arithmetic battery: add_months (month-end clamped in both
    * engines), last_day, quarter truncation, day arithmetic, weekday
    * numbering (DuckDB's Sunday=0 shifted to Spark's Sunday=1), and
    * make_date. */
  def d84Datetime(spark: SparkSession, dir: String): DataFrame = {
    val od = col("o_orderdate").cast("date")
    orders(spark, dir)
      .select(col("o_orderkey"),
        od.as("od"),
        add_months(od, 3).as("plus3m"),
        last_day(od).as("eom"),
        date_trunc("quarter", od).cast("date").as("qtr"),
        datediff(to_date(lit("2024-12-31")), od).cast("long").as("days_to_eoy"),
        dayofweek(od).cast("long").as("dow"),
        make_date(year(od), month(od), lit(1)).as("month_start"))
      .orderBy("o_orderkey")
  }

  val d84Oracle: String =
    """SELECT o_orderkey,
      |  CAST(o_orderdate AS DATE) AS od,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
      |  last_day(CAST(o_orderdate AS DATE)) AS eom,
      |  CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS qtr,
      |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2024-12-31') AS BIGINT) AS days_to_eoy,
      |  CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS BIGINT) AS dow,
      |  make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1) AS month_start
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- d85
  /** listagg WITHIN GROUP (ordered string aggregation) + GROUP BY ALL /
    * ORDER BY ALL resolution. */
  def d85Listagg(spark: SparkSession, dir: String): DataFrame = {
    nation(spark, dir).createOrReplaceTempView("v_nation_d85")
    region(spark, dir).createOrReplaceTempView("v_region_d85")
    spark.sql(
      """SELECT r_name,
        |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS members,
        |  COUNT(*) AS n_nations
        |FROM v_nation_d85 JOIN v_region_d85 ON n_regionkey = r_regionkey
        |GROUP BY ALL
        |ORDER BY ALL""".stripMargin)
  }

  val d85Oracle: String =
    """SELECT r_name,
      |  string_agg(n_name, ',' ORDER BY n_name) AS members,
      |  COUNT(*) AS n_nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name, members, n_nations""".stripMargin

  // ---------------------------------------------------------------- d89
  /** ANSI-safe `try_*` functions: division by zero, bigint overflow,
    * out-of-bounds array access, and unparseable timestamps each yield NULL
    * instead of failing the job — the row-level error containment a 100 TB
    * batch needs (one malformed row must not kill a 6-hour job). */
  def d89TryFuncs(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .select(col("o_orderkey"),
        try_divide(col("o_totalprice"), (col("o_custkey") % 10).cast("double"))
          .as("safe_ratio"),
        // overflow only at o_orderkey % 100 == 99 (~1% of rows): the JVM
        // overflow path raises-and-catches per failing row, so a
        // half-overflowing column costs ~100× the happy path (measured
        // 1.4 s vs 0.1 s on 150k rows) while a rare-overflow probe pins the
        // same NULL contract at none of the cost
        try_multiply(col("o_orderkey") % 100, lit(93200000000000000L))
          .as("safe_product"),
        // index 2 is in-bounds (priorities are 'N-WORD'), 3 is out-of-bounds:
        // the in-bounds probe pins the 1-based indexing convention, the
        // out-of-bounds one pins the NULL (vs error) contract
        try_element_at(split(col("o_orderpriority"), "-"), lit(2))
          .as("safe_elem2"),
        try_element_at(split(col("o_orderpriority"), "-"), lit(3))
          .as("safe_elem"),
        try_to_timestamp(col("o_orderstatus")).cast("string").as("bad_ts"),
        try_to_timestamp(concat(lit("2024-01-0"), (col("o_orderkey") % 9 + 1)))
          .cast("string").as("good_ts"))
      .orderBy("o_orderkey")

  val d89Oracle: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_custkey % 10 = 0 THEN NULL
      |       ELSE o_totalprice / CAST(o_custkey % 10 AS DOUBLE) END AS safe_ratio,
      |  CASE WHEN o_orderkey % 100 > 98 THEN NULL
      |       ELSE (o_orderkey % 100) * 93200000000000000 END AS safe_product,
      |  string_split(o_orderpriority, '-')[2] AS safe_elem2,
      |  string_split(o_orderpriority, '-')[3] AS safe_elem,
      |  strftime(TRY_CAST(o_orderstatus AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS bad_ts,
      |  strftime(TRY_CAST('2024-01-0' || CAST(o_orderkey % 9 + 1 AS VARCHAR) AS TIMESTAMP),
      |           '%Y-%m-%d %H:%M:%S') AS good_ts
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- d90
  /** Exact distinct counting via bitmap aggregates (bitmap_bucket_number /
    * bitmap_bit_position / bitmap_construct_agg / bitmap_count): keys fold
    * into fixed-width per-bucket bitmaps that merge associatively, so the
    * shuffle carries one 4 KB bitmap per (group, bucket) instead of every
    * raw key — the mergeable-exact-distinct structure that replaces
    * `COUNT(DISTINCT)`'s key re-shuffle at warehouse scale. */
  def d90BitmapDistinct(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .groupBy(col("o_orderpriority"),
        bitmap_bucket_number(col("o_custkey")).as("bucket"))
      .agg(bitmap_construct_agg(bitmap_bit_position(col("o_custkey"))).as("bm"))
      .groupBy("o_orderpriority")
      .agg(sum(bitmap_count(col("bm"))).cast("long").as("n_distinct_cust"))
      .orderBy("o_orderpriority")

  val d90Oracle: String =
    """SELECT o_orderpriority,
      |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct_cust
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- registry

  val queries: Map[String, QueryFn] = Map(
    "d76_unpivot" -> (d76Unpivot _),
    "d77_stat_aggs" -> (d77StatAggs _),
    "d78_recursive_cte" -> (d78RecursiveCte _),
    "d79_sql_scripting" -> (d79SqlScripting _),
    "d80_pipe_syntax" -> (d80PipeSyntax _),
    "d81_collation" -> (d81Collation _),
    "d82_param_sql" -> (d82ParamSql _),
    "d83_ignore_nulls" -> (d83IgnoreNulls _),
    "d84_datetime" -> (d84Datetime _),
    "d85_listagg" -> (d85Listagg _),
    "d89_try_funcs" -> (d89TryFuncs _),
    "d90_bitmap_distinct" -> (d90BitmapDistinct _),
  )

  val oracles: Map[String, String] = Map(
    "d76_unpivot" -> d76Oracle,
    "d77_stat_aggs" -> d77Oracle,
    "d78_recursive_cte" -> d78Oracle,
    "d79_sql_scripting" -> d79Oracle,
    "d80_pipe_syntax" -> d80Oracle,
    "d81_collation" -> d81Oracle,
    "d82_param_sql" -> d82Oracle,
    "d83_ignore_nulls" -> d83Oracle,
    "d84_datetime" -> d84Oracle,
    "d85_listagg" -> d85Oracle,
    "d89_try_funcs" -> d89Oracle,
    "d90_bitmap_distinct" -> d90Oracle,
  )
}
