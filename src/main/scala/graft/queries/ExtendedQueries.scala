package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._

/**
 * Extended operator surface (SURVEY §2.2 closure): outer joins, unionByName,
 * distribution window functions, GROUPING SETS, theta/band joins, the wider
 * scalar/map/struct function set, and an as-of join composed from running
 * conditional aggregates — each with a DuckDB oracle.
 */
object ExtendedQueries {

  import BatchQueries.QueryFn

  // ---------------------------------------------------------------- d23
  /** Full outer join of per-nation customer vs supplier aggregates — the
    * supplier table covers few nations, so both unmatched sides are real. */
  def d23FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir).groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    val s = supplier(spark, dir).groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(s, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .orderBy("nationkey")
  }

  val d23Oracle: String =
    """SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
      |  COALESCE(n_customers, 0) AS n_customers,
      |  COALESCE(n_suppliers, 0) AS n_suppliers
      |FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1) c
      |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) s
      |  USING (nationkey)
      |ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------- d24
  /** unionByName: same logical schema declared in different column orders. */
  def d24UnionByName(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
      .select(col("c_custkey").as("id"), lit("customer").as("src"))
    val s = supplier(spark, dir)
      .select(lit("supplier").as("src"), col("s_suppkey").as("id"))
    c.unionByName(s).orderBy("src", "id")
  }

  val d24Oracle: String =
    """SELECT id, src FROM (
      |  SELECT c_custkey AS id, 'customer' AS src FROM customer
      |  UNION ALL
      |  SELECT s_suppkey AS id, 'supplier' AS src FROM supplier
      |)
      |ORDER BY src, id""".stripMargin

  // ---------------------------------------------------------------- d25
  /** Distribution window functions: ntile / percent_rank / cume_dist per
    * order priority. The doubles derive from identical integer rank/count
    * arithmetic, so they are bit-stable across engines. */
  def d25WindowDist(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice"), col("o_orderkey"))
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("o_orderkey")
  }

  val d25Oracle: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
      |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
      |  PERCENT_RANK() OVER w AS pct_rank,
      |  CUME_DIST() OVER w AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- d26
  /** Explicit GROUPING SETS beyond rollup/cube: (priority,status),
    * (status), and grand total. */
  def d26GroupingSets(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("sum_price"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"))
      .orderBy(col("g_priority"), col("g_status"),
        col("o_orderpriority"), col("o_orderstatus"))

  val d26Oracle: String =
    """SELECT o_orderpriority, o_orderstatus,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
      |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderstatus), ())
      |ORDER BY g_priority, g_status,
      |  o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- d27
  /** Theta/band join: orders joined to an inline price-band dimension on a
    * range predicate. Spark plans a broadcast nested-loop join — the right
    * physical shape for a tiny band table at any scale. */
  def d27BandJoin(spark: SparkSession, dir: String): DataFrame = {
    val bands = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("budget", 0.0, 75000.0),
        Row("mid", 75000.0, 200000.0),
        Row("premium", 200000.0, 1e12)),
      StructType(Seq(
        StructField("band", StringType),
        StructField("lo", DoubleType),
        StructField("hi", DoubleType))))
    orders(spark, dir)
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy("band")
  }

  val d27Oracle: String =
    """SELECT band, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM orders
      |JOIN (VALUES ('budget', 0.0, 75000.0), ('mid', 75000.0, 200000.0),
      |             ('premium', 200000.0, 1e12)) AS bands(band, lo, hi)
      |  ON o_totalprice >= lo AND o_totalprice < hi
      |GROUP BY band
      |ORDER BY band""".stripMargin

  // ---------------------------------------------------------------- d28
  /** Wider scalar sweep: regexp_extract, padding/trim, reverse, replace,
    * IEEE-exact math (sqrt / floor / ceil / sign / pmod — transcendentals are
    * deliberately excluded: libm last-ulp behavior differs across engines). */
  def d28ScalarMore(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir)
      .select(col("p_partkey"),
        regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("long").as("brand_num"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        trim(lit("  padded  ")).as("trimmed"),
        reverse(col("p_name")).as("name_rev"),
        regexp_replace(col("p_type"), "A", "@").as("type_sub"),
        sqrt(col("p_retailprice")).as("price_sqrt"),
        floor(col("p_retailprice")).cast("long").as("price_floor"),
        ceil(col("p_retailprice")).cast("long").as("price_ceil"),
        signum(col("p_retailprice") - 1000.0).as("price_sign"),
        pmod(col("p_size"), lit(7)).cast("long").as("size_mod"))
      .orderBy("p_partkey")

  val d28Oracle: String =
    """SELECT p_partkey,
      |  CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS BIGINT) AS brand_num,
      |  lpad(p_brand, 12, '*') AS brand_pad,
      |  trim('  padded  ') AS trimmed,
      |  reverse(p_name) AS name_rev,
      |  regexp_replace(p_type, 'A', '@', 'g') AS type_sub,
      |  sqrt(p_retailprice) AS price_sqrt,
      |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
      |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
      |  CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS price_sign,
      |  CAST(p_size % 7 AS BIGINT) AS size_mod
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- d29
  /** Map functions: construction, key/value extraction, membership, merge. */
  def d29MapOps(spark: SparkSession, dir: String): DataFrame = {
    val m = map(lit("brand"), col("p_brand"), lit("type"), col("p_type"))
    val merged = map_concat(m, map(lit("size"), col("p_size").cast("string")))
    part(spark, dir)
      .select(col("p_partkey"),
        // map_keys under test; joined to a scalar for the comparator
        array_join(map_keys(merged), ",").as("keys"),
        element_at(m, "brand").as("brand_val"),
        element_at(merged, "size").cast("long").as("size_val"),
        map_contains_key(m, "type").as("has_type"),
        size(map_values(merged)).cast("long").as("n_vals"))
      .orderBy("p_partkey")
  }

  val d29Oracle: String =
    """SELECT p_partkey,
      |  'brand,type,size' AS keys,
      |  p_brand AS brand_val,
      |  CAST(p_size AS BIGINT) AS size_val,
      |  true AS has_type,
      |  CAST(3 AS BIGINT) AS n_vals
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- d30
  /** Struct construction, nested access, and to_json rendering. */
  def d30StructOps(spark: SparkSession, dir: String): DataFrame = {
    val st = struct(col("p_partkey").as("k"), col("p_brand").as("b"))
    part(spark, dir)
      .select(col("p_partkey"),
        st.getField("b").as("brand_again"),
        to_json(st).as("as_json"))
      .orderBy("p_partkey")
  }

  val d30Oracle: String =
    """SELECT p_partkey,
      |  p_brand AS brand_again,
      |  '{"k":' || p_partkey || ',"b":"' || p_brand || '"}' AS as_json
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- d31
  /** As-of join composed from built-ins (SURVEY §7.3 preference (a)): for
    * each error event, the timestamp of the user's most recent prior
    * purchase — a running conditional max over the event-time order, one
    * shuffle on user_id, no custom operator needed. */
  def d31AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, dir)
      .filter(col("event_type").isin("error", "purchase"))
      .withColumn("last_purchase_ts",
        max(when(col("event_type") === "purchase", col("ts"))).over(w))
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), tsString(col("ts")).as("ts"),
        tsString(col("last_purchase_ts")).as("asof_purchase_ts"))
      .orderBy("event_id")
  }

  val d31Oracle: String =
    """SELECT event_id, user_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
      |  strftime(MAX(CASE WHEN event_type = 'purchase' THEN ts END)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    '%Y-%m-%d %H:%M:%S.%f') AS asof_purchase_ts
      |FROM events
      |WHERE event_type IN ('error', 'purchase')
      |QUALIFY event_type = 'error'
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- d35
  /** Skew-salted join ([[graft.ops.Scale.saltedJoin]]): result-identical to
    * the plain equi-join — the oracle IS the plain join — while the hot keys
    * spread over `buckets` reducers. */
  def d35SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    val o = orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    graft.ops.Scale.saltedJoin(li, o, "l_orderkey", buckets = 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  val d35Oracle: String =
    """SELECT o_orderpriority, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- d50
  /** Shipping-priority top-10 (TPC-H Q3 shape): segment-filtered customers,
    * date-bracketed orders and lineitems, revenue top-k. Broadcast the
    * filtered customer side, shuffle-join orders⋈lineitem, top-k via
    * TakeOrderedAndProject. */
  def d50ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-06-15 00:00:00").cast("timestamp_ntz")
    val c = customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(spark, dir).filter(col("o_orderdate") < cutoff)
    val li = lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"), col("o_orderpriority"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  val d50Oracle: String =
    """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-06-15 00:00:00'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- registry

  val queries: Map[String, QueryFn] = Map(
    "d23_full_outer" -> (d23FullOuter _),
    "d24_union_by_name" -> (d24UnionByName _),
    "d25_window_dist" -> (d25WindowDist _),
    "d26_grouping_sets" -> (d26GroupingSets _),
    "d27_band_join" -> (d27BandJoin _),
    "d28_scalar_more" -> (d28ScalarMore _),
    "d29_map_ops" -> (d29MapOps _),
    "d30_struct_ops" -> (d30StructOps _),
    "d31_asof_join" -> (d31AsOfJoin _),
    "d35_salted_join" -> (d35SaltedJoin _),
    "d50_shipping_priority" -> (d50ShippingPriority _),
  )

  val oracles: Map[String, String] = Map(
    "d23_full_outer" -> d23Oracle,
    "d24_union_by_name" -> d24Oracle,
    "d25_window_dist" -> d25Oracle,
    "d26_grouping_sets" -> d26Oracle,
    "d27_band_join" -> d27Oracle,
    "d28_scalar_more" -> d28Oracle,
    "d29_map_ops" -> d29Oracle,
    "d30_struct_ops" -> d30Oracle,
    "d31_asof_join" -> d31Oracle,
    "d35_salted_join" -> d35Oracle,
    "d50_shipping_priority" -> d50Oracle,
  )
}
