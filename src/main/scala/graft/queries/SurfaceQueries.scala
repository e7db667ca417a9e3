package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Tables._

/** Buffer for the typed order-stats aggregator: exact cents plus count and
  * extrema. */
final case class OrderStatsBuf(cents: Long, n: Long, lo: Double, hi: Double)

/**
 * Remaining operator-surface closure (SURVEY §2.2): pivot, min_by/max_by,
 * exact moments, multiset set-ops, posexplode, the SQL entry point with
 * correlated subqueries, JSON/CSV source formats, and a custom typed
 * `Aggregator` — each oracle-checked.
 */
object SurfaceQueries {

  import BatchQueries.QueryFn

  // ---------------------------------------------------------------- d36
  /** Pivot with explicitly declared pivot values (declared values keep the
    * plan single-pass and the output schema deterministic). */
  def d36Pivot(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("o_orderpriority")

  val d36Oracle: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- d37
  /** min_by/max_by plus exact second moments: variance/stddev are computed
    * from exact decimal sums (Σx, Σx²) rather than the engines' streaming
    * moment kernels, whose merge order differs across engines. */
  def d37AggFuncs(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    // exact integer-cents moments: a fractional-scale decimal whose unit
    // count exceeds 2^53 casts to double differently across engines (two
    // roundings vs one); scale-0 decimals convert correctly-rounded in both
    val cents = round(col("o_totalprice") * 100, 0).cast("long")
    val s1 = sum(cents.cast(DecimalType(18, 0)))
    val s2 = sum((cents * cents).cast(DecimalType(38, 0)))
    val n = count(lit(1))
    val varCents =
      (s2.cast("double") - s1.cast("double") * s1.cast("double") / n) / (n - 1)
    val varExact = varCents / 10000.0
    // min_by/max_by tie-break on equal prices is engine-nondeterministic, so
    // the ordering key is a unique fixed-width string: cents ++ orderkey
    val ordKey = concat(
      lpad(round(col("o_totalprice") * 100, 0).cast("long").cast("string"), 14, "0"),
      lpad(col("o_orderkey").cast("string"), 12, "0"))
    o.groupBy("o_orderpriority")
      .agg(
        min_by(col("o_orderkey"), ordKey).as("cheapest_order"),
        max_by(col("o_orderkey"), ordKey).as("priciest_order"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        // mirrored 2-decimal round: at sf0.1 the Σx² decimal exceeds 2^63
        // and DuckDB's int128→double cast can land 1 ulp off Spark's
        // (correctly-rounded) BigDecimal path; the round absorbs it (a
        // 1-ulp input wiggle can't cross a 0.005 boundary here)
        round(sqrt(varExact), 2).as("stddev_price"))
      .orderBy("o_orderpriority")
  }

  val d37Oracle: String =
    """WITH o AS (
      |  SELECT *, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c,
      |    lpad(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR), 14, '0')
      |      || lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS ord_key
      |  FROM orders
      |)
      |SELECT o_orderpriority,
      |  min_by(o_orderkey, ord_key) AS cheapest_order,
      |  max_by(o_orderkey, ord_key) AS priciest_order,
      |  MIN(o_totalprice) AS min_price,
      |  MAX(o_totalprice) AS max_price,
      |  round(sqrt(((CAST(SUM(CAST(c * c AS DECIMAL(38,0))) AS DOUBLE)
      |         - CAST(SUM(CAST(c AS DECIMAL(18,0))) AS DOUBLE)
      |           * CAST(SUM(CAST(c AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*))
      |        / (COUNT(*) - 1)) / 10000.0), 2) AS stddev_price
      |FROM o
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- d38
  /** Multiset set operations: intersectAll / exceptAll keep duplicate
    * multiplicities (bag semantics), unlike their distinct cousins in D11. */
  def d38MultisetOps(spark: SparkSession, dir: String): DataFrame = {
    val a = orders(spark, dir).select(col("o_custkey").as("custkey"))
    val b = orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    a.intersectAll(b).groupBy().agg(count(lit(1)).as("n")).select(lit("intersect_all").as("op"), col("n"))
      .unionAll(a.exceptAll(b).groupBy().agg(count(lit(1)).as("n")).select(lit("except_all").as("op"), col("n")))
      .orderBy("op")
  }

  val d38Oracle: String =
    """WITH a AS (SELECT o_custkey AS custkey FROM orders),
      |     b AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
      |SELECT 'except_all' AS op, COUNT(*) AS n FROM (SELECT custkey FROM a EXCEPT ALL SELECT custkey FROM b)
      |UNION ALL
      |SELECT 'intersect_all' AS op, COUNT(*) AS n FROM (SELECT custkey FROM a INTERSECT ALL SELECT custkey FROM b)
      |ORDER BY op""".stripMargin

  // ---------------------------------------------------------------- d39
  /** posexplode: generator with element position. */
  def d39PosExplode(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir)
      .select(col("p_partkey"), posexplode(split(col("p_name"), " ")))
      .select(col("p_partkey"), col("pos").cast("long").as("pos"), col("col").as("word"))
      .orderBy("p_partkey", "pos")

  val d39Oracle: String =
    """SELECT p_partkey,
      |  CAST(generate_subscripts(string_split(p_name, ' '), 1) - 1 AS BIGINT) AS pos,
      |  unnest(string_split(p_name, ' ')) AS word
      |FROM part
      |ORDER BY p_partkey, pos""".stripMargin

  // ---------------------------------------------------------------- d40
  /** The SQL entry point with a correlated EXISTS subquery — Catalyst plans
    * it as a left-semi join; the same ANSI text runs on both engines. */
  val d40Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_active
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000.0)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  def d40SqlSubquery(spark: SparkSession, dir: String): DataFrame = {
    customer(spark, dir).createOrReplaceTempView("customer")
    orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(d40Sql)
  }

  // ---------------------------------------------------------------- d41/d42
  /** JSON source round-trip: events staged as JSON lines, read back through
    * the JSON source with an explicit schema, aggregated. Timestamps travel
    * as ISO-8601 strings. */
  def d41JsonSource(spark: SparkSession, dir: String): DataFrame = {
    val staging = Tables.scratchDir("d41").resolve("json")
    val ev = events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        tsString(col("ts")).as("ts"))
    ev.coalesce(4).write.mode("overwrite").json(staging.toString)
    spark.read.schema(ev.schema).json(staging.toString)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"),
        min(col("ts")).as("first_ts"))
      .orderBy("event_type")
  }

  val d41Oracle: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
      |  MIN(strftime(ts, '%Y-%m-%d %H:%M:%S.%f')) AS first_ts
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** CSV source round-trip with header + explicit schema. */
  def d42CsvSource(spark: SparkSession, dir: String): DataFrame = {
    val staging = Tables.scratchDir("d42").resolve("csv")
    val o = orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
    o.coalesce(4).write.mode("overwrite").option("header", "true").csv(staging.toString)
    spark.read.schema(o.schema).option("header", "true").csv(staging.toString)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  val d42Oracle: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- d62
  /** ORC source round-trip (the remaining built-in columnar format beside
    * parquet): write orders as ORC, read back with predicate + projection
    * pushdown, aggregate — must equal the parquet-derived oracle. */
  def d62OrcSource(spark: SparkSession, dir: String): DataFrame = {
    val staging = Tables.scratchDir("d62").resolve("orc")
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        col("o_totalprice"))
      .write.mode("overwrite").orc(staging.toString)
    spark.read.orc(staging.toString)
      .filter(col("o_totalprice") > 50000.0)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  val d62Oracle: String =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM orders
      |WHERE o_totalprice > 50000.0
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- d63
  /** Typed cogroup (`KeyValueGroupedDataset.cogroup`): orders and line items
    * grouped on the order key, one output row per order with item stats —
    * the escape hatch for per-key logic a join+agg can't express (here it
    * CAN, which is what makes it oracle-checkable). */
  def d63Cogroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val og = orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Double)].groupByKey(_._1)
    val lg = lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity").cast("long"))
      .as[(Long, Long)].groupByKey(_._1)
    og.cogroup(lg) { (k, os, ls) =>
      val ov = os.toSeq
      if (ov.isEmpty) Iterator.empty // line items without an order row
      else {
        val items = ls.map(_._2).toSeq
        Iterator((k, ov.head._2, items.size.toLong, items.sum))
      }
    }.toDF("o_orderkey", "o_totalprice", "n_items", "sum_qty")
      .orderBy("o_orderkey")
  }

  val d63Oracle: String =
    """SELECT o.o_orderkey, o.o_totalprice,
      |  COUNT(l.l_orderkey) AS n_items,
      |  CAST(COALESCE(SUM(CAST(l.l_quantity AS BIGINT)), 0) AS BIGINT) AS sum_qty
      |FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |GROUP BY 1, 2
      |ORDER BY o.o_orderkey""".stripMargin

  // ---------------------------------------------------------------- d43
  /**
   * Custom typed `Aggregator`: per-priority order statistics with an exact
   * integer-cents accumulator (2-decimal money × 100 is always an exact
   * integer, so the sum is order-independent and bit-stable). Exercises the
   * typed aggregation surface (`Aggregator[IN, BUF, OUT]` + Encoders) that
   * complements the untyped `functions._` path.
   */
  object OrderStatsAgg extends Aggregator[(String, Double), OrderStatsBuf, (Double, Long, Double, Double)] {
    override def zero: OrderStatsBuf = OrderStatsBuf(0L, 0L, Double.MaxValue, Double.MinValue)
    override def reduce(b: OrderStatsBuf, row: (String, Double)): OrderStatsBuf = {
      val price = row._2
      OrderStatsBuf(b.cents + math.round(price * 100), b.n + 1,
        math.min(b.lo, price), math.max(b.hi, price))
    }
    override def merge(x: OrderStatsBuf, y: OrderStatsBuf): OrderStatsBuf =
      OrderStatsBuf(x.cents + y.cents, x.n + y.n,
        math.min(x.lo, y.lo), math.max(x.hi, y.hi))
    override def finish(b: OrderStatsBuf): (Double, Long, Double, Double) =
      (b.cents / 100.0, b.n, b.lo, b.hi)
    override def bufferEncoder: Encoder[OrderStatsBuf] = Encoders.product[OrderStatsBuf]
    override def outputEncoder: Encoder[(Double, Long, Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong,
        Encoders.scalaDouble, Encoders.scalaDouble)
  }

  def d43TypedAggregator(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    orders(spark, dir)
      .select(col("o_orderpriority"), col("o_totalprice"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .agg(OrderStatsAgg.toColumn.name("stats"))
      .select(col("key").as("o_orderpriority"),
        col("stats._1").as("sum_price"), col("stats._2").as("n_orders"),
        col("stats._3").as("min_price"), col("stats._4").as("max_price"))
      .orderBy("o_orderpriority")
  }

  val d43Oracle: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price,
      |  COUNT(*) AS n_orders,
      |  MIN(o_totalprice) AS min_price,
      |  MAX(o_totalprice) AS max_price
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- d46
  /** Versioned-table time travel ([[graft.sources.VersionedTable]], the
    * offline `startingVersion`/time-travel surface): three day-range commits,
    * snapshot read at version 1 — only the first two ranges are visible. */
  def d46TimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val table = Tables.scratchDir("d46").resolve("t").toString
    val ev = events(spark, dir)
    val day = datediff(col("ts").cast("date"), to_date(lit("2024-01-01")))
    graft.sources.VersionedTable.commit(ev.filter(day < 10), table)
    graft.sources.VersionedTable.commit(ev.filter(day >= 10 && day < 20), table)
    graft.sources.VersionedTable.commit(ev.filter(day >= 20), table)
    graft.sources.VersionedTable.read(spark, table, version = Some(1L))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  val d46Oracle: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) < 20
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- d47
  /** Exact median and quartiles per priority. Spark's percentile family
    * interpolates with the two-weight form
    * `(hiIdx - pos) * lo + (pos - loIdx) * hi` (with the single-index case
    * returning lo directly); the oracle reproduces that exact IEEE sequence
    * from row_number-selected neighbors (DuckDB's own `median` computes
    * `(lo + hi) / 2`, a different rounding sequence — and `lo + (hi-lo)*frac`
    * differs too, which cross-scale validation caught). */
  def d47Percentiles(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(median(col("o_totalprice")).as("median_price"),
        percentile(col("o_totalprice"), lit(0.25)).as("p25_price"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  val d47Oracle: String =
    """WITH ranked AS (
      |  SELECT o_orderpriority, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn,
      |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM orders
      |), pick AS (
      |  SELECT o_orderpriority, n,
      |    -- 1-based neighbors for percentile p: pos = 1 + (n-1)*p
      |    MAX(CASE WHEN rn = CAST(floor(1 + (n - 1) * 0.5) AS BIGINT) THEN o_totalprice END) AS med_lo,
      |    MAX(CASE WHEN rn = CAST(ceil(1 + (n - 1) * 0.5) AS BIGINT) THEN o_totalprice END) AS med_hi,
      |    MAX(CASE WHEN rn = CAST(floor(1 + (n - 1) * 0.25) AS BIGINT) THEN o_totalprice END) AS q_lo,
      |    MAX(CASE WHEN rn = CAST(ceil(1 + (n - 1) * 0.25) AS BIGINT) THEN o_totalprice END) AS q_hi
      |  FROM ranked
      |  GROUP BY o_orderpriority, n
      |)
      |SELECT o_orderpriority,
      |  CASE WHEN (1 + (n - 1) * 0.5) = floor(1 + (n - 1) * 0.5) THEN med_lo
      |       ELSE (ceil(1 + (n - 1) * 0.5) - (1 + (n - 1) * 0.5)) * med_lo
      |          + ((1 + (n - 1) * 0.5) - floor(1 + (n - 1) * 0.5)) * med_hi
      |  END AS median_price,
      |  CASE WHEN (1 + (n - 1) * 0.25) = floor(1 + (n - 1) * 0.25) THEN q_lo
      |       ELSE (ceil(1 + (n - 1) * 0.25) - (1 + (n - 1) * 0.25)) * q_lo
      |          + ((1 + (n - 1) * 0.25) - floor(1 + (n - 1) * 0.25)) * q_hi
      |  END AS p25_price,
      |  n AS n_orders
      |FROM pick
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- d48
  /** Array higher-order functions: filter / exists / forall / slice /
    * sequence + aggregate / zip_with. */
  def d48ArrayHof(spark: SparkSession, dir: String): DataFrame = {
    val ws = split(col("p_name"), " ")
    part(spark, dir)
      .select(col("p_partkey"),
        // HOFs are the operators under test; array results are rendered as
        // delimited strings because the comparator hashes scalar cells only
        array_join(filter(ws, w => length(w) > 4), "|").as("long_words"),
        size(filter(ws, w => length(w) > 4)).cast("long").as("n_long"),
        exists(ws, w => w === "bolt").as("has_bolt"),
        forall(ws, w => length(w) < 10).as("all_short"),
        array_join(slice(ws, 1, 2), "|").as("first_two"),
        aggregate(sequence(lit(1), col("p_size")), lit(0L),
          (acc, x) => acc + x).as("seq_sum"),
        array_join(zip_with(ws, ws, (a, b) => concat(a, lit("-"), b)), "|")
          .as("self_zip"))
      .orderBy("p_partkey")
  }

  val d48Oracle: String =
    """SELECT p_partkey,
      |  COALESCE(array_to_string(list_filter(string_split(p_name, ' '), w -> length(w) > 4), '|'), '') AS long_words,
      |  CAST(len(list_filter(string_split(p_name, ' '), w -> length(w) > 4)) AS BIGINT) AS n_long,
      |  len(list_filter(string_split(p_name, ' '), w -> w = 'bolt')) > 0 AS has_bolt,
      |  len(list_filter(string_split(p_name, ' '), w -> length(w) >= 10)) = 0 AS all_short,
      |  array_to_string(list_slice(string_split(p_name, ' '), 1, 2), '|') AS first_two,
      |  CAST(list_sum(range(1, p_size + 1)) AS BIGINT) AS seq_sum,
      |  array_to_string(list_transform(string_split(p_name, ' '), w -> w || '-' || w), '|') AS self_zip
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- d49
  /** Conditional and bitwise scalar functions. */
  def d49CondBitwise(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .select(col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_label"),
        col("o_orderkey").bitwiseAND(255L).as("key_and"),
        col("o_orderkey").bitwiseOR(16L).as("key_or"),
        col("o_orderkey").bitwiseXOR(7L).as("key_xor"),
        shiftleft(pmod(col("o_orderkey"), lit(1024)), 2).as("key_shl"),
        shiftright(col("o_orderkey"), 3).as("key_shr"),
        bit_count(col("o_orderkey")).cast("long").as("key_bits"))
      .orderBy("o_orderkey")

  val d49Oracle: String =
    """SELECT o_orderkey,
      |  nullif(o_orderstatus, 'O') AS status_or_null,
      |  COALESCE(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
      |  o_orderkey & 255 AS key_and,
      |  o_orderkey | 16 AS key_or,
      |  xor(o_orderkey, 7) AS key_xor,
      |  (o_orderkey % 1024) << 2 AS key_shl,
      |  o_orderkey >> 3 AS key_shr,
      |  CAST(bit_count(o_orderkey) AS BIGINT) AS key_bits
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- d52
  /** The custom whole-operator path (§7.3(c)): per-key exact top-k through
    * [[graft.plans.TopKPerKey]] — a library LogicalPlan planned by an
    * injected SparkStrategy into a partial/final bounded-heap pair (only
    * ≤ k rows per key per partition reach the shuffle). Top-3 orders by
    * price per order priority; the oracle is the row_number window
    * formulation the operator replaces. */
  def d52TopKOperator(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerKey(
      orders(spark, dir).select("o_orderpriority", "o_orderkey", "o_totalprice"),
      keys = Seq(col("o_orderpriority")),
      order = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
      k = 3)
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))

  val d52Oracle: String =
    """WITH r AS (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders
      |)
      |SELECT o_orderpriority, o_orderkey, o_totalprice
      |FROM r WHERE rn <= 3
      |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- d53
  /** Map higher-order functions (transform_keys / transform_values /
    * map_filter / map_zip_with), checked as scalars against ground-truth
    * arithmetic (map cells themselves aren't comparator-hashable). */
  def d53MapHof(spark: SparkSession, dir: String): DataFrame = {
    val m = map_from_arrays(
      array(lit("a"), lit("b"), lit("c")),
      array(col("p_size"), col("p_size") * 2, col("p_size") * 3))
    part(spark, dir)
      .select(col("p_partkey"),
        element_at(transform_values(m, (_, v) => v * 10), "b")
          .cast("long").as("tv_b"),
        array_join(map_keys(transform_keys(m, (k, _) => upper(k))), ",").as("tk"),
        size(map_filter(m, (_, v) => v > 10)).cast("long").as("mf_n"),
        element_at(map_zip_with(m, m, (_, v1, v2) => v1 + v2), "c")
          .cast("long").as("mzw_c"))
      .orderBy("p_partkey")
  }

  val d53Oracle: String =
    """SELECT p_partkey,
      |  CAST(p_size * 2 * 10 AS BIGINT) AS tv_b,
      |  'A,B,C' AS tk,
      |  CAST(CASE WHEN p_size > 10 THEN 3
      |            WHEN p_size * 2 > 10 THEN 2
      |            WHEN p_size * 3 > 10 THEN 1 ELSE 0 END AS BIGINT) AS mf_n,
      |  CAST(p_size * 3 * 2 AS BIGINT) AS mzw_c
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- d54
  /** Generator functions beyond explode/posexplode: `stack` (columns → rows)
    * and `inline` (array-of-struct → rows), unioned. */
  def d54Generators(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .selectExpr("o_orderkey",
        "stack(2, 'base', o_totalprice, 'doubled', o_totalprice + o_totalprice) AS (label, v)")
      .unionAll(orders(spark, dir).selectExpr(
        "o_orderkey",
        "inline(array(named_struct('label', 'neg', 'v', -o_totalprice)))"))
      .orderBy("o_orderkey", "label")

  val d54Oracle: String =
    """SELECT o_orderkey, label, v FROM (
      |  SELECT o_orderkey, 'base' AS label, o_totalprice AS v FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, 'doubled', o_totalprice + o_totalprice FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, 'neg', -o_totalprice FROM orders
      |)
      |ORDER BY o_orderkey, label""".stripMargin

  // ---------------------------------------------------------------- d55
  /** RANGE window frame (value-based bounds, vs the ROWS frames of D07/D08):
    * per return flag, statistics over all line items whose quantity lies
    * within 5 units below the current row's. Only order-independent
    * aggregates (count / integer sum / min / max) so float summation order
    * can't diverge across engines. */
  def d55RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag").orderBy(col("l_quantity"))
      .rangeBetween(-5L, Window.currentRow)
    lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"),
        count(lit(1)).over(w).as("n_in_range"),
        sum(col("l_quantity").cast("long")).over(w).as("qty_in_range"))
      // (l_orderkey, l_linenumber) is not unique in the synthetic table —
      // include quantity + flag so the presentation order is total (rows
      // agreeing on all four sort keys have identical window results)
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
  }

  val d55Oracle: String =
    """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
      |  COUNT(*) OVER w AS n_in_range,
      |  -- cast back to BIGINT: DuckDB SUM(BIGINT) yields HUGEINT, which
      |  -- arrow/pandas-side hashing renders as float64 and hash-mismatches
      |  -- Spark's long even when values are identical
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) OVER w AS BIGINT) AS qty_in_range
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity
      |             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
      |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag""".stripMargin

  // ---------------------------------------------------------------- d56
  /** MERGE-style upsert ([[graft.ops.Upsert]]): customers ending in 0 get a
    * segment upgrade (matched → update), a shifted key block is appended
    * (not matched → insert), and the merged snapshot must equal the oracle's
    * anti-join + union formulation. */
  def d56MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = customer(spark, dir)
      .select("c_custkey", "c_name", "c_mktsegment")
    val upgraded = base.filter(col("c_custkey") % 10 === 0)
      .withColumn("c_mktsegment", lit("UPGRADED"))
    val inserts = base.filter(col("c_custkey") % 97 === 0)
      .select((col("c_custkey") + 1000000).as("c_custkey"),
        concat(lit("new:"), col("c_name")).as("c_name"),
        lit("NEWCOMER").as("c_mktsegment"))
    graft.ops.Upsert.upsert(base, upgraded.unionByName(inserts), "c_custkey")
      .orderBy("c_custkey")
  }

  val d56Oracle: String =
    """WITH base AS (
      |  SELECT c_custkey, c_name, c_mktsegment FROM customer
      |), updates AS (
      |  SELECT c_custkey, c_name, 'UPGRADED' AS c_mktsegment
      |  FROM base WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 'new:' || c_name, 'NEWCOMER'
      |  FROM base WHERE c_custkey % 97 = 0
      |)
      |SELECT * FROM updates
      |UNION ALL
      |SELECT b.* FROM base b ANTI JOIN updates u USING (c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- d57
  /** Parquet schema evolution: a second file adds a column; reading the
    * directory with `mergeSchema=true` null-fills the old rows (the
    * source-side evolution surface the reference exposes as options —
    * global `spark.sql.parquet.mergeSchema=false`, sink `mergeSchema`). */
  def d57SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.scratchDir("d57").toString
    val c = customer(spark, dir)
    c.filter(col("c_custkey") % 2 === 0)
      .select("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$base/gen=0")
    c.filter(col("c_custkey") % 2 =!= 0)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$base/gen=1")
    spark.read.option("mergeSchema", "true")
      .parquet(s"$base/gen=0", s"$base/gen=1")
      .orderBy("c_custkey")
  }

  val d57Oracle: String =
    """SELECT c_custkey, c_name, NULL AS c_mktsegment
      |FROM customer WHERE c_custkey % 2 = 0
      |UNION ALL
      |SELECT c_custkey, c_name, c_mktsegment
      |FROM customer WHERE c_custkey % 2 <> 0
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- d58
  /** LATERAL correlated subquery (SQL surface): per customer, an aggregate
    * over just that customer's orders, customers without orders kept
    * (count 0 / null max). */
  def d58Lateral(spark: SparkSession, dir: String): DataFrame = {
    customer(spark, dir).createOrReplaceTempView("v_customer")
    orders(spark, dir).createOrReplaceTempView("v_orders")
    spark.sql(
      """SELECT c.c_custkey, t.n_orders, t.max_price
        |FROM v_customer c,
        |LATERAL (
        |  SELECT COUNT(*) AS n_orders, MAX(o.o_totalprice) AS max_price
        |  FROM v_orders o WHERE o.o_custkey = c.c_custkey
        |) t
        |ORDER BY c.c_custkey""".stripMargin)
  }

  val d58Oracle: String =
    """SELECT c.c_custkey, t.n_orders, t.max_price
      |FROM customer c,
      |LATERAL (
      |  SELECT COUNT(*) AS n_orders, MAX(o.o_totalprice) AS max_price
      |  FROM orders o WHERE o.o_custkey = c.c_custkey
      |) t
      |ORDER BY c.c_custkey""".stripMargin

  // ---------------------------------------------------------------- d59
  /** Regex and string→map functions: regexp_extract_all, regexp_count,
    * split_part, str_to_map. */
  def d59RegexpStrmap(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir)
      .select(col("p_partkey"),
        array_join(regexp_extract_all(col("p_name"), lit("[a-z]+"), lit(0)), "|")
          .as("alpha_runs"),
        regexp_count(col("p_name"), lit("[aeiou]")).cast("long").as("n_vowels"),
        split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
        element_at(
          str_to_map(concat(lit("brand:"), col("p_brand"),
            lit(",size:"), col("p_size")), lit(","), lit(":")),
          "size").cast("long").as("size_from_map"))
      .orderBy("p_partkey")

  val d59Oracle: String =
    """SELECT p_partkey,
      |  array_to_string(regexp_extract_all(p_name, '[a-z]+'), '|') AS alpha_runs,
      |  CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels,
      |  split_part(p_type, ' ', 1) AS type_head,
      |  CAST(p_size AS BIGINT) AS size_from_map
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- d60
  /** DataSource V2 batch read ([[graft.sources.v2.GraftSeqSource]]): the
    * full connector stack (TableProvider → ScanBuilder → Batch →
    * PartitionReaderFactory, short-named via DataSourceRegister) planned
    * into 8 input partitions, with column pruning pushed into the scan.
    * Oracle = the same sequence arithmetic from DuckDB's range(). */
  def d60Dsv2Seq(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft-seq")
      .option("start", "0").option("end", "60000")
      .load()
      .groupBy((col("id") % 7).as("g"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"),
        sum(col("sq")).as("sum_sq"))
      .orderBy("g")

  val d60Oracle: String =
    """SELECT id % 7 AS g, COUNT(*) AS n,
      |  CAST(SUM(id) AS BIGINT) AS sum_id,
      |  CAST(SUM(id * id) AS BIGINT) AS sum_sq
      |FROM range(0, 60000) t(id)
      |GROUP BY 1
      |ORDER BY g""".stripMargin

  // ---------------------------------------------------------------- d97
  /** The DSv2 connector's STREAMING path (round 10): the sequence table
    * read as a `MicroBatchStream` — exactly-once offset protocol
    * (initial/latest/deserialize/commit), `rowsPerBatch` admission via
    * `SupportsAdmissionControl`, `AvailableNow` drain in
    * ⌈60000/20000⌉ = 3 micro-batches through the parquet sink's commit
    * log, then an aggregate over the drained rows touching EVERY column
    * of the round-11 mixed-type schema (long/string/double/timestamp —
    * the streaming protocol must deliver exactly the batch scan's rows,
    * once each, whatever their types). `val` is an exponent-shifted
    * exact double and `label`/`ts` compare bytewise/microsecond-exact,
    * so the mixed aggregate stays hash-stable across engines. */
  def d97Dsv2Stream(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.scratchDir("d97")
    val q = spark.readStream.format("graft-seq")
      .option("start", "0").option("end", "60000")
      .option("rowsPerBatch", "20000")
      .load()
      .writeStream.format("parquet")
      .option("path", base.resolve("data").toString)
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    mixedSeqAgg(spark.read.parquet(base.resolve("data").toString))
  }

  /** The shared d97/d98 aggregate over the mixed-type sequence frame. */
  private def mixedSeqAgg(df: DataFrame): DataFrame =
    df.groupBy((col("id") % 7).as("g"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"),
        sum(col("sq")).as("sum_sq"), sum(col("val")).as("sum_val"),
        min(col("label")).as("min_label"), max(col("ts")).as("max_ts"))
      .orderBy("g")

  /** DuckDB twin of the mixed-type drained frame: every column rebuilt
    * from `range()` exactly as the source's reader derives it
    * (`GraftSeqSource.fieldValue`), including the microsecond timestamp
    * epoch via `make_timestamp`. */
  val mixedSeqOracle: String =
    """SELECT id % 7 AS g, COUNT(*) AS n,
      |  CAST(SUM(id) AS BIGINT) AS sum_id,
      |  CAST(SUM(id * id) AS BIGINT) AS sum_sq,
      |  SUM(id / 64.0) AS sum_val,
      |  MIN('r' || CAST(id % 1000 AS VARCHAR)) AS min_label,
      |  MAX(make_timestamp(1767225600000000 + id * 1000000)) AS max_ts
      |FROM range(0, 60000) t(id)
      |GROUP BY 1
      |ORDER BY g""".stripMargin

  // ---------------------------------------------------------------- d98
  /** The DSv2 STREAMING SINK (round 10): the sequence stream written
    * through the full connector write protocol — per-partition
    * `DataWriter`s, `WriterCommitMessage`s, atomic driver-side epoch
    * manifests, replayed-epoch skip (`sinks.v2.GraftFilesSink`) — then
    * the committed rows aggregated. Round 11: the stream carries the
    * mixed-type schema through the sink's GENERAL row codec
    * (JSON-lines encode/decode per declared field type), so the
    * exactly-once epoch protocol is exercised over strings, doubles and
    * timestamps, not just longs. */
  def d98Dsv2StreamSink(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.scratchDir("d98")
    val out = base.resolve("out").toString
    val q = spark.readStream.format("graft-seq")
      .option("start", "0").option("end", "60000")
      .option("rowsPerBatch", "20000")
      .load()
      // round 12: widen the stream with the nested/decimal surface the
      // sink's recursive codec must carry — every value a deterministic
      // function of id, so the DuckDB oracle rebuilds the aggregates from
      // range() (decimal addition is exact at scale 3; the arrays/struct/
      // map round-trip through JSON-lines and aggregate back to BIGINTs)
      .withColumn("dec", col("id").cast("decimal(15,3)") +
        lit("0.125").cast("decimal(15,3)"))
      .withColumn("nums", sequence(lit(0L), pmod(col("id"), lit(3L))))
      .withColumn("strs", array(col("label"), concat(col("label"), lit("_x"))))
      .withColumn("kv", struct(pmod(col("id"), lit(5L)).as("k"),
        col("val").as("v")))
      .withColumn("m", map(lit("a"), pmod(col("id"), lit(3L)),
        lit("b"), pmod(col("id"), lit(11L))))
      .writeStream.format("graft-files")
      .option("path", out)
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wideDdl = "id BIGINT, sq BIGINT, label STRING, val DOUBLE, " +
      "ts TIMESTAMP, dec DECIMAL(16,3), nums ARRAY<BIGINT>, " +
      "strs ARRAY<STRING>, kv STRUCT<k: BIGINT, v: DOUBLE>, " +
      "m MAP<STRING, BIGINT>"
    graft.sinks.v2.GraftFilesSink.committed(spark, out, wideDdl)
      .groupBy((col("id") % 7).as("g"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"),
        sum(col("sq")).as("sum_sq"), sum(col("val")).as("sum_val"),
        min(col("label")).as("min_label"), max(col("ts")).as("max_ts"),
        // output as BIGINT thousandths: DECIMAL(p>18) is int128-backed and
        // the driver's arrow hash path renders it divergently between the
        // Spark and DuckDB results (same class as the HUGEINT pitfall in
        // tools/check_oracle.py); the decimal itself still round-trips
        // through the sink codec above
        (sum(col("dec")) * 1000).cast("long").as("sum_dec_th"),
        sum(size(col("nums"))).as("n_nums"),
        min(array_join(col("strs"), "|")).as("min_strs"),
        sum(col("kv.k")).as("sum_k"),
        sum(element_at(col("m"), "b")).as("sum_mb"))
      .orderBy("g")
  }

  /** The d98 oracle: [[mixedSeqOracle]]'s rebuild-from-range() shape plus
    * the widened nested/decimal aggregates. */
  val mixedSeqWideOracle: String =
    """SELECT id % 7 AS g, COUNT(*) AS n,
      |  CAST(SUM(id) AS BIGINT) AS sum_id,
      |  CAST(SUM(id * id) AS BIGINT) AS sum_sq,
      |  SUM(id / 64.0) AS sum_val,
      |  MIN('r' || CAST(id % 1000 AS VARCHAR)) AS min_label,
      |  MAX(make_timestamp(1767225600000000 + id * 1000000)) AS max_ts,
      |  CAST(SUM(CAST(id AS DECIMAL(15,3)) + CAST('0.125' AS DECIMAL(15,3)))
      |    * 1000 AS BIGINT) AS sum_dec_th,
      |  CAST(SUM(id % 3 + 1) AS BIGINT) AS n_nums,
      |  MIN('r' || CAST(id % 1000 AS VARCHAR) || '|' ||
      |      'r' || CAST(id % 1000 AS VARCHAR) || '_x') AS min_strs,
      |  CAST(SUM(id % 5) AS BIGINT) AS sum_k,
      |  CAST(SUM(id % 11) AS BIGINT) AS sum_mb
      |FROM range(0, 60000) t(id)
      |GROUP BY 1
      |ORDER BY g""".stripMargin

  // ---------------------------------------------------------------- registry

  val queries: Map[String, QueryFn] = Map(
    "d36_pivot" -> (d36Pivot _),
    "d37_agg_funcs" -> (d37AggFuncs _),
    "d38_multiset_ops" -> (d38MultisetOps _),
    "d39_posexplode" -> (d39PosExplode _),
    "d40_sql_subquery" -> (d40SqlSubquery _),
    "d41_json_source" -> (d41JsonSource _),
    "d42_csv_source" -> (d42CsvSource _),
    "d43_typed_aggregator" -> (d43TypedAggregator _),
    "d46_time_travel" -> (d46TimeTravel _),
    "d47_percentiles" -> (d47Percentiles _),
    "d48_array_hof" -> (d48ArrayHof _),
    "d49_cond_bitwise" -> (d49CondBitwise _),
    "d52_topk_operator" -> (d52TopKOperator _),
    "d53_map_hof" -> (d53MapHof _),
    "d54_generators" -> (d54Generators _),
    "d55_range_frame" -> (d55RangeFrame _),
    "d56_merge_upsert" -> (d56MergeUpsert _),
    "d57_schema_evolution" -> (d57SchemaEvolution _),
    "d58_lateral" -> (d58Lateral _),
    "d59_regexp_strmap" -> (d59RegexpStrmap _),
    "d60_dsv2_seq" -> (d60Dsv2Seq _),
    "d97_dsv2_stream" -> (d97Dsv2Stream _),
    "d98_dsv2_stream_sink" -> (d98Dsv2StreamSink _),
    "d62_orc_source" -> (d62OrcSource _),
    "d63_cogroup" -> (d63Cogroup _),
  )

  val oracles: Map[String, String] = Map(
    "d36_pivot" -> d36Oracle,
    "d37_agg_funcs" -> d37Oracle,
    "d38_multiset_ops" -> d38Oracle,
    "d39_posexplode" -> d39Oracle,
    "d40_sql_subquery" -> d40Sql,
    "d41_json_source" -> d41Oracle,
    "d42_csv_source" -> d42Oracle,
    "d43_typed_aggregator" -> d43Oracle,
    "d46_time_travel" -> d46Oracle,
    "d47_percentiles" -> d47Oracle,
    "d48_array_hof" -> d48Oracle,
    "d49_cond_bitwise" -> d49Oracle,
    "d52_topk_operator" -> d52Oracle,
    "d53_map_hof" -> d53Oracle,
    "d54_generators" -> d54Oracle,
    "d55_range_frame" -> d55Oracle,
    "d56_merge_upsert" -> d56Oracle,
    "d57_schema_evolution" -> d57Oracle,
    "d58_lateral" -> d58Oracle,
    "d59_regexp_strmap" -> d59Oracle,
    "d60_dsv2_seq" -> d60Oracle,
    // the streaming protocol must deliver exactly the batch rows, once —
    // round 11: over the full mixed-type schema
    "d97_dsv2_stream" -> mixedSeqOracle,
    // the sink's epoch-commit protocol must surface them exactly once
    // too, through the general row codec
    "d98_dsv2_stream_sink" -> mixedSeqWideOracle,
    "d62_orc_source" -> d62Oracle,
    "d63_cogroup" -> d63Oracle,
  )
}
