package graft.queries

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/**
 * Source-format closure beyond parquet/JSON/CSV/ORC (SURVEY §2.2: the
 * reference hands callers the whole `DataFrameReader` surface, so every
 * built-in format it can name is in scope): XML, line-text, binary files,
 * and the VARIANT semi-structured type.
 *
 * Each query is a round-trip — stage driver testdata in the format under
 * test, read it back through that source, aggregate — so the DuckDB oracle
 * can compute the same result from the original parquet table. At scale the
 * staged copy IS the production input (an XML feed, a crawl dump of binary
 * blobs); the write half exists only to make the test self-contained.
 */
object FormatQueries {

  import BatchQueries.QueryFn

  // ---------------------------------------------------------------- d64
  /** XML source round-trip (built-in since Spark 4): orders staged as XML
    * elements, read back with `rowTag` + explicit schema (schema inference
    * would re-scan the data — never at 100 TB), aggregated. Doubles travel
    * as shortest-repr decimal strings and re-parse bit-exact. */
  def d64XmlSource(spark: SparkSession, dir: String): DataFrame = {
    val staging = Tables.scratchDir("d64").resolve("xml")
    val o = orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        col("o_totalprice"))
    o.coalesce(4).write.mode("overwrite")
      .format("xml").option("rootTag", "orders").option("rowTag", "order")
      .save(staging.toString)
    spark.read.format("xml").option("rowTag", "order").schema(o.schema)
      .load(staging.toString)
      .filter(col("o_totalprice") > 100000.0)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  val d64Oracle: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM orders
      |WHERE o_totalprice > 100000.0
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- d65
  /** Line-text source: part names staged one-per-line via `write.text`, read
    * back as raw lines, tokenized and counted. The text source is the entry
    * point for every "pile of .txt/.log files" corpus a training pipeline
    * starts from. */
  def d65TextSource(spark: SparkSession, dir: String): DataFrame = {
    val staging = Tables.scratchDir("d65").resolve("text")
    part(spark, dir).select(col("p_name"))
      .coalesce(4).write.mode("overwrite").text(staging.toString)
    spark.read.text(staging.toString)
      .select(explode(split(col("value"), " ")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("word"))
      .limit(10)
  }

  val d65Oracle: String =
    """SELECT word, COUNT(*) AS cnt
      |FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
      |GROUP BY word
      |ORDER BY cnt DESC, word
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- d66
  /** Binary-file source (the multimodal on-ramp: image/audio/video blobs are
    * opaque bytes + metadata): document texts staged as one `.bin` file
    * each, scanned via `binaryFile`, identified from the file name, and
    * fingerprinted (md5 + byte length) — all computable by the oracle from
    * the original strings. Staging writes driver-side: it fabricates the
    * blob store that production would already have. */
  def d66BinarySource(spark: SparkSession, dir: String): DataFrame = {
    val staging = Tables.scratchDir("d66").resolve("blobs")
    Files.createDirectories(staging)
    documents(spark, dir).select(col("doc_id"), col("text"))
      .filter(col("doc_id") < 40)
      .collect()
      .foreach { r =>
        Files.write(staging.resolve(s"${r.getLong(0)}.bin"),
          r.getString(1).getBytes(StandardCharsets.UTF_8))
      }
    spark.read.format("binaryFile").load(staging.toString)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.bin$", 1).cast("long").as("doc_id"),
        length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("digest"))
      .orderBy("doc_id")
  }

  val d66Oracle: String =
    """SELECT doc_id,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |  md5(text) AS digest
      |FROM documents
      |WHERE doc_id < 40
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d67
  /** VARIANT semi-structured type (Spark 4): JSON events parsed once into
    * the binary variant encoding, then field- and array-path extraction with
    * typed casts. At scale this is the schema-on-read path for heterogeneous
    * event payloads — parse once, extract many, no per-query string
    * re-parsing. */
  def d67Variant(spark: SparkSession, dir: String): DataFrame = {
    val js = events(spark, dir)
      .select(to_json(struct(
        col("event_type").as("et"),
        col("value").as("v"),
        array(col("value"), col("value") * 2).as("arr"))).as("js"))
    js.select(parse_json(col("js")).as("v"))
      .select(
        variant_get(col("v"), "$.et", "string").as("event_type"),
        variant_get(col("v"), "$.v", "double").as("value"),
        variant_get(col("v"), "$.arr[1]", "double").as("value2x"),
        try_variant_get(col("v"), "$.missing", "string").as("absent"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        moneySum(col("value")).as("sum_value"),
        moneySum(col("value2x")).as("sum_value2x"),
        count(col("absent")).as("n_absent"))
      .orderBy("event_type")
  }

  val d67Oracle: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
      |  CAST(SUM(CAST(value * 2 AS DECIMAL(18,4))) AS DOUBLE) AS sum_value2x,
      |  CAST(0 AS BIGINT) AS n_absent
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- d68
  /** Mergeable DataSketches cardinality (Apache DataSketches HLL + Theta,
    * native in Spark 4): per-key user cardinality estimates plus an
    * `__all__` row built by UNIONING the per-key sketches — the property
    * that makes sketches the 100 TB path (partial sketches merge across
    * partitions/days/reruns in constant memory; exact distinct re-shuffles
    * everything). Both sketch types are order-independent and therefore
    * deterministic, but not DuckDB-expressible — rows-only driver check,
    * with relative-error bounds vs exact asserted in `FormatQueriesSpec`. */
  def d68Sketches(spark: SparkSession, dir: String): DataFrame = {
    val perType = events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        expr("hll_sketch_agg(user_id)").as("hll"),
        expr("theta_sketch_agg(user_id)").as("theta"))
    val all = perType.agg(
      sum(col("n_events")).as("n_events"),
      expr("hll_union_agg(hll)").as("hll"),
      expr("theta_union_agg(theta)").as("theta"))
      .select(lit("__all__").as("event_type"), col("n_events"), col("hll"), col("theta"))
    perType.unionByName(all)
      .select(col("event_type"), col("n_events"),
        expr("hll_sketch_estimate(hll)").as("approx_users_hll"),
        expr("theta_sketch_estimate(theta)").as("approx_users_theta"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- d93
  /** `variant_explode` table function: an open-schema variant object fanned
    * out into (pos, key, value) rows — the discovery path for heterogeneous
    * payloads (d67 extracts KNOWN paths; this enumerates whatever is there).
    * Values come back typed through try_variant_get per key; doubles are
    * extracted as doubles (never rendered to JSON text, whose float
    * formatting is engine-specific). */
  def d93VariantExplode(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir)
      .select(col("event_id"), to_json(struct(
        col("event_type").as("et"),
        col("value").as("v")),
        // keep null fields: the default silently DROPS a null key, which
        // would emit one variant_explode row where the oracle emits two
        Map("ignoreNullFields" -> "false")).as("js"))
      .createOrReplaceTempView("v_events_d93")
    spark.sql(
      """SELECT event_id, CAST(pos AS BIGINT) AS pos, key,
        |  CASE WHEN key = 'et' THEN try_variant_get(value, '$', 'string') END AS sval,
        |  CASE WHEN key = 'v' THEN try_variant_get(value, '$', 'double') END AS dval
        |FROM v_events_d93,
        |LATERAL variant_explode(parse_json(js))
        |ORDER BY event_id, pos""".stripMargin)
  }

  val d93Oracle: String =
    """SELECT event_id, CAST(0 AS BIGINT) AS pos, 'et' AS key, event_type AS sval,
      |  CAST(NULL AS DOUBLE) AS dval
      |FROM events
      |UNION ALL
      |SELECT event_id, CAST(1 AS BIGINT), 'v', NULL, value FROM events
      |ORDER BY event_id, pos""".stripMargin

  // ---------------------------------------------------------------- registry

  val queries: Map[String, QueryFn] = Map(
    "d64_xml_source" -> (d64XmlSource _),
    "d65_text_source" -> (d65TextSource _),
    "d66_binary_source" -> (d66BinarySource _),
    "d67_variant" -> (d67Variant _),
    "d68_sketches" -> (d68Sketches _),
    "d93_variant_explode" -> (d93VariantExplode _),
  )

  val oracles: Map[String, String] = Map(
    "d64_xml_source" -> d64Oracle,
    "d65_text_source" -> d65Oracle,
    "d66_binary_source" -> d66Oracle,
    "d67_variant" -> d67Oracle,
    "d93_variant_explode" -> d93Oracle,
  )
}
