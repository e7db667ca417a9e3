package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Tables._

/**
 * Deterministic sampling and sequence-packing operators for training-data
 * pipelines (north-star surface; complements [[Dedup]]/[[TextAnalysis]]).
 *
 * Both are built on content- or key-hash determinism rather than RNG state:
 * at 100 TB a sample must be reproducible across reruns, partitionings, and
 * engine versions, which `DataFrame.sample`'s per-partition RNG is not. The
 * md5-bucket form is the industry-standard reproducible train/val/test
 * split (hash the key, bucket mod 100).
 */
object Sampling {

  /** Stable [0, 100) bucket from the md5 of a salted key column — the
    * reproducible-split primitive. Pure column program: codegen'd md5 +
    * string slice, no RNG, no shuffle. */
  def hashBucket(key: org.apache.spark.sql.Column, salt: String = "graft:"): org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 8), 16, 10)
      .cast("long") % 100

  /** The n14 80/10/10 split label for a key column — shared with the n64
    * split-leakage check so the split rule cannot drift (the
    * qualityScoreCol treatment). */
  def splitCol(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val b = hashBucket(key)
    when(b < 80, "train").when(b < 90, "validation").otherwise("test")
  }

  /**
   * Deterministic train/validation/test split by key hash: 80/10/10.
   * Filtering to one split is a map-side predicate (no shuffle), so the
   * split composes with partition pruning at any scale.
   */
  def hashSampleQuery(spark: SparkSession, dir: String): DataFrame = {
    documents(spark, dir)
      .select(col("doc_id"), hashBucket(col("doc_id")).as("bucket"),
        splitCol(col("doc_id")).as("split"))
      .orderBy("doc_id")
  }

  val hashSampleOracle: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substring(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 8))
      |         AS UBIGINT) % 100 AS bucket
      |  FROM documents
      |)
      |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
      |  CASE WHEN bucket < 80 THEN 'train'
      |       WHEN bucket < 90 THEN 'validation'
      |       ELSE 'test' END AS split
      |FROM b
      |ORDER BY doc_id""".stripMargin

  /**
   * Greedy contiguous sequence packing: documents are packed in doc_id order
   * into fixed token-budget bins (the LLM pre-training batch-construction
   * op), per source shard. A document opens a new bin when the running token
   * count would cross the budget boundary — expressed as
   * `floor(exclusive_cumsum / budget)`, one window cumsum, no iteration.
   *
   * Packing is per-`source` (PARTITION BY), so the window sort is
   * per-shard, not global — the shape that scales: each shard packs
   * independently on its own executor group.
   */
  def seqPackingQuery(spark: SparkSession, dir: String,
                      budget: Int = 2048): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents(spark, dir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("tokens"))
      .withColumn("cum", sum(col("tokens")).over(w))
      .withColumn("bin",
        floor((col("cum") - col("tokens")) / lit(budget.toDouble)).cast("long"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("sum_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy("source", "bin")
  }

  /**
   * Deterministic stratified downsampling: per-language keep rates applied
   * through the same md5 bucket — the corpus-rebalancing op (downsample the
   * dominant language, keep the rest whole) with full reproducibility. A
   * map-side predicate; rates are a tiny literal map, no shuffle, no RNG.
   */
  def stratifiedSampleQuery(spark: SparkSession, dir: String): DataFrame = {
    val keepPct: Map[String, Int] = Map("en" -> 40) // unlisted langs keep 100%
    val b = hashBucket(col("doc_id"), salt = "strat:")
    val rate = keepPct.foldLeft(lit(100): org.apache.spark.sql.Column) {
      case (acc, (lang, pct)) => when(col("lang") === lang, lit(pct)).otherwise(acc)
    }
    documents(spark, dir)
      .withColumn("bucket", b)
      .filter(col("bucket") < rate)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("lang")
  }

  val stratifiedSampleOracle: String =
    """WITH b AS (
      |  SELECT doc_id, lang,
      |    CAST(('0x' || substring(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 8))
      |         AS UBIGINT) % 100 AS bucket
      |  FROM documents
      |)
      |SELECT lang, COUNT(*) AS n_kept,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM b
      |WHERE bucket < (CASE WHEN lang = 'en' THEN 40 ELSE 100 END)
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  val seqPackingOracle: String =
    """WITH t AS (
      |  SELECT source, doc_id,
      |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS tokens
      |  FROM documents
      |), c AS (
      |  SELECT source, doc_id, tokens,
      |    SUM(tokens) OVER (PARTITION BY source ORDER BY doc_id
      |                      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM t
      |)
      |SELECT source, CAST(FLOOR((cum - tokens) / 2048.0) AS BIGINT) AS bin,
      |  COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS sum_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM c
      |GROUP BY 1, 2
      |ORDER BY source, bin""".stripMargin
}
