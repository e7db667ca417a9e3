package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Tables._

/**
 * Composed corpus-pipeline operators: the stages the rest of `graft.ops`
 * provides individually, chained the way a production training-data run
 * chains them. The value demonstrated here is composition — each stage is
 * a declarative frame handed to the next, so Catalyst fuses the chain into
 * one plan (filters reach the scan, the dedup shuffle is the only wide
 * exchange) rather than materializing stage boundaries the way an
 * imperative pipeline would.
 */
object Pipeline {

  // --------------------------------------------- n32 host canonicalization
  /**
   * Keep-best-per-host canonicalization: the URL-level dedup pass that
   * follows crawl ingestion — among a host's documents, keep the one with
   * the highest lexical diversity (type-token ratio), tie-broken by lowest
   * doc_id. One window argmax per host; the host key comes from the same
   * synthetic URL construction as n24.
   *
   * Scale shape: a single shuffle on host for the window rank —
   * per-host groups are crawl-shard sized, never corpus sized. The score
   * is a BIGINT ratio evaluated identically in both engines (one correctly
   * rounded division; no float accumulation).
   */
  def hostCanonicalQuery(spark: SparkSession, dir: String): DataFrame = {
    val ws = split(lower(col("text")), "\\s+")
    val scored = documents(spark, dir)
      .select(col("doc_id"), Corpus.hostCol.as("host"),
        size(ws).cast("long").as("n_words"),
        size(array_distinct(ws)).cast("long").as("n_distinct"))
      .select(col("doc_id"), col("host"), col("n_words"), col("n_distinct"),
        (col("n_distinct").cast("double") / col("n_words")).as("ttr"))
    val w = Window.partitionBy("host")
      .orderBy(col("ttr").desc, col("doc_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("host"), col("doc_id"), col("n_words"), col("n_distinct"), col("ttr"))
      .orderBy("host")
  }

  val hostCanonicalOracle: String =
    """WITH s AS (
      |  SELECT doc_id,
      |    source || '.example-' || lang || '.com' AS host,
      |    CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n_words,
      |    CAST(len(list_distinct(string_split_regex(lower(text), '\s+'))) AS BIGINT) AS n_distinct
      |  FROM documents
      |), r AS (
      |  SELECT host, doc_id, n_words, n_distinct,
      |    CAST(n_distinct AS DOUBLE) / n_words AS ttr,
      |    row_number() OVER (PARTITION BY host
      |                       ORDER BY CAST(n_distinct AS DOUBLE) / n_words DESC, doc_id ASC) AS rk
      |  FROM s
      |)
      |SELECT host, doc_id, n_words, n_distinct, ttr
      |FROM r WHERE rk = 1
      |ORDER BY host""".stripMargin

  // --------------------------------------------------- n62 per-domain quota
  /**
   * Per-domain quota enforcement — the crawl-balancing pass that keeps a
   * corpus from being dominated by its largest hosts (the quota n24's
   * per-domain aggregation exists to inform): every host keeps its
   * `perHost` best documents by the n09 quality score (ties to the lowest
   * doc_id), everything past the quota is dropped.
   *
   * Scale shape: scoring is map-side arithmetic; the quota cut runs on the
   * custom [[graft.plans.TopKPerKey]] whole-operator — a bounded per-host
   * heap on each input partition means at most `perHost` rows per (host,
   * partition) reach the shuffle, so the exchange carries ~quota-sized
   * groups even when one host owns half the crawl, and no partition is
   * ever sorted (Spark's own `WindowGroupLimit` rewrite bounds the
   * window-rank plan's exchange too, but full-sorts every input
   * partition first — measured ×2.8 slower at 20M skewed rows,
   * `ProbeQuotaSkew`/BASELINE). The trailing rank is a window over the
   * already-capped n_hosts·perHost rows, not the corpus.
   *
   * The quota key is the SHARED extracted host ([[Corpus.hostCol]]:
   * `parse_url` over the corpus URL — the n24/n32 expression), so the
   * operator composes with the extraction chain it governs instead of
   * fabricating its own key (round-14 verdict #6).
   */
  def domainCapQuery(spark: SparkSession, dir: String,
                     perHost: Int = 10): DataFrame = {
    val scored = documents(spark, dir)
      .select(col("doc_id"), Corpus.hostCol.as("host"),
        TextAnalysis.qualityScoreCol(col("text")).as("quality_score"))
    val top = graft.plans.TopKPerKey(scored, Seq(col("host")),
      Seq(col("quality_score").desc, col("doc_id")), perHost)
    top
      .withColumn("rank", row_number().over(Window.partitionBy("host")
        .orderBy(col("quality_score").desc, col("doc_id"))).cast("long"))
      .select(col("host"), col("rank"), col("doc_id"), col("quality_score"))
      .orderBy("host", "rank")
  }

  /** The n09 score arithmetic (bit-identical doubles), a row_number cut
    * per host, quota = 10. */
  val domainCapOracle: String =
    s"""WITH c AS (
       |  SELECT doc_id,
       |    source || '.example-' || lang || '.com' AS host,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n_words,
       |    CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
       |          w -> w IN (${TextAnalysis.qualityStopwords.map(w => s"'$w'").mkString(", ")}))) AS BIGINT) AS n_stopwords,
       |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS alpha_cnt
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, host,
       |    least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.25
       |      + (CAST(n_stopwords AS DOUBLE) / n_words) * 0.25
       |      + (CAST(alpha_cnt AS DOUBLE) / n_chars) * 0.25
       |      + least((CAST(alpha_cnt AS DOUBLE) / n_words) / 8.0, 1.0) * 0.25 AS quality_score
       |  FROM c
       |), r AS (
       |  SELECT host, doc_id, quality_score,
       |    CAST(row_number() OVER (PARTITION BY host
       |                            ORDER BY quality_score DESC, doc_id) AS BIGINT) AS rank
       |  FROM s
       |)
       |SELECT host, rank, doc_id, quality_score
       |FROM r WHERE rank <= 10
       |ORDER BY host, rank""".stripMargin

  // ----------------------------------------------------- n64 split leakage
  /**
   * Train/test split-leakage detection — the decontamination check a
   * training pipeline runs AFTER splitting: a test/validation document
   * with a near-duplicate in train is leaked evaluation data (the n20/n44
   * benchmark-contamination concern, turned inward on the corpus's own
   * split). Composes two hash-matched primitives: the n02 MinHash-banded
   * near-dup pair set (banded candidates, exact-Jaccard verify — never
   * the n² pair space) joined against the n14 hash split on both
   * endpoints, keeping pairs that STRADDLE splits. Both the pair set and
   * the split rule are the shared implementations (`minHashNearDupPairs`,
   * `Sampling.splitCol`), so this query cannot drift from n02/n14.
   *
   * Scale shape: the pair set is the n02 plan unchanged (its shuffle
   * story is n02's); the split labels are map-side md5 arithmetic on the
   * two id columns of the already-bounded pair stream — the straddle
   * check adds NO new wide dependency.
   */
  def splitLeakageQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir)
    Dedup.minHashNearDupPairs(docs)
      .select(col("doc_a"), Sampling.splitCol(col("doc_a")).as("split_a"),
        col("doc_b"), Sampling.splitCol(col("doc_b")).as("split_b"),
        col("jaccard"))
      .filter(col("split_a") =!= col("split_b"))
      .orderBy("doc_a", "doc_b")
  }

  /** The n02 exact-Jaccard pair SQL with the n14 split CASE applied to
    * both endpoints and a straddle filter. */
  val splitLeakageOracle: String =
    """WITH w AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS ws FROM documents
      |), sh AS (
      |  SELECT doc_id,
      |    list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |                   for i in range(1, len(ws) - 1)]) AS shingles
      |  FROM w WHERE len(ws) >= 3
      |), ex AS (
      |  SELECT doc_id, unnest(shingles) AS sh FROM sh
      |), common AS (
      |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS n_common
      |  FROM ex x JOIN ex y USING (sh)
      |  WHERE x.doc_id < y.doc_id
      |  GROUP BY 1, 2
      |), sz AS (SELECT doc_id, len(shingles) AS sz FROM sh
      |), p AS (
      |  SELECT doc_a, doc_b,
      |    CAST(n_common AS DOUBLE) / (a.sz + b.sz - n_common) AS jaccard
      |  FROM common
      |  JOIN sz a ON a.doc_id = doc_a
      |  JOIN sz b ON b.doc_id = doc_b
      |  WHERE CAST(n_common AS DOUBLE) / (a.sz + b.sz - n_common) >= 0.8
      |), s AS (
      |  SELECT doc_id,
      |    CASE WHEN b < 80 THEN 'train'
      |         WHEN b < 90 THEN 'validation'
      |         ELSE 'test' END AS split
      |  FROM (SELECT doc_id,
      |          CAST(('0x' || substring(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 8))
      |               AS UBIGINT) % 100 AS b
      |        FROM documents)
      |)
      |SELECT p.doc_a, sa.split AS split_a, p.doc_b, sb.split AS split_b, p.jaccard
      |FROM p
      |JOIN s sa ON sa.doc_id = p.doc_a
      |JOIN s sb ON sb.doc_id = p.doc_b
      |WHERE sa.split <> sb.split
      |ORDER BY p.doc_a, p.doc_b""".stripMargin

  // ------------------------------------------------ n33 end-to-end pipeline
  /**
   * The composed pipeline: exact dedup (keep the lowest doc_id per md5
   * fingerprint) → quality gate (≥ 20 words, mean word length < 12) →
   * deterministic md5-bucket train/val/test split → per-(source, split)
   * document and token counts. Four stages, one Catalyst plan: the dedup
   * window shuffle on the constant-width fingerprint is the only exchange
   * over full documents; the quality gate and split predicate are map-side;
   * the final aggregate carries only counters.
   *
   * At 100 TB each stage keeps its individual operator's shape (n01's
   * fingerprint shuffle, n09's map-side scoring, n14's hash split) — the
   * chain adds no new wide dependency beyond its stages.
   */
  def pipelineQuery(spark: SparkSession, dir: String): DataFrame = {
    val ws = split(lower(col("text")), "\\s+")
    val base = documents(spark, dir)
      .select(col("doc_id"), col("source"), md5(col("text")).as("fp"),
        size(ws).cast("long").as("n_words"), col("n_chars"))
    // stage 1: exact dedup, keep lowest doc_id per fingerprint
    val dedupW = Window.partitionBy("fp").orderBy("doc_id")
    val deduped = base.withColumn("rk", row_number().over(dedupW))
      .filter(col("rk") === 1).drop("rk", "fp")
    // stage 2: quality gate — integer predicate (chars < 12·words), exact
    val quality = deduped.filter(col("n_words") >= 20 &&
      col("n_chars") < col("n_words") * 12)
    // stage 3: deterministic split (the n14 primitive)
    val b = Sampling.hashBucket(col("doc_id"))
    val split3 = quality.withColumn("split",
      when(b < 80, "train").when(b < 90, "validation").otherwise("test"))
    // stage 4: shard manifest
    split3.groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_tokens"))
      .orderBy("source", "split")
  }

  val pipelineOracle: String =
    """WITH base AS (
      |  SELECT doc_id, source, md5(text) AS fp,
      |    CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n_words,
      |    n_chars
      |  FROM documents
      |), dd AS (
      |  SELECT * FROM (
      |    SELECT doc_id, source, n_words, n_chars,
      |      row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rk
      |    FROM base) WHERE rk = 1
      |), q AS (
      |  SELECT * FROM dd WHERE n_words >= 20 AND n_chars < n_words * 12
      |), s AS (
      |  SELECT *, CAST(('0x' || substring(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 8))
      |                 AS UBIGINT) % 100 AS b
      |  FROM q
      |)
      |SELECT source,
      |  CASE WHEN b < 80 THEN 'train'
      |       WHEN b < 90 THEN 'validation'
      |       ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_words) AS BIGINT) AS n_tokens
      |FROM s
      |GROUP BY 1, 2
      |ORDER BY source, split""".stripMargin
}
