package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables._

/** A multimodal record: opaque media bytes plus typed metadata. The binary
  * payload is the engine-level representation for image/audio/video columns —
  * Spark treats it as `BinaryType`, stays out of its way in the row format,
  * and lets per-partition decoders do the modality-specific work. */
final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
                             source: String)

/** Decoded-media metadata (the output of the decode stage). */
final case class DecodedMedia(media_id: Long, kind: String, n_bytes: Long,
                              width: Long, height: Long, n_frames: Long,
                              sample_rate: Long)

/** One sampled video frame: index into the stream plus the byte offset a
  * real demuxer would seek to (stub arithmetic — see [[Multimodal]]). */
final case class SampledFrame(media_id: Long, n_frames: Long,
                              frame_idx: Long, frame_off: Long)

/** Resize-stage output: source dims plus the target box fit. */
final case class ResizedMedia(media_id: Long, kind: String, width: Long,
                              height: Long, out_w: Long, out_h: Long)

/** Feature-extraction output: a fixed-dim embedding per media record. */
final case class MediaFeatures(media_id: Long, kind: String, f0: Double,
                               f1: Double, f2: Double, f3: Double)

/**
 * Multimodal-column plumbing (north-star surface): binary payload columns
 * with typed metadata, decoded/feature-extracted in batched per-partition
 * passes.
 *
 * The decode itself is a clearly-marked DETERMINISTIC STUB — this container
 * has no image/audio codecs, so `decodeStub` derives plausible metadata from
 * the byte length alone. The Spark-side plumbing is real and tested: binary
 * schema, a typed `Dataset[MediaRecord]`, `mapPartitions` with explicit
 * batching (the Scala analogue of an arrow-batched UDF: the decoder sees
 * blocks of records, amortizing any per-call setup such as a codec context),
 * and partition-parallel execution with no driver materialization.
 */
object Multimodal {

  /** Deterministic fake decode — REPLACE with a real codec in production.
    * Metadata is a pure function of (kind, payload length) so the oracle can
    * reproduce it arithmetically. */
  def decodeStub(r: MediaRecord): DecodedMedia = {
    val n = r.payload.length.toLong
    r.kind match {
      case "image" => DecodedMedia(r.media_id, r.kind, n, 320 + n % 320, 240 + n % 240, 1L, 0L)
      case "video" => DecodedMedia(r.media_id, r.kind, n, 320 + n % 320, 240 + n % 240, 1 + n % 100, 0L)
      case _       => DecodedMedia(r.media_id, r.kind, n, 0L, 0L, 0L, 8000 + (n % 3) * 8000)
    }
  }

  /** Documents → media records: the text bytes stand in for a real payload
    * (same schema and code path a binary parquet column would take). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source"))
      .as[MediaRecord]
  }

  /** Batched per-partition decode: groups the partition iterator into blocks
    * of `batchSize` (codec-context amortization), decodes each block. */
  def decodeAll(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder would open one codec context per batch here
        batch.map(decodeStub)
      }
    }
  }

  /**
   * Frame sampling over the video records: up to `maxFrames` evenly-spaced
   * frame indices per video (`idx_i = ⌊i·n_frames/k⌋`), each with the byte
   * offset a demuxer would seek to (`idx · ⌊n_bytes/n_frames⌋` in the stub's
   * fixed-frame-size model). A typed flatMap — the row-explosion plumbing a
   * real frame extractor plugs into; all arithmetic integer and
   * oracle-reproducible.
   */
  def sampleVideoFrames(media: Dataset[MediaRecord],
                        maxFrames: Int = 4): Dataset[SampledFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    decodeAll(media).filter(col("kind") === "video").as[DecodedMedia]
      .flatMap { d =>
        val k = math.min(maxFrames.toLong, d.n_frames)
        val frameBytes = d.n_bytes / d.n_frames
        (0L until k).map { i =>
          val idx = i * d.n_frames / k
          SampledFrame(d.media_id, d.n_frames, idx, idx * frameBytes)
        }
      }
  }

  def frameSampleQuery(spark: SparkSession, dir: String): DataFrame =
    sampleVideoFrames(mediaFromDocuments(documents(spark, dir)))
      .toDF()
      .orderBy("media_id", "frame_idx")

  val frameSampleOracle: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
      |    octet_length(encode(text)) AS n
      |  FROM documents
      |), v AS (
      |  SELECT media_id, n AS n_bytes, 1 + n % 100 AS n_frames,
      |    least(4, 1 + n % 100) AS k
      |  FROM m WHERE kind = 'video'
      |), f AS (
      |  SELECT media_id, n_bytes, n_frames, k,
      |    unnest(range(0, k)) AS i
      |  FROM v
      |)
      |SELECT media_id, CAST(n_frames AS BIGINT) AS n_frames,
      |  CAST((i * n_frames) // k AS BIGINT) AS frame_idx,
      |  CAST(((i * n_frames) // k) * (n_bytes // n_frames) AS BIGINT) AS frame_off
      |FROM f
      |ORDER BY media_id, frame_idx""".stripMargin

  /**
   * Resize stage (n54): every visual record mapped to its target-box fit —
   * longest side scaled to `box`, aspect preserved, integer floor
   * arithmetic (`out_w = w·box / max(w, h)`), so both engines agree
   * exactly. A real resampler replaces the body of the map; the plumbing
   * it plugs into — typed Dataset in, batched per-partition pass, dims
   * from the decode stage, no driver materialization — is the tested
   * part, exactly like [[decodeAll]].
   */
  def resizeAll(media: Dataset[MediaRecord], box: Long = 256L,
                batchSize: Int = 64): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    decodeAll(media, batchSize)
      .filter(col("kind").isin("image", "video")).as[DecodedMedia]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real implementation opens one resampler context per batch
          batch.map { d =>
            val longest = math.max(d.width, d.height)
            ResizedMedia(d.media_id, d.kind, d.width, d.height,
              d.width * box / longest, d.height * box / longest)
          }
        }
      }
  }

  def resizeQuery(spark: SparkSession, dir: String): DataFrame =
    resizeAll(mediaFromDocuments(documents(spark, dir)))
      .toDF().orderBy("media_id")

  /** The decode-stub dims plus the integer box fit. */
  val resizeOracle: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
      |    octet_length(encode(text)) AS n
      |  FROM documents
      |), d AS (
      |  SELECT media_id, kind, 320 + n % 320 AS width, 240 + n % 240 AS height
      |  FROM m WHERE kind IN ('image', 'video')
      |)
      |SELECT media_id, kind,
      |  CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
      |  CAST(width * 256 // greatest(width, height) AS BIGINT) AS out_w,
      |  CAST(height * 256 // greatest(width, height) AS BIGINT) AS out_h
      |FROM d
      |ORDER BY media_id""".stripMargin

  /**
   * Feature-extraction stage (n55): a fixed-dim embedding per media
   * record, batched per partition — the mapPartitions shape a real vision/
   * audio encoder plugs into (one model session per batch, fixed-width
   * array out). The stub "model" derives each of the 4 features from an
   * 8-hex-char chunk of the payload's md5 via the exact power-of-two map
   * to [-1, 1) (the n06/n07 construction), so the DuckDB oracle rebuilds
   * the identical doubles from md5 digit arithmetic alone.
   */
  def featureExtract(media: Dataset[MediaRecord],
                     batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // one digest instance per partition: the "model session" the batch
      // loop would reuse in a real encoder
      val md = java.security.MessageDigest.getInstance("MD5")
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val hex = md.digest(r.payload).map(b => f"$b%02x").mkString
          def f(c: Int): Double =
            java.lang.Long.parseLong(hex.substring(c * 8, c * 8 + 8), 16)
              .toDouble / 2147483648.0 - 1.0
          MediaFeatures(r.media_id, r.kind, f(0), f(1), f(2), f(3))
        }
      }
    }
  }

  def featureQuery(spark: SparkSession, dir: String): DataFrame =
    featureExtract(mediaFromDocuments(documents(spark, dir)))
      .toDF().orderBy("media_id")

  /** md5(payload) = md5(text) (the payload IS the UTF-8 text bytes); each
    * feature from one 8-hex chunk via digit arithmetic and shifts. */
  val featureOracle: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
      |    md5(text) AS h
      |  FROM documents
      |)
      |SELECT media_id, kind,
      |  CAST(list_sum([(strpos('0123456789abcdef', substr(h, 0 * 8 + d + 1, 1)) - 1)
      |    * (1 << (4 * (7 - d))) for d in range(8)]) AS DOUBLE) / 2147483648.0 - 1.0 AS f0,
      |  CAST(list_sum([(strpos('0123456789abcdef', substr(h, 1 * 8 + d + 1, 1)) - 1)
      |    * (1 << (4 * (7 - d))) for d in range(8)]) AS DOUBLE) / 2147483648.0 - 1.0 AS f1,
      |  CAST(list_sum([(strpos('0123456789abcdef', substr(h, 2 * 8 + d + 1, 1)) - 1)
      |    * (1 << (4 * (7 - d))) for d in range(8)]) AS DOUBLE) / 2147483648.0 - 1.0 AS f2,
      |  CAST(list_sum([(strpos('0123456789abcdef', substr(h, 3 * 8 + d + 1, 1)) - 1)
      |    * (1 << (4 * (7 - d))) for d in range(8)]) AS DOUBLE) / 2147483648.0 - 1.0 AS f3
      |FROM m
      |ORDER BY media_id""".stripMargin

  /** Per-kind metadata rollup over the decoded media — the oracle reproduces
    * the stub's arithmetic from octet lengths. */
  def multimodalQuery(spark: SparkSession, dir: String): DataFrame =
    decodeAll(mediaFromDocuments(documents(spark, dir)))
      .groupBy("kind")
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        (sum(col("width")).cast("double") / count(lit(1))).as("avg_width"),
        sum(col("n_frames")).as("total_frames"),
        max(col("sample_rate")).as("max_sample_rate"))
      .orderBy("kind")

  val multimodalOracle: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
      |    octet_length(encode(text)) AS n
      |  FROM documents
      |), d AS (
      |  SELECT media_id, kind, n AS n_bytes,
      |    CASE WHEN kind IN ('image', 'video') THEN 320 + n % 320 ELSE 0 END AS width,
      |    CASE WHEN kind IN ('image', 'video') THEN 240 + n % 240 ELSE 0 END AS height,
      |    CASE WHEN kind = 'image' THEN 1
      |         WHEN kind = 'video' THEN 1 + n % 100 ELSE 0 END AS n_frames,
      |    CASE WHEN kind = 'audio' THEN 8000 + (n % 3) * 8000 ELSE 0 END AS sample_rate
      |  FROM m
      |)
      |SELECT kind,
      |  COUNT(*) AS n_media,
      |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      |  CAST(SUM(width) AS DOUBLE) / COUNT(*) AS avg_width,
      |  CAST(SUM(n_frames) AS BIGINT) AS total_frames,
      |  CAST(MAX(sample_rate) AS BIGINT) AS max_sample_rate
      |FROM d
      |GROUP BY kind
      |ORDER BY kind""".stripMargin
}
