package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.queries.Tables

/**
 * Round-10 composition (the round-9 verdict's top item): the media modality
 * end-to-end — wide feature head → shared banded near-dup engine → dedup
 * manifest — mirroring what text (n38) and embeddings (n53) already have.
 *
 * The parity test is the load-bearing one: at the separating 0.9 threshold
 * the media chain's banded pair stage must return EXACTLY the pair set of
 * the exact all-pairs block-grid join over the same feature corpus (the
 * per-pair banding miss bound is ~2e-20 — a difference means the plumbing
 * between the media head and the generic engine broke, not luck).
 */
class MediaDedupSpec extends AnyFunSuite {
  lazy val spark = T.spark

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("vec_a", "vec_b", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("banded media pairs equal the exact block-grid join over the same corpus") {
    val docs = Tables.documents(spark, T.sf0001)
    val feats =
      Multimodal.featureExtractWide(Multimodal.mediaFromDocuments(docs)).toDF()
    val corpus = feats.select(col("media_id").as("vec_id"), col("fv").as("v"))
      .unionByName(Multimodal.plantedMediaCopies(feats))
    val exact = pairSet(Dedup.embeddingNearDupPairs(
      corpus.withColumnRenamed("v", "embedding"), threshold = 0.9))
    val banded = pairSet(Multimodal.mediaNearDupPairs(feats))
    assert(exact.nonEmpty, "planted construction produced no qualifying pairs")
    assert(banded == exact,
      s"banded minus exact: ${banded.diff(exact).take(3)}; " +
        s"exact minus banded: ${exact.diff(banded).take(3)}")
  }

  test("wide features: 64 dims, exact values from salted md5 digit arithmetic") {
    val docs = Tables.documents(spark, T.sf0001).limit(3)
    val feats = Multimodal.featureExtractWide(
      Multimodal.mediaFromDocuments(docs)).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.fv.length == 64)
      assert(f.fv.forall(v => v >= -1.0 && v < 1.0))
    }
    // spot-check one value against an independent digest computation
    val docRow = docs.orderBy("doc_id").select("doc_id", "text").head()
    val f0 = feats.find(_.media_id == docRow.getLong(0)).get.fv(0)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((docRow.getString(1) + "|0").getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val expected =
      java.lang.Long.parseLong(hex.take(8), 16).toDouble / 2147483648.0 - 1.0
    assert(f0 == expected)
  }

  test("manifest: planted variants are near_dups of their source; pointers decrease") {
    val n = Tables.documents(spark, T.sf0001).count()
    val rows = Multimodal.mediaDedupManifestQuery(spark, T.sf0001).collect()
    assert(rows.length == 2 * n, s"expected ${2 * n} manifest rows, got ${rows.length}")
    val (planted, base) = rows.partition(_.getLong(0) >= 1000000L)
    assert(planted.length == n && base.length == n)
    // every planted re-encode variant dedups through the FEATURE engine:
    // unique synthetic fingerprint (never exact_dup), clustered with its
    // source (never keep), pointer at a base-range canonical
    planted.foreach { r =>
      assert(r.getString(2) == "near_dup",
        s"planted ${r.getLong(0)}: verdict ${r.getString(2)}")
      assert(r.getLong(3) < 1000000L,
        s"planted ${r.getLong(0)} points at ${r.getLong(3)}")
    }
    // base rows: keepers point at themselves, losers at a strictly smaller id
    base.foreach { r =>
      if (r.getString(2) == "keep") assert(r.getLong(3) == r.getLong(0))
      else assert(r.getLong(3) < r.getLong(0),
        s"base ${r.getLong(0)} (${r.getString(2)}) points at ${r.getLong(3)}")
    }
    // exact precedence accounting: base exact_dup verdicts are exactly the
    // payload-md5 collisions (n − distinct fingerprints) — identical
    // payloads also collide in EVERY feature band (cosine 1.0), so any
    // miscount here means the precedence CASE broke, not the engine
    val docs = Tables.documents(spark, T.sf0001)
    val expectedExact =
      n - docs.select(md5(encode(col("text"), "UTF-8"))).distinct().count()
    assert(base.count(_.getString(2) == "exact_dup") == expectedExact)
  }

  test("n58 streaming media clusters equal the batch chain's cluster table") {
    // the incremental engine is modality-agnostic: the media feature
    // corpus through IncrementalEmbedIndex must converge to exactly what
    // the batch chain (mediaNearDupPairs -> minLabelComponents) produces
    val streamed = Multimodal.streamingMediaClustersQuery(spark, T.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val feats = Multimodal.featureExtractWide(
      Multimodal.mediaFromDocuments(Tables.documents(spark, T.sf0001))).toDF()
    val batch = Dedup.minLabelComponents(
        Multimodal.mediaNearDupPairs(feats).select("vec_a", "vec_b"),
        "vec_a", "vec_b", "media_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"streamed minus batch: ${streamed.diff(batch).take(3)}; " +
        s"batch minus streamed: ${batch.diff(streamed).take(3)}")
  }
}
