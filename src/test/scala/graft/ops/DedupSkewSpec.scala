package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.queries.Tables

/**
 * Skew resilience of the banded candidate joins (n02/n26): a pathological
 * band bucket — here 10% of the corpus carrying IDENTICAL text, so all 16
 * of their band hashes collide into one bucket each — adds a quadratic
 * candidate blowup (C(50,2)=1225 pairs from 50 planted docs) that no
 * shuffle partitioning can reduce. The `maxBandBucket` cap drops such
 * buckets before the self-join; the planted clones are exactly what n01
 * exact dedup collapses upstream, and every pair NOT involving the plant
 * must survive the cap untouched.
 */
class DedupSkewSpec extends AnyFunSuite {
  lazy val spark = T.spark

  private val PlantN = 50
  private lazy val base = Tables.documents(spark, T.sf0001)
    .select("doc_id", "text")
  private lazy val planted = {
    val clone = spark.range(PlantN)
      .select((col("id") + 900000L).as("doc_id"),
        lit("the quick brown fox jumps over the lazy dog again and again").as("text"))
    base.unionByName(clone)
  }

  test("a planted hot bucket blows up the uncapped candidate space") {
    val uncapped = Dedup.minHashNearDupPairs(planted).count()
    val baseline = Dedup.minHashNearDupPairs(base).count()
    assert(uncapped >= baseline + PlantN.toLong * (PlantN - 1) / 2,
      s"uncapped=$uncapped baseline=$baseline")
  }

  test("maxBandBucket drops only the hot bucket; all other pairs survive") {
    val baseline = Dedup.minHashNearDupPairs(base)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.minHashNearDupPairs(planted, maxBandBucket = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == baseline,
      s"capped minus baseline: ${capped.diff(baseline).take(5)}; " +
        s"baseline minus capped: ${baseline.diff(capped).take(5)}")
  }

  test("embedding band cap: planted identical vectors are dropped, others kept") {
    val emb = Tables.embeddings(spark, T.sf0001)
    // 10% of vectors replaced by copies of vector 0: every band of every
    // copy collides into one bucket per band
    val clones = emb.filter(col("vec_id") === 0L).select("embedding")
      .crossJoin(spark.range(PlantN).select((col("id") + 900000L).as("vec_id")))
      .select(col("vec_id"), col("embedding"),
        lit(0).as("label"))
    val plantedEmb = emb.unionByName(clones.select("vec_id", "embedding", "label"))
    val baseline = Dedup.embeddingLshNearDupPairs(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.embeddingLshNearDupPairs(plantedEmb, maxBandBucket = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // no pair among the 50 identical planted clones survives the cap (all
    // their bands land in the same hot bucket); the internal +1e6 planted
    // copies of the clones are NEAR-identical, scatter across low-occupancy
    // neighbor buckets, and may legitimately pair up — the cap bounds
    // bucket size, it is not an id blacklist
    assert(!capped.exists { case (a, b) =>
      a >= 900000L && a < 1000000L && b >= 900000L && b < 1000000L })
    // every baseline pair not involving the cloned vector 0 is retained
    val untouched = baseline.filterNot { case (a, b) => a == 0L || b == 0L }
    assert(untouched.subsetOf(capped), s"lost: ${untouched.diff(capped).take(5)}")
  }
}
