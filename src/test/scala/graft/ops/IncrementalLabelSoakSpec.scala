package graft.ops

import java.nio.file.Path

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

/**
 * Long-horizon soak of the [[LabelLog]] relabel-log store through ≥10 FULL
 * tiering cycles on both dedup indexes (round-13 verdict #4 — the drift
 * monitor's 500-batch treatment, applied to the label machinery). The
 * corpus soaks in [[IncrementalSoakSpec]] barely exercise the log (their
 * planted clusters are pairs, which never relabel); this one drives the
 * WORST case on purpose: every batch adds one member with a smaller id to
 * the same component, so the component minimum moves — one relabel row —
 * every single batch, and the resolve chain grows one hop per batch until
 * the next full merge folds it.
 *
 * 40 batches, maintenance every batch (the batch-0 pass is a legitimate
 * single-part no-op), maxLevels = 4 ⇒ 39 maintenance passes, full merges
 * at passes 1, 5, …, 37 — ten full tiering cycles.
 * (The builder's longer 80-batch / cadence-2 run of this same harness —
 * deeper chains between folds — passed with flat timings on both indexes;
 * numbers in BASELINE. The suite keeps the cadence-1 variant: same cycle
 * count at half the wall clock.) Asserted
 * each cycle: the fold EMPTIES the log (chain depth re-anchors at zero —
 * without this the chain, and resolve's round count, would grow with
 * stream lifetime instead of batches-since-fold), and between folds the
 * log's row count stays bounded by batches since the fold. Asserted at the
 * end: per-batch wall time stayed flat (late/early < 4× — the loose bound
 * the drift soak uses, tolerating shared-VM noise while catching O(stream)
 * ramps), and the final state equals the closed-form answer.
 */
class IncrementalLabelSoakSpec extends AnyFunSuite with graft.SoakTagged {
  lazy val spark = T.spark

  private val Batches = 40
  private val Cadence = 1
  private val BaseId = 100000L

  private val u = Seq(1.0, 0.5, -0.3, 0.8, -0.6, 0.2, -0.9, 0.4)
  private val text = "the quick brown fox jumps over the lazy dog near the riverbank today"

  /** Drive `Batches` single-row batches of descending ids through
    * `process`, maintaining every `Cadence`; returns per-batch seconds. */
  private def soak(root: Path, process: (DataFrame, Long) => Unit,
                   row: Long => DataFrame, compact: () => Option[Long],
                   logCount: () => Long): Seq[Double] = {
    var passes = 0
    var lastFoldBatch = -1L
    val secs = Seq.newBuilder[Double]
    (0 until Batches).foreach { j =>
      val t0 = System.nanoTime()
      process(row(BaseId - j), j.toLong)
      secs += (System.nanoTime() - t0) / 1e9
      if ((j + 1) % Cadence == 0 && j > 0) {
        // j = 0 is skipped: a single part with no levels is legitimately
        // below compact()'s two-object threshold (a no-op pass)
        passes += 1
        assert(compact().contains(j.toLong))
        if ((passes - 1) % 4 == 0) {
          // FULL merge: the fold must leave the log empty — this is the
          // invariant that bounds resolve's chain depth by
          // batches-since-fold instead of stream lifetime
          assert(logCount() == 0,
            s"relabel log not empty after the full merge at batch $j")
          lastFoldBatch = j.toLong
        } else {
          // delta passes consolidate layout only: the log keeps exactly
          // its post-fold rows — one per relabeling batch since the fold
          val sinceFold = j - lastFoldBatch
          assert(logCount() <= sinceFold,
            s"relabel log (${logCount()}) outgrew batches-since-fold " +
              s"($sinceFold) at batch $j")
        }
      }
    }
    secs.result()
  }

  private def assertFlat(secs: Seq[Double], what: String): Unit = {
    val early = secs.slice(5, 15).sum / 10
    val late = secs.slice(Batches - 10, Batches).sum / 10
    info(f"$what label soak per-batch: early=$early%.3f s late=$late%.3f s " +
      f"(ratio ${late / early}%.2f)")
    assert(late < early * 4,
      f"$what per-batch cost ramped over 10 tiering cycles: " +
        f"early=$early%.3f s late=$late%.3f s")
  }

  test("embed index: 10 tiering cycles of every-batch relabels, flat cost, fold empties the log") {
    import spark.implicits._
    val root = T.tmpDir("label-soak-embed").resolve("state")
    val index = new IncrementalEmbedIndex(root, geometry = (8, 4))
    val secs = soak(root,
      (df, j) => index.processBatch(df, j),
      id => Seq((id, u)).toDF("vec_id", "embedding"),
      () => index.compact(spark),
      () => index.debugRead(spark, "relabel", Long.MaxValue).count())
    assertFlat(secs, "embed")
    val minId = BaseId - (Batches - 1)
    val got = index.finalClusters(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val expected = (0 until Batches)
      .map(j => (BaseId - j, minId, BaseId - j == minId)).toSet
    assert(got == expected, "soaked clusters diverged from the closed form")
  }

  test("text index: 10 tiering cycles of every-batch relabels, flat cost, fold empties the log") {
    import spark.implicits._
    val root = T.tmpDir("label-soak-text").resolve("state")
    val index = new IncrementalDedupIndex(root)
    val secs = soak(root,
      (df, j) => index.processBatch(df, j),
      id => Seq((id, "s", text)).toDF("doc_id", "source", "text"),
      () => index.compact(spark),
      () => index.debugRead(spark, "relabel", Long.MaxValue).count())
    assertFlat(secs, "text")
    // identical texts: the min doc keeps itself, every other doc is an
    // exact dup pointing at it (fp precedence over near_dup in the CASE)
    val minId = BaseId - (Batches - 1)
    val got = index.finalManifest(spark).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet
    val expected = (0 until Batches).map { j =>
      val id = BaseId - j
      if (id == minId) (id, "keep", id) else (id, "exact_dup", minId)
    }.toSet
    assert(got == expected, "soaked manifest diverged from the closed form")
  }
}
