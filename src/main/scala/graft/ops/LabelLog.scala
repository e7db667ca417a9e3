package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The relabel-log label store shared by the incremental dedup indexes
 * (text [[IncrementalDedupIndex]], embeddings/media
 * [[IncrementalEmbedIndex]]) — round-13's structural fix for the last
 * per-batch term that grew with index size.
 *
 * Through round 12 cluster labels lived in a versioned snapshot that every
 * edge-bearing batch read and REWROTE in full: O(label store) per batch,
 * measured at 5.96 → 30.44 s for a trivial trickle batch as the index grew
 * ×1 → ×100 (BASELINE round-13 label-store table). The store is now two
 * append-only part tables under the ordinary state machine:
 *
 *  - `assign` (id, lbl): WRITE-ONCE rows — an id is assigned exactly once,
 *    in the batch whose edge first touches it, with its component minimum
 *    AS OF that batch. Never rewritten by later batches.
 *  - `relabel` (old, new): the per-batch relabel log — one row per
 *    existing label whose component minimum moved in that batch.
 *
 * The current label of an id is its assignment resolved through the
 * relabel log ([[resolve]]). Three facts make the log a plain union-able
 * part table with NO ordering metadata:
 *
 *  1. labels only DECREASE (component minima under merges), so
 *     `new < old` on every log row and chains are acyclic;
 *  2. a retired label never becomes current again (labels are member ids;
 *     a component containing id k can never re-acquire minimum k after
 *     once having a smaller member), so KEYS ARE GLOBALLY UNIQUE across
 *     all batches — the union of the per-batch maps is one function and
 *     application order is irrelevant;
 *  3. an assignment written at batch j is already past every map from
 *     batches i ≤ j (its label is current as of j), and maps from earlier
 *     batches key only labels retired by then — so resolving EVERY
 *     assignment through the WHOLE log is exact.
 *
 * Per-batch cost is now ∝ batch: the endpoint lookup reads the assign
 * table pruned to the endpoints' id-hash buckets, the contraction /
 * min-label clustering is bounded by the batch's edges (unchanged), and
 * the write is the batch's own assignment + relabel rows instead of the
 * whole store. Full merges ([[IncrementalStateMachine.fullMergeContent]])
 * fold the log into the assign level and empty the log level, so the
 * resolve chain length is bounded by batches since the last bin-pack.
 *
 * This is a persisted union-find in LSM clothing: assignments are the
 * nodes' first parents, the relabel log is the path of parent updates,
 * and the full merge is path compression.
 */
private[ops] object LabelLog {

  private[ops] val RelabelDdl = "old BIGINT, new BIGINT"

  /** Resolve rows carrying a `lbl` column through the relabel function
    * `maps0` (old → new) to fixpoint, preserving all other columns.
    * Rounds = longest chain in the log — bounded by batches since the
    * last full merge, in practice 0–2 — and the per-round fixpoint count
    * is the price, so CALLERS should skip the call entirely when the
    * driver already knows the log is empty
    * ([[IncrementalStateMachine.trackedHasData]]). `cur` is referenced
    * once per join, so lineage grows linearly with rounds (no
    * minLabelComponents-style 2^k nesting); a localCheckpoint every 8
    * rounds caps plan depth on pathological chains without paying a
    * per-round materialization job on the common shallow ones. */
  def resolve(assign: DataFrame, maps0: DataFrame): DataFrame = {
    val maps = maps0.select(col("old"), col("new")).persist()
    try {
      if (maps.limit(1).count() == 0) return assign
      val others = assign.columns.filterNot(_ == "lbl").map(col)
      var cur = assign
      var moved = true
      var rounds = 0
      while (moved) {
        rounds += 1
        // chains are acyclic by construction (values strictly decrease);
        // this trips only on store corruption, loudly instead of hanging
        require(rounds <= 100000, "relabel chain did not terminate")
        val step = cur.join(maps, cur("lbl") === maps("old"), "left")
          .select(others :+ coalesce(col("new"), col("lbl")).as("lbl")
            :+ col("new").isNotNull.as("moved"): _*)
        moved = step.filter(col("moved")).limit(1).count() > 0
        cur = step.drop("moved")
        if (rounds % 8 == 0) cur = cur.localCheckpoint(true)
      }
      cur
    } finally maps.unpersist()
  }

  /** The batch's label-store deltas, from its verified edge set (columns
    * `a`, `b`), the distinct endpoint ids (`id`), and the endpoints'
    * CURRENT labels `cur` (`id`, `lbl` — the pruned assign lookup already
    * resolved through the log):
    *
    *  - contract each edge endpoint through its current label (labels are
    *    component minima, so contraction preserves global minima), cluster
    *    the contracted graph — bounded by the batch's edges, never the
    *    corpus — exactly as the snapshot path did;
    *  - NEW ASSIGNMENTS: endpoints with no existing assignment, labeled
    *    with their contracted component's minimum. Every new endpoint
    *    appears in the contracted graph: its partner is either another id
    *    (≠ by pair normalization) or an existing label, and labels are
    *    previously-assigned ids — disjoint from never-assigned ones;
    *  - RELABEL rows: existing labels (mapping nodes that are some current
    *    label — disjoint from new ids, same argument) whose component
    *    minimum moved.
    */
  def deltas(edges: DataFrame, endpoints: DataFrame,
             cur: DataFrame): (DataFrame, DataFrame) = {
    val contracted = edges
      .join(cur.select(col("id").as("a"), col("lbl").as("la0")), Seq("a"), "left")
      .join(cur.select(col("id").as("b"), col("lbl").as("lb0")), Seq("b"), "left")
      .select(coalesce(col("la0"), col("a")).as("la"),
        coalesce(col("lb0"), col("b")).as("lb"))
      .filter(col("la") =!= col("lb"))
    val mapping = Dedup.minLabelComponents(contracted, "la", "lb", "node")
      .select(col("node"), col("cluster_id"))
    val newAssign = endpoints
      .join(cur.select("id"), Seq("id"), "left_anti")
      .join(mapping.select(col("node").as("id"), col("cluster_id").as("lbl")),
        "id")
    val relabel = mapping
      .join(cur.select(col("lbl").as("node")).distinct(), Seq("node"))
      .filter(col("cluster_id") =!= col("node"))
      .select(col("node").as("old"), col("cluster_id").as("new"))
    (newAssign, relabel)
  }
}
