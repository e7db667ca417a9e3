package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/**
 * MERGE-style upsert as a declarative composition — the batch semantics of
 * the reference sink's Delta MERGE surface (matched → update with the new
 * row, not matched → insert), expressed as
 * `updates ∪ (base ⟕anti updates on key)`.
 *
 * Scale shape: one shuffle (or none: the anti join broadcasts when the
 * updates batch is small, the overwhelmingly common case for incremental
 * upserts into a large base). The result is a full new snapshot — pair with
 * [[graft.sources.VersionedTable.commit]] to make it a versioned table
 * rewrite, or partition-overwrite only the affected partitions at scale.
 */
object Upsert {

  /** `base` with every key present in `updates` replaced by the update row
    * and every new key appended. Key must be unique in both inputs. */
  def upsert(base: DataFrame, updates: DataFrame, key: String,
             broadcastUpdates: Boolean = true): DataFrame = {
    val keys = updates.select(key)
    val u = if (broadcastUpdates) broadcast(keys) else keys
    updates.unionByName(base.join(u, Seq(key), "left_anti"))
  }
}
