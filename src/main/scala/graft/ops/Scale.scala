package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Scale utilities: the partitioning patterns that keep the engine's plans
 * healthy at 100 TB — skew-salted joins, co-located bucketed joins, and
 * per-key top-k that never materializes a global sort.
 *
 * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
 * default in the sessions this library builds) covers sort-merge joins
 * automatically; [[saltedJoin]] is the explicit form for when the skew is
 * known up front or the join shape AQE won't split (e.g. broadcast-disabled
 * environments, or aggregations keyed on the skewed column).
 */
object Scale {

  /**
   * Equi-join `fact ⋈ dim` on `key`, salted to defeat key skew: each fact
   * row picks one of `buckets` salt values (deterministically, from a hash
   * of the row's key and position), while the dim side is replicated into
   * all `buckets` values — so a hot key's rows spread over `buckets`
   * reducers instead of one. Result equals the unsalted join exactly.
   *
   * Only fact-preserving join types are accepted: for right/full-outer the
   * replicated dim side would emit each unmatched dim row `buckets` times,
   * so those types are rejected up front.
   */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int = 16, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports inner/left/semi/anti join types only, got '$joinType': " +
        "the salted dim replication would duplicate unmatched dim rows for " +
        "right/full outer joins")
    // collision-free working column: a fixed "_salt" would silently overwrite
    // (and then drop) a user column of that name
    val salt = s"__graft_salt_${java.util.UUID.randomUUID().toString.take(8)}"
    val saltedFact = fact.withColumn(salt,
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(buckets.toLong)).cast("int"))
    val explodedDim = dim.withColumn(salt,
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(explodedDim, Seq(key, salt), joinType).drop(salt)
  }

  /**
   * Per-key top-k via ranking window: shuffles once on `keys`, sorts within
   * partitions only — no global sort, no driver collection. The shape that
   * replaces `orderBy.limit` when the limit is per group.
   */
  def topKPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }
}
