package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data-quality checks ported from the reference's E2E verification pattern
 * (`/root/reference/tests/test_delta_end_to_end.py:94-107`, canonized in its
 * `docs/overview.md:318-341`): row count plus a per-column non-null
 * fingerprint — `sum(when(col.isNotNull, 1).otherwise(0))` for every column
 * in one aggregation pass — asserting the pipeline landed real, populated
 * data rather than an empty-but-present sink.
 */
object DataQuality {

  /** Per-column non-null counts, computed in a single pass. */
  def nonNullFingerprint(df: DataFrame): Map[String, Long] = {
    val row = df.select(df.columns.toSeq.map(c =>
      sum(when(col(c).isNotNull, 1L).otherwise(0L)).as(c)): _*).head()
    df.columns.zipWithIndex.map { case (c, i) =>
      c -> (if (row.isNullAt(i)) 0L else row.getLong(i))
    }.toMap
  }

  /** The reference's E2E gate: rows exist, and the summed fingerprint
    * strictly exceeds the row count (i.e. more than one populated column). */
  def passesE2EGate(df: DataFrame): Boolean = {
    val rows = df.count()
    rows > 0 && nonNullFingerprint(df).values.sum > rows
  }
}
