package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.queries.Tables

/** The two-pointer intersect count must agree with the interpreted
  * size(array_intersect(...)) it replaces on the real shingle-hash arrays
  * (sorted-distinct producer contract). */
class SortedIntersectCountSpec extends AnyFunSuite {
  lazy val spark = T.spark

  private def shingleHashes = {
    val sh = graft.ops.Dedup.wordShingles(col("text"))
    Tables.documents(spark, T.sf0001)
      .select(col("doc_id"),
        array_sort(transform(sh, s => xxhash64(s))).as("h"))
      .filter(size(col("h")) > 0)
  }

  test("kernel matches size(array_intersect) on real shingle arrays") {
    val a = shingleHashes.select(col("doc_id").as("da"), col("h").as("ha"))
    val b = shingleHashes.select(col("doc_id").as("db"), col("h").as("hb"))
    // a bounded sample of pairs incl. self-pairs (full overlap) and planted
    // near-dups (high overlap); the modulo keeps the pair count small
    val rows = a.join(b, col("da") % 7 === col("db") % 7)
      .select(col("da"), col("db"),
        SortedIntersectCount(col("ha"), col("hb")).as("fast"),
        size(array_intersect(col("ha"), col("hb"))).cast("long").as("ref"))
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(3),
        s"pair (${r.getLong(0)}, ${r.getLong(1)}): ${r.getLong(2)} != ${r.getLong(3)}")
    }
  }

  test("disjoint, identical, and null inputs") {
    val df = spark.sql(
      """SELECT array(1L, 3L, 5L) AS a, array(2L, 4L, 6L) AS b,
        |       array(1L, 2L, 3L) AS c, CAST(NULL AS ARRAY<BIGINT>) AS nl""".stripMargin)
    val r = df.select(
      SortedIntersectCount(col("a"), col("b")),
      SortedIntersectCount(col("c"), col("c")),
      SortedIntersectCount(col("a"), col("nl"))).head()
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == 3L)
    assert(r.isNullAt(2))
  }
}
