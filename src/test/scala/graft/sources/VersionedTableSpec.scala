package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.queries.Tables

/** Versioned table: commits are ordered, snapshots time-travel, change
  * replay honors (from, to], and uncommitted data is invisible. */
class VersionedTableSpec extends AnyFunSuite {
  lazy val spark = T.spark

  test("commit / snapshot / time travel / change replay") {
    val table = Files.createTempDirectory("graft-vt-").resolve("t").toString
    val o = Tables.orders(spark, T.sf0001)
    val c0 = o.filter(col("o_orderkey") % 3 === 0)
    val c1 = o.filter(col("o_orderkey") % 3 === 1)
    val c2 = o.filter(col("o_orderkey") % 3 === 2)
    assert(VersionedTable.commit(c0, table) == 0L)
    assert(VersionedTable.commit(c1, table) == 1L)
    assert(VersionedTable.commit(c2, table) == 2L)

    assert(VersionedTable.read(spark, table).count() == o.count())
    assert(VersionedTable.read(spark, table, Some(1L)).count() == c0.count() + c1.count())
    assert(VersionedTable.readChanges(spark, table, 0L, 2L).count() ==
      c1.count() + c2.count())
    assert(VersionedTable.readChanges(spark, table, -1L, 0L).count() == c0.count())
    assert(VersionedTable.latestVersion(table).contains(2L))
  }

  test("half-written commits are invisible until the marker lands") {
    val table = Files.createTempDirectory("graft-vt2-").resolve("t").toString
    val o = Tables.orders(spark, T.sf0001).limit(10)
    VersionedTable.commit(o, table)
    // simulate a crashed writer: data dir without a commit marker
    o.write.mode("overwrite").parquet(s"$table/v=1")
    assert(VersionedTable.latestVersion(table).contains(0L))
    assert(VersionedTable.read(spark, table).count() == 10)
  }
}
