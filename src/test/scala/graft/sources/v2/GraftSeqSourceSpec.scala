package graft.sources.v2

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

class GraftSeqSourceSpec extends AnyFunSuite {
  lazy val spark = T.spark

  private def seq(start: Long, end: Long) =
    spark.read.format("graft-seq")
      .option("start", start.toString).option("end", end.toString).load()

  test("produces the exact sequence across partition boundaries") {
    val rows = seq(5, 105).collect()
    assert(rows.length == 100)
    assert(rows.map(_.getLong(0)).sorted.toSeq == (5L until 105L).toSeq)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(0) * r.getLong(0)))
  }

  test("splits into the configured number of input partitions") {
    assert(seq(0, 1000).rdd.getNumPartitions == 8)
    val n3 = spark.read.format("graft-seq")
      .option("start", "0").option("end", "10").option("numPartitions", "3")
      .load()
    assert(n3.rdd.getNumPartitions == 3)
    assert(n3.count() == 10)
  }

  test("column pruning reaches the scan (BatchScan output excludes sq)") {
    val plan = seq(0, 100).select("id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"), plan)
    assert(!plan.contains("sq"), plan)
  }

  test("empty range and count-only projection") {
    assert(seq(7, 7).count() == 0)
    assert(seq(0, 12345).count() == 12345)
  }
}
