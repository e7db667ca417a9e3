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

  test("column pruning reaches the scan (BatchScan output excludes unused columns)") {
    val plan = seq(0, 100).select("id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"), plan)
    Seq("sq", "label", "val", "ts").foreach(c =>
      assert(!plan.contains(c), s"unpruned column $c in:\n$plan"))
  }

  test("mixed-type columns derive exactly from the sequence position") {
    // the round-11 schema: label/val/ts are deterministic functions of id
    // (the d97/d98 oracle rebuilds them in DuckDB from range() alone)
    val rows = seq(0, 100).orderBy("id").collect()
    rows.foreach { r =>
      val i = r.getLong(0)
      assert(r.getString(2) == s"r${i % 1000}", s"label at $i")
      assert(r.getDouble(3) == i / 64.0, s"val at $i")
      assert(r.getTimestamp(4).getTime == 1767225600000L + i * 1000L,
        s"ts at $i: ${r.getTimestamp(4)}")
    }
  }

  test("empty range and count-only projection") {
    assert(seq(7, 7).count() == 0)
    assert(seq(0, 12345).count() == 12345)
  }

  test("negative ranges: label follows plain % (dividend sign), as documented") {
    // round-11 advice: remainderUnsigned diverged from the scaladoc'd
    // id % 1000 for negative ids; pin the plain-% semantics (sign follows
    // the dividend, matching DuckDB's %)
    val rows = seq(-1500, -1490).orderBy("id").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val i = r.getLong(0)
      assert(r.getString(2) == s"r${i % 1000}", s"label at $i: ${r.getString(2)}")
      assert(r.getLong(1) == i * i, s"sq at $i")
    }
    assert(rows.head.getString(2) == "r-500")
  }

  // ------------------------- MicroBatchStream (round 10, d97) ------------

  private def drain(base: java.nio.file.Path, end: Long,
                    rowsPerBatch: Long): Unit = {
    val q = spark.readStream.format("graft-seq")
      .option("start", "0").option("end", end.toString)
      .option("rowsPerBatch", rowsPerBatch.toString)
      .load()
      .writeStream.format("parquet")
      .option("path", base.resolve("data").toString)
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("streaming drain delivers the exact sequence once, in rowsPerBatch batches") {
    val base = graft.SparkTestSession.tmpDir("seq-stream")
    drain(base, end = 1000, rowsPerBatch = 300)
    val ids = spark.read.parquet(base.resolve("data").toString)
      .collect().map(_.getLong(0))
    assert(ids.length == 1000, s"expected 1000 rows, got ${ids.length}")
    assert(ids.toSet == (0L until 1000L).toSet, "missing or duplicated ids")
    // ceil(1000/300) = 4 committed micro-batches in the offset log
    val commits = java.nio.file.Files.list(base.resolve("ckpt/commits"))
    try {
      import scala.jdk.CollectionConverters._
      val n = commits.iterator().asScala
        .count(p => p.getFileName.toString.forall(_.isDigit))
      assert(n == 4, s"expected 4 micro-batch commits, got $n")
    } finally commits.close()
  }

  test("restart resumes from the committed offset: new rows only, exactly once") {
    val base = graft.SparkTestSession.tmpDir("seq-stream-resume")
    drain(base, end = 500, rowsPerBatch = 250)
    assert(spark.read.parquet(base.resolve("data").toString).count() == 500)
    // the table grows (end moves out); the same checkpoint must resume at
    // offset 500 — deserializeOffset + admission from the committed
    // position, never a re-read of [0, 500)
    drain(base, end = 800, rowsPerBatch = 250)
    val ids = spark.read.parquet(base.resolve("data").toString)
      .collect().map(_.getLong(0))
    assert(ids.length == 800, s"expected 800 rows, got ${ids.length}")
    assert(ids.toSet == (0L until 800L).toSet, "re-delivery or gap on resume")
  }
}
