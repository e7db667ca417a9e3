package graft.sinks.v2

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

/**
 * The DSv2 streaming-sink commit protocol (round 10, d98): committed
 * manifests are the only visibility flip — orphan data files don't exist
 * to readers, a replayed epoch is skipped (exactly-once under retries),
 * and abort leaves nothing visible.
 */
class GraftFilesSinkSpec extends AnyFunSuite {
  lazy val spark = T.spark
  private val Schema = "id BIGINT, sq BIGINT"
  // the round-11 general-codec surface: every wire type the DataWriter
  // encodes, exercised through the same replay/abort protocol
  private val MixedSchema =
    "id BIGINT, label STRING, val DOUBLE, ts TIMESTAMP"

  private def mixedRow(i: Long): org.apache.spark.sql.catalyst.InternalRow =
    org.apache.spark.sql.catalyst.InternalRow(
      i,
      if (i % 5 == 4) null
      else org.apache.spark.unsafe.types.UTF8String.fromString(
        s"""s$i "quoted"\nline\ttab\\end"""),
      i / 64.0,
      1767225600000000L + i * 1000000L)

  test("streamed rows surface exactly once through epoch manifests") {
    val base = graft.SparkTestSession.tmpDir("files-sink")
    val out = base.resolve("out").toString
    val q = spark.readStream.format("graft-seq")
      .option("start", "0").option("end", "1000").option("rowsPerBatch", "400")
      .load()
      .writeStream.format("graft-files")
      .option("path", out)
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val ids = GraftFilesSink.committed(spark, out, Schema)
      .collect().map(_.getLong(0))
    assert(ids.length == 1000, s"expected 1000 rows, got ${ids.length}")
    assert(ids.toSet == (0L until 1000L).toSet, "missing or duplicated ids")
    // ceil(1000/400) = 3 epoch manifests
    val s = Files.list(Paths.get(out, "commits"))
    try {
      import scala.jdk.CollectionConverters._
      assert(s.iterator().asScala
        .count(_.getFileName.toString.forall(_.isDigit)) == 3)
    } finally s.close()
  }

  test("orphan data files are invisible; replayed epoch commit is skipped") {
    val base = graft.SparkTestSession.tmpDir("files-sink-replay")
    val out = base.resolve("out").toString
    val w = new GraftFilesStreamingWrite(out,
      org.apache.spark.sql.types.StructType.fromDDL(Schema))
    val factory = w.createStreamingWriterFactory(null)
    def writeRows(epoch: Long, lo: Long, hi: Long) = {
      val dw = factory.createWriter(0, 0L, epoch)
      (lo until hi).foreach(i => dw.write(
        org.apache.spark.sql.catalyst.InternalRow(i, i * i)))
      dw.commit()
    }
    // epoch 0 committed with rows [0, 5)
    w.commit(0L, Array(writeRows(0L, 0, 5)))
    assert(GraftFilesSink.committed(spark, out, Schema).count() == 5)

    // an orphan writer (task that died after writing, before any driver
    // commit) leaves a data file no manifest names — invisible
    writeRows(7L, 100, 110)
    assert(GraftFilesSink.committed(spark, out, Schema).count() == 5)

    // a REPLAY of epoch 0 (retry after a crash between sink commit and
    // checkpoint commit) re-writes its rows and re-commits: the first
    // manifest stays authoritative, no duplicates surface
    w.commit(0L, Array(writeRows(0L, 0, 5)))
    val rows = GraftFilesSink.committed(spark, out, Schema)
      .collect().map(_.getLong(0))
    assert(rows.length == 5, s"replayed epoch duplicated rows: ${rows.length}")
    assert(rows.toSet == (0L until 5L).toSet)

    // abort deletes the attempt's files
    val msg = writeRows(9L, 200, 203)
    w.abort(9L, Array(msg))
    assert(GraftFilesSink.committed(spark, out, Schema).count() == 5)
    val dataFiles = Files.list(Paths.get(out, "data"))
    try {
      import scala.jdk.CollectionConverters._
      val names = dataFiles.iterator().asScala.map(_.getFileName.toString).toSeq
      assert(!names.exists(_.startsWith("e9-")), s"aborted file survived: $names")
    } finally dataFiles.close()
  }

  test("general codec round-trips strings/doubles/timestamps/nulls through replay and abort") {
    val base = graft.SparkTestSession.tmpDir("files-sink-mixed")
    val out = base.resolve("out").toString
    val w = new GraftFilesStreamingWrite(out,
      org.apache.spark.sql.types.StructType.fromDDL(MixedSchema))
    val factory = w.createStreamingWriterFactory(null)
    def writeRows(epoch: Long, lo: Long, hi: Long) = {
      val dw = factory.createWriter(0, 0L, epoch)
      (lo until hi).foreach(i => dw.write(mixedRow(i)))
      dw.commit()
    }
    w.commit(0L, Array(writeRows(0L, 0, 10)))
    // replay of epoch 0 is skipped; an aborted epoch leaves nothing
    w.commit(0L, Array(writeRows(0L, 0, 10)))
    w.abort(3L, Array(writeRows(3L, 50, 55)))

    val rows = GraftFilesSink.committed(spark, out, MixedSchema)
      .orderBy("id").collect()
    assert(rows.length == 10, s"expected 10 rows, got ${rows.length}")
    rows.foreach { r =>
      val i = r.getLong(0)
      // string round-trip incl. quotes, escapes, newline, tab — and the
      // null slot every 5th row
      if (i % 5 == 4) assert(r.isNullAt(1), s"row $i: null string lost")
      else assert(r.getString(1) == s"""s$i "quoted"\nline\ttab\\end""",
        s"row $i: string mangled: ${r.getString(1)}")
      // exact double (exponent-shifted, so codec must round-trip bitwise)
      assert(r.getDouble(2) == i / 64.0, s"row $i: double drifted")
      // microsecond-exact timestamp (session UTC)
      assert(r.getTimestamp(3).getTime == 1767225600000L + i * 1000L,
        s"row $i: timestamp drifted: ${r.getTimestamp(3)}")
    }
  }

  test("recursive codec round-trips decimals, arrays, structs and maps") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
    import org.apache.spark.sql.types.Decimal
    import org.apache.spark.unsafe.types.UTF8String

    val base = graft.SparkTestSession.tmpDir("files-sink-nested")
    val out = base.resolve("out").toString
    val NestedSchema = "id BIGINT, dec DECIMAL(16,3), nums ARRAY<BIGINT>, " +
      "strs ARRAY<STRING>, kv STRUCT<k: BIGINT, s: STRING>, m MAP<STRING, BIGINT>"
    val w = new GraftFilesStreamingWrite(out,
      org.apache.spark.sql.types.StructType.fromDDL(NestedSchema))
    val factory = w.createStreamingWriterFactory(null)
    val dw = factory.createWriter(0, 0L, 0L)
    def u(s: String) = UTF8String.fromString(s)
    (0L until 8L).foreach { i =>
      dw.write(InternalRow(
        i,
        Decimal(BigDecimal(i) + BigDecimal("0.125"), 16, 3),
        // a null ELEMENT inside the array every 3rd row
        new GenericArrayData(Array[Any](i, if (i % 3 == 0) null else i * 2)),
        new GenericArrayData(Array[Any](u(s"""a$i "q"\t"""), u(s"b$i"))),
        // a null top-level struct every 4th row
        if (i % 4 == 3) null else InternalRow(i % 5, u(s"s$i\n")),
        new ArrayBasedMapData(
          new GenericArrayData(Array[Any](u("x"), u("y"))),
          new GenericArrayData(Array[Any](i % 7, if (i % 2 == 0) null else i)))))
    }
    w.commit(0L, Array(dw.commit()))

    val rows = GraftFilesSink.committed(spark, out, NestedSchema)
      .orderBy("id").collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val i = r.getLong(0)
      assert(r.getDecimal(1) == new java.math.BigDecimal(s"$i.125"),
        s"row $i: decimal drifted: ${r.getDecimal(1)}")
      val nums = r.getSeq[Any](2)
      assert(nums == Seq(i, if (i % 3 == 0) null else i * 2),
        s"row $i: long array mangled: $nums")
      assert(r.getSeq[String](3) == Seq(s"""a$i "q"\t""", s"b$i"),
        s"row $i: string array mangled")
      if (i % 4 == 3) assert(r.isNullAt(4), s"row $i: null struct lost")
      else {
        val kv = r.getStruct(4)
        assert(kv.getLong(0) == i % 5 && kv.getString(1) == s"s$i\n",
          s"row $i: struct mangled: $kv")
      }
      val m = r.getMap[String, Any](5)
      assert(m == Map("x" -> (i % 7), "y" -> (if (i % 2 == 0) null else i)),
        s"row $i: map mangled: $m")
    }
  }
}
