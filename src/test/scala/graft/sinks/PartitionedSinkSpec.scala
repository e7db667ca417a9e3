package graft.sinks

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.queries.Tables

/**
 * The layout contract of the sinks' `partitionBy`/`clusterBy` application
 * (the reference carried both config-only — `streaming_sink.py:19-20`; the
 * sinks apply them as writer methods):
 *
 *  1. a streaming write with `partitionBy` config produces hive-style
 *     `key=value` directories,
 *  2. a batch read-back over that layout prunes on the partition column at
 *     LISTING time (PartitionFilters, not row-level PushedFilters — the
 *     `PlanShapeSpec` d73 assertion pattern), and
 *  3. the Delta sink shape accepts `clusterBy` and refuses a
 *     partitionBy+clusterBy conflict eagerly at `generate()`, naming the
 *     two config keys (Spark itself would reject the writer only at stream
 *     start, without saying which conf entries collide).
 */
class PartitionedSinkSpec extends AnyFunSuite {
  lazy val spark = T.spark

  test("streaming partitionBy config yields hive layout and listing-time pruning") {
    val base = Tables.scratchDir("psink")
    val out = base.resolve("out")
    val ckpt = base.resolve("ckpt")

    val events = Tables.events(spark, T.sf0001)
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
    val input = base.resolve("input")
    events.write.mode("overwrite").parquet(input.toString)
    val n = events.count()

    spark.conf.set("spark.psink.sink.parquet.options.path", out.toString)
    spark.conf.set("spark.psink.sink.parquet.options.checkpointLocation", ckpt.toString)
    spark.conf.set("spark.psink.sink.parquet.options.partitionBy", "event_type")
    val sink = ParquetStreamingSink(Some("spark.psink.sink"), session = Some(spark))

    val stream = spark.readStream
      .schema(spark.read.parquet(input.toString).schema)
      .parquet(input.toString)
    val query = sink.generate(stream)
      .outputMode("append")
      .queryName("graft:psink")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()

    // 1. hive-style key=value directories, no data files at the root
    import scala.jdk.CollectionConverters._
    val dirs = java.nio.file.Files.list(out).iterator().asScala
      .map(_.getFileName.toString).toList
    val partDirs = dirs.filter(_.startsWith("event_type="))
    assert(partDirs.nonEmpty, s"no event_type= directories under $out: $dirs")
    assert(!dirs.exists(_.endsWith(".parquet")),
      s"data files at the partitioned root: $dirs")

    // 2. content round-trips (partition column restored from the path)
    val back = spark.read.parquet(out.toString)
    assert(back.count() == n)
    assert(back.columns.sorted.toSeq == events.columns.sorted.toSeq)

    // 3. a partition-column predicate prunes at listing time
    val p = back.filter(col("event_type") === "click")
      .queryExecution.executedPlan.toString
    val partFilters = "PartitionFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(p)
    assert(partFilters.isDefined, s"no PartitionFilters list in plan:\n$p")
    assert(partFilters.get.group(1).contains("event_type"), p)
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(p)
    assert(pushed.isDefined, s"no PushedFilters list in plan:\n$p")
    assert(!pushed.get.group(1).contains("event_type"), p)
  }

  test("delta sink applies clusterBy alone, refuses partitionBy+clusterBy eagerly") {
    // writeStream needs a streaming frame; the built-in rate source gives
    // one without any connector jar
    val df = spark.readStream.format("rate").load()

    spark.conf.set("spark.psinkc.sink.delta.options.clusterBy", "value")
    val clustered = DeltaStreamingSink(Some("spark.psinkc.sink"), session = Some(spark))
    // offline there is no Delta connector to start against; the contract
    // here is that generate() builds (clusterBy is applied pre-start)
    assert(clustered.generate(df) != null)

    spark.conf.set("spark.psinkb.sink.delta.options.partitionBy", "timestamp")
    spark.conf.set("spark.psinkb.sink.delta.options.clusterBy", "value")
    val both = DeltaStreamingSink(Some("spark.psinkb.sink"), session = Some(spark))
    val ex = intercept[IllegalArgumentException] { both.generate(df) }
    assert(ex.getMessage.contains("spark.psinkb.sink.delta.options.partitionBy"), ex.getMessage)
    assert(ex.getMessage.contains("spark.psinkb.sink.delta.options.clusterBy"), ex.getMessage)
  }
}
