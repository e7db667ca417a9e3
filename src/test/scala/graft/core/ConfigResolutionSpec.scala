package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.{DeltaStreamingSource, KafkaStreamingSource}

/** 3-tier config resolution: hardcoded defaults < session RuntimeConf <
  * direct config (which writes through to the session conf). Mirrors the
  * reference's option-plumbing tests
  * (`/root/reference/tests/test_kafka_stream_source.py`,
  * `tests/test_delta_streaming_source.py`). */
class ConfigResolutionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("kafka source resolves curated defaults when nothing is configured") {
    val src = KafkaStreamingSource(Some("spark.test1.source"), session = Some(spark))
    val opts = src.options()
    assert(opts("failOnDataLoss") == "true")
    assert(opts("startingOffsets") == "earliest")
    assert(opts("minPartitions") == "36")
    assert(opts("maxOffsetsPerTrigger") == "5000")
    assert(opts("maxRecordsPerPartition") == "100")
    // unset options are absent, not null
    assert(!opts.contains("kafka.bootstrap.servers"))
    assert(!opts.contains("startingTimestamp"))
  }

  test("kafka topic comes from {prefix}.topic, not .options") {
    spark.conf.set("spark.test2.source.kafka.topic", "events-in")
    val src = KafkaStreamingSource(Some("spark.test2.source"), session = Some(spark))
    assert(src.options()("subscribe") == "events-in")
  }

  test("kafka groupIdPrefix defaults to appName:checkpointsVersion") {
    spark.conf.set("spark.app.checkpoints.version", "7.7.7")
    val src = KafkaStreamingSource(Some("spark.test3.source"), session = Some(spark))
    assert(src.options()("groupIdPrefix") == "graft-test:7.7.7")
    spark.conf.unset("spark.app.checkpoints.version")
  }

  test("session conf overrides defaults; empty string counts as unset") {
    spark.conf.set("spark.test4.source.delta.options.maxFilesPerTrigger", "9")
    spark.conf.set("spark.test4.source.delta.options.maxBytesPerTrigger", "")
    val src = DeltaStreamingSource(Some("spark.test4.source"), session = Some(spark))
    val opts = src.options()
    assert(opts("maxFilesPerTrigger") == "9")
    assert(opts("maxBytesPerTrigger") == "1g") // empty -> default survives
    assert(opts("withEventTimeOrder") == "true")
    assert(opts("ignoreChanges") == "true")
  }

  test("direct config writes through to the session conf (tier-1 as tier-2)") {
    val src = DeltaStreamingSource(Some("spark.test5.source"),
      config = Map("spark.test5.source.delta.options.startingVersion" -> "42"),
      session = Some(spark))
    assert(src.options()("startingVersion") == "42")
    assert(spark.conf.get("spark.test5.source.delta.options.startingVersion") == "42")
  }

  test("non-spark keys in direct config are ignored") {
    val src = DeltaStreamingSource(Some("spark.test6.source"),
      config = Map("not.a.spark.key" -> "x"), session = Some(spark))
    assert(!src.options().values.toSet.contains("x"))
  }

  test("delta managed-table name joins non-empty parts; all-missing raises") {
    spark.conf.set("spark.test7.source.delta.table.databaseOrSchema", "silver")
    spark.conf.set("spark.test7.source.delta.table.tableName", "events")
    val src = DeltaStreamingSource(Some("spark.test7.source"), session = Some(spark))
    assert(src.tableName() == "silver.events")
    assert(DeltaStreamingSource.isManaged(src.tableName()))

    val bare = DeltaStreamingSource(Some("spark.test8.source"), session = Some(spark))
    assertThrows[IllegalArgumentException](bare.tableName())
  }
}
