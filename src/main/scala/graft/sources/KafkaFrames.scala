package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The Kafka connector's fixed record frame and its payload decode path.
 *
 * The connector (absent offline) always yields this schema
 * (spec: reference `sources/kafka_source.py:22-23` documents the headers
 * variant; the base schema is the Spark Kafka integration contract):
 * `key binary, value binary, topic string, partition int, offset long,
 * timestamp timestamp, timestampType int`.
 *
 * [[decodeJson]] is the standard first transform of every Kafka pipeline —
 * `value` bytes → string → `from_json` → typed columns — and works the same
 * on a real `format("kafka")` stream or on the simulated frames
 * [[framesFromEvents]] builds for offline testing.
 */
object KafkaFrames {

  val frameSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Simulate connector output from the events table: the payload is the
    * JSON-serialized event, keyed by user. */
  def framesFromEvents(events: DataFrame, topic: String = "events",
                       nPartitions: Int = 8): DataFrame =
    events.select(
      col("user_id").cast("string").cast("binary").as("key"),
      to_json(struct(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))).cast("binary").as("value"),
      lit(topic).as("topic"),
      (col("event_id") % nPartitions).cast("int").as("partition"),
      col("event_id").as("offset"),
      col("ts").as("timestamp"),
      lit(0).cast("int").as("timestampType"))

  /** Decode the value payload into typed columns (works on streaming and
    * batch frames alike — from_json is stateless). */
  def decodeJson(frames: DataFrame, payloadSchema: StructType): DataFrame =
    frames.select(
      col("key").cast("string").as("key"),
      col("topic"), col("partition"), col("offset"), col("timestamp"),
      from_json(col("value").cast("string"), payloadSchema).as("payload"))
      .select(col("key"), col("topic"), col("partition"), col("offset"),
        col("timestamp"), col("payload.*"))
}
