package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.core.StreamingApp
import graft.queries.Tables
import graft.sinks.{DeltaStreamingSink, ParquetStreamingSink}

/** Plan-level checks: generated readers produce streaming DataFrames, sink
  * option narrowing matches the reference contract. */
class SourceSinkPlanSpec extends AnyFunSuite {
  lazy val spark = T.spark

  test("file source generate().load() is a streaming DataFrame") {
    val schema = Tables.lineitem(spark, T.sf0001).schema
    spark.conf.set("spark.test10.source.parquet.options.path",
      s"${T.sf0001}/lineitem.parquet")
    val src = FileStreamingSource(Some("spark.test10.source"),
      session = Some(spark), schema = Some(schema))
    val df = src.generate(spark).load()
    assert(df.isStreaming)
    assert(df.schema == schema)
  }

  test("delta sink resolves curated defaults and narrows forwarded options") {
    val sink = DeltaStreamingSink(Some("spark.test11.sink"), session = Some(spark))
    val opts = sink.options()
    assert(opts("outputMode") == "append")
    assert(opts("mergeSchema") == "false")
    assert(opts("maxRecordsPerFile") == "100000")
    assert(opts("queryName") == "delta:sink:default")
    assert(opts("spark.databricks.delta.autoCompact.minNumFiles") == "10")
    assert(!opts.contains("txnAppId"))
  }

  test("parquet sink forwards maxRecordsPerFile to the writer options") {
    spark.conf.set("spark.test12.sink.parquet.options.path", "/tmp/t12-out")
    spark.conf.set("spark.test12.sink.parquet.options.checkpointLocation", "/tmp/t12-ck")
    val sink = ParquetStreamingSink(Some("spark.test12.sink"), session = Some(spark))
    val opts = sink.options()
    assert(opts("maxRecordsPerFile") == "100000")
    assert(opts("path") == "/tmp/t12-out")
  }

  test("kafka reader builds without the connector (plan-only)") {
    // generate() must succeed — .load() would need the kafka connector jar,
    // exactly like the reference treats format as data
    val app = new StreamingApp(Some(spark)).initialize()
      .withKafkaSource(Some("spark.test13.source"))
    val reader = app.kafkaSource().generate(spark)
    assert(reader != null)
  }
}
