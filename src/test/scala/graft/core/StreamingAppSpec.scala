package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** App lifecycle + checkpoint derivation, mirroring the reference's
  * `tests/test_streaming_app.py` (golden path shape, frozen-after-init,
  * constructor-config auto-init, typed accessor errors). */
class StreamingAppSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("checkpoint location is {base}/{name}/{version}/_checkpoints") {
    val app = new StreamingApp(Some(spark))
      .withConfig(Map(
        "spark.app.checkpoints.path" -> "/src/test/resources",
        "spark.app.checkpoint.version" -> "1.0.0"))
      .initialize()
    assert(app.checkpointLocation.toString ==
      s"/src/test/resources/${app.appName}/1.0.0/_checkpoints")
    spark.conf.unset("spark.app.checkpoints.path")
    spark.conf.unset("spark.app.checkpoint.version")
  }

  test("version falls back to 'stable'; missing base path raises") {
    val app = new StreamingApp(Some(spark))
    app.appCheckpointsPath = Some("/tmp/ckpt")
    app.appCheckpointVersion = None
    assert(app.checkpointLocation.toString.endsWith("/stable/_checkpoints"))
    app.appCheckpointsPath = None
    assertThrows[RuntimeException](app.checkpointLocation)
  }

  test("withConfig after initialize raises") {
    val app = new StreamingApp(Some(spark)).initialize()
    assertThrows[RuntimeException](app.withConfig(Map("spark.x" -> "y")))
  }

  test("constructor config auto-initializes") {
    spark.conf.unset("spark.app.checkpoints.path")
    val app = new StreamingApp(Some(spark),
      Some(Map("spark.app.checkpoints.path" -> "/tmp/auto")))
    assert(app.isInitialized)
    assert(app.appCheckpointsPath.contains("/tmp/auto"))
    spark.conf.unset("spark.app.checkpoints.path")
  }

  test("typed accessors raise on wrong source type") {
    val app = new StreamingApp(Some(spark)).initialize()
      .withKafkaSource(Some("spark.test9.source"))
    assert(app.kafkaSource() != null)
    assertThrows[RuntimeException](app.deltaSource())
    assertThrows[RuntimeException](app.deltaSink())
  }
}
