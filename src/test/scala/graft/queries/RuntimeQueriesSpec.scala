package graft.queries

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

/** Catalog-surface semantics the oracle compare can't see. */
class RuntimeQueriesSpec extends AnyFunSuite {
  lazy val spark = T.spark

  test("dynamic partition overwrite rewrites only the partitions present in the write") {
    import org.apache.spark.sql.functions._
    val staging = Tables.scratchDir("d92spec").resolve("by_type")
    val ev = Tables.events(spark, T.sf0001)
      .select(col("event_id"), col("value"), col("event_type"))
    ev.write.mode("overwrite").partitionBy("event_type").parquet(staging.toString)
    def files(pt: String): Map[String, Long] = {
      val dir = staging.resolve(s"event_type=$pt")
      val s = java.nio.file.Files.list(dir)
      try s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
      finally s.close()
    }
    val viewBefore = files("view")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try ev.filter(col("event_type") === "click" && col("value") > 50.0)
      .write.mode("overwrite").partitionBy("event_type").parquet(staging.toString)
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    // the view partition's files are byte-for-byte the ones written first;
    // only the click partition was replaced
    assert(files("view") == viewBefore)
    val clickRows = spark.read.parquet(staging.toString)
      .filter(col("event_type") === "click").count()
    val expected = ev.filter(col("event_type") === "click" && col("value") > 50.0).count()
    assert(clickRows == expected)
  }

  test("d86 records the clustering columns in the catalog") {
    RuntimeQueries.d86ClusterBy(spark, T.sf0001).collect()
    val desc = spark.sql("DESCRIBE TABLE EXTENDED graft_d86")
      .collect().map(_.mkString("|"))
    assert(desc.exists(_.contains("Clustering Information")),
      "DESCRIBE should carry a Clustering Information section")
    assert(desc.exists(r => r.contains("clusteringColumns") && r.contains("l_returnflag")),
      s"clusteringColumns property missing: ${desc.mkString("\n")}")
  }
}
