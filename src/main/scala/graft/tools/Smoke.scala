package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke check: every testdata table loads and prints its schema. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet is TIMESTAMP(NANOS); unreadable without this flag
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        println(s"== $t rows=${df.count()} schema=${df.schema.simpleString}")
      } catch {
        case e: Throwable => println(s"== $t FAILED: ${e.getMessage}")
      }
    }
    // reference-style data-quality gate over a joined sample
    val joined = graft.queries.BatchQueries.d05LeftJoin(spark, dir)
    println(s"== data-quality gate (d05 output): ${graft.core.DataQuality.passesE2EGate(joined)}")
    println(s"== fingerprint: ${graft.core.DataQuality.nonNullFingerprint(joined).toSeq.sorted}")
    spark.stop()
  }
}
