package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

/** Catalog-surface semantics the oracle compare can't see. */
class RuntimeQueriesSpec extends AnyFunSuite {
  lazy val spark = T.spark

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
