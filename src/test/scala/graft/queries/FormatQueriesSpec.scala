package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

/** Error-bound assertions for the sketch query (rows-only at the driver
  * gate, so the accuracy contract lives here). */
class FormatQueriesSpec extends AnyFunSuite {
  lazy val spark = T.spark

  test("d68 sketch estimates land within 5% of exact distinct counts") {
    val est = FormatQueries.d68Sketches(spark, T.sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val exactPer = Tables.events(spark, T.sf0001)
      .groupBy("event_type").agg(countDistinct("user_id").as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = Tables.events(spark, T.sf0001)
      .agg(countDistinct("user_id")).collect()(0).getLong(0)

    assert(est.keySet == exactPer.keySet + "__all__")
    (exactPer + ("__all__" -> exactAll)).foreach { case (k, exact) =>
      val (hll, theta) = est(k)
      assert(math.abs(hll - exact).toDouble / exact <= 0.05,
        s"$k: hll $hll vs exact $exact")
      assert(math.abs(theta - exact).toDouble / exact <= 0.05,
        s"$k: theta $theta vs exact $exact")
    }
  }

  test("d68 is deterministic across reruns (sketches are order-independent)") {
    val a = FormatQueries.d68Sketches(spark, T.sf0001).collect().map(_.toSeq).toSeq
    val b = FormatQueries.d68Sketches(spark, T.sf0001).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("count-min sketch frequency estimates overcount-only within bound") {
    // CountMin never undercounts; with eps=0.001 the overcount is bounded
    // by eps * total (w.h.p.) — the heavy-hitter budget primitive
    val ev = Tables.events(spark, T.sf0001).select(col("event_type"))
    val cms = ev.stat.countMinSketch("event_type", 0.001, 0.99, 42)
    val exact = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    exact.foreach { case (k, n) =>
      val e = cms.estimateCount(k)
      assert(e >= n, s"$k undercounted: $e < $n")
      assert(e <= n + math.ceil(0.001 * total).toLong + 1, s"$k overcounted: $e vs $n")
    }
  }
}
