package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

class UpsertSpec extends AnyFunSuite {
  lazy val spark = T.spark

  test("upsert replaces matched keys, appends new ones, leaves the rest") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val updates = Seq((2L, "B"), (9L, "Z")).toDF("k", "v")
    val out = Upsert.upsert(base, updates, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a"), (2L, "B"), (3L, "c"), (9L, "Z")))
  }

  test("update keys broadcast by default") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("k", "v")
    val updates = Seq((1L, "A")).toDF("k", "v")
    val plan = Upsert.upsert(base, updates, "k").queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan)
  }
}
