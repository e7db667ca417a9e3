package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

/** Semantics of the modern-SQL surface (d76–d85) that the oracle equivalence
  * alone doesn't pin down: recursion termination and gap preservation,
  * IGNORE NULLS fill direction, collation case-collapse, and the
  * scripting-loop accumulator. */
class ModernSqlQueriesSpec extends AnyFunSuite {
  lazy val spark = T.spark

  test("d78 recursive calendar covers all of January regardless of event gaps") {
    val rows = ModernSqlQueries.d78RecursiveCte(spark, T.sf0001).collect()
    assert(rows.length == 31)
    assert(rows.head.getDate(0).toString == "2024-01-01")
    assert(rows.last.getDate(0).toString == "2024-01-31")
    // sf0.001 has only 1000 events in January; every day row still present,
    // zero-event days carry n_events = 0 and sum_value = 0.0 (not null)
    assert(rows.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
  }

  test("d83 LOCF: last_purchase is null before a user's first purchase and set after") {
    val df = ModernSqlQueries.d83IgnoreNulls(spark, T.sf0001)
    val rows = df.filter(col("user_id") === df.filter(col("event_type") === "purchase")
        .select(min("user_id")).first().getLong(0))
      .orderBy("event_id").collect()
    val firstPurchaseIdx = rows.indexWhere(_.getString(2) == "purchase")
    assert(firstPurchaseIdx >= 0)
    // before the first purchase: no value to carry; at and after: carried
    rows.zipWithIndex.foreach { case (r, i) =>
      if (i < firstPurchaseIdx) assert(r.isNullAt(4), s"row $i should have null last_purchase")
      else assert(!r.isNullAt(4), s"row $i should carry a purchase value")
    }
  }

  test("d81 collation collapses case variants to one group per segment") {
    val rows = ModernSqlQueries.d81Collation(spark, T.sf0001).collect()
    val segs = rows.map(_.getString(0))
    assert(segs.distinct.length == segs.length)
    assert(segs.forall(s => s == s.toLowerCase))
    // counts must cover every customer row exactly once (no split groups)
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.customer(spark, T.sf0001).count())
  }

  test("d79 scripting accumulator equals the unrolled sum of per-threshold counts") {
    val o = Tables.orders(spark, T.sf0001)
    val expected = (1 to 5).map(i =>
      o.filter(col("o_totalprice") > i * 50000).count()).sum
    val got = ModernSqlQueries.d79SqlScripting(spark, T.sf0001).first().getLong(0)
    assert(got == expected)
  }
}
