package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.queries.{StreamingQueries, Tables}

/** The reference's count + non-null-fingerprint E2E gate, applied to both a
  * batch table and the streaming pipeline's landed output. */
class DataQualitySpec extends AnyFunSuite {
  lazy val spark = T.spark

  test("fingerprint counts non-nulls per column in one pass") {
    val li = Tables.lineitem(spark, T.sf0001)
    val fp = DataQuality.nonNullFingerprint(li)
    assert(fp.keySet == li.columns.toSet)
    assert(fp.values.forall(_ == li.count())) // testdata has no nulls
    val withNulls = li.withColumn("maybe",
      when(col("l_linenumber") === 1, lit(null).cast("string")).otherwise(lit("x")))
    val fp2 = DataQuality.nonNullFingerprint(withNulls)
    assert(fp2("maybe") < withNulls.count())
  }

  test("streaming E2E output passes the reference gate") {
    val out = StreamingQueries.d20StreamingE2E(spark, T.sf0001)
    assert(DataQuality.passesE2EGate(out))
  }
}
