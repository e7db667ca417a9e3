package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}
import graft.queries.Tables

/** Codegen sketch kernels: interpreted eval and generated code must agree,
  * and the sketches must have their defining properties. */
class HashSketchesSpec extends AnyFunSuite {
  lazy val spark = T.spark

  test("simhash64 is deterministic across evaluations") {
    val docs = Tables.documents(spark, T.sf0001)
    val sims = docs.select(col("doc_id"),
      graft.ops.Dedup.simHash(col("text")).as("sim"))
    val twice = sims.join(
      docs.select(col("doc_id"), graft.ops.Dedup.simHash(col("text")).as("sim2")),
      "doc_id")
    assert(twice.filter(col("sim") =!= col("sim2")).count() == 0)
  }

  test("minhash signature has k elements, each stable across evaluations") {
    val docs = Tables.documents(spark, T.sf0001)
    val hs = transform(split(lower(col("text")), "\\s+"), w => xxhash64(w))
    val sigs = docs.select(col("doc_id"),
      MinHashSignature(hs, 32).as("sig"),
      MinHashSignature(hs, 32).as("sig2"))
    assert(sigs.filter(size(col("sig")) =!= 32).count() == 0)
    assert(sigs.filter(to_json(col("sig")) =!= to_json(col("sig2"))).count() == 0)
  }

  test("minhash similarity tracks jaccard on planted near-dups") {
    val docs = Tables.documents(spark, T.sf0001)
    val planted = graft.ops.Dedup.ngramJaccardPairs(docs)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = graft.ops.Dedup.minHashNearDupPairs(docs)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == planted, s"missing=${planted -- found} extra=${found -- planted}")
  }
}
