package graft.plans

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Property: for random data, keys, and k, the custom top-k operator
  * returns exactly the window row_number()-prefix row set (the order used
  * is total — (score, id) with unique id — so the expected set is
  * well-defined). */
object TopKPerKeyProps extends Properties("TopKPerKey") {
  // repo seed policy (round 6): pin the ScalaCheck seed so green is
  // reproducible, never generator luck (see TemperatureMixProps scaladoc)
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withInitialSeed(org.scalacheck.rng.Seed(0x746f706bL))

  lazy val spark = SparkTestSession.spark

  private val rowsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 300)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 6L), Gen.choose(-50L, 50L)))
  } yield rows.zipWithIndex.map { case ((g, s), i) => (g, s * 1000 + i) }
  // score*1000+index keeps (group, score) pairs unique → total order

  private val kGen: Gen[Int] = Gen.choose(1, 8)

  property("equals the sorted-prefix per group for random data and k") =
    forAll(rowsGen, kGen) { (rows, k) =>
      import spark.implicits._
      val df = rows.toDF("g", "score").repartition(5)
      val got = TopKPerKey(df, Seq(col("g")), Seq(col("score").desc), k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, grp) =>
        grp.sortBy(-_._2).take(k)
      }.toSet
      got == expected
    }
}
