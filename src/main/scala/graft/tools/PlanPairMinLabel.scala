package graft.tools

import org.apache.spark.sql.functions._

/**
 * Dev tool (round-19 plan evidence): the rounds ≥ 1 hop of
 * `Dedup.minLabelComponents`, PRE-fold vs POST-fold, over a small
 * parquet-backed pair list with the SAME persist/materialize treatment
 * the real loop applies (edges cached; post-fold edges cached
 * pre-partitioned on dst) — so the explain shows what a round actually
 * pays: the pre-fold shape's per-round exchanges (edges re-shuffled on
 * src, groupBy(dst) exchange, labels⟕nbrMin join exchanges) vs the
 * post-fold shape's single aggregation exchange over the already
 * dst-partitioned cache.
 *
 * Usage: runMain graft.tools.PlanPairMinLabel
 */
object PlanPairMinLabel {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, logLevel = "ERROR")
    val dir = graft.queries.Tables.scratchDir("planpair").resolve("pairs.parquet")
    spark.range(2000)
      .select(col("id").as("doc_a"), pmod(col("id") * 7 + 1, lit(2000)).as("doc_b"))
      .write.mode("overwrite").parquet(dir.toString)
    val pairs = spark.read.parquet(dir.toString)

    // PRE-fold: edges cached UNPARTITIONED (the pre-round-19 layout)
    val edgesPre = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    edgesPre.count()
    // a round-0-shaped label table, checkpointed exactly like the loop's
    val labels = edgesPre.groupBy(col("dst").as("doc_id"))
      .agg(min(col("src")).as("nbr_lbl"))
      .select(col("doc_id"), least(col("doc_id"), col("nbr_lbl")).as("lbl"))
      .localCheckpoint(true)

    println("----- PLANPAIR round>=1 hop PRE-fold -----")
    val nbrMin = edgesPre
      .join(labels.select(col("doc_id").as("src"), col("lbl")), "src")
      .groupBy(col("dst").as("doc_id")).agg(min(col("lbl")).as("nbr_lbl"))
    labels.as("o").join(nbrMin.as("n"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("o.lbl").as("old_lbl"),
        least(col("o.lbl"), coalesce(col("n.nbr_lbl"), col("o.lbl"))).as("lbl"))
      .explain("formatted")

    // POST-fold: edges cached PRE-PARTITIONED on dst (the round-19 layout)
    val edgesPost = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .repartition(col("dst"))
      .persist()
    edgesPost.count()
    println("----- PLANPAIR round>=1 hop POST-fold -----")
    edgesPost.join(labels.select(col("doc_id").as("dst"), col("lbl")), "dst")
      .select(col("src").as("doc_id"), col("lbl"),
        when(lit(false), col("lbl")).as("slf"))
      .unionByName(labels.select(col("doc_id"), col("lbl"), col("lbl").as("slf")))
      .groupBy(col("doc_id"))
      .agg(min(col("lbl")).as("lbl"), max(col("slf")).as("old_lbl"))
      .explain("formatted")

    spark.stop()
  }
}
