package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal}
import graft.queries.Tables._

/** Dev-only: phase-level timing for the banded-cosine dedup chain — the
  * engine shared by n26/n37/n53 (embeddings), n55–n58 (media features),
  * and the per-batch work of the n52/n58 replays. Mirrors the operators'
  * CURRENT shapes (round-18 measurement; see OPTIMIZATION_r18.md):
  * unit persist → sign-band kernel persist → band-bucket self-join +
  * distinct → DotProduct verify → minLabelComponents → corpus tail.
  * Usage: runMain graft.tools.ProbeBandedBreakdown <sfDir> [emb|media] [rounds]
  */
object ProbeBandedBreakdown {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val mode = if (args.length > 1) args(1) else "emb"
    val rounds = if (args.length > 2) args(2).toInt else 2
    val spark = Sessions.local(32, logLevel = "WARN")

    t("warmup")(noop(documents(spark, sfDir).select(md5(col("text")))))

    (1 to rounds).foreach { round =>
      println(s"== round $round ($mode) ==")
      // the n53 (emb) / n57 (media) corpus: base vectors ∪ planted copies
      val vectors = mode match {
        case "media" =>
          val media = Multimodal.mediaFromDocuments(documents(spark, sfDir))
          val feats = t("featurewide") {
            val f = Multimodal.featureExtractWide(media).toDF()
            noop(f); f
          }
          feats.select(col("media_id").as("vec_id"), col("fv").as("v"))
            .unionByName(Multimodal.plantedMediaCopies(feats))
        case _ =>
          val emb = embeddings(spark, sfDir)
          emb.select(col("vec_id"),
              transform(col("embedding"), x => x.cast("double")).as("v"))
            .unionByName(Dedup.plantedCopies(emb))
      }
      val par = spark.sparkContext.defaultParallelism
      val unit = t("unit-persist-count") {
        val u = vectors.repartition(par)
          .select(col("vec_id"), Dedup.unitVector(col("v")).as("u")).persist()
        println(s"  n=${u.count()}")
        u
      }
      val n = unit.count()
      // the REAL geometry (round-18 ADVICE: don't mirror the constants —
      // a duplicated formula silently measures a stale shape)
      val bits = Dedup.lshBitsFor(n)
      val bands = Dedup.lshBandsFor(bits)
      println(s"  bits=$bits bands=$bands")
      val bandedAll = t("band-persist-count") {
        val b = unit.select(col("vec_id"),
          posexplode(Dedup.signBandCol(col("u"), bits, bands))
            .as(Seq("band", "bh"))).persist()
        println(s"  bandrows=${b.count()}")
        b
      }
      val candidates = t("cand-join-distinct") {
        val c = bandedAll.as("x").join(bandedAll.as("y"), Seq("band", "bh"))
          .filter(col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
          .distinct()
        noop(c); c
      }
      val pairs = t("verify") {
        val p = candidates
          .join(unit.select(col("vec_id").as("vec_a"), col("u").as("ua")), "vec_a")
          .join(unit.select(col("vec_id").as("vec_b"), col("u").as("ub")), "vec_b")
          .withColumn("cosine", graft.functions.DotProduct(col("ua"), col("ub")))
          .filter(col("cosine") >= 0.9)
          .select("vec_a", "vec_b")
        noop(p); p
      }
      t("labels") {
        val lbl = Dedup.minLabelComponents(pairs, "vec_a", "vec_b", "vec_id",
          onConverged = it => println(s"  label rounds=$it"))
        noop(lbl)
      }
      // replicate minLabelComponents' PRE-round-19 internals with per-step
      // timing — kept as the in-session A/B baseline for the round-19 fold
      // (per-round: 2 joins + checkpoint + separate convergence count)
      t("labels-instrumented-prefold19") {
        val p2 = t("  old:pairs-persist") {
          val x = pairs.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")).persist()
          x.count(); x
        }
        val edges = t("  old:edges-persist") {
          val e = p2.select(col("doc_a").as("src"), col("doc_b").as("dst"))
            .unionByName(p2.select(col("doc_b").as("src"), col("doc_a").as("dst")))
            .persist()
          e.count(); e
        }
        var labels = t("  old:init-distinct") {
          val l = edges.select(col("src").as("doc_id"))
            .distinct().withColumn("lbl", col("doc_id")).persist()
          l.count(); l
        }
        var converged = false
        var iter = 0
        while (!converged && iter < 50) {
          val nbrMin = edges
            .join(labels.select(col("doc_id").as("src"), col("lbl")), "src")
            .groupBy(col("dst").as("doc_id")).agg(min(col("lbl")).as("nbr_lbl"))
          val hop = t(s"  old:r$iter-hop-persist") {
            val h = labels.as("o")
              .join(nbrMin.as("n"), Seq("doc_id"), "left")
              .select(col("doc_id"), col("o.lbl").as("old_lbl"),
                least(col("o.lbl"), coalesce(col("n.nbr_lbl"), col("o.lbl"))).as("lbl"))
              .persist()
            h
          }
          // the round-19 fold's plan evidence pair, PRE side: the real
          // round-1 hop over the real cached inputs (plans/r19)
          if (iter == 1 && round == 1) {
            println("----- round1 hop PRE-fold (edges⋈labels + groupBy(dst) + labels⟕nbrMin) -----")
            hop.explain("formatted")
          }
          val ptr = hop.select(col("doc_id"), col("lbl"))
            .withColumnRenamed("doc_id", "p_doc")
            .withColumnRenamed("lbl", "p_lbl")
          val step = t(s"  old:r$iter-step-ckpt") {
            hop.join(ptr, hop("lbl") === ptr("p_doc"), "left")
              .select(col("doc_id"), col("old_lbl"),
                least(col("lbl"), coalesce(col("p_lbl"), col("lbl"))).as("new_lbl"))
              .select(col("doc_id"), col("new_lbl").as("lbl"),
                (col("new_lbl") < col("old_lbl")).as("chg"))
              .localCheckpoint()
          }
          val anyChanged = t(s"  old:r$iter-changed-count") {
            step.filter(col("chg")).limit(1).count()
          }
          hop.unpersist(); labels.unpersist()
          labels = step
          converged = anyChanged == 0L
          iter += 1
        }
        p2.unpersist(); edges.unpersist(); labels.unpersist()
      }
      // replicate minLabelComponents' CURRENT (round-19) internals: edges
      // hash-partitioned on dst once, rounds ≥1 as ONE union-aggregation,
      // convergence observed on the checkpoint job itself (zero extra jobs)
      t("labels-instrumented-r19") {
        val p2 = t("  new:pairs-persist") {
          val x = pairs.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")).persist()
          x.count(); x
        }
        val edges = t("  new:edges-persist") {
          val e = p2.select(col("doc_a").as("src"), col("doc_b").as("dst"))
            .unionByName(p2.select(col("doc_b").as("src"), col("doc_a").as("dst")))
            .repartition(col("dst"))
            .persist()
          e.count(); e
        }
        var labels: DataFrame = null
        var converged = false
        var iter = 0
        while (!converged && iter < 50) {
          val hop = t(s"  new:r$iter-hop-persist") {
            val h = (if (labels == null)
              edges.groupBy(col("dst").as("doc_id"))
                .agg(min(col("src")).as("nbr_lbl"))
                .select(col("doc_id"), col("doc_id").as("old_lbl"),
                  least(col("doc_id"), col("nbr_lbl")).as("lbl"))
            else
              edges.join(labels.select(col("doc_id").as("dst"), col("lbl")), "dst")
                .select(col("src").as("doc_id"), col("lbl"),
                  when(lit(false), col("lbl")).as("slf"))
                .unionByName(
                  labels.select(col("doc_id"), col("lbl"), col("lbl").as("slf")))
                .groupBy(col("doc_id"))
                .agg(min(col("lbl")).as("lbl"), max(col("slf")).as("old_lbl"))
            ).persist()
            h
          }
          // the round-19 fold's plan evidence pair, POST side (plans/r19):
          // dst-keyed join against the pre-partitioned cached edges + ONE
          // union-aggregation — no groupBy(dst) exchange, no hop left join
          if (iter == 1 && round == 1) {
            println("----- round1 hop POST-fold (dst-keyed join + one union-aggregation) -----")
            hop.explain("formatted")
          }
          val ptr = hop.select(col("doc_id").as("p_doc"), col("lbl").as("p_lbl"))
          val obs = org.apache.spark.sql.Observation()
          val step = t(s"  new:r$iter-step-ckpt+observe") {
            hop.join(ptr, hop("lbl") === ptr("p_doc"), "left")
              .select(col("doc_id"), col("old_lbl"),
                least(col("lbl"), coalesce(col("p_lbl"), col("lbl"))).as("new_lbl"))
              .select(col("doc_id"), col("new_lbl").as("lbl"),
                (col("new_lbl") < col("old_lbl")).as("chg"))
              .observe(obs, max(col("chg")).as("chg_any"))
              .localCheckpoint()
          }
          val anyChanged = obs.get.get("chg_any").exists {
            case b: java.lang.Boolean => b.booleanValue()
            case _ => false
          }
          hop.unpersist()
          if (labels != null) labels.unpersist()
          labels = step
          converged = !anyChanged
          iter += 1
        }
        p2.unpersist(); edges.unpersist()
        if (labels != null) labels.unpersist()
      }
      // round-0 subplan shapes, before vs after the round-18 fold (the
      // returned frame's plan is round-structure-free, so the evidence of
      // the removed exchanges is THIS pair of subplans + the phase timings)
      if (round == 1) {
        val p2 = pairs.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
        val edges = p2.select(col("doc_a").as("src"), col("doc_b").as("dst"))
          .unionByName(p2.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        println("----- round0 hop BEFORE fold (init-distinct + 2 joins) -----")
        val labels0 = edges.select(col("src").as("doc_id")).distinct()
          .withColumn("lbl", col("doc_id"))
        val nbrMin = edges
          .join(labels0.select(col("doc_id").as("src"), col("lbl")), "src")
          .groupBy(col("dst").as("doc_id")).agg(min(col("lbl")).as("nbr_lbl"))
        labels0.as("o").join(nbrMin.as("n"), Seq("doc_id"), "left")
          .select(col("doc_id"), col("o.lbl").as("old_lbl"),
            least(col("o.lbl"), coalesce(col("n.nbr_lbl"), col("o.lbl"))).as("lbl"))
          .explain("formatted")
        println("----- round0 hop AFTER fold (one aggregation) -----")
        edges.groupBy(col("dst").as("doc_id"))
          .agg(min(col("src")).as("nbr_lbl"))
          .select(col("doc_id"), col("doc_id").as("old_lbl"),
            least(col("doc_id"), col("nbr_lbl")).as("lbl"))
          .explain("formatted")
      }
      // attribute the per-round fixed cost: AQE / codegen latency A/B
      for ((aqe, wsc) <- Seq(("false", "true"), ("true", "false"), ("false", "false"))) {
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.codegen.wholeStage", wsc)
        t(s"labels aqe=$aqe wsc=$wsc") {
          val lbl = Dedup.minLabelComponents(pairs, "vec_a", "vec_b", "vec_id")
          noop(lbl)
        }
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      unit.unpersist(); bandedAll.unpersist()
      // end-to-end for reference (fresh plan, no shared persists)
      val full = mode match {
        case "media" => "n57_media_dedup_corpus"
        case _ => "n53_embedding_dedup_corpus"
      }
      t(s"end-to-end $full") {
        noop(graft.SparkEntry.queries(full)(spark, sfDir))
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
