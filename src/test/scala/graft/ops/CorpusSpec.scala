package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

/** Invariants for the corpus-preparation operators ([[Corpus]]) beyond the
  * driver's oracle gate: structural properties that must hold at any scale
  * factor, checked at sf0.001. */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = T.spark

  test("source overlap: bounded counts, upper triangle, exact for one pair") {
    val rows = Corpus.sourceOverlapQuery(spark, T.sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, shared, na, nb, j) =>
      assert(a < b, s"($a,$b) not upper-triangular")
      assert(shared >= 1 && shared <= math.min(na, nb))
      assert(j > 0.0 && j <= 1.0)
      assert(math.abs(j - shared.toDouble / (na + nb - shared)) < 1e-15)
    }
    // recompute one pair from the raw shingle sets
    val (a0, b0, shared0, na0, nb0, _) = rows.head
    val bySource = graft.queries.Tables.documents(spark, T.sf0001)
      .filter(col("source").isin(a0, b0))
      .select(col("source"), explode(Dedup.wordShingles(col("text"))).as("g"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s, gs) => s -> gs.map(_._2).toSet }
    assert(bySource(a0).size == na0 && bySource(b0).size == nb0)
    assert((bySource(a0) & bySource(b0)).size == shared0)
  }

  test("chunking covers every token exactly: stride windows tile each doc") {
    val df = Corpus.chunkingQuery(spark, T.sf0001, window = 32, stride = 16)
    // chunk ids are dense from 0 per doc, and the last chunk is the only
    // one allowed to be shorter than the stride
    val byDoc = df.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("chunk_id").as("maxId"),
        min("n_tokens").as("minTok"))
      .collect()
    assert(byDoc.nonEmpty)
    byDoc.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + 1, s"chunk ids not dense: $r")
      assert(r.getLong(3) >= 1, s"empty chunk: $r")
    }
  }

  test("contamination never flags a benchmark document") {
    val flagged = Corpus.contaminationQuery(spark, T.sf0001)
      .filter(col("doc_id") % 101 === 0).count()
    assert(flagged == 0)
  }

  test("vocab coverage is monotone and ends at a fraction <= 1") {
    val rows = Corpus.vocabCoverageQuery(spark, T.sf0001)
      .select("cum_frac").collect().map(_.getDouble(0))
    assert(rows.nonEmpty)
    assert(rows.zip(rows.tail).forall { case (a, b) => a <= b })
    assert(rows.last <= 1.0 + 1e-12)
  }

  test("mixing keeps a subset bounded by the declared rate (hash-stable)") {
    val rows = Corpus.mixingWeightsQuery(spark, T.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rate, total, kept) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(kept <= total)
      assert(rate >= 10 && rate <= 50)
    }
    // rerun is bit-identical (content-hash, not RNG)
    val again = Corpus.mixingWeightsQuery(spark, T.sf0001).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("redaction digest differs from raw text and counts match the synthetic PII") {
    val df = Corpus.piiRedactQuery(spark, T.sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (docId, nEmails, nPhones) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nEmails == (if (docId % 2 == 0) 2 else 1), s"doc $docId emails $nEmails")
      assert(nPhones == 1, s"doc $docId phones $nPhones")
    }
  }

  test("domain extraction groups every document under a host") {
    val df = Corpus.domainExtractQuery(spark, T.sf0001)
    val total = df.agg(sum("n_docs")).collect()(0).getLong(0)
    val nDocs = graft.queries.Tables.documents(spark, T.sf0001).count()
    assert(total == nDocs)
  }

  test("n40 boilerplate-gram cap drops only hot grams and keeps a true Jaccard") {
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val uncapped = toMap(Corpus.sourceOverlapQuery(spark, T.sf0001))
    val capped = toMap(Corpus.sourceOverlapQuery(spark, T.sf0001,
      maxSourcesPerGram = 2))
    assert(uncapped.nonEmpty)
    // dropping grams can only shrink shared counts and per-source totals,
    // and the Jaccard must stay consistent with its own capped counts
    capped.foreach { case (pair, (shared, na, nb, jac)) =>
      val (s0, a0, b0, _) = uncapped(pair)
      assert(shared <= s0 && na <= a0 && nb <= b0, s"cap grew counts for $pair")
      assert(math.abs(jac - shared.toDouble / (na + nb - shared)) < 1e-12)
    }
    // the cap engaged at this scale: some gram lives in >2 sources
    assert(capped.exists { case (p, (s, _, _, _)) => s < uncapped(p)._1 } ||
      capped.map(_._2._2).sum < uncapped.map(_._2._2).sum)
  }
}
