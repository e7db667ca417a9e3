package graft.ops

import java.security.MessageDigest

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}
import org.scalacheck.rng.Seed

/**
 * Property tests for the n47 content-defined chunking boundary rule
 * (`Corpus.cdcChunks`), modeling the shipped algorithm — boundary AFTER
 * 0-based word position i ⟺ i ≥ 2 and md5 of the trailing 3-word window
 * starts with hex digit '0' or '8'; a word belongs to the chunk of the
 * last boundary strictly before it — in pure Scala against
 * java.security MessageDigest (the same md5 both engines compute).
 *
 * Two claims, the scaladoc's load-bearing ones:
 *  1. Lossless partition: the chunks of any document concatenate back to
 *     the document (no word lost, duplicated, or reordered).
 *  2. Prefix-shift resynchronization — the property that makes CDC beat
 *     fixed-grid segmentation for dedup: prepending ANY words changes at
 *     most the first chunk's worth of chunking. Precisely: boundary
 *     decisions at positions whose 3-word window lies entirely inside the
 *     original words are unchanged, so every original chunk after the
 *     original's FIRST boundary reappears verbatim as a contiguous suffix
 *     of the shifted document's chunk list.
 *
 * Seed policy (round 6, repo-wide): pinned initial seed via
 * `overrideParameters`, three seed objects.
 */
abstract class CdcChunkPropsBase(seed: Long, tag: String)
    extends Properties(s"CdcChunk-$tag") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withInitialSeed(Seed(seed)).withMinSuccessfulTests(200)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** The shipped rule: boundary after 0-based position i. */
  private def isBoundary(ws: IndexedSeq[String], i: Int): Boolean =
    i >= 2 && {
      val h = md5hex(s"${ws(i - 2)} ${ws(i - 1)} ${ws(i)}")
      h.head == '0' || h.head == '8'
    }

  /** Chunk texts in document order (the groupBy(doc, chunk_id) rebuild). */
  private def chunksOf(ws: IndexedSeq[String]): List[String] = {
    if (ws.isEmpty) return Nil
    val out = List.newBuilder[String]
    val cur = collection.mutable.ArrayBuffer.empty[String]
    ws.indices.foreach { i =>
      cur += ws(i)
      if (isBoundary(ws, i)) { out += cur.mkString(" "); cur.clear() }
    }
    if (cur.nonEmpty) out += cur.mkString(" ")
    out.result()
  }

  // lowercase word generator (the Spark side lowercases before splitting;
  // words must be whitespace-free to round-trip through split)
  private val wordGen: Gen[String] =
    Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val docGen: Gen[IndexedSeq[String]] =
    Gen.choose(0, 200).flatMap(n => Gen.listOfN(n, wordGen).map(_.toIndexedSeq))
  private val prefixGen: Gen[IndexedSeq[String]] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, wordGen).map(_.toIndexedSeq))

  property("chunks partition the document losslessly") =
    forAll(docGen) { ws =>
      chunksOf(ws).mkString(" ") == ws.mkString(" ")
    }

  property("boundary decisions inside the original text are shift-invariant") =
    forAll(prefixGen, docGen) { (p, ws) =>
      val shifted = p ++ ws
      // for i >= 2 the original window [i-2, i] is entirely original text,
      // and in the shifted doc the same window sits at offset p.length
      (2 until ws.length).forall { i =>
        isBoundary(ws, i) == isBoundary(shifted, p.length + i)
      }
    }

  property("prefix shift preserves every chunk after the first boundary, as a suffix") =
    forAll(prefixGen, docGen) { (p, ws) =>
      val tail = chunksOf(ws).drop(1) // chunks after ws's first boundary
      val shifted = chunksOf(p ++ ws)
      propBoolean(shifted.takeRight(tail.length) == tail) :|
        s"tail=$tail shiftedSuffix=${shifted.takeRight(tail.length)}"
    }
}

object CdcChunkProps extends CdcChunkPropsBase(0x3c7d1a42L, "seedA")
object CdcChunkPropsSeedB extends CdcChunkPropsBase(0x58f2e9b07a16c3d4L, "seedB")
object CdcChunkPropsSeedC extends CdcChunkPropsBase(0x9ab04e61d27f38c5L, "seedC")
