package graft.queries

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Properties of the sessionizer's pure gap-merge core.
  *
  * Reference semantics: sort all underlying event points by time and split
  * wherever consecutive points are >= gap apart (the gaps-and-islands
  * definition the D22 oracle uses). The merge must reproduce that no
  * matter how the points were pre-grouped into partial sessions — the
  * invariant that makes late-but-in-watermark bridging correct.
  */
object SessionMergeProps extends Properties("SessionMerge") {
  // repo seed policy (round 6): pin the ScalaCheck seed so green is
  // reproducible, never generator luck (see TemperatureMixProps scaladoc)
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withInitialSeed(org.scalacheck.rng.Seed(0x73657373L))

  private val gap = 100L

  private val pointsGen: Gen[List[Long]] = for {
    n <- Gen.choose(0, 60)
    ts <- Gen.listOfN(n, Gen.choose(0L, 2000L))
  } yield ts

  /** Reference: sessions from raw points by the gaps-and-islands rule. */
  private def reference(ts: List[Long]): List[(Long, Long, Long)] = {
    val sorted = ts.sorted
    if (sorted.isEmpty) Nil
    else sorted.tail.foldLeft(List((sorted.head, sorted.head, 1L))) {
      case ((s, l, n) :: rest, t) =>
        if (t - l >= gap) (t, t, 1L) :: (s, l, n) :: rest
        else (s, math.max(l, t), n + 1) :: rest
      case (Nil, t) => List((t, t, 1L))
    }.reverse
  }

  /** Split points arbitrarily into pre-merged chunks, sessionize each chunk
    * independently, then merge — must equal sessionizing all points at once. */
  property("merge is independent of prior grouping (bridging-correct)") =
    forAll(pointsGen, Gen.choose(1, 5)) { (ts, nChunks) =>
      val asPoints = ts.map(t => SessState(t, t, 1, t))
      val direct = StreamingOpsQueries.mergeSessions(asPoints, gap)

      val chunks = ts.zipWithIndex.groupBy(_._2 % nChunks).values
        .map(_.map(_._1)).toList
      val preMerged = chunks.flatMap { chunk =>
        StreamingOpsQueries.mergeSessions(chunk.map(t => SessState(t, t, 1, t)), gap)
      }
      val viaChunks = StreamingOpsQueries.mergeSessions(preMerged, gap)
      viaChunks == direct
    }

  property("matches the gaps-and-islands reference on raw points") =
    forAll(pointsGen) { ts =>
      val got = StreamingOpsQueries
        .mergeSessions(ts.map(t => SessState(t, t, 1, 1)), gap)
        .map(s => (s.startMicros, s.lastMicros, s.n))
      got == reference(ts)
    }

  property("counts and units are conserved") =
    forAll(pointsGen) { ts =>
      val merged = StreamingOpsQueries
        .mergeSessions(ts.map(t => SessState(t, t, 1, t)), gap)
      merged.map(_.n).sum == ts.length.toLong &&
        merged.map(_.units).sum == ts.sum
    }
}
