package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Marks EVERY test of the mixing suite with the `graft.SlowTest` tag.
 *
 * The soak / scale / compaction scenario suites replay hundreds of
 * micro-batches each (~26 of the suite's ~36 minutes of test time,
 * round-19 measurement) — far past any CI-style time budget, and their
 * guarantees (flat cost over depth, bounded file counts, crash-window
 * invisibility) do not change with ordinary code edits the fast suites
 * already cover. The default `sbt test` excludes this tag (build.sbt
 * passes ScalaTest `-l graft.SlowTest` unless `SPARK_GRAFT_FULL_TESTS`
 * is set), so the contract run finishes in minutes; set
 * `SPARK_GRAFT_FULL_TESTS=1` for the full pre-release sweep.
 */
trait SoakTagged extends AnyFunSuite {
  override def tags: Map[String, Set[String]] =
    testNames.iterator.map(n =>
      n -> (super.tags.getOrElse(n, Set.empty) + "graft.SlowTest")).toMap
}
