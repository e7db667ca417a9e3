package graft

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession => T}

/**
 * Replay-registry invariant (round-14 verdict #1): a query whose BUILD
 * executes a streaming replay pays the local per-micro-batch scheduling
 * floor, so it must be in `SparkEntry.replayQueries` — otherwise its
 * floor lands in the bench's `batch_sec` bucket and reads as a phantom
 * batch-plan regression (exactly how round 14 shipped with n63
 * misbucketed). Detection is behavioral, not a source grep: every
 * non-replay query is BUILT at sf0.001 and must move neither the
 * [[graft.ops.StreamHarness]] invocation counter (synchronous — covers
 * every incremental-index consumer) nor start any Structured Streaming
 * query (listener-observed — covers direct readStream/writeStream
 * shapes). A future incremental index that forgets its registry entry
 * fails here, in `sbt test`, before the bench ever runs.
 */
class ReplayRegistrySpec extends AnyFunSuite {
  lazy val spark = T.spark

  test("replayQueries names only registered queries") {
    val unknown = SparkEntry.replayQueries.diff(SparkEntry.queries.keySet)
    assert(unknown.isEmpty, s"replayQueries entries with no query: $unknown")
  }

  test("every query whose build runs a streaming replay is in replayQueries") {
    // stream starts observed two ways: the harness counter is synchronous
    // and attributes per query; the listener (async) catches any direct
    // writeStream a non-harness build might grow, attributed by queryName
    val startedNames = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        startedNames.add(Option(e.name).getOrElse(e.id.toString))
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val batchNames =
        (SparkEntry.queries.keySet -- SparkEntry.replayQueries).toSeq.sorted
      val offenders = batchNames.filter { name =>
        val h0 = graft.ops.StreamHarness.runs.get()
        SparkEntry.queries(name)(spark, T.sf0001) // build only — a replay runs eagerly
        spark.catalog.clearCache()
        graft.ops.StreamHarness.runs.get() != h0
      }
      assert(offenders.isEmpty,
        s"non-replay queries drove the stream harness during build: $offenders — " +
          "add them to SparkEntry.replayQueries")
      // listener events are delivered async; drain before the final check
      Thread.sleep(2000)
      assert(startedNames.isEmpty,
        s"non-replay query builds started streaming queries: " +
          s"${startedNames.toArray.mkString(", ")} — the owning registry " +
          "entries belong in SparkEntry.replayQueries")
    } finally spark.streams.removeListener(listener)
  }
}
