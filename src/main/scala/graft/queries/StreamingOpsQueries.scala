package graft.queries

import java.nio.file.{Files, Path}
import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import Tables._
import graft.ops.Upsert

/** Input row for the typed sessionization path. */
final case class SessionEvent(user_id: Long, event_id: Long, ts: Instant, value: Double)

/** One open session: epoch-micro bounds, event count, and the value sum in
  * exact 1e-4 units (DECIMAL(18,4)-equivalent integer accumulation). */
final case class SessState(startMicros: Long, lastMicros: Long, n: Long, units: Long)

/** Streaming-sessionizer state: ALL of a user's open sessions. A late (but
  * in-watermark) event can bridge two of them, so a single-session state
  * would have to emit eagerly and could never retract. */
final case class SessVec(sessions: Seq[SessState])

/** Output session for the typed sessionization path. */
final case class UserSession(user_id: Long, session_start: String,
                             n_events: Long, sum_value: Double)

/** Input row for the transformWithState path: value pre-rounded to exact
  * 1e-4 integer units (state must not accumulate order-dependent doubles). */
final case class TypedEvent(event_type: String, value_u: Long)

/** Running per-key totals emitted by [[TypeTotalsProcessor]]. */
final case class TypeTotals(event_type: String, n: Long, value_u: Long)

/**
 * `StatefulProcessor` for the transformWithState API (Spark 4's successor
 * to flatMapGroupsWithState): one `ValueState` cell of exact running totals
 * per key, updated per micro-batch, emitting the key's current totals —
 * update-mode semantics, composed downstream with an upsert sink.
 */
final class TypeTotalsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, TypedEvent, TypeTotals] {
  import org.apache.spark.sql.streaming.{TimerValues, TTLConfig}
  @transient private var totals: org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode,
                    timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)]("totals",
      org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[TypedEvent],
                               timerValues: TimerValues): Iterator[TypeTotals] = {
    var (n, u) = if (totals.exists()) totals.get() else (0L, 0L)
    rows.foreach { r => n += 1; u += r.value_u }
    totals.update((n, u))
    Iterator.single(TypeTotals(key, n, u))
  }
}

/**
 * Streaming operator surface beyond the windowed-aggregation path
 * (SURVEY §2.2): stream-static joins, streaming deduplication, and custom
 * stateful processing via `flatMapGroupsWithState`.
 */
object StreamingOpsQueries {

  private def tempDirs(label: String): (Path, Path, Path) = {
    val base = Tables.scratchDir(label)
    (base.resolve("input"), base.resolve("out"), base.resolve("ckpt"))
  }

  private def writeFileSeq(dfs: Seq[DataFrame], input: Path): Unit =
    // sequential appends => strictly increasing modification times => the
    // file stream source processes them in this order
    dfs.foreach(_.coalesce(1).write.mode("append").parquet(input.toString))

  private def runStream(spark: SparkSession, input: Path, out: Path, ckpt: Path,
                        label: String, transform: DataFrame => DataFrame): DataFrame = {
    val schema = spark.read.parquet(input.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input.toString)
    StreamingQueries.withStatePartitions(spark, 8) {
      val q = transform(stream).writeStream
        .format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .queryName(s"graft:$label")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out.toString)
  }

  // ---------------------------------------------------------------- d32
  /** Stream-static join: the event stream joined to the static customer
    * dimension (broadcast — the dimension is loaded once per micro-batch
    * plan, the scalable shape for stream enrichment). Stateless, so no
    * watermark is needed and every row appends exactly once. */
  def d32StreamStaticJoin(spark: SparkSession, dir: String): DataFrame = {
    val (input, out, ckpt) = tempDirs("d32")
    writeFileSeq(Seq(events(spark, dir)), input)
    val cust = customer(spark, dir)
    runStream(spark, input, out, ckpt, "d32", stream =>
      stream.join(broadcast(cust), stream("user_id") === cust("c_custkey"))
        .select(col("event_id"), col("c_mktsegment"), col("value"),
          tsString(col("ts")).as("ts")))
      .orderBy("event_id")
  }

  val d32Oracle: String =
    """SELECT event_id, c_mktsegment, value,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts
      |FROM events JOIN customer ON user_id = c_custkey
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- d33
  /** Streaming exact dedup: the input is staged twice (the second file is a
    * full late replay), and `dropDuplicates` on the key emits each event
    * exactly once across micro-batches. The duplicate copies are identical
    * rows, so the output set is deterministic regardless of arrival order. */
  def d33StreamDedup(spark: SparkSession, dir: String): DataFrame = {
    val (input, out, ckpt) = tempDirs("d33")
    val ev = events(spark, dir)
    writeFileSeq(Seq(ev, ev), input)
    runStream(spark, input, out, ckpt, "d33", stream =>
      stream.dropDuplicates("event_id")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), tsString(col("ts")).as("ts")))
      .orderBy("event_id")
  }

  val d33Oracle: String =
    """SELECT event_id, user_id, event_type, value,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts
      |FROM events
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- d91
  /** Streaming dedup with BOUNDED state (`dropDuplicatesWithinWatermark`):
    * unlike d33's plain `dropDuplicates` (whose key state grows forever),
    * the watermark evicts keys once they age out — the only dedup shape that
    * survives an unbounded 100 TB stream. The replayed second file arrives
    * one micro-batch later: its rows are dropped either as in-state
    * duplicates or as late data, so the output is exactly the distinct event
    * set either way. */
  def d91StreamDedupWm(spark: SparkSession, dir: String): DataFrame = {
    val (input, out, ckpt) = tempDirs("d91")
    val ev = events(spark, dir)
    writeFileSeq(Seq(ev, ev), input)
    runStream(spark, input, out, ckpt, "d91", stream =>
      stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), tsString(col("ts")).as("ts")))
      .orderBy("event_id")
  }

  // same distinct-set contract as d33
  val d91Oracle: String = d33Oracle

  // ---------------------------------------------------------------- d34
  private val microsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS").withZone(ZoneOffset.UTC)

  /**
   * Custom stateful sessionization through the typed
   * `KeyValueGroupedDataset.flatMapGroupsWithState` API — the streaming
   * engine's escape hatch for state machines the built-in windows can't
   * express. Executed here over the bounded events table (batch mode runs
   * the same function with empty state), producing exactly D22's sessions:
   * per-user 30-minute-gap sessions with the same half-open `>=` boundary
   * and the same exact-decimal value sum as the SQL oracle.
   *
   * Scale note: each invocation sees one user's events; memory is bounded by
   * per-user activity, and users are hash-partitioned across executors.
   */
  def d34FmgwsSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val gapMicros = 30L * 60 * 1000000
    val sessions = events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[SessionEvent], _: GroupState[Long]) =>
          val evs = it.toArray
            .sortBy(e => (e.ts.getEpochSecond, e.ts.getNano, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
          var start = 0
          def emit(from: Int, until: Int): Unit = {
            // exact-decimal sum matching CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DOUBLE)
            val sum = evs.slice(from, until)
              .map(e => java.math.BigDecimal.valueOf(e.value)
                .setScale(4, java.math.RoundingMode.HALF_UP))
              .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
            out += UserSession(uid, microsFmt.format(evs(from).ts),
              until - from, sum.doubleValue())
          }
          var i = 1
          while (i < evs.length) {
            val gap = java.time.Duration.between(evs(i - 1).ts, evs(i).ts)
            if (gap.toNanos / 1000 >= gapMicros) { emit(start, i); start = i }
            i += 1
          }
          if (evs.nonEmpty) emit(start, evs.length)
          out.iterator
      }
      .toDF()
    sessions.orderBy("user_id", "session_start")
  }

  // same result contract as D22, so the same gaps-and-islands oracle applies
  val d34Oracle: String = StreamingQueries.d22Oracle

  // ---------------------------------------------------------------- d45
  /**
   * TRUE streaming sessionization: `flatMapGroupsWithState` with
   * `EventTimeTimeout` over a multi-batch file stream. Per user, the state
   * machine extends the open session while events arrive within the 30-min
   * gap, emits it when a newer event opens the next one, and relies on the
   * event-time timeout (watermark passing `last + gap`) to flush sessions
   * that simply stop receiving events. The staged far-future sentinel pushes
   * the watermark past every real session; the sentinel's own open session
   * never times out and is therefore never emitted. Must equal the batch
   * session-window oracle exactly.
   */
  def d45StreamingSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (input, out, ckpt) = tempDirs("d45")
    StreamingQueries.stageInput(spark, dir, input, chunks = 5, shuffled = false)

    val gapMicros = 30L * 60 * 1000000
    val schema = spark.read.parquet(input.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input.toString)

    val sessions = stream
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        sessionize(gapMicros) _)

    StreamingQueries.withStatePartitions(spark, 8) {
      val q = sessions.toDF().writeStream
        .format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .queryName("graft:d45")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    spark.read.parquet(out.toString)
      .filter(col("user_id") >= 0)
      .orderBy("user_id", "session_start")
  }

  private def micros(i: Instant): Long = i.getEpochSecond * 1000000L + i.getNano / 1000

  /** Pure gap-merge over a session/point set: sort by start, merge any
    * interval whose start is strictly under `gap` past the running
    * interval's last event (`>= gap` opens a new session, matching
    * `session_window` and the gaps-and-islands oracle). Counts and unit
    * sums are additive under merge, so the result is independent of how
    * the input was previously grouped into sessions. */
  private[graft] def mergeSessions(ss: Seq[SessState], gapMicros: Long): List[SessState] =
    ss.sortBy(s => (s.startMicros, s.lastMicros))
      .foldLeft(List.empty[SessState]) {
        case (cur :: rest, s) if s.startMicros - cur.lastMicros < gapMicros =>
          SessState(cur.startMicros, math.max(cur.lastMicros, s.lastMicros),
            cur.n + s.n, cur.units + s.units) :: rest
        case (acc, s) => s :: acc
      }.reverse

  /** Value in exact 1e-4 units — the integer form of the oracle's
    * `CAST(value AS DECIMAL(18,4))` accumulation (half-up, sign-correct;
    * `math.round(v * 100)` would lose >2-decimal inputs and round negative
    * ties toward +inf). */
  private def valueUnits(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /**
   * Watermark-correct sessionization: the state is the user's full open
   * interval set, new events enter as single-point sessions, and one
   * gap-merge pass unifies everything — so a late-but-in-watermark event
   * that arrives between (or before) open sessions extends or BRIDGES them
   * instead of forcing an eager, unretractable emission. A session is
   * emitted only when the watermark has passed `last + gap`: any event the
   * watermark still admits has `t ≥ watermark ≥ last + gap`, which by the
   * gap rule cannot extend or bridge it — emission is final by construction.
   */
  private[graft] def sessionize(gapMicros: Long)(
      uid: Long, it: Iterator[SessionEvent],
      state: GroupState[SessVec]): Iterator[UserSession] = {
    def toSession(s: SessState): UserSession =
      UserSession(uid, microsFmt.format(Instant.ofEpochSecond(
        s.startMicros / 1000000L, (s.startMicros % 1000000L) * 1000)),
        s.n, s.units / 10000.0)

    val existing = state.getOption.map(_.sessions).getOrElse(Seq.empty)
    val points = it.map { e =>
      val t = micros(e.ts)
      SessState(t, t, 1, valueUnits(e.value))
    }.toSeq
    val merged = StreamingOpsQueries.mergeSessions(existing ++ points, gapMicros)

    val wmMicros = state.getCurrentWatermarkMs() * 1000L
    val (done, open) = merged.partition(s => s.lastMicros + gapMicros <= wmMicros)
    if (open.isEmpty) state.remove()
    else {
      state.update(SessVec(open))
      // fire once the watermark passes the earliest open gap horizon
      state.setTimeoutTimestamp((open.map(_.lastMicros).min + gapMicros) / 1000L)
    }
    done.iterator.map(toSession)
  }

  // ---------------------------------------------------------------- d51
  /**
   * Stream-stream interval join: the click stream joined to the purchase
   * stream on user within a 30-minute event-time window, both sides
   * watermarked (watermarks bound the join state; an inner join emits
   * matches as both sides arrive, so the AvailableNow result is complete
   * and equals the batch interval join).
   */
  def d51StreamStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.scratchDir("d51")
    val ev = events(spark, dir)
    val clickDir = base.resolve("clicks")
    val purchaseDir = base.resolve("purchases")
    ev.filter(col("event_type") === "click").coalesce(1)
      .write.parquet(clickDir.toString)
    ev.filter(col("event_type") === "purchase").coalesce(1)
      .write.parquet(purchaseDir.toString)

    def readStreamOf(p: Path, prefix: String) = {
      val schema = spark.read.parquet(p.toString).schema
      spark.readStream.schema(schema).parquet(p.toString)
        .select(col("event_id").as(s"${prefix}_id"), col("user_id").as(s"${prefix}_user"),
          col("ts").as(s"${prefix}_ts"), col("value").as(s"${prefix}_value"))
        .withWatermark(s"${prefix}_ts", "1 hour")
    }
    val clicks = readStreamOf(clickDir, "click")
    val purchases = readStreamOf(purchaseDir, "purchase")
    val joined = clicks.join(purchases,
      col("click_user") === col("purchase_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("click_id"), col("purchase_id"), col("click_user").as("user_id"),
        tsString(col("click_ts")).as("click_ts"),
        tsString(col("purchase_ts")).as("purchase_ts"))

    val out = base.resolve("out")
    StreamingQueries.withStatePartitions(spark, 8) {
      val q = joined.writeStream
        .format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .outputMode("append")
        .queryName("graft:d51")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out.toString).orderBy("click_id", "purchase_id")
  }

  val d51Oracle: String =
    """SELECT c.event_id AS click_id, p.event_id AS purchase_id,
      |  c.user_id,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id
      | AND p.ts >= c.ts
      | AND p.ts <= c.ts + INTERVAL 30 MINUTE
      |ORDER BY click_id, purchase_id""".stripMargin

  // ---------------------------------------------------------------- d94
  /**
   * Stream-stream LEFT OUTER interval join — the semantics d51's inner
   * join cannot express: a click with no purchase within its 30-minute
   * window must still be emitted, null-padded, and that emission is
   * watermark-driven state eviction (the row leaves the join state when
   * the global watermark passes `click_ts + 30min`, proving no matching
   * purchase can still arrive). Clicks above the final-watermark horizon
   * stay in state and are never emitted — the oracle mirrors exactly that
   * cutoff: `W = min(max click_ts, max purchase_ts) − 1h` (Spark's global
   * watermark is the min across inputs), null rows only where
   * `click_ts + 30min < W`. The matched rows are complete (inner-join
   * portion emits as both sides arrive), so the whole result is
   * deterministic despite the eviction asymmetry.
   */
  /** Stage the click/purchase event streams and run one interval join of
    * the given type through a parquet sink; shared by d94/d95/d96. */
  private def intervalJoinReplay(spark: SparkSession, dir: String,
                                 label: String, joinType: String): DataFrame = {
    val base = Tables.scratchDir(label)
    val ev = events(spark, dir)
    val clickDir = base.resolve("clicks")
    val purchaseDir = base.resolve("purchases")
    ev.filter(col("event_type") === "click").coalesce(1)
      .write.parquet(clickDir.toString)
    ev.filter(col("event_type") === "purchase").coalesce(1)
      .write.parquet(purchaseDir.toString)

    def readStreamOf(p: Path, prefix: String) = {
      val schema = spark.read.parquet(p.toString).schema
      spark.readStream.schema(schema).parquet(p.toString)
        .select(col("event_id").as(s"${prefix}_id"), col("user_id").as(s"${prefix}_user"),
          col("ts").as(s"${prefix}_ts"), col("value").as(s"${prefix}_value"))
        .withWatermark(s"${prefix}_ts", "1 hour")
    }
    val clicks = readStreamOf(clickDir, "click")
    val purchases = readStreamOf(purchaseDir, "purchase")
    val cond = col("click_user") === col("purchase_user") &&
      col("purchase_ts") >= col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES")
    val joined = joinType match {
      case "leftSemi" =>
        clicks.join(purchases, cond, "leftSemi")
          .select(col("click_id"), col("click_user").as("user_id"),
            tsString(col("click_ts")).as("click_ts"))
      case t =>
        clicks.join(purchases, cond, t)
          .select(col("click_id"), col("purchase_id"),
            coalesce(col("click_user"), col("purchase_user")).as("user_id"),
            tsString(col("click_ts")).as("click_ts"),
            tsString(col("purchase_ts")).as("purchase_ts"))
    }

    val out = base.resolve("out")
    StreamingQueries.withStatePartitions(spark, 8) {
      val q = joined.writeStream
        .format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .outputMode("append")
        .queryName(s"graft:$label")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val res = spark.read.parquet(out.toString)
    if (joinType == "leftSemi") res.orderBy("click_id")
    else res.orderBy(col("click_id").asc_nulls_last,
      col("purchase_id").asc_nulls_first)
  }

  def d94StreamOuterJoin(spark: SparkSession, dir: String): DataFrame =
    intervalJoinReplay(spark, dir, "d94", "leftOuter")

  val d94Oracle: String =
    """WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
      |p AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |wm AS (SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
      |              - INTERVAL 1 HOUR AS w)
      |SELECT * FROM (
      |  SELECT c.event_id AS click_id, p.event_id AS purchase_id,
      |    c.user_id,
      |    strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
      |    strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts
      |  FROM c JOIN p
      |    ON c.user_id = p.user_id
      |   AND p.ts >= c.ts
      |   AND p.ts <= c.ts + INTERVAL 30 MINUTE
      |  UNION ALL
      |  SELECT c.event_id AS click_id, CAST(NULL AS BIGINT) AS purchase_id,
      |    c.user_id,
      |    strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
      |    CAST(NULL AS VARCHAR) AS purchase_ts
      |  FROM c, wm
      |  WHERE c.ts + INTERVAL 30 MINUTE < wm.w
      |    AND NOT EXISTS (SELECT 1 FROM p
      |                    WHERE p.user_id = c.user_id
      |                      AND p.ts >= c.ts
      |                      AND p.ts <= c.ts + INTERVAL 30 MINUTE)
      |)
      |ORDER BY click_id, purchase_id NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- d95
  /**
   * Stream-stream FULL OUTER interval join — both eviction bounds at once.
   * The click side null-pads below `W − 30min` as in d94; the purchase
   * side's bound is tighter: a purchase can only match clicks with
   * `click_ts ∈ [purchase_ts − 30min, purchase_ts]`, all ≤ purchase_ts,
   * so the row is provably matchless (and null-padded) as soon as
   * `purchase_ts < W` — no interval arithmetic on that side. Rows above
   * either horizon stay in state unemitted; the oracle mirrors both
   * cutoffs exactly.
   */
  def d95StreamFullOuterJoin(spark: SparkSession, dir: String): DataFrame =
    intervalJoinReplay(spark, dir, "d95", "fullOuter")

  val d95Oracle: String =
    """WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
      |p AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |wm AS (SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
      |              - INTERVAL 1 HOUR AS w)
      |SELECT * FROM (
      |  SELECT c.event_id AS click_id, p.event_id AS purchase_id,
      |    c.user_id,
      |    strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
      |    strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts
      |  FROM c JOIN p
      |    ON c.user_id = p.user_id
      |   AND p.ts >= c.ts
      |   AND p.ts <= c.ts + INTERVAL 30 MINUTE
      |  UNION ALL
      |  SELECT c.event_id, CAST(NULL AS BIGINT), c.user_id,
      |    strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f'), CAST(NULL AS VARCHAR)
      |  FROM c, wm
      |  WHERE c.ts + INTERVAL 30 MINUTE < wm.w
      |    AND NOT EXISTS (SELECT 1 FROM p
      |                    WHERE p.user_id = c.user_id
      |                      AND p.ts >= c.ts
      |                      AND p.ts <= c.ts + INTERVAL 30 MINUTE)
      |  UNION ALL
      |  SELECT CAST(NULL AS BIGINT), p.event_id, p.user_id,
      |    CAST(NULL AS VARCHAR), strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f')
      |  FROM p, wm
      |  WHERE p.ts < wm.w
      |    AND NOT EXISTS (SELECT 1 FROM c
      |                    WHERE c.user_id = p.user_id
      |                      AND p.ts >= c.ts
      |                      AND p.ts <= c.ts + INTERVAL 30 MINUTE)
      |)
      |ORDER BY click_id NULLS LAST, purchase_id NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- d96
  /**
   * Stream-stream LEFT SEMI interval join: match-existence semantics — a
   * click is emitted once (no purchase columns, no duplicates) as soon as
   * any in-window purchase arrives. The matched set is complete at
   * AvailableNow termination (semi emits on match, not on eviction), so
   * the oracle is a plain EXISTS with no watermark cutoff.
   */
  def d96StreamSemiJoin(spark: SparkSession, dir: String): DataFrame =
    intervalJoinReplay(spark, dir, "d96", "leftSemi")

  val d96Oracle: String =
    """SELECT c.event_id AS click_id, c.user_id,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |WHERE EXISTS (SELECT 1 FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |              WHERE p.user_id = c.user_id
      |                AND p.ts >= c.ts
      |                AND p.ts <= c.ts + INTERVAL 30 MINUTE)
      |ORDER BY click_id""".stripMargin

  // ---------------------------------------------------------------- d61
  /**
   * foreachBatch sink with exactly-once commit markers
   * ([[graft.sinks.IdempotentParquetWriter]] — the offline equivalent of the
   * Delta sink's txnAppId/txnVersion): the event stream replays as three
   * files, each micro-batch lands in its own `batch=<id>` directory guarded
   * by a commit marker, and the union of batch directories must equal the
   * input exactly (the same guarantee a checkpoint-recovery replay gets).
   */
  def d61ForeachBatch(spark: SparkSession, dir: String): DataFrame = {
    val (input, out, ckpt) = tempDirs("d61")
    val ev = events(spark, dir)
    // three deterministic key-range files -> three micro-batches
    writeFileSeq(Seq(
      ev.filter(col("event_id") % 3 === 0),
      ev.filter(col("event_id") % 3 === 1),
      ev.filter(col("event_id") % 3 === 2)), input)

    val writer = graft.sinks.IdempotentParquetWriter(
      out.toString, ckpt.resolve("commits").toString, "graft-d61")
    val schema = spark.read.parquet(input.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input.toString)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), tsString(col("ts")).as("ts"))

    StreamingQueries.withStatePartitions(spark, 8) {
      val q = stream.writeStream
        .foreachBatch((df: DataFrame, id: Long) => writer.write(df, id))
        .option("checkpointLocation", ckpt.resolve("stream").toString)
        .outputMode("append")
        .queryName("graft:d61")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out.toString).drop("batch").orderBy("event_id")
  }

  val d61Oracle: String =
    """SELECT event_id, user_id, event_type, value,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts
      |FROM events
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- d44
  /** Kafka payload decode: the connector's fixed binary frame schema
    * ([[graft.sources.KafkaFrames]]) round-tripped — events → JSON value
    * bytes → `from_json` decode → aggregation. The decode transform is
    * identical for a live `format("kafka")` stream. */
  def d44KafkaDecode(spark: SparkSession, dir: String): DataFrame = {
    val frames = graft.sources.KafkaFrames.framesFromEvents(events(spark, dir))
    val payloadSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    graft.sources.KafkaFrames.decodeJson(frames, payloadSchema)
      .groupBy("topic", "partition", "event_type")
      .agg(count(lit(1)).as("n"),
        moneySum(col("value")).as("sum_value"),
        max(col("offset")).as("max_offset"))
      .orderBy("topic", "partition", "event_type")
  }

  val d44Oracle: String =
    """SELECT 'events' AS topic,
      |  CAST(event_id % 8 AS INTEGER) AS partition,
      |  event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
      |  MAX(event_id) AS max_offset
      |FROM events
      |GROUP BY 1, 2, 3
      |ORDER BY topic, partition, event_type""".stripMargin

  // ---------------------------------------------------------------- d69/d70
  /**
   * Update output mode (reference-documented surface, `docs/overview.md:265`)
   * through its canonical sink pattern: each micro-batch emits only the
   * CHANGED keys' current aggregate values, and foreachBatch upserts them
   * into a keyed table ([[graft.ops.Upsert]] — the JDBC/Delta MERGE shape).
   * The final table therefore equals the batch aggregate of all input, which
   * is what the oracle checks. Versioned output dirs keep each merge
   * immutable AND retry-idempotent: the merge source is derived from the
   * batch id (read v{id−1}, write v{id}), so a retried micro-batch re-reads
   * the immutable previous version instead of the possibly partially
   * written dir it is about to overwrite — a mutable last-written ref would
   * self-read-overwrite on retry.
   */
  def d69UpdateMode(spark: SparkSession, dir: String): DataFrame = {
    val (input, out, ckpt) = tempDirs("d69")
    val ev = events(spark, dir)
    writeFileSeq(Seq(
      ev.filter(col("event_id") % 3 === 0),
      ev.filter(col("event_id") % 3 === 1),
      ev.filter(col("event_id") % 3 === 2)), input)

    val schema = spark.read.parquet(input.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input.toString)
    val agg = stream
      .groupBy(concat_ws("|", col("event_type"), (col("user_id") % 7).cast("string")).as("k"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 10000.0, 0).cast("long")).as("value_u"))
    val last = new java.util.concurrent.atomic.AtomicReference[String]("")
    StreamingQueries.withStatePartitions(spark, 8) {
      val q = agg.writeStream
        .foreachBatch { (df: DataFrame, id: Long) =>
          val cur = out.resolve(s"v$id").toString
          val merged =
            if (id == 0L) df
            else Upsert.upsert(
              spark.read.parquet(out.resolve(s"v${id - 1}").toString), df, "k")
          merged.write.mode("overwrite").parquet(cur)
          last.set(cur)
        }
        .option("checkpointLocation", ckpt.toString)
        .outputMode("update")
        .queryName("graft:d69")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(last.get)
      .select(col("k"), col("n"), (col("value_u").cast("double") / 10000.0).as("sum_value"))
      .orderBy("k")
  }

  val d69Oracle: String =
    """SELECT event_type || '|' || CAST(user_id % 7 AS VARCHAR) AS k,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(round(value * 10000.0, 0) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_value
      |FROM events
      |GROUP BY 1
      |ORDER BY k""".stripMargin

  /** Complete output mode: every micro-batch re-emits the ENTIRE aggregate
    * state, and foreachBatch snapshots it (overwrite — the
    * dashboard-refresh shape). The last snapshot equals the batch aggregate
    * of all input. Complete mode only scales when the aggregate itself is
    * small (key count, not input size — here 5 event types). */
  def d70CompleteMode(spark: SparkSession, dir: String): DataFrame = {
    val (input, out, ckpt) = tempDirs("d70")
    val ev = events(spark, dir)
    writeFileSeq(Seq(
      ev.filter(col("event_id") % 3 === 0),
      ev.filter(col("event_id") % 3 === 1),
      ev.filter(col("event_id") % 3 === 2)), input)

    val schema = spark.read.parquet(input.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input.toString)
    val agg = stream.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 10000.0, 0).cast("long")).as("value_u"))
    val last = new java.util.concurrent.atomic.AtomicReference[String]("")
    StreamingQueries.withStatePartitions(spark, 8) {
      val q = agg.writeStream
        .foreachBatch { (df: DataFrame, id: Long) =>
          val cur = out.resolve(s"v$id").toString
          df.write.mode("overwrite").parquet(cur)
          last.set(cur)
        }
        .option("checkpointLocation", ckpt.toString)
        .outputMode("complete")
        .queryName("graft:d70")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(last.get)
      .select(col("event_type"), col("n"),
        (col("value_u").cast("double") / 10000.0).as("sum_value"))
      .orderBy("event_type")
  }

  val d70Oracle: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(round(value * 10000.0, 0) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- d71
  /**
   * transformWithState (Spark 4's arbitrary-state API, the successor to
   * flatMapGroupsWithState): typed `ValueState` running totals per event
   * type across a 3-file micro-batch replay, update-mode emissions upserted
   * into a keyed table exactly like d69. Requires the RocksDB state store
   * (the API's only supported provider — also the right provider at scale:
   * state lives off-heap/on-disk, bounded by keys not heap).
   */
  def d71TransformWithState(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (input, out, ckpt) = tempDirs("d71")
    val ev = events(spark, dir)
    writeFileSeq(Seq(
      ev.filter(col("event_id") % 3 === 0),
      ev.filter(col("event_id") % 3 === 1),
      ev.filter(col("event_id") % 3 === 2)), input)

    val schema = spark.read.parquet(input.toString).schema
    val typed = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input.toString)
      .select(col("event_type"),
        round(col("value") * 10000.0, 0).cast("long").as("value_u"))
      .as[TypedEvent]
    val updates = typed.groupByKey(_.event_type)
      .transformWithState(new TypeTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
      .toDF()

    val last = new java.util.concurrent.atomic.AtomicReference[String]("")
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try StreamingQueries.withStatePartitions(spark, 8) {
      val q = updates.writeStream
        .foreachBatch { (df: DataFrame, id: Long) =>
          // v{id-1} is immutable by the time batch id runs, so a retried
          // batch re-merges from it idempotently (see d69 scaladoc)
          val cur = out.resolve(s"v$id").toString
          val merged =
            if (id == 0L) df
            else Upsert.upsert(
              spark.read.parquet(out.resolve(s"v${id - 1}").toString), df, "event_type")
          merged.write.mode("overwrite").parquet(cur)
          last.set(cur)
        }
        .option("checkpointLocation", ckpt.toString)
        .outputMode("update")
        .queryName("graft:d71")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
    spark.read.parquet(last.get)
      .select(col("event_type"), col("n"),
        (col("value_u").cast("double") / 10000.0).as("sum_value"))
      .orderBy("event_type")
  }

  // same final-state contract as d70's complete-mode aggregate
  val d71Oracle: String = d70Oracle

  // ---------------------------------------------------------------- d87
  /** Row-level `foreach` sink (`ForeachWriter`, the per-row cousin of d61's
    * foreachBatch): each executor partition opens its own output file keyed
    * (partitionId, epochId) — the idempotent naming contract the sink API is
    * built around — writes one line per row, and the files are read back and
    * aggregated. This is the integration point for row-oriented external
    * systems (key-value stores, message queues) that have no DataFrame
    * writer. */
  def d87ForeachWriter(spark: SparkSession, dir: String): DataFrame = {
    val (input, out, ckpt) = tempDirs("d87")
    Files.createDirectories(out)
    writeFileSeq(Seq(events(spark, dir)
      .select(col("event_id"),
        round(col("value") * 10000, 0).cast("long").as("value_u"))), input)
    val outDir = out.toString
    val writer = new org.apache.spark.sql.ForeachWriter[org.apache.spark.sql.Row] {
      @transient private var w: java.io.Writer = _
      override def open(partitionId: Long, epochId: Long): Boolean = {
        // (partitionId, epochId) names the file: a replayed epoch overwrites
        // its own output instead of duplicating it (at-least-once → exactly-
        // once under deterministic partitioning)
        w = Files.newBufferedWriter(
          Path.of(outDir, s"p$partitionId-e$epochId.csv"))
        true
      }
      override def process(r: org.apache.spark.sql.Row): Unit =
        w.write(s"${r.getLong(0)},${r.getLong(1)}\n")
      override def close(errorOrNull: Throwable): Unit = if (w != null) w.close()
    }
    val schema = spark.read.parquet(input.toString).schema
    val q = spark.readStream.schema(schema).parquet(input.toString)
      .writeStream.foreach(writer)
      .option("checkpointLocation", ckpt.toString)
      .queryName("graft:d87")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.schema("event_id LONG, value_u LONG").csv(outDir)
      .agg(count(lit(1)).as("n"), min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"),
        (sum(col("value_u")).cast("double") / 10000.0).as("sum_value"))
  }

  val d87Oracle: String =
    """SELECT COUNT(*) AS n, MIN(event_id) AS min_id, MAX(event_id) AS max_id,
      |  CAST(SUM(CAST(round(value * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_value
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- d88
  /** Streaming into a catalog-managed table (`writeStream.toTable`): the
    * streaming counterpart of d74's batch CTAS — micro-batches append to a
    * session-catalog parquet table created on first start, queried back
    * through `spark.table`. */
  def d88StreamToTable(spark: SparkSession, dir: String): DataFrame = {
    val (input, out, ckpt) = tempDirs("d88")
    // pre-create the location: Spark probes it for _spark_metadata at table
    // resolution, and a missing directory logs a spurious stacktrace
    Files.createDirectories(out)
    spark.sql("DROP TABLE IF EXISTS graft_d88")
    // pre-created EXTERNAL table (explicit scratch location): toTable on a
    // fresh name would create a MANAGED table under spark.sql.warehouse.dir,
    // which lands in the caller's cwd when the session doesn't override it
    // (the d74 lesson); appending to an existing table uses its location
    spark.sql(
      s"""CREATE TABLE graft_d88 (event_id BIGINT, event_type STRING, value_u BIGINT)
         |USING parquet LOCATION '${out.toString}'""".stripMargin)
    writeFileSeq(Seq(events(spark, dir)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 10000, 0).cast("long").as("value_u"))), input)
    val schema = spark.read.parquet(input.toString).schema
    val q = spark.readStream.schema(schema).parquet(input.toString)
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .queryName("graft:d88")
      .trigger(Trigger.AvailableNow())
      .toTable("graft_d88")
    q.awaitTermination()
    spark.table("graft_d88")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        (sum(col("value_u")).cast("double") / 10000.0).as("sum_value"))
      .orderBy("event_type")
  }

  val d88Oracle: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(round(value * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- registry

  val queries: Map[String, BatchQueries.QueryFn] = Map(
    "d32_stream_static_join" -> (d32StreamStaticJoin _),
    "d33_stream_dedup" -> (d33StreamDedup _),
    "d34_fmgws_sessions" -> (d34FmgwsSessions _),
    "d44_kafka_decode" -> (d44KafkaDecode _),
    "d45_streaming_sessions" -> (d45StreamingSessions _),
    "d51_stream_stream_join" -> (d51StreamStreamJoin _),
    "d61_foreach_batch" -> (d61ForeachBatch _),
    "d69_update_mode" -> (d69UpdateMode _),
    "d70_complete_mode" -> (d70CompleteMode _),
    "d71_transform_with_state" -> (d71TransformWithState _),
    "d87_foreach_writer" -> (d87ForeachWriter _),
    "d88_stream_totable" -> (d88StreamToTable _),
    "d91_stream_dedup_wm" -> (d91StreamDedupWm _),
    "d94_stream_outer_join" -> (d94StreamOuterJoin _),
    "d95_stream_full_outer" -> (d95StreamFullOuterJoin _),
    "d96_stream_semi_join" -> (d96StreamSemiJoin _),
  )

  val oracles: Map[String, String] = Map(
    "d32_stream_static_join" -> d32Oracle,
    "d33_stream_dedup" -> d33Oracle,
    "d34_fmgws_sessions" -> d34Oracle,
    "d44_kafka_decode" -> d44Oracle,
    "d45_streaming_sessions" -> StreamingQueries.d22Oracle,
    "d51_stream_stream_join" -> d51Oracle,
    "d61_foreach_batch" -> d61Oracle,
    "d69_update_mode" -> d69Oracle,
    "d70_complete_mode" -> d70Oracle,
    "d71_transform_with_state" -> d71Oracle,
    "d87_foreach_writer" -> d87Oracle,
    "d88_stream_totable" -> d88Oracle,
    "d91_stream_dedup_wm" -> d91Oracle,
    "d94_stream_outer_join" -> d94Oracle,
    "d95_stream_full_outer" -> d95Oracle,
    "d96_stream_semi_join" -> d96Oracle,
  )
}
