package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators over the events-shaped table
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference daemon only does arrival-time micro-batching (SURVEY
  * §2.9: "no watermarks / event-time windows"); a training-data
  * pipeline needs real event-time semantics, so these are part of the
  * beyond-reference surface: watermarked tumbling windows (late data
  * dropped deterministically) and gap-based sessionization with
  * explicit state (KeyValueGroupedDataset.flatMapGroupsWithState).
  * Both operate identically on batch DataFrames (windowedCounts is
  * oracle-checkable via q_hourly_batches' shape).
  */
object EventStreams {

  /** Tumbling event-time window counts/sums with a watermark; in
    * streaming mode emits only finalized windows (append mode).
    */
  /** Stream-stream INTERVAL join: match each right-stream event to
    * left-stream events with the same key that happened in
    * [rightTime - horizon, rightTime] — the attribution shape
    * (impression ⋈ click within N minutes). Both sides carry
    * watermarks so Spark bounds the join state: a left event is
    * dropped from state once no admissible right event can still
    * arrive (leftWatermark + horizon), exactly the condition the
    * interval predicate implies. Without the time-bound predicate this
    * would be an unbounded-state cross join — the predicate IS the
    * state eviction policy.
    *
    * Columns: left (key, ts, ...) ⋈ right (key, rts, ...) → inner join
    * rows. Expects distinct column names on the two inputs.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      rightKeyCol: String, tsCol: String, rightTsCol: String,
      horizon: String, delay: String = "1 minute"): DataFrame = {
    val l = left.withWatermark(tsCol, delay)
    val r = right.withWatermark(rightTsCol, delay)
    l.join(r,
      expr(s"$keyCol = $rightKeyCol AND " +
        s"$tsCol <= $rightTsCol AND " +
        s"$tsCol >= $rightTsCol - INTERVAL $horizon"))
  }

  def windowedCounts(events: DataFrame, windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sm"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sm"))

  case class Event(user_id: Long, ts: Instant, event_type: String,
      value: Double)
  case class Session(user_id: Long, session_start: Instant,
      session_end: Instant, n_events: Long, total_value: Double)

  /** Microsecond epoch — java.sql.Timestamp.getTime would truncate to
    * milliseconds and lose parquet's microsecond precision.
    */
  private def micros(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  private def fromMicros(us: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
      Math.floorMod(us, 1000000L) * 1000L)

  private[streaming] case class SessionState(start: Long, end: Long, n: Long,
      total: Double)

  /** Gap-based sessionization: consecutive events of a user belong to
    * one session while gaps stay under `gapMs`. BATCH semantics: each
    * invocation sees a user's complete history and emits final
    * sessions. For unbounded input use `sessionizeStream`, which holds
    * open sessions in state across micro-batches; this variant rejects
    * streaming input rather than silently fragmenting sessions at
    * batch boundaries.
    */
  def sessionize(events: Dataset[Event], gapMs: Long)
      : Dataset[Session] = {
    require(!events.isStreaming,
      "sessionize is batch-only; use sessionizeStream for unbounded " +
        "input (event-time timeouts close sessions at the watermark)")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event],
            state: GroupState[SessionState]) =>
          // batch semantics: fold the user's events in time order,
          // emitting a session whenever the gap exceeds gapMs
          val sorted = it.toSeq.sortBy(e => micros(e.ts))
          val out = Seq.newBuilder[Session]
          var cur: Option[SessionState] = state.getOption
          sorted.foreach { e =>
            val t = micros(e.ts)
            cur match {
              case Some(s) if t - s.end <= gapMs * 1000L =>
                cur = Some(s.copy(end = t, n = s.n + 1,
                  total = s.total + e.value))
              case Some(s) =>
                out += Session(userId, fromMicros(s.start),
                  fromMicros(s.end), s.n, s.total)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach { s =>
            out += Session(userId, fromMicros(s.start),
              fromMicros(s.end), s.n, s.total)
          }
          state.remove()
          out.result().iterator
      }
  }

  /** Streaming sessionization with correct out-of-order handling:
    * per-user state holds a LIST of candidate sessions; each incoming
    * event (the engine admits anything newer than the watermark, in
    * any order) is inserted as a singleton and the list re-coalesced
    * by the gap rule (merging can extend a session backwards OR
    * forwards, and can fuse two sessions an out-of-order event
    * bridges). A session is emitted only once the watermark passes
    * session_end + gap — i.e. when no admissible event can still
    * touch it — so every session is emitted exactly once, final.
    */
  def sessionizeStream(events: Dataset[Event], gapMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    require(events.isStreaming,
      "sessionizeStream needs streaming input; use sessionize for batch")
    val gapUs = gapMs * 1000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event],
            state: GroupState[List[SessionState]]) =>
          val existing = state.getOption.getOrElse(Nil)
          // insert events as singletons, then coalesce by gap
          val singletons = it.map(e =>
            SessionState(micros(e.ts), micros(e.ts), 1, e.value)).toList
          val merged = (existing ++ singletons)
            .sortBy(s => (s.start, s.end))
            .foldLeft(List.empty[SessionState]) {
              case (acc @ (prev :: rest), cur)
                  if cur.start - prev.end <= gapUs =>
                prev.copy(end = math.max(prev.end, cur.end),
                  n = prev.n + cur.n,
                  total = prev.total + cur.total) :: rest
              case (acc, cur) => cur :: acc
            }
            .reverse
          // emit sessions no admissible event can still touch
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (closed, open) = merged.partition(_.end + gapUs < wmUs)
          if (open.isEmpty) state.remove()
          else {
            state.update(open)
            // flush the earliest-finishing open session at its horizon
            state.setTimeoutTimestamp(
              open.map(_.end).min / 1000L + gapMs)
          }
          closed.iterator.map(s => Session(userId, fromMicros(s.start),
            fromMicros(s.end), s.n, s.total))
      }
  }

  /** Event funnel: per user, the earliest chain through `steps` where
    * each step happens within `withinMs` of the previous one — the
    * conversion/sequence primitive (view → click → purchase) of
    * behavioral analytics. Greedy-earliest semantics: stage 1 is the
    * user's first `steps(0)` event; stage i is the first `steps(i-1)`
    * event in `[t_{i-1}, t_{i-1} + withinMs]`. Earliest-chaining makes
    * the result a deterministic function of the event set (and
    * SQL-restatable), at the usual cost: a later stage-1 occurrence
    * that would have chained further is not explored.
    *
    * Scale shape: one filtered partial min-aggregation per step, each
    * keyed on the user column — no windows, no per-user sort, no
    * cross-step shuffle beyond the user-keyed joins (co-partitioned
    * under one bucketing at scale). Time math is integer microseconds
    * on both engines.
    *
    * @return one row per user that reached stage >= 1:
    *   (userCol, stage, t1 .. t_{steps.length}) with nulls past the
    *   reached stage.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], withinMs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(withinMs > 0, s"withinMs must be positive (got $withinMs)")
    val stageTimes = steps.zipWithIndex.scanLeft(
        Option.empty[DataFrame]) { case (prev, (step, i)) =>
      val tcol = s"t${i + 1}"
      Some(prev match {
        case None =>
          events.where(col(typeCol) === step)
            .groupBy(col(userCol)).agg(min(col(tsCol)).as(tcol))
        case Some(p) =>
          val pcol = s"t$i"
          events.where(col(typeCol) === step)
            .select(col(userCol), col(tsCol).as("nts"))
            .join(p.select(col(userCol), col(pcol)), Seq(userCol))
            .where(unix_micros(col("nts")) >= unix_micros(col(pcol)) &&
              unix_micros(col("nts")) - unix_micros(col(pcol)) <=
                withinMs * 1000L)
            .groupBy(col(userCol)).agg(min(col("nts")).as(tcol))
      })
    }.flatten
    val joined = stageTimes.zipWithIndex.tail.foldLeft(stageTimes.head) {
      case (acc, (df, _)) => acc.join(df, Seq(userCol), "left")
    }
    // built inside-out so the HIGHEST reached stage is tested first
    val stage = steps.indices.foldLeft(lit(0)) { case (acc, i) =>
      when(col(s"t${i + 1}").isNotNull, lit(i + 1)).otherwise(acc)
    }
    joined.select(col(userCol) +: stage.as("stage") +:
      steps.indices.map(i => col(s"t${i + 1}")): _*)
  }
}
