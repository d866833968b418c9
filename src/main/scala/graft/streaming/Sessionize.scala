package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming gap-based sessionization — the stateful-operator surface
  * (SURVEY.md T10, absent from the reference; the batch twin is
  * operators/Temporal.sessionize, oracle-checked).
  *
  * State per user is O(1): only the open session's (start, end, count) —
  * never buffered events — and is dropped either when a gap closes the
  * session in-stream or when the event-time timeout fires (watermark passed
  * session end + gap), so state size is bounded by the number of
  * *concurrently active* users regardless of history length. That is the
  * property that keeps this runnable forever on an unbounded stream.
  */
object Sessionize {

  /** Open-session state carried between micro-batches. */
  final case class Open(startMs: Long, endMs: Long, n: Long)

  /** A closed session. */
  final case class Session(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long)

  /** Sessionize a stream of (user_id, event-time) pairs. The input MUST
    * carry a watermark on the event-time column (event-time timeouts
    * require it). */
  def sessions(
      events: Dataset[(Long, java.sql.Timestamp)],
      gapMs: Long = 30L * 60 * 1000): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[Open, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp)], state: GroupState[Open]) =>
          if (state.hasTimedOut) {
            // Watermark passed end+gap with no new events: close and emit.
            val open = state.get
            state.remove()
            Iterator.single(Session(uid,
              new java.sql.Timestamp(open.startMs),
              new java.sql.Timestamp(open.endMs), open.n))
          } else {
            val sorted = rows.map(_._2.getTime).toArray.sorted
            var open = state.getOption.orNull
            val closed = Seq.newBuilder[Session]
            // cross-batch late PREFIX: events separated from the open
            // session by more than the gap. Batch semantics would attach
            // them to an earlier (already-emitted, immutable in append
            // mode) session — the bounded-state approximation closes
            // them as their own chain, gap-merged AMONG THEMSELVES: a
            // device flushing an offline buffer delivers one coherent
            // session, not n single-event sessions. (Sorted ascending +
            // a start that can only move earlier ⇒ the late events are
            // exactly a prefix.)
            var i = 0
            if (open != null) {
              var late: Open = null
              while (i < sorted.length && sorted(i) < open.startMs - gapMs) {
                val t = sorted(i)
                late match {
                  case null => late = Open(t, t, 1)
                  case l if t - l.endMs > gapMs =>
                    closed += Session(uid,
                      new java.sql.Timestamp(l.startMs),
                      new java.sql.Timestamp(l.endMs), l.n)
                    late = Open(t, t, 1)
                  case l => late = Open(l.startMs, math.max(l.endMs, t), l.n + 1)
                }
                i += 1
              }
              if (late != null) closed += Session(uid,
                new java.sql.Timestamp(late.startMs),
                new java.sql.Timestamp(late.endMs), late.n)
            }
            while (i < sorted.length) {
              val t = sorted(i)
              open match {
                case null => open = Open(t, t, 1)
                case o if t - o.endMs > gapMs =>
                  closed += Session(uid,
                    new java.sql.Timestamp(o.startMs),
                    new java.sql.Timestamp(o.endMs), o.n)
                  open = Open(t, t, 1)
                case o =>
                  // late-but-adjacent event: extend with min/max, never
                  // move session_end backwards
                  open = Open(math.min(o.startMs, t), math.max(o.endMs, t), o.n + 1)
              }
              i += 1
            }
            state.update(open)
            state.setTimeoutTimestamp(open.endMs + gapMs)
            closed.result().iterator
          }
      }
  }

  /** The transformWithState twin's per-batch fold: sessions closed by
    * gaps plus the resulting open session (never null — the batch has ≥1
    * row). Deliberately a SEPARATE implementation from the inline fold in
    * [[sessions]]: the spec asserts the two APIs produce equal output, and
    * that check is only meaningful while the logic isn't shared. */
  private def foldBatch(uid: Long, sorted: Array[Long], prev: Open,
      gapMs: Long): (Seq[Session], Open) = {
    var open = prev
    val closed = Seq.newBuilder[Session]
    // same late-prefix chain-merge as the inline fold in [[sessions]] —
    // the two stay separate implementations so the equality spec means
    // something, but they must agree on the late-data approximation
    var i = 0
    if (open != null) {
      var late: Open = null
      while (i < sorted.length && sorted(i) < open.startMs - gapMs) {
        val t = sorted(i)
        late match {
          case null => late = Open(t, t, 1)
          case l if t - l.endMs > gapMs =>
            closed += Session(uid,
              new java.sql.Timestamp(l.startMs),
              new java.sql.Timestamp(l.endMs), l.n)
            late = Open(t, t, 1)
          case l => late = Open(l.startMs, math.max(l.endMs, t), l.n + 1)
        }
        i += 1
      }
      if (late != null) closed += Session(uid,
        new java.sql.Timestamp(late.startMs),
        new java.sql.Timestamp(late.endMs), late.n)
    }
    while (i < sorted.length) {
      val t = sorted(i)
      open match {
        case null => open = Open(t, t, 1)
        case o if t - o.endMs > gapMs =>
          closed += Session(uid,
            new java.sql.Timestamp(o.startMs),
            new java.sql.Timestamp(o.endMs), o.n)
          open = Open(t, t, 1)
        case o =>
          open = Open(math.min(o.startMs, t), math.max(o.endMs, t), o.n + 1)
      }
      i += 1
    }
    (closed.result(), open)
  }

  /** The same sessionization on the `transformWithState` API (Spark 4's
    * StatefulProcessor — typed state handles + explicit event-time
    * timers, replacing flatMapGroupsWithState's single state value and
    * implicit timeout). Semantics are identical to [[sessions]] — the
    * spec runs both on the same micro-batches and asserts equal output.
    *
    * Differences that matter at scale: state lives in named column
    * families in the RocksDB state store (transformWithState requires
    * that provider), so per-user state is still O(1) — the open session
    * plus one registered timer — and timer bookkeeping is explicit:
    * extending a session DELETES the stale timer before registering the
    * new close time, where the old API silently overwrote its timeout. */
  final class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp), Session] {
    @transient private var open: ValueState[Open] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[Open]("open", Encoders.product[Open], TTLConfig.NONE)

    override def handleInputRows(
        uid: Long,
        rows: Iterator[(Long, java.sql.Timestamp)],
        tv: TimerValues): Iterator[Session] = {
      val sorted = rows.map(_._2.getTime).toArray.sorted
      val prev = if (open.exists()) open.get() else null
      val (closed, next) = foldBatch(uid, sorted, prev, gapMs)
      if (prev != null && prev.endMs != next.endMs)
        getHandle.deleteTimer(prev.endMs + gapMs)
      open.update(next)
      if (prev == null || prev.endMs != next.endMs)
        getHandle.registerTimer(next.endMs + gapMs)
      closed.iterator
    }

    override def handleExpiredTimer(
        uid: Long, tv: TimerValues, info: ExpiredTimerInfo): Iterator[Session] = {
      // A timer only survives to expiry if no later batch replaced it, so
      // the open session it guards is still the current state.
      if (!open.exists()) Iterator.empty
      else {
        val o = open.get()
        open.clear()
        Iterator.single(Session(uid,
          new java.sql.Timestamp(o.startMs),
          new java.sql.Timestamp(o.endMs), o.n))
      }
    }
  }

  /** [[sessions]] re-expressed on `transformWithState`. Input contract is
    * identical (watermarked (user_id, event-time) pairs). */
  def sessionsTws(
      events: Dataset[(Long, java.sql.Timestamp)],
      gapMs: Long = 30L * 60 * 1000): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
