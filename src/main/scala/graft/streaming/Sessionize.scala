package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ExpiredTimerInfo}

/** Event-time sessionization on the arbitrary-state v2 API — the deep end
  * of `transformWithState`: buffered `ListState` plus EVENT-TIME TIMERS,
  * where `session_window` (Q-win-04/Q-str-03) covers only the aggregate
  * shape. A custom processor owns the session lifecycle: events buffer
  * per user; a timer registered at (latest event + gap) fires once the
  * watermark proves the gap elapsed; the fired timer emits every closed
  * session and re-arms for any still-open tail.
  *
  * Determinism: sessions are computed from the full buffered list at
  * timer fire, so output is a pure function of the event set — batching
  * (how rows split across micro-batches) cannot change it. That is what
  * lets the DuckDB gap-and-island oracle hash-match a timer-driven
  * streaming computation.
  *
  * Scale: state per user = its open-session event times (bounded by the
  * gap — anything older has fired and cleared); timers are per-key and
  * RocksDB-backed. A flooding key costs one sort of its buffered events
  * at fire time.
  */
object Sessionize {

  case class SessEvent(user_id: Long, ts_ms: Long)
  case class SessionOut(user_id: Long, session_start_ms: Long,
                        session_end_ms: Long, n_events: Long)

  /** Buffered event entry — the UPGRADED (v2) state shape. `value` keeps
    * the v1 field name (v1 state was `ListState[Long]`, whose encoder
    * schema names its single column "value") so an Avro state upgrade
    * resolves old rows BY NAME; `weight` arrived in the upgrade as a
    * nullable field — None on rows a v1 processor wrote, read as 1.
    * Weighted entries are the pre-aggregation hook a flooding key wants
    * (collapse equal-timestamp bursts to one weighted entry) without
    * another state migration. Upgrade is spec-pinned: a v2 query resumes
    * a v1 checkpoint mid-session under the Avro state encoding and
    * emits exactly the uninterrupted answer (SessionizeSpec). */
  case class BufEntry(value: Long, weight: Option[Long])

  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessEvent, SessionOut] {
    @transient private var buf: ListState[BufEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[BufEntry]("buf",
        Encoders.product[BufEntry], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[SessEvent],
        tv: TimerValues): Iterator[SessionOut] = {
      rows.foreach(r => buf.appendValue(BufEntry(r.ts_ms, Some(1L))))
      val maxTs = buf.get().map(_.value).max
      // one live timer per key: re-arm at the newest possible session end
      // (materialize before deleting — mutating state while iterating the
      // state-store iterator is unspecified behavior across providers)
      getHandle.listTimers().toList.foreach(getHandle.deleteTimer)
      getHandle.registerTimer(maxTs + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long, tv: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionOut] = {
      val wm = tv.getCurrentWatermarkInMs()
      val entries = buf.get().toArray.sortBy(_.value)
      if (entries.isEmpty) return Iterator.empty
      // gap-and-island over the buffer, then split closed/open: islands
      // are time-ordered, so the open ones (watermark has NOT yet proven
      // their gap elapsed) form a suffix
      val islands = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(entries.head))
      for (e <- entries.tail) {
        if (e.value - islands.last.last.value > gapMs)
          islands += scala.collection.mutable.ArrayBuffer(e)
        else islands.last += e
      }
      val (closed, open) = islands.span(_.last.value + gapMs <= wm)
      buf.clear()
      if (open.nonEmpty) {
        open.flatten.foreach(buf.appendValue)
        getHandle.registerTimer(open.last.last.value + gapMs)
      }
      closed.iterator
        .map(isl => SessionOut(key, isl.head.value, isl.last.value,
          isl.map(_.weight.getOrElse(1L)).sum))
    }
  }

  /** Wire the processor over a watermarked (user_id, ts_ms) stream. */
  def sessions(spark: SparkSession, events: DataFrame, gapMs: Long): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("ts_ms"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
