package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event for the windowed top-k ranker. */
final case class TopKEvent(win_us: Long, event_type: String, ts: java.sql.Timestamp)

/** One emitted rank row for a closed window. */
final case class TopKOut(win_start_us: Long, rank: Int, event_type: String, n: Long)

/** STREAMING WINDOWED TOP-K (twelfth stateful family) — per tumbling
  * hour, the K most frequent event types, emitted ONLY once the window
  * can no longer change (event-time timeout at window end). A ranking
  * is not an incremental aggregate — emitting early would retract — so
  * this is precisely the shape that needs custom state + timeout
  * rather than a windowed agg: state per open window is the (tiny,
  * type-cardinality-bounded) count map, merged across micro-batches,
  * ranked exactly once on close, then dropped.
  *
  * At production scale the state is |open windows| x |types| — bounded
  * by the watermark horizon, independent of event volume; the
  * per-batch work is a map-side count per (window, type) before the
  * state shuffle.
  */
object StreamTopK {

  val K = 3
  val WINDOW_US: Long = 3600L * 1000000L

  implicit val evEnc: Encoder[TopKEvent] = Encoders.product[TopKEvent]
  implicit val outEnc: Encoder[TopKOut] = Encoders.product[TopKOut]
  implicit val stateEnc: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Pure transition: fold a batch of events into the count-map state.
    * (The spec replays this per-batch and whole-log to prove tiling
    * invariance.)
    */
  def step(evs: Seq[TopKEvent], state: Option[Map[String, Long]]): Map[String, Long] =
    evs.foldLeft(state.getOrElse(Map.empty[String, Long])) { (m, e) =>
      m.updated(e.event_type, m.getOrElse(e.event_type, 0L) + 1L)
    }

  /** Rank a closed window's count map: by count desc, type asc. */
  def rank(winUs: Long, m: Map[String, Long]): Seq[TopKOut] =
    m.toSeq.sortBy { case (t, n) => (-n, t) }.take(K).zipWithIndex.map {
      case ((t, n), i) => TopKOut(winUs, i + 1, t, n)
    }

  /** Apply to a (possibly streaming) events DataFrame with `ts` and
    * `event_type`. Streaming requires a watermark on ts (the timeout
    * clock) and Append output.
    */
  def windowedTopK(events: DataFrame): Dataset[TopKOut] = {
    val typed = events.select(
      (floor(unix_micros(col("ts")) / WINDOW_US) * WINDOW_US).as("win_us"),
      col("event_type"), col("ts")).as[TopKEvent]
    typed.groupByKey(_.win_us)
      .flatMapGroupsWithState[Map[String, Long], TopKOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (win: Long, it: Iterator[TopKEvent], state: GroupState[Map[String, Long]]) =>
          if (state.hasTimedOut) {
            val m = state.get
            state.remove()
            rank(win, m).iterator
          } else {
            state.update(step(it.toSeq, state.getOption))
            // close when the watermark passes the window end (ms clock)
            state.setTimeoutTimestamp((win + WINDOW_US) / 1000L)
            Iterator.empty
          }
      }
  }
}
