package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event for the retention tracker (day = event-time epoch day). */
final case class RetEvent(user_id: Long, day: Long)

/** First-activity-of-the-day attribution row. */
final case class RetSeen(user_id: Long, cohort_day: Long, day_offset: Long)

/** Per-user retention state: the first-seen day plus the within-
  * horizon days already attributed. */
final case class RetState(firstDay: Long, seen: Seq[Long])

/** STREAMING RETENTION COHORTS (sixteenth stateful family) — the
  * incremental form of q74's cohort matrix: per user, track the
  * first-seen day (the cohort) and emit ONE row per newly-active
  * (user, day) with its cohort offset, as the stream arrives. The
  * emitted rows roll up to the exact (cohort, offset) retention
  * triangle without ever rescanning the log — what a batch q74 pays a
  * full-log pass for on every refresh.
  *
  * State is BOUNDED by construction: one long (first day) + the set of
  * attributed days within [[HORIZON]] of it, i.e. O(HORIZON) per user
  * independent of stream age — activity past the analysis horizon is
  * ignored WITHOUT being tracked (the same cap a production retention
  * dashboard applies). Emission is immediate: a (user, day, offset)
  * attribution never retracts.
  *
  * Batch parity: with time-ordered delivery (each user's earliest
  * event arrives before its later days — guaranteed by time-split
  * replay, the q185 convention), the emitted set equals the batch
  * min-day formulation exactly; the two-batch replay spec pins it.
  */
object StreamRetention {

  /** Max day offset tracked/emitted (inclusive). */
  val HORIZON = 14L

  implicit val evEnc: Encoder[RetEvent] = Encoders.product[RetEvent]
  implicit val outEnc: Encoder[RetSeen] = Encoders.product[RetSeen]
  implicit val stEnc: Encoder[RetState] = Encoders.product[RetState]
  implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

  /** Pure transition for one user's batch slice: fold days in sorted
    * order, attributing each unseen within-horizon day once. */
  def step(days: Seq[Long], st: Option[RetState]): RetState = {
    var cur = st.getOrElse(RetState(Long.MaxValue, Seq.empty))
    days.sorted.foreach { d =>
      if (d < cur.firstDay) cur = RetState(d, cur.seen)
      if (d - cur.firstDay <= HORIZON && !cur.seen.contains(d)) {
        cur = RetState(cur.firstDay, cur.seen :+ d)
      }
    }
    cur
  }

  private def process(user: Long, evs: Iterator[RetEvent],
      state: GroupState[RetState]): Iterator[RetSeen] = {
    val prev = state.getOption
    val prevSeen: Set[(Long, Long)] = prev
      .map(s => s.seen.map(d => (s.firstDay, d)).toSet).getOrElse(Set.empty)
    val next = step(evs.map(_.day).toSeq, prev)
    state.update(next)
    // new attributions only: rows whose (cohort, day) was not already
    // emitted under the SAME cohort (with time-ordered delivery the
    // cohort never changes after first sight, so this is append-only)
    next.seen.iterator
      .filter(d => !prevSeen.contains((next.firstDay, d)))
      .map(d => RetSeen(user, next.firstDay, d - next.firstDay))
  }

  /** The streaming stage: events → first-activity attribution rows. */
  def firstSeen(events: DataFrame): Dataset[RetSeen] = {
    events
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .as[RetEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        process)
  }
}
