package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event for the CEP matcher. */
final case class CepEvent(
    user_id: Long, event_type: String, ts: java.sql.Timestamp, event_id: Long)

/** A matched (click, purchase) pair within the pattern window. */
final case class CepMatch(
    user_id: Long, click_id: Long, purchase_id: Long, lag_us: Long)

/** STREAMING CEP PAIR MATCHING (fourteenth stateful family) — emit
  * EVERY (click, purchase) pair where the purchase follows the click
  * within the window: the complex-event-processing "A followed by B
  * within T" primitive. Unlike q91's funnel (last-click state, one
  * long) this needs LIST state — the clicks still inside the pattern
  * window — and unlike q59's watermarked interval join the state is
  * evicted inline as events arrive (any click older than T behind the
  * group's max-seen time can never match again), so state is bounded
  * by the per-user click rate x window, independent of stream length.
  *
  * Batch parity: the emitted set equals the batch interval join
  * `purchase.ts - click.ts in (0, T]` (ties broken by event_id order)
  * provided batches arrive time-split, which the two-batch spec pins.
  */
object StreamCep {

  val WINDOW_US: Long = 30L * 60L * 1000000L

  implicit val evEnc: Encoder[CepEvent] = Encoders.product[CepEvent]
  implicit val outEnc: Encoder[CepMatch] = Encoders.product[CepMatch]
  implicit val stEnc: Encoder[Seq[(Long, Long)]] =
    Encoders.kryo[Seq[(Long, Long)]]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  def tsUs(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** Pure transition: fold a batch into the pending-clicks state,
    * emitting matches. State entries are (click_us, click_id).
    */
  def step(evs: Seq[CepEvent], pending0: Seq[(Long, Long)]):
      (Seq[CepMatch], Seq[(Long, Long)]) = {
    var pending = pending0
    val out = Seq.newBuilder[CepMatch]
    var maxSeen = pending0.map(_._1).maxOption.getOrElse(Long.MinValue)
    evs.sortBy(e => (tsUs(e.ts), e.event_id)).foreach { e =>
      val us = tsUs(e.ts)
      maxSeen = math.max(maxSeen, us)
      e.event_type match {
        case "purchase" =>
          pending.foreach { case (cUs, cId) =>
            val lag = us - cUs
            if (lag > 0L && lag <= WINDOW_US)
              out += CepMatch(e.user_id, cId, e.event_id, lag)
          }
        case "click" =>
          pending = pending :+ (us, e.event_id)
        case _ => ()
      }
      // inline eviction: clicks that can never match again
      pending = pending.filter(_._1 >= maxSeen - WINDOW_US)
    }
    (out.result(), pending)
  }

  def matchPairs(events: DataFrame): Dataset[CepMatch] = {
    val typed = events.select(
      col("user_id").cast("long").as("user_id"),
      col("event_type"), col("ts"),
      col("event_id").cast("long").as("event_id")).as[CepEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[(Long, Long)], CepMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, it: Iterator[CepEvent], state: GroupState[Seq[(Long, Long)]]) =>
          val (out, pending) =
            step(it.toSeq, state.getOption.getOrElse(Seq.empty))
          if (pending.nonEmpty) state.update(pending) else state.remove()
          out.iterator
      }
  }
}
