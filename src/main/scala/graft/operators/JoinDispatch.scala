package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistics-driven join strategy dispatch — the piece of a
  * cost-based planner that graft queries hand-roll today (explicit
  * `broadcast()` hints, Skew.saltedJoin at known-skewed keys): probe
  * the two sides with ONE aggregate each (the q186/q157 statistics),
  * then pick the strategy a 1000-executor cluster would want:
  *
  *   - BroadcastDim: the dim side is small enough to ship to every
  *     executor — no shuffle of the fact at all;
  *   - SaltedShuffle: the fact's hottest key exceeds the skew bound, so
  *     a plain shuffle join would serialize that key through one task —
  *     salt it (replicating the dim rows per salt);
  *   - PlainShuffle: both sides large, keys well-spread — the ordinary
  *     sort-merge/shuffled-hash join is optimal.
  *
  * The probes cost one scan of each input (map-side combined, tiny
  * output); at 100 TB that scan is usually already paid by table-stats
  * collection, and the decision avoids either a hopeless single-task
  * hot key or an unnecessary full-fact shuffle.
  */
object JoinDispatch {

  sealed trait Strategy
  case object BroadcastDim extends Strategy
  case object SaltedShuffle extends Strategy
  case object PlainShuffle extends Strategy

  /** One-aggregate probe: (rows, distinct keys, hottest-key rows). */
  final case class KeyStats(rows: Long, keys: Long, maxKeyRows: Long)

  def probe(df: DataFrame, key: String): KeyStats = {
    val r = df.groupBy(key).agg(count(lit(1)).as("c"))
      .agg(sum("c"), count(lit(1)), max("c")).head
    // zero groups -> sum/max are SQL NULL; a legal empty input must
    // yield an empty join, not an NPE
    if (r.isNullAt(0)) KeyStats(0L, 0L, 0L)
    else KeyStats(r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Strategy choice. `broadcastMaxRows` stands in for the byte
    * threshold a real planner derives from
    * spark.sql.autoBroadcastJoinThreshold; `skewFactor` is the
    * hot-key-to-mean ratio beyond which one task drowns.
    */
  def choose(
      fact: KeyStats, dim: KeyStats,
      broadcastMaxRows: Long = 1000000L,
      skewFactor: Long = 16L): Strategy =
    if (dim.rows <= broadcastMaxRows) BroadcastDim
    // hot-key vs mean-rows-per-key, in Double: the product form
    // maxKeyRows * keys overflows Long exactly at the target scales
    // (1e10-row hot key x 1e9 keys), silently flipping a skewed join
    // to PlainShuffle
    else if (fact.keys > 0 &&
      fact.maxKeyRows.toDouble * fact.keys.toDouble >
        skewFactor.toDouble * fact.rows.toDouble)
      SaltedShuffle
    else PlainShuffle

  /** Probe-and-join: applies the chosen strategy. Result rows are
    * identical across strategies — the choice is purely physical.
    */
  def join(fact: DataFrame, dim: DataFrame, key: String,
      broadcastMaxRows: Long = 1000000L, skewFactor: Long = 16L):
      (DataFrame, Strategy) = {
    val s = choose(probe(fact, key), probe(dim, key),
      broadcastMaxRows, skewFactor)
    val out = s match {
      case BroadcastDim => fact.join(broadcast(dim), key)
      case SaltedShuffle => Skew.saltedJoin(fact, dim, key, 8)
      case PlainShuffle => fact.join(dim, key)
    }
    (out, s)
  }
}
