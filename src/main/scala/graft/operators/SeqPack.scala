package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-cut sequence packing — the standard pre-training
  * batching step: documents are laid end to end in a deterministic
  * order and cut into fixed token-budget context windows; a document
  * belongs to the window its first token lands in.
  *
  * Packing is inherently sequential, so the parallel unit is a SHARD:
  * the cumulative token offset is a window sum per shard, and shards
  * pack independently. At 100 TB the shard count is the write
  * parallelism (thousands); the per-shard window never sees more than
  * one shard's rows, so no task sorts the corpus. Equivalent semantics
  * to tokenizer-side "pack to max_seq_len with document boundaries
  * ignored", minus the cross-shard seam tokens.
  */
object SeqPack {

  /** Adds `pack_id` (long) — the context-window index within
    * `shardCol` — ordering rows by `orderCols` and cutting every
    * `ctxLen` tokens of `tokenCol`.
    */
  def assignPacks(
      df: DataFrame,
      shardCol: Column,
      orderCols: Seq[String],
      tokenCol: Column,
      ctxLen: Int): DataFrame = {
    require(ctxLen > 0, "ctxLen must be positive")
    val prefix = Window.partitionBy(col("_shard"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_shard", shardCol)
      .withColumn("_tok", tokenCol.cast("long"))
      .withColumn("_prefix", coalesce(sum("_tok").over(prefix), lit(0L)))
      .withColumn("pack_id", expr(s"_prefix div $ctxLen"))
  }
}
