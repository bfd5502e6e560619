package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY §4).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime, but a
  * hot key inside an exchange can still pin one task. Salting splits
  * each big-side key into `factor` sub-keys and replicates the small
  * side to match — the classic trade of `factor`x small-side volume
  * for even task sizes. Use when the small side is too large to
  * broadcast and the key histogram is heavy-tailed.
  */
object Skew {

  /** Equi-join `big` with `small` on `key`, salting the big side into
    * `factor` buckets. Result equals `big.join(small, key)` exactly;
    * only the physical distribution changes. The salt is derived from
    * the full big-side row (xxhash64), so replicated rows of one hot
    * key spread uniformly.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(factor)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
