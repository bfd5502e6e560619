package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning — shrink the big (fact) side of a join
  * BEFORE its shuffle using a compact filter built from the small
  * side's keys. The classic use at 100 TB: a selective dimension
  * filter ("suppliers in region X") would otherwise shuffle the whole
  * fact table into the join just to drop 95% of it; a bloom filter
  * moves that drop into the fact SCAN stage for a few MB of filter.
  *
  * Mechanics: both sides hash their key with xxhash64 (so any key type
  * works and only longs enter the sketch — the same design as Spark's
  * own runtime row-group filters); the build side aggregates a
  * `util.sketch.BloomFilter` to the driver (one pass, mergeable per
  * partition), and the probe becomes a native codegen'd
  * `might_contain` predicate in the fact scan stage — a Filter, not a
  * join: no exchange, no false negatives, ~fpp false positives that
  * the real join still eliminates.
  *
  * Sizing: the filter costs ~1.2 bytes/key at fpp=1% and ships inside
  * the plan (task binary). Keep expectedItems ≲ 10^7 for this explicit
  * variant; for bigger build sides prefer a plain shuffle semi-join or
  * Spark's automatic runtime bloom filters
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), which this
  * utility complements for the cases AQE cannot see — e.g. a build
  * side computed by a previous action, or a probe reused across
  * several queries.
  */
object BloomPrune {

  /** The serialized filter over xxhash64(key) of `keys` rows. An empty
    * build side yields a valid always-false filter (stat.bloomFilter
    * itself NPEs on zero rows — the partial-aggregate merge starts from
    * null), so pruning against an empty dimension correctly drops
    * everything instead of crashing.
    */
  def buildFilter(dim: DataFrame, dimKey: Column,
                  expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val keyed = dim.select(xxhash64(dimKey).as("_bloom_key"))
    val bf =
      if (keyed.isEmpty) org.apache.spark.util.sketch.BloomFilter.create(1, fpp)
      else keyed.stat.bloomFilter("_bloom_key", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Predicate column `might_contain(filter, xxhash64(key))`. */
  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal(filterBytes, BinaryType),
      GraftBridge.expression(xxhash64(key))))

  /** `fact` reduced to rows whose key might appear in `dim`'s keys —
    * a superset of the exact semi-join (no false negatives).
    */
  def prune(fact: DataFrame, factKey: Column, dim: DataFrame, dimKey: Column,
            expectedItems: Long, fpp: Double = 0.01): DataFrame =
    fact.filter(mightContain(buildFilter(dim, dimKey, expectedItems, fpp), factKey))
}
