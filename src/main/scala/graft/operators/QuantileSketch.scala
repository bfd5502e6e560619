package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Single-pass MERGEABLE quantile sketch (KLL-style compactor levels).
  *
  * [[DistributedQuantile]] computes EXACT quantiles but needs multiple
  * passes (bounds, histogram, survivor sort). At 100 TB — and in any
  * one-pass context: streaming state, per-micro-batch stats, sketch
  * columns stored next to table partitions and merged at read time —
  * the right tool is a bounded-memory mergeable summary: O(k·log(n/k))
  * doubles per sketch, one pass, closed under merge, with a uniform
  * rank-error bound.
  *
  * Structure: level buffers; level L holds items each representing
  * 2^L input rows. An overflowing buffer sorts and keeps alternate
  * items, promoting them to level L+1 (each survivor now stands for
  * twice as many rows). Compaction here is DETERMINISTIC (keep the
  * even-indexed items of the sorted buffer) rather than the textbook
  * coin flip: reproducible runs and tests outweigh the error
  * improvement randomization buys. The price of determinism is that
  * per-compaction drifts ADD instead of cancelling: the worst-case
  * rank error is |levels|·n/k + |levels| ([[rankErrorBound]]), not
  * the randomized compactor's O(n/k) — the bound the spec and the
  * q251/q339 gates assert.
  *
  * Merge concatenates per-level buffers, then re-compacts overflowing
  * levels — associative in the bound (NOT bit-identical under
  * reordering, which is why the EXACT oracle-gated quantiles stay on
  * DistributedQuantile; this operator's contract is the error bound).
  */
object QuantileSketch {

  /** Buffer capacity per level; error ~ 1.5/k per compaction level. */
  val DEFAULT_K = 200

  final case class Sketch(k: Int, n: Long, levels: Seq[Seq[Double]]) {

    def insert(v: Double): Sketch =
      compact(Sketch(k, n + 1, (v +: levels.head) +: levels.tail))

    def merge(other: Sketch): Sketch = {
      val depth = math.max(levels.length, other.levels.length)
      val merged = (0 until depth).map { l =>
        levelAt(l) ++ other.levelAt(l)
      }
      compact(Sketch(k, n + other.n, merged))
    }

    private def levelAt(l: Int): Seq[Double] =
      if (l < levels.length) levels(l) else Seq.empty

    /** Estimated rank of `v`: weighted count of kept items <= v. */
    def rank(v: Double): Long =
      levels.zipWithIndex.map { case (buf, l) =>
        buf.count(_ <= v).toLong << l
      }.sum

    /** Quantile estimate: the smallest kept value whose estimated rank
      * reaches q*n (classic sketch inversion).
      */
    def quantile(q: Double): Double = {
      val target = math.max(1L, math.ceil(q * n).toLong)
      val items = levels.zipWithIndex
        .flatMap { case (buf, l) => buf.map(v => (v, 1L << l)) }
        .sortBy(_._1)
      var cum = 0L
      var i = 0
      while (i < items.length) {
        cum += items(i)._2
        if (cum >= target) return items(i)._1
        i += 1
      }
      if (items.isEmpty) Double.NaN else items.last._1
    }

    /** Total weight retained — always equals n (compaction halves
      * counts while doubling weights).
      */
    def retainedWeight: Long =
      levels.zipWithIndex.map { case (buf, l) => buf.length.toLong << l }.sum
  }

  /** Compact every overflowing level: sort, promote the even-indexed
    * half of an even-sized prefix one level up (weight doubles — each
    * survivor absorbs its dropped odd neighbor, so total weight is
    * EXACTLY preserved), and if the buffer size was odd leave the last
    * (largest) item in place. Fully deterministic.
    */
  private def compact(s: Sketch): Sketch = {
    var levels = s.levels.map(_.toVector).toVector
    var l = 0
    while (l < levels.length) {
      if (levels(l).length > s.k) {
        val sorted = levels(l).sorted
        val evenPart = sorted.dropRight(sorted.length % 2)
        val leftover = sorted.takeRight(sorted.length % 2)
        val promoted = evenPart.zipWithIndex.collect {
          case (v, i) if i % 2 == 0 => v
        }
        levels = levels.updated(l, leftover)
        levels =
          (if (l + 1 < levels.length)
             levels.updated(l + 1, levels(l + 1) ++ promoted)
           else levels :+ promoted)
      }
      l += 1
    }
    Sketch(s.k, s.n, levels)
  }

  def empty(k: Int = DEFAULT_K): Sketch = Sketch(k, 0L, Seq(Seq.empty))

  /** Worst-case rank-error bound of the DETERMINISTIC compactor:
    * each compaction at level l shifts any rank by at most 2^l, and
    * level l sees at most ~n/2^l items so it compacts at most
    * n/(k·2^l) times — n/k error PER LEVEL, which (unlike the
    * randomized textbook compactor, whose per-level errors cancel in
    * expectation to O(n/k) total) ADDS across levels:
    * |levels|·n/k + |levels|. The round-8 sf0.1 gate caught the
    * earlier 3n/k + |levels| claim dropping the |levels| factor: at
    * sf0.01 (n/k≈100) the drift sits far inside either formula, but
    * q251's group-N sketch at n≈200k exceeded the 3n/k claim (~3013)
    * and flipped its ok_p50 gate flag; the per-level-additive bound
    * (11007 there) is the one the deterministic analysis supports.
    */
  def rankErrorBound(s: Sketch): Long =
    s.levels.length.toLong * s.n / s.k + s.levels.length + 1

  /** Spark aggregation: one-pass sketch of a double column, usable in
    * groupBy().agg(...). Buffers merge across partitions with the
    * sketch's own merge — the mergeability IS the distributed story.
    */
  final class SketchAgg(k: Int) extends Aggregator[Double, Sketch, Sketch] {
    override def zero: Sketch = empty(k)
    override def reduce(b: Sketch, a: Double): Sketch = b.insert(a)
    override def merge(a: Sketch, b: Sketch): Sketch = a.merge(b)
    override def finish(r: Sketch): Sketch = r
    override def bufferEncoder: Encoder[Sketch] = Encoders.product[Sketch]
    override def outputEncoder: Encoder[Sketch] = Encoders.product[Sketch]
  }

  /** Column aggregate: `df.groupBy(...).agg(QuantileSketch.sketch(col))`. */
  def sketch(c: Column, k: Int = DEFAULT_K): Column =
    udaf(new SketchAgg(k)).apply(c)

  /** Rebuild a [[Sketch]] from its aggregated struct Row (collect()
    * decodes the nested arrays as mutable ArraySeq — rebuild
    * immutable). Shared by the q251 batch gate and the q339 streaming
    * gate.
    */
  def fromRow(row: org.apache.spark.sql.Row): Sketch = {
    val levels = row
      .getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("levels")
      .map(_.toSeq).toSeq
    Sketch(row.getAs[Int]("k"), row.getAs[Long]("n"), levels)
  }
}
