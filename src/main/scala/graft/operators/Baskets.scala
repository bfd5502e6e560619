package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Within-group pair/triple generation from collected "basket" arrays
  * (round 9, guide §2.3/§2.4): the market-basket / co-purchase family
  * (q93/q103/q117/q219/... and every GraphOps query built on the
  * co-purchase edge list) needs all (u < v) item pairs WITHIN an
  * order. The original shape was a fact-table self-join on the group
  * key — two exchanges of lineitem plus two sort-merge sorts. Since
  * the pair set never leaves the group, the cheaper distributed shape
  * is: ONE groupBy of the fact table collecting the per-group item
  * array (map-side partial aggregation applies), then an in-row
  * explode of the array's ordered pairs. Baskets are bounded by
  * lines-per-order (single digits), so the explode is O(basket²) per
  * group — the same fanout the join paid, minus a full exchange and
  * both sorts.
  */
object Baskets {

  /** All (u, v) pairs with u < v from a SORTED basket array, exploded
    * to struct rows. Works on multiset baskets (sort_array ∘
    * collect_list): the strict `y > x` filter skips equal-value line
    * pairs exactly as the self-join's `a.partkey < b.partkey`
    * predicate did, and for each value pair (u, v) the index pairs
    * contribute the same count(u)×count(v) multiplicity the join
    * produced. On set baskets (sort_array ∘ collect_set) the filter is
    * redundant but harmless.
    */
  def pairs(parts: Column): Column =
    explode(flatten(transform(parts, (x, i) =>
      transform(
        filter(slice(parts, i + lit(2), size(parts)), y => y > x),
        y => struct(x.as("u"), y.as("v"))))))

  /** All (u, v, w) triples with u < v < w from a SORTED SET basket
    * (sort_array ∘ collect_set — strictly increasing, so positional
    * order IS value order). Volume is C(basket, 3) per group.
    */
  def triples(parts: Column): Column =
    explode(flatten(flatten(transform(parts, (x, i) =>
      transform(slice(parts, i + lit(2), size(parts)), (y, j) =>
        transform(slice(parts, i + j + lit(3), size(parts)), z =>
          struct(x.as("u"), y.as("v"), z.as("w"))))))))
}
