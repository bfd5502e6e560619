package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Correctness-gate adapters.
  *
  * The driver's hash compare is row-order-sensitive, so every dumped
  * result needs a deterministic total order matching its oracle's
  * ORDER BY. But a library operator must not embed that sort: a global
  * sort is a full range-exchange that a caller composing operators at
  * 100 TB would pay for nothing. Operators therefore return UNSORTED
  * per-row outputs, and the `queries` gate bindings wrap them with the
  * dump-time sort here (PlanAuditSpec pins the no-Sort property on the
  * operators themselves).
  */
object Gate {
  def sorted(fn: (SparkSession, String) => DataFrame, cols: String*):
      (SparkSession, String) => DataFrame =
    (s, d) => fn(s, d).orderBy(cols.head, cols.tail: _*)
}
