package graft.operators

import org.apache.spark.sql.DataFrame

/** Eager localCheckpoint with a release handle (round 10, guide §5):
  * iterative loops pin per-round state to keep lineage O(1), but the
  * pins of superseded rounds stay in the block store until the query
  * ends — on the driver's 16 g heap that garbage lands on whatever
  * runs next. `pinWithRelease` returns the pinned frame plus a
  * callback that unpersists exactly the RDDs this checkpoint created,
  * for the loop to call as soon as the next round's pin supersedes it.
  */
object Pins {
  def pinWithRelease(df: DataFrame): (DataFrame, () => Unit) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val cp = df.localCheckpoint(true)
    val added = sc.getPersistentRDDs.keySet -- before
    (cp, () => added.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(false))))
  }
}
