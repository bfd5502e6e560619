package graft

import graft.operators.ZOrderLayout
import org.apache.spark.sql.functions._

class ZOrderLayoutSpec extends SparkSpec {

  /** Per-file (min, max) bounding boxes of two columns under a layout
    * written to disk — the information parquet footers expose to the
    * scan planner.
    */
  private def fileBoxes(path: String, a: String, b: String) = {
    val dir = new java.io.File(path)
    dir.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(a), max(a), min(b), max(b)).head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
  }

  test("zkey interleaves bits monotonically per dimension") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L))
      .toDF("a", "b")
      .select(ZOrderLayout.zkey(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    assert(rows(0) == 0L)
    assert(rows(1) == 1L)       // a occupies even bits
    assert(rows(2) == 2L)       // b occupies odd bits
    assert(rows(3) == 0xFFFFFFFFL)
  }

  test("z-ordered files have small 2-D bounding boxes vs single-column layout") {
    val li = Tables(spark, sfDir).lineitem
      .select(col("l_orderkey").cast("long").as("a"),
        (col("l_partkey") % 6000L).cast("long").as("b"))
    val bounds = li.agg(min("a"), max("a"), min("b"), max("b")).head
    val (loA, hiA) = (bounds.getLong(0).toDouble, bounds.getLong(1).toDouble)
    val (loB, hiB) = (bounds.getLong(2).toDouble, bounds.getLong(3).toDouble)

    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrderLayout.layout(li, "a", loA, hiA, "b", loB, hiB, 16)
      .write.mode("overwrite").parquet(s"$base/z")
    li.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(s"$base/bya")

    // narrow filters, one per dimension (~1/16 of each range).
    // Boundaries come from range-partitioner SAMPLING (seeded by rdd
    // id, so they shift run to run) — assert the workload-level
    // property that holds for EVERY boundary set, not per-file luck:
    // across one filter on each dimension, the z-layout touches fewer
    // total files, because the single-column layout prunes one
    // dimension perfectly and the other not at all.
    val (qaLo, qaHi) = (loA, loA + (hiA - loA) / 16)
    val (qbLo, qbHi) = (loB, loB + (hiB - loB) / 16)
    def hitA(boxes: Array[(Long, Long, Long, Long)]): Int =
      boxes.count { case (mna, mxa, _, _) => mna <= qaHi && mxa >= qaLo }
    def hitB(boxes: Array[(Long, Long, Long, Long)]): Int =
      boxes.count { case (_, _, mnb, mxb) => mnb <= qbHi && mxb >= qbLo }

    val zBoxes = fileBoxes(s"$base/z", "a", "b")
    val aBoxes = fileBoxes(s"$base/bya", "a", "b")
    assert(zBoxes.length >= 8 && aBoxes.length >= 8, "expected multi-file layouts")

    // a b-only filter prunes z-files while the a-layout reads ALL files
    assert(hitB(zBoxes) < zBoxes.length,
      "z-order must allow pruning on the second dimension")
    assert(hitB(aBoxes) == aBoxes.length,
      "sanity: single-column layout cannot prune on b")
    // combined workload: one narrow filter per dimension
    val zTotal = hitA(zBoxes) + hitB(zBoxes)
    val aTotal = hitA(aBoxes) + hitB(aBoxes)
    assert(zTotal < aTotal,
      s"z-order should touch fewer files across both filters: z=$zTotal vs single-col=$aTotal")
  }
}
