package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The six NBODY6 output formats as Spark reads (reference:
  * src/nbody6/parser/{out34,out9,fort82,fort83,fort19,density_center}.py
  * — token indices and field names copied from those configs).
  *
  * Each reader returns (headers, rows) DataFrames keyed by
  * (sim_id, time); `read*(spark, glob)` parallelizes over files.
  */
object NBody6 {

  private def d(name: String, i: Int) = BlockField(name, Seq(i), "double")
  private def l(name: String, i: Int) = BlockField(name, Seq(i), "long")
  private def v(name: String, is: Seq[Int]) = BlockField(name, is, "vec")

  /** OUT34: per-star positions/velocities (reference: out34.py:7). */
  val OUT34 = BlockConfig(
    headerPrefix = "#", headerLength = 1, footerPrefix = None,
    header = Seq(
      d("time", 7), l("nzero", 5), d("rbar", 8), d("vstar", 9), d("rtide", 10),
      d("plummer_mass", 12), v("rd", Seq(13, 14, 15)), v("rcm", Seq(16, 17, 18)),
      v("rg", Seq(22, 23, 24)), v("vg", Seq(25, 26, 27))),
    data = Seq(
      d("x", 0), d("y", 1), d("z", 2), d("vx", 3), d("vy", 4), d("vz", 5),
      d("mass", 6), l("name", 7), l("kstar", 8)))

  /** OUT9: regularized binaries (reference: out9.py:5). */
  val OUT9 = BlockConfig(
    headerPrefix = "#", headerLength = 3, footerPrefix = None,
    header = Seq(d("time", 1), l("npairs", 2)),
    data = Seq(
      d("ecc", 3), d("semi", 4), d("p", 5), d("mass1", 6), d("mass2", 7),
      l("name1", 8), l("name2", 9), l("cmName", 13)))

  /** fort.82: binary component attributes (reference: fort82.py:5). */
  val FORT82 = BlockConfig(
    headerPrefix = "## BEGIN", headerLength = 1, footerPrefix = Some("## END"),
    header = Seq(d("time", 1)),
    data = Seq(
      l("name1", 0), l("name2", 1), d("x", 5), d("y", 6), d("z", 7),
      d("mass1", 11), d("mass2", 12), d("zlum1", 13), d("zlum2", 14),
      d("rad1", 15), d("rad2", 16), d("tempe1", 17), d("tempe2", 18)))

  /** fort.83: single-star attributes (reference: fort83.py:5). */
  val FORT83 = BlockConfig(
    headerPrefix = "## BEGIN", headerLength = 1, footerPrefix = Some("## END"),
    header = Seq(d("time", 1)),
    data = Seq(
      l("name", 0), d("x", 2), d("y", 3), d("z", 4), d("mass", 5),
      d("zlum", 6), d("rad", 7), d("tempe", 8)))

  /** fort.19: wide (non-regularized) binaries (reference: fort19.py:5). */
  val FORT19 = BlockConfig(
    headerPrefix = "#", headerLength = 1, footerPrefix = None,
    header = Seq(d("time", 0), l("npairs", 1)),
    data = Seq(
      d("ecc", 3), d("semi", 4), d("p", 5), d("mass1", 6), d("mass2", 7),
      l("name1", 8), l("name2", 9), l("hiarch", 12)))

  /** densCentre.txt: one header line per timestamp, no data rows
    * (reference: density_center.py:12).
    */
  val DENS_CENTRE = BlockConfig(
    headerPrefix = "", headerLength = 1, footerPrefix = None,
    header = Seq(
      d("time", 0), d("r_tidal", 1),
      v("density_center", Seq(2, 3, 4))),
    data = Seq())

  def readOut34(spark: SparkSession, glob: String): (DataFrame, DataFrame) =
    BlockText.read(spark, glob, OUT34)
  def readOut9(spark: SparkSession, glob: String): (DataFrame, DataFrame) =
    BlockText.read(spark, glob, OUT9)
  def readFort82(spark: SparkSession, glob: String): (DataFrame, DataFrame) =
    BlockText.read(spark, glob, FORT82)
  def readFort83(spark: SparkSession, glob: String): (DataFrame, DataFrame) =
    BlockText.read(spark, glob, FORT83)
  def readFort19(spark: SparkSession, glob: String): (DataFrame, DataFrame) =
    BlockText.read(spark, glob, FORT19)
  def readDensCentre(spark: SparkSession, glob: String): DataFrame =
    BlockText.read(spark, glob, DENS_CENTRE)._1
}
