package graft.sources

import java.nio.file.{Files, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Cross-file timestamp alignment result: `report` holds one row per
  * inconsistent (sim_id, rank) — missing files or spread beyond
  * tolerance; `mapping` holds (sim_id, file, time, ref_time) rewrites
  * onto the reference file's grid for the aligned ranks.
  */
final case class TimestampAlignment(report: DataFrame, mapping: DataFrame)

/** Pre-flight validation of NBODY6 simulation directories (reference:
  * src/nbody6/loader.py:75 _validate_file — every required output file
  * must exist before any parsing starts; the reference raises
  * FileNotFoundError per missing file).
  *
  * This runs driver-side over directory metadata only — the point is to
  * fail a 10k-sim survey in milliseconds with a complete problem list
  * instead of discovering a half-written run from a task exception an
  * hour into the parse.
  */
object Loader {

  /** The reference's parser_dict file set (loader.py:60-67). */
  val REQUIRED_FILES: Seq[String] =
    Seq("OUT34", "OUT9", "fort.19", "fort.82", "fort.83", "densCentre.txt")

  /** Problems with one sim directory: missing or empty required files.
    * Empty means zero bytes — the reference's parsers raise on such
    * files at parse time; catching them here is strictly earlier.
    */
  def validateSimDir(dir: Path): Seq[String] = {
    if (!Files.isDirectory(dir)) Seq(s"not a directory: $dir")
    else REQUIRED_FILES.flatMap { name =>
      val f = dir.resolve(name)
      if (!Files.isRegularFile(f)) Some(s"missing file: $name")
      else if (Files.size(f) == 0L) Some(s"empty file: $name")
      else None
    }
  }

  /** Validate every sim directory under `root`; returns sim_id ->
    * problems for the dirs that have any. `strict = true` throws with
    * the full report like the reference's per-file raise.
    */
  def validate(root: Path, strict: Boolean = false): Map[String, Seq[String]] = {
    require(Files.isDirectory(root), s"root path '$root' is not a directory")
    val problems = Files.list(root).iterator().asScala
      .filter(Files.isDirectory(_))
      .map(d => d.getFileName.toString -> validateSimDir(d))
      .filter(_._2.nonEmpty)
      .toMap
    if (strict && problems.nonEmpty)
      throw new IllegalStateException(
        "invalid sim directories:\n" + problems.toSeq.sortBy(_._1)
          .map { case (sim, ps) => s"  $sim: ${ps.mkString("; ")}" }
          .mkString("\n"))
    problems
  }

  /** Cross-file timestamp alignment (reference: loader.py:140-200):
    * the i-th block of every file in a sim must carry the same
    * timestamp within `tolerance`; the unified value is the reference
    * file's (OUT34, like the reference). Strict mode = caller asserts
    * `report` is empty (the reference raises); trim mode = use only
    * the aligned ranks in `mapping` (ranks where a file is missing a
    * block or the spread exceeds tolerance are reported, not mapped).
    *
    * One shuffle per input on (sim_id, file) for the rank window, one
    * grouped pass on (sim_id, rank) — scales over sims, exactly like
    * every other pipeline stage.
    */
  def alignTimestamps(
      headers: Map[String, DataFrame],
      refFile: String = "OUT34",
      tolerance: Double = 2e-2): TimestampAlignment = {
    require(headers.contains(refFile), s"reference file '$refFile' not among inputs")
    val nFiles = headers.size
    val tagged = headers.map { case (name, df) =>
      df.select(col("sim_id"), col("time")).distinct()
        .withColumn("file", lit(name))
    }.reduce(_ unionByName _)
    val ranked = tagged.withColumn("rank", row_number().over(
      Window.partitionBy("sim_id", "file").orderBy("time")))
    val perRank = ranked.groupBy("sim_id", "rank").agg(
      count(lit(1)).as("n_files"),
      min("time").as("t_min"),
      max("time").as("t_max"),
      max(when(col("file") === refFile, col("time"))).as("ref_time"),
      collect_list(struct(col("file"), col("time"))).as("entries"))
    val report = perRank.filter(
      col("n_files") =!= nFiles ||
        col("t_max") - col("t_min") > tolerance ||
        col("ref_time").isNull)
      .withColumn("reason",
        when(col("n_files") =!= nFiles, "missing_in_some_files")
          .otherwise("spread_exceeds_tolerance"))
      .select("sim_id", "rank", "n_files", "t_min", "t_max", "reason")
    val mapping = perRank.filter(
      col("n_files") === nFiles &&
        col("t_max") - col("t_min") <= tolerance &&
        col("ref_time").isNotNull)
      .select(col("sim_id"), col("ref_time"),
        explode(col("entries")).as("e"))
      .select(col("sim_id"), col("e.file").as("file"),
        col("e.time").as("time"), col("ref_time"))
      .filter(col("time") =!= col("ref_time"))
    TimestampAlignment(report, mapping)
  }

  /** One discovered simulation: initial-condition attributes parsed
    * from the directory convention, the path, and the canonical label.
    */
  final case class SimRoot(
      attrs: Map[String, Int], path: Path, label: String)

  /** The survey directory convention the reference walks:
    * Rad<gc_radius>/zmet<metallicity>/M<mass_lv>/<position> (reference:
    * src/utils.py:57 fetch_sim_root, SIM_ATTR_PATTERN).
    */
  private val SimAttrPattern =
    raw"Rad(\d+)/zmet(\d+)/M(\d+)/(\d+)".r

  /** Discover every simulation directory under `base` whose last four
    * path segments match the survey convention, with its
    * initial-condition attributes and canonical label, sorted by
    * init_mass_lv (reference: utils.py:57-83 — the batch driver
    * schedules heavy-mass sims first/last by this key). Driver-side
    * directory walk: metadata only, no file reads.
    */
  def fetchSimRoot(base: Path): Seq[SimRoot] = {
    require(Files.isDirectory(base), s"base path '$base' is not a directory")
    val found = Files.walk(base).iterator().asScala
      .filter(Files.isDirectory(_))
      .flatMap { p =>
        val parts = p.iterator().asScala.map(_.toString).toSeq
        if (parts.length < 4) None
        else parts.takeRight(4).mkString("/") match {
          case SimAttrPattern(rad, zmet, mass, pos) =>
            Some(SimRoot(
              Map(
                "init_gc_radius" -> rad.toInt,
                "init_metallicity" -> zmet.toInt,
                "init_mass_lv" -> mass.toInt,
                "init_pos" -> pos.toInt),
              p,
              f"Rad${rad.toInt}%02d-zmet${zmet.toInt}%04d-M${mass.toInt}-${pos.toInt}%04d"))
          case _ => None
        }
      }.toSeq
    found.sortBy(s => (s.attrs("init_mass_lv"), s.label))
  }

  /** Prepend a sim's initial-condition attribute columns to a stats
    * frame (reference: collect_simulation_stats.py:122-125 inserts
    * sim_attr_dict into every exported stats df). Literal columns —
    * no shuffle, survives any downstream concat/union.
    */
  def withSimAttrs(df: DataFrame, attrs: Map[String, Int]): DataFrame =
    attrs.toSeq.sortBy(_._1).foldLeft(df) { case (d, (k, v)) =>
      d.withColumn(k, lit(v))
    }

  /** Rewrite one table's `time` onto the unified grid using the
    * alignment mapping for its file (reference: parser
    * update_timestamp calls, loader.py:197-200). Tables already on the
    * grid pass through unchanged (left join on the sparse mapping).
    */
  def applyAlignment(df: DataFrame, mapping: DataFrame, file: String): DataFrame = {
    val m = mapping.filter(col("file") === file)
      .select(col("sim_id").as("m_sim_id"), col("time").as("m_time"),
        col("ref_time"))
    df.join(broadcast(m),
        df("sim_id") === col("m_sim_id") && df("time") === col("m_time"), "left")
      .withColumn("time", coalesce(col("ref_time"), df("time")))
      .drop("m_sim_id", "m_time", "ref_time")
  }
}
