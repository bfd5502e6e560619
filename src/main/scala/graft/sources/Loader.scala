package graft.sources

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

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
}
