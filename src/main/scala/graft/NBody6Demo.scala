package graft

import org.apache.spark.sql.SparkSession

/** Executable example of the NBODY6 surface: parse a simulation
  * directory tree, assemble snapshots, pseudo-observe from a
  * coordinate, print the resulting tables.
  *
  * Usage: runMain graft.NBody6Demo <root-dir-with-sim-subdirs> [cx cy cz]
  * Each sim subdir holds OUT34, OUT9, fort.82, fort.83, fort.19,
  * densCentre.txt.
  */
object NBody6Demo {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      sys.error("usage: NBody6Demo <root> [cx cy cz]"))
    val coord =
      if (args.length >= 4) (args(1).toDouble, args(2).toDouble, args(3).toDouble)
      else (100.0, 200.0, 300.0)
    val spark = GraftSession.getOrCreate("graft-nbody6-demo")

    import graft.pipeline.{PseudoObserver, SnapshotAssembler}
    import graft.sources.NBody6
    val (o34h, o34d) = NBody6.readOut34(spark, s"$root/*/OUT34")
    val (_, o9d) = NBody6.readOut9(spark, s"$root/*/OUT9")
    val (_, f82d) = NBody6.readFort82(spark, s"$root/*/fort.82")
    val (_, f83d) = NBody6.readFort83(spark, s"$root/*/fort.83")
    val (_, f19d) = NBody6.readFort19(spark, s"$root/*/fort.19")
    val dcH = NBody6.readDensCentre(spark, s"$root/*/densCentre.txt")

    val asm = SnapshotAssembler.assemble(o34h, o34d, o9d, f82d, f83d, f19d, dcH)
    println(s"[demo] stars=${asm.stars.count()} binaries=${asm.binaries.count()} " +
      s"headers=${asm.headers.count()}")
    asm.headers.orderBy("sim_id", "time").show(4, truncate = false)
    asm.binaries.select("sim_id", "time", "pair", "semi", "is_top_level",
      "is_multi_system").orderBy("sim_id", "time", "pair").show(8, truncate = false)

    import graft.pipeline.SnapshotStats
    val stats = SnapshotStats.overallStats(asm)
    println(s"[demo] overall stats rows=${stats.count()} cols=${stats.columns.length}")
    stats.select("sim_id", "time", "n_star", "n_binary_star", "total_mass",
      "mass_median", "within_r_tidal_n_star", "n_binary_system")
      .orderBy("sim_id", "time").show(4, truncate = false)
    SnapshotStats.annularStats(asm)
      .orderBy("sim_id", "time", "dist_key", "radius").show(6, truncate = false)
    SnapshotStats.timeAlign(
      stats.select("sim_id", "time", "n_star", "total_mass"), step = 1.0)
      .orderBy("sim_id", "grid_time").show(6, truncate = false)

    val obs = PseudoObserver.observe(asm, coord)
    println(s"[demo] observed stars=${obs.stars.count()} " +
      s"(unresolved merged=${obs.stars.filter(org.apache.spark.sql.functions.col("is_unresolved_binary")).count()})")
    obs.stars.select("sim_id", "time", "obj_label", "is_binary",
      "is_unresolved_binary", "lon_deg", "lat_deg", "dist_pc", "rv_kms")
      .orderBy("sim_id", "time", "obj_label").show(8, truncate = false)

    // pre-flight + diagnostics (reference loader surface)
    import graft.sources.Loader
    val problems = Loader.validate(java.nio.file.Paths.get(root))
    println(s"[demo] sim-dir validation problems: $problems")
    SnapshotStats.timestampStats(asm.headers).orderBy("sim_id")
      .show(4, truncate = false)

    // multi-coordinate collection: stats per observer coordinate
    val all = PseudoObserver.observeAll(asm,
      Seq(coord, (coord._1 * 10, coord._2 * 10, coord._3 * 10)))
    SnapshotStats.overallStats(all, asm.headers)
      .select("obs_coord", "sim_id", "time", "n_star",
        "n_binary_system", "n_unresolved_binary_system")
      .orderBy("obs_coord", "sim_id", "time").show(8, truncate = false)

    // parquet round-trip: write partitioned, load, same stats
    val tmp = java.nio.file.Files.createTempDirectory("graft_demo_rt").toString
    SnapshotStats.writePartitioned(asm, tmp)
    val loaded = graft.pipeline.Assembled.load(spark, tmp)
    println(s"[demo] round-trip stars=${loaded.stars.count()} (== ${asm.stars.count()})")
    spark.stop()
  }
}
