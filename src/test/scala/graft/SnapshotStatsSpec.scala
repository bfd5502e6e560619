package graft

import graft.pipeline.{SnapshotAssembler, SnapshotStats}
import graft.sources.NBody6
import java.nio.file.Files
import org.apache.spark.sql.functions._

class SnapshotStatsSpec extends SparkSpec {
  import NBody6Fixtures._

  private lazy val assembled = {
    val d = Files.createTempDirectory("nbody6_stats_fixtures")
    NBody6Fixtures.write(d)
    val g = d.toString
    val (o34h, o34d) = NBody6.readOut34(spark, s"$g/*/OUT34")
    val (_, o9d) = NBody6.readOut9(spark, s"$g/*/OUT9")
    val (_, f82d) = NBody6.readFort82(spark, s"$g/*/fort.82")
    val (_, f83d) = NBody6.readFort83(spark, s"$g/*/fort.83")
    val (_, f19d) = NBody6.readFort19(spark, s"$g/*/fort.19")
    val dcH = NBody6.readDensCentre(spark, s"$g/*/densCentre.txt")
    SnapshotAssembler.assemble(o34h, o34d, o9d, f82d, f83d, f19d, dcH)
  }

  test("overall stats: one row per snapshot, masked counts consistent") {
    val s = SnapshotStats.overallStats(assembled)
    assert(s.count() == SIMS.size * TIMES.size)
    val r = s.filter(col("sim_id") === "simA" && col("time") === 12.5).collect().head
    assert(r.getAs[Long]("n_star") == 11L)
    assert(r.getAs[Long]("n_binary_star") == 5L)  // 3,4,5,11,12
    assert(r.getAs[Long]("within_r_tidal_n_star") <= r.getAs[Long]("n_star"))
    assert(r.getAs[Long]("n_binary_system") == 3L)
    val expectedTotal = (1 to 9).map(starMass).sum + starMass(11) + starMass(12)
    assert(math.abs(r.getAs[Double]("total_mass") - expectedTotal) < 1e-9)
    // mass quantile pack is ordered
    val q = Seq("mass_min", "mass_q1", "mass_median", "mass_q3", "mass_max")
      .map(r.getAs[Double])
    assert(q == q.sorted)
  }

  test("annular stats: ring counts per dist key sum to star count") {
    val a = SnapshotStats.annularStats(assembled)
    val sums = a.groupBy("sim_id", "time", "dist_key").agg(sum("n_star").as("n"))
    assert(sums.filter(col("n") =!= 11).count() == 0)
    assert(a.filter(col("n_single") + col("n_binary_star") =!= col("n_star")).count() == 0)
    assert(a.select("dist_key").distinct().count() == 2)
  }

  test("inclinations computed for atomic-sided binaries only") {
    val inc = SnapshotStats.inclinations(assembled)
    val pairs = inc.filter(col("sim_id") === "simA" && col("time") === 12.5)
      .select("pair").collect().map(_.getString(0)).toSet
    assert(pairs == Set("3+4", "11+12"))  // triple has a composite side
    assert(inc.filter(col("incl_rad") < 0 || col("incl_rad") > math.Pi).count() == 0)
  }

  test("time alignment produces a dense grid with forward fill") {
    val stats = SnapshotStats.overallStats(assembled)
      .select("sim_id", "time", "n_star", "total_mass")
    val aligned = SnapshotStats.timeAlign(stats, step = 1.0)
    // grid spans ceil(12.5)=13 .. ceil(25)=25 per sim => 13 rows
    val perSim = aligned.groupBy("sim_id").count().select("count").distinct().collect()
    assert(perSim.length == 1 && perSim.head.getLong(0) == 13L)
    // every grid point after the first snapshot carries values
    assert(aligned.filter(col("n_star").isNull).count() == 0)
    // value at grid 20 is the t=12.5 snapshot's (forward-filled)
    val v = aligned.filter(col("sim_id") === "simA" && col("grid_time") === 20.0)
      .select("n_star").collect().head.getLong(0)
    assert(v == 11L)
  }

  test("partitioned write round-trips and prunes partitions") {
    val out = Files.createTempDirectory("graft_partitioned").toString
    SnapshotStats.writePartitioned(assembled, out)
    val stars = spark.read.parquet(s"$out/stars")
    assert(stars.count() == assembled.stars.count())
    val pruned = stars.filter(col("sim_id") === "simA")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("sim_id"),
      "expected partition pruning on sim_id")
    assert(pruned.count() == assembled.stars.filter(col("sim_id") === "simA").count())
  }
}
