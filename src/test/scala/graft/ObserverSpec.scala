package graft

import graft.pipeline.{OffsetFrame, PseudoObserver, SnapshotAssembler}
import graft.sources.NBody6
import java.nio.file.Files
import org.apache.spark.sql.functions._

class ObserverSpec extends SparkSpec {
  import NBody6Fixtures._

  private lazy val assembled = {
    val d = Files.createTempDirectory("nbody6_obs_fixtures")
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

  // ~374 pc away: the 0.6" cut resolves the wide (3,4) pair and the
  // triple, but not the tight regularized (11,12) pair.
  private val COORD = (100.0, 200.0, 300.0)
  private lazy val observed = PseudoObserver.observe(assembled, COORD)

  test("offset frame: on-axis star sits at lon=lat=0 with pure radial velocity") {
    import spark.implicits._
    val df = Seq((10.0, 0.0, 0.0, 5.0, 0.0, 0.0), (0.0, 50.0, 0.0, 0.0, 0.0, 7.0))
      .toDF("x", "y", "z", "vx", "vy", "vz")
    val out = OffsetFrame.project(df, (100.0, 0.0, 0.0)).collect()
    val onAxis = out(0)
    assert(math.abs(onAxis.getAs[Double]("lon_deg")) < 1e-12)
    assert(math.abs(onAxis.getAs[Double]("lat_deg")) < 1e-12)
    assert(math.abs(onAxis.getAs[Double]("dist_pc") - 110.0) < 1e-9)
    assert(math.abs(onAxis.getAs[Double]("rv_kms") - 5.0) < 1e-9)
    assert(math.abs(onAxis.getAs[Double]("pm_lat_mas_yr")) < 1e-9)
    val off = out(1)
    assert(math.abs(off.getAs[Double]("lon_deg") - math.toDegrees(math.atan2(50, 100))) < 1e-9)
    assert(math.abs(off.getAs[Double]("dist_pc") - math.sqrt(12500.0)) < 1e-9)
    assert(math.abs(off.getAs[Double]("rv_kms")) < 1e-9)
    val expectedPmLat = 7.0 / (graft.functions.Astro.PM_KAPPA * math.sqrt(12500.0)) * 1000
    assert(math.abs(off.getAs[Double]("pm_lat_mas_yr") - expectedPmLat) < 1e-6)
  }

  test("resolvability is the 0.6 arcsec angular cut") {
    val b = observed.binaries.filter(col("sim_id") === "simA" && col("time") === 12.5)
      .collect().map(r => r.getAs[String]("pair") ->
        r.getAs[Boolean]("is_unresolved_binary_system")).toMap
    assert(b("11+12") == true, "tight regularized pair should be unresolved")
    assert(b("3+4") == false, "wide pair should be resolved at 374 pc")
    assert(b("5+(11+12)") == false, "triple is wide enough to resolve")
  }

  test("observed star catalog = singles + resolved members + merged objects") {
    val s = observed.stars.filter(col("sim_id") === "simA" && col("time") === 12.5)
    assert(s.count() == 12) // 6 singles + 5 resolved members + 1 merged
    assert(s.filter(!col("is_binary")).count() == 6)
    assert(s.filter(col("is_unresolved_binary")).count() == 1)
    val resolvedNames = s.filter(col("is_binary") && !col("is_unresolved_binary"))
      .select("name").collect().map(_.getLong(0)).toSet
    assert(resolvedNames == Set(3L, 4L, 5L, 11L, 12L))
  }

  test("merged object carries photocentric position and summed quantities") {
    val m = observed.stars
      .filter(col("sim_id") === "simA" && col("time") === 12.5 &&
        col("is_unresolved_binary"))
      .collect().head
    assert(m.getAs[String]("obj_label") == "11+12")
    // components share the CoM position, so the photocenter is exactly it
    val (x10, y10, z10) = starPos(10, 12.5)
    assert(math.abs(m.getAs[Double]("x") - x10) < 1e-9)
    assert(math.abs(m.getAs[Double]("y") - y10) < 1e-9)
    assert(math.abs(m.getAs[Double]("mass") - (starMass(11) + starMass(12))) < 1e-9)
    val expectedLogL = {
      val (a, b) = (0.5, 0.3)
      math.max(a, b) + math.log10(1 + math.pow(10, math.min(a, b) - math.max(a, b)))
    }
    assert(math.abs(m.getAs[Double]("log_L_L_sol") - expectedLogL) < 1e-12)
    assert(m.getAs[scala.collection.Seq[String]]("hierarchy").toSeq ==
      Seq("11", "12", "11+12"))
  }

  test("hierarchy of surviving stars drops pairs outside 2 r_tidal") {
    // all fixture systems are inside 2rt, so hierarchies are unchanged
    val s = observed.stars.filter(col("sim_id") === "simA" && col("time") === 12.5 &&
      col("name") === 11L).collect().head
    assert(s.getAs[scala.collection.Seq[String]]("hierarchy").toSeq ==
      Seq("11", "11+12", "5+(11+12)"))
  }

  test("observeAll: per-coordinate slices equal per-call observe, keyed by obs_coord") {
    val coords = Seq(COORD, (-150.0, 50.0, 80.0))
    val all = PseudoObserver.observeAll(assembled, coords)
    assert(Seq("obs_coord", "galactic_x", "galactic_y", "galactic_z")
      .forall(all.stars.columns.contains))
    // collect-and-compare with tolerance: a DataFrame exceptAll would
    // re-execute the heavy observe DAG per direction AND demand
    // bit-exact doubles across two differently-shaped plans
    val allRows = all.stars.collect()
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => ((r.getAs[String]("sim_id"), r.getAs[Double]("time"),
        r.getAs[String]("obj_label")), r)).toMap
    coords.foreach { c =>
      val tag = s"${c._1},${c._2},${c._3}"
      val direct = PseudoObserver.observe(assembled, c).stars
      val dRows = keyed(direct.collect())
      val sRows = keyed(allRows.filter(_.getAs[String]("obs_coord") == tag))
      assert(sRows.keySet == dRows.keySet, s"object sets differ for $tag")
      sRows.foreach { case (k, sr) =>
        val dr = dRows(k)
        direct.columns.foreach { cn =>
          (sr.getAs[Any](cn), dr.getAs[Any](cn)) match {
            case (a: Double, b: Double) =>
              assert(a == b || math.abs(a - b) <=
                1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b))),
                s"$tag $k $cn: $a != $b")
            case (a: scala.collection.Seq[_], b: scala.collection.Seq[_]) =>
              assert(a.toSeq == b.toSeq, s"$tag $k $cn differs")
            case (a, b) => assert(a == b, s"$tag $k $cn: $a != $b")
          }
        }
      }
    }
  }

  test("every observed star has finite observables") {
    val bad = observed.stars.filter(
      isnan(col("lon_deg")) || isnan(col("lat_deg")) || isnan(col("dist_pc")) ||
        isnan(col("rv_kms")) || col("dist_pc") <= 0)
    assert(bad.count() == 0)
  }
}
