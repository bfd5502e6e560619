package graft.pipeline

import graft.functions.Astro
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Observed snapshot tables: stars carry offset-frame observables and
  * an is_unresolved_binary flag; binaries carry resolvability.
  */
final case class Observed(stars: DataFrame, binaries: DataFrame)

/** Spark-native pseudo-observation (reference: src/nbody6/observer.py
  * PseudoObserver._observe). The reference loops snapshots and merges
  * unresolved systems with recursive dict lookups; here each step is a
  * join/aggregation keyed by (sim_id, time), so one plan observes every
  * snapshot at once. The recursion is bounded (component sides hold at
  * most one regularized pair, observer.py:127), so it unrolls into two
  * deterministic merge levels.
  *
  * Resolvability: semi[AU] <= dist_obs[pc] * 0.6 is an angular cut —
  * separation/distance in those units IS arcsec, so this is a 0.6"
  * resolution limit (observer.py:22 UNRESOLVED_SEP_FACTOR).
  */
object PseudoObserver {

  val UNRESOLVED_SEP_FACTOR = 0.6
  private val KEY = Seq("sim_id", "time")

  private val ATTR = Seq("x", "y", "z", "vx", "vy", "vz", "mass",
    "log_L_L_sol", "log_R_R_sol")

  /** Photocentric merge of two component attr structs (reference:
    * observer.py:42 _merge_unresolved_binaries).
    */
  private def mergePair(s1: Column, s2: Column): Column = {
    val l1 = pow(lit(10.0), s1.getField("log_L_L_sol"))
    val l2 = pow(lit(10.0), s2.getField("log_L_L_sol"))
    def photo(f: String): Column =
      Astro.photocentric(l1, l2, s1.getField(f), s2.getField(f))
    val logL = Astro.logAdd10(s1.getField("log_L_L_sol"), s2.getField("log_L_L_sol"))
    val logR = Astro.logEquivalentRadius(s1.getField("log_R_R_sol"), s2.getField("log_R_R_sol"))
    struct(
      photo("x").as("x"), photo("y").as("y"), photo("z").as("z"),
      photo("vx").as("vx"), photo("vy").as("vy"), photo("vz").as("vz"),
      (s1.getField("mass") + s2.getField("mass")).as("mass"),
      logL.as("log_L_L_sol"), logR.as("log_R_R_sol"))
  }

  /** Observe every assembled snapshot from one observer coordinate. */
  def observe(assembled: Assembled, coord: (Double, Double, Double)): Observed = {
    val starsW = assembled.stars.filter(col("is_within_2x_r_tidal"))
    val binsW = assembled.binaries.filter(col("is_within_2x_r_tidal"))

    // hierarchy restricted to pairs that survived the 2rt cut
    // (reference: observer.py:186-191)
    val pairSets = binsW.groupBy(KEY.map(col): _*)
      .agg(collect_set(col("pair")).as("alive_pairs"))
    val starsH = starsW.join(broadcast(pairSets), KEY, "left")
      .withColumn("hierarchy",
        filter(col("hierarchy"), p =>
          !p.contains("+") ||
            array_contains(coalesce(col("alive_pairs"), array()), p)))
      .withColumn("is_binary", size(col("hierarchy")) > 1)
      .withColumn("is_multi_system", size(col("hierarchy")) > 2)
      .drop("alive_pairs")

    val obs = OffsetFrame.project(starsH, coord)

    // observed distance + resolvability per system
    val memberObs = binsW
      .select((KEY.map(col) :+ col("pair") :+
        explode(concat(col("obj1_ids"), col("obj2_ids"))).as("name")): _*)
      .join(obs.select((KEY.map(col) :+ col("name") :+ col("dist_pc")): _*),
        KEY :+ "name")
      .groupBy((KEY :+ "pair").map(col): _*)
      .agg(avg(col("dist_pc")).as("dist_obs_pc"))
    val binaries = binsW.join(memberObs, KEY :+ "pair")
      .withColumn("is_unresolved_binary_system",
        col("semi") <= col("dist_obs_pc") * UNRESOLVED_SEP_FACTOR)

    // single stars pass through; members of resolved systems pass
    // through flagged as binaries
    val resolvedNames = binaries.filter(!col("is_unresolved_binary_system"))
      .select((KEY.map(col) :+
        explode(concat(col("obj1_ids"), col("obj2_ids"))).as("name")): _*)
      .distinct()
    val singles = obs.filter(!col("is_binary"))
      .withColumn("is_unresolved_binary", lit(false))
    val resolvedStars = obs.join(resolvedNames, KEY :+ "name")
      .withColumn("is_binary", lit(true))
      .withColumn("is_unresolved_binary", lit(false))

    // ---- unresolved systems -> merged photocentric objects ---------
    val unres = binaries.filter(col("is_unresolved_binary_system"))
      .withColumn("members", sort_array(concat(col("obj1_ids"), col("obj2_ids"))))

    // top-level = member set not a strict subset of another unresolved
    // system's member set (reference: observer.py:103)
    val other = unres.select(col("sim_id").as("o_sim_id"),
      col("time").as("o_time"), col("members").as("o_members"))
    val topUnres = unres.join(other,
        col("sim_id") === col("o_sim_id") && col("time") === col("o_time") &&
          size(array_except(col("members"), col("o_members"))) === 0 &&
          size(col("members")) < size(col("o_members")), "left_anti")

    // component-side attrs: atoms look up the star; regularized pairs
    // merge their two members first (bounded recursion level 1)
    val attrStruct = struct(ATTR.map(col): _*).as("attrs")
    val atomAttrs = obs.select((KEY.map(col) :+ col("name") :+ attrStruct): _*)
    def sideAttrs(side: Int): DataFrame = {
      val ids = col(s"obj${side}_ids")
      val base = topUnres.select((KEY.map(col) :+ col("pair") :+ ids.as("ids")): _*)
      val atomSide = base.filter(size(col("ids")) === 1)
      val atom = atomSide
        .join(atomAttrs,
          KEY.map(k => atomSide(k) === atomAttrs(k)).reduce(_ && _) &&
            element_at(atomSide("ids"), 1) === atomAttrs("name"))
        .select((atomSide.columns.map(atomSide(_)) :+ atomAttrs("attrs")): _*)
      val pairIds = base.filter(size(col("ids")) === 2)
      val a1 = atomAttrs.select(col("sim_id").as("s1"), col("time").as("t1"),
        col("name").as("n1"), col("attrs").as("attrs1"))
      val a2 = atomAttrs.select(col("sim_id").as("s2"), col("time").as("t2"),
        col("name").as("n2"), col("attrs").as("attrs2"))
      val merged = pairIds
        .join(a1, col("sim_id") === col("s1") && col("time") === col("t1") &&
          element_at(col("ids"), 1) === col("n1"))
        .join(a2, col("sim_id") === col("s2") && col("time") === col("t2") &&
          element_at(col("ids"), 2) === col("n2"))
        .select((pairIds.columns.map(pairIds(_)) :+
          mergePair(col("attrs1"), col("attrs2")).as("attrs")): _*)
      atom.unionByName(merged)
        .withColumnRenamed("attrs", s"attrs$side").drop("ids")
    }

    val withSides = sideAttrs(1).join(sideAttrs(2), KEY :+ "pair")
      .withColumn("m", mergePair(col("attrs1"), col("attrs2")))
      .drop("attrs1", "attrs2")

    // merged-system hierarchy: member ids + every unresolved pair whose
    // members are a subset (reference: observer.py:134-146)
    val contained = topUnres.select((KEY.map(col) :+ col("pair") :+ col("members")): _*)
      .join(unres.select(col("sim_id").as("u_sim_id"), col("time").as("u_time"),
        col("pair").as("u_pair"), col("members").as("u_members")),
        col("sim_id") === col("u_sim_id") && col("time") === col("u_time") &&
          size(array_except(col("u_members"), col("members"))) === 0)
      .groupBy((KEY :+ "pair").map(col): _*)
      .agg(collect_set(col("u_pair")).as("sub_pairs"))

    val hdr = assembled.headers.select((KEY.map(col) :+ col("density_center") :+
      col("r_tidal") :+ col("r_half_mass")): _*)
    val mergedStars0 = withSides
      .join(contained, KEY :+ "pair", "left")
      .join(topUnres.select((KEY.map(col) :+ col("pair") :+ col("members")): _*), KEY :+ "pair")
      .join(broadcast(hdr), KEY)
      .select((KEY.map(col) ++ Seq(col("pair"), col("members"),
        coalesce(col("sub_pairs"), array()).as("sub_pairs"),
        col("m"), col("density_center"), col("r_tidal"), col("r_half_mass"))): _*)

    val dcDist = {
      val dx = col("m.x") - element_at(col("density_center"), 1)
      val dy = col("m.y") - element_at(col("density_center"), 2)
      val dz = col("m.z") - element_at(col("density_center"), 3)
      sqrt(dx * dx + dy * dy + dz * dz)
    }
    val mergedFlat = mergedStars0
      .withColumn("hierarchy",
        transform(sort_array(transform(
          array_union(transform(col("members"), _.cast("string")), col("sub_pairs")),
          p => struct(length(p).as("l"), p.as("p")))), _.getField("p")))
      .withColumn("is_multi_system", size(col("members")) > 2)
      .withColumn("dist_dc_pc", dcDist)
      .select((KEY.map(col) ++ Seq(col("pair").as("obj_label"),
        col("hierarchy"), col("is_multi_system")) ++
        ATTR.map(f => col(s"m.$f").as(f)) ++ Seq(
        Astro.logEffectiveTemperatureK(col("m.log_L_L_sol"), col("m.log_R_R_sol"))
          .as("log_T_eff_K"),
        col("dist_dc_pc"),
        (col("dist_dc_pc") / col("r_tidal")).as("dist_dc_r_tidal"),
        (col("dist_dc_pc") / col("r_half_mass")).as("dist_dc_r_half_mass"),
        (col("dist_dc_pc") <= col("r_tidal")).as("is_within_r_tidal"),
        (col("dist_dc_pc") <= col("r_tidal") * 2).as("is_within_2x_r_tidal"))): _*)
    val mergedStars = OffsetFrame.project(mergedFlat, coord)
      .withColumn("is_binary", lit(true))
      .withColumn("is_unresolved_binary", lit(true))
      .withColumn("name", lit(null).cast("long"))

    val obsCols = Seq("sim_id", "time", "name", "obj_label", "is_binary",
      "is_multi_system", "is_unresolved_binary", "hierarchy") ++ ATTR ++
      Seq("log_T_eff_K", "dist_dc_pc", "dist_dc_r_tidal", "dist_dc_r_half_mass",
        "is_within_r_tidal", "is_within_2x_r_tidal",
        "lon_deg", "lat_deg", "pm_lon_coslat_mas_yr", "pm_lat_mas_yr",
        "dist_pc", "rv_kms")
    def shape(df: DataFrame): DataFrame = {
      val withLabel =
        if (df.columns.contains("obj_label")) df
        else df.withColumn("obj_label", col("name").cast("string"))
      withLabel.select(obsCols.map(col): _*)
    }

    Observed(
      stars = shape(singles).unionByName(shape(resolvedStars))
        .unionByName(shape(mergedStars)),
      binaries = binaries)
  }

  /** Observe every snapshot from EVERY coordinate — the reference's
    * SnapshotSeriesCollection layer (collection.py:84-126
    * iter_by_coordinate; observer.py observe(coordinates)). Each
    * coordinate's observation is tagged with the SURVEY §3 partition
    * column `obs_coord` plus the reference's galactic_x/y/z triple
    * (collection.py:207-210) and unioned into one table, so downstream
    * stats group by (obs_coord, sim_id, time) in a single pass instead
    * of looping coordinates. Scale note: coordinates multiply the data
    * N_coords times exactly like the reference's per-coordinate series
    * dict — but here each coordinate's branch shares the one assembled
    * scan and the union is partition-parallel.
    */
  def observeAll(assembled: Assembled,
                 coords: Seq[(Double, Double, Double)]): Observed = {
    require(coords.nonEmpty, "observeAll needs at least one coordinate")
    def tag(df: DataFrame, c: (Double, Double, Double)): DataFrame = df
      .withColumn("obs_coord", lit(s"${c._1},${c._2},${c._3}"))
      .withColumn("galactic_x", lit(c._1))
      .withColumn("galactic_y", lit(c._2))
      .withColumn("galactic_z", lit(c._3))
    coords.map { c =>
      val o = observe(assembled, c)
      Observed(tag(o.stars, c), tag(o.binaries, c))
    }.reduce((a, b) => Observed(
      a.stars.unionByName(b.stars), a.binaries.unionByName(b.binaries)))
  }
}
