package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Astrophysics column functions, re-expressed Spark-first.
  *
  * Semantics derived from the reference pipeline's calc package
  * (reference: src/nbody6/calc/binary.py, star.py, cluster.py). All of
  * these are pure Catalyst expression trees (whole-stage codegen, no
  * UDFs) so they vectorize on a 1000-executor cluster exactly like
  * built-ins.
  *
  * Physical constants are IAU/CODATA nominal values, spelled out as
  * literals so results are reproducible engine-to-engine.
  */
object Astro {

  /** Newtonian constant of gravitation [m^3 kg^-1 s^-2] (CODATA 2018). */
  val G_SI = 6.6743e-11
  /** Nominal solar mass [kg] (IAU 2015 B3, GM_sun / G). */
  val M_SUN_KG = 1.988409870698051e30
  /** Astronomical unit [m] (IAU 2012 B2). */
  val AU_M = 1.495978707e11
  /** Parsec in AU (648000 / pi). */
  val PC_AU = 206264.80624709636
  /** Solar effective temperature [K] (IAU 2015 B3). */
  val T_SUN_K = 5772.0
  /** Nominal solar luminosity [W] (IAU 2015 B2). */
  val L_SUN_W = 3.828e26
  /** Zero-point luminosity for bolometric magnitude [W] (IAU 2015 B2). */
  val L_BOL0_W = 3.0128e28
  /** Seconds per day. */
  val DAY_S = 86400.0
  /** km/s tangential velocity at 1 pc <-> 1 arcsec/yr proper motion. */
  val PM_KAPPA = 4.740470463533349

  private val LN10 = math.log(10.0)

  /** log10(10^a + 10^b) via log-sum-exp for numerical stability
    * (reference: calc/binary.py:10 calc_total_log_luminosity).
    */
  def logAdd10(a: Column, b: Column): Column = {
    val hi = greatest(a, b)
    val lo = least(a, b)
    hi + log10(lit(1.0) + pow(lit(10.0), lo - hi))
  }

  /** log10 equivalent radius: 0.5*log10(10^(2a) + 10^(2b))
    * (reference: calc/binary.py:26 calc_log_equivalent_radius).
    */
  def logEquivalentRadius(logR1: Column, logR2: Column): Column =
    logAdd10(logR1 * 2.0, logR2 * 2.0) * 0.5

  /** Kepler third law semi-major axis in AU from component masses
    * [M_sol] and period [days] (reference: calc/binary.py:57).
    */
  def keplerSemiMajorAxisAu(m1MSol: Column, m2MSol: Column, periodDays: Column): Column = {
    val totalMassKg = (m1MSol + m2MSol) * M_SUN_KG
    val periodS = periodDays * DAY_S
    val aCubed = totalMassKg * periodS * periodS * (G_SI / (4.0 * math.Pi * math.Pi))
    pow(aCubed, 1.0 / 3.0) / AU_M
  }

  /** Wide binary: a > threshold AU (reference: calc/binary.py:95). */
  def isWideBinary(semiAu: Column, thresholdAu: Double = 1000.0): Column =
    semiAu > thresholdAu

  /** Hard binary (Heggie): a < r_hm / N, r_hm in pc
    * (reference: calc/binary.py:99).
    */
  def isHardBinary(semiAu: Column, halfMassRadiusPc: Column, numStars: Column): Column =
    semiAu < halfMassRadiusPc * PC_AU / numStars

  /** Effective temperature [K] from L/L_sol and R/R_sol via
    * Stefan-Boltzmann (reference: calc/star.py:12).
    */
  def effectiveTemperatureK(lLSol: Column, rRSol: Column): Column =
    pow(lLSol / (rRSol * rRSol), 0.25) * T_SUN_K

  /** log10 T_eff from log10 L and log10 R (reference: calc/star.py:19). */
  def logEffectiveTemperatureK(logL: Column, logR: Column): Column =
    (logL - logR * 2.0) * 0.25 + math.log10(T_SUN_K)

  /** log10 surface flux ratio vs the Sun (reference: calc/star.py:5). */
  def logSurfaceFluxRatio(logTeffK: Column): Column =
    (logTeffK - math.log10(T_SUN_K)) * 4.0

  /** Bolometric magnitude from log10(L/L_sol)
    * (reference: calc/star.py:30). M_bol_sun derived from IAU zero point.
    */
  def bolometricMagnitude(logL: Column): Column =
    logL * -2.5 + (-2.5 * math.log10(L_SUN_W / L_BOL0_W))

  /** Apparent magnitude from absolute magnitude and distance [pc]
    * (reference: calc/star.py:38).
    */
  def apparentMagnitude(absMag: Column, distPc: Column): Column =
    absMag + (log10(distPc) - 1.0) * 5.0

  /** Euclidean distance to a fixed 3-D center (reference:
    * assembler.py:192 dist_dc_pc).
    */
  def distToCenter(x: Column, y: Column, z: Column,
                   cx: Double, cy: Double, cz: Double): Column =
    sqrt((x - cx) * (x - cx) + (y - cy) * (y - cy) + (z - cz) * (z - cz))

  /** Orbital-plane inclination [rad]: angle between specific angular
    * momentum h = r_rel x v_rel and the z-axis
    * (reference: calc/binary.py:69). Radial orbits (|h| ~ 0) -> 0.
    */
  def orbitalInclinationRad(rx: Column, ry: Column, rz: Column,
                            vx: Column, vy: Column, vz: Column): Column = {
    val hx = ry * vz - rz * vy
    val hy = rz * vx - rx * vz
    val hz = rx * vy - ry * vx
    val hn = sqrt(hx * hx + hy * hy + hz * hz)
    when(hn < 1e-12, lit(0.0))
      .otherwise(acos(greatest(lit(-1.0), least(lit(1.0), hz / hn))))
  }

  /** Photocentric (luminosity-weighted) coordinate of a two-object
    * system (reference: calc/binary.py:43). Zero total weight falls
    * back to the geometric mean.
    */
  def photocentric(l1: Column, l2: Column, v1: Column, v2: Column): Column = {
    val total = l1 + l2
    when(abs(total) < 1e-300, (v1 + v2) / 2.0)
      .otherwise((l1 * v1 + l2 * v2) / total)
  }
}
