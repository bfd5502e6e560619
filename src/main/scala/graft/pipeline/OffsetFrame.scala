package graft.pipeline

import graft.functions.Astro
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Observer offset-frame projection (reference: calc/cluster.py:34
  * convert_to_offset_frame; astropy's SkyOffsetFrame re-derived as a
  * direct spherical rotation, SURVEY §6).
  *
  * World position = observer coordinate + centered star position. The
  * frame is rotated so the observer->origin direction sits at
  * (lon=0, lat=0): Rz(-lon0) then Ry(-lat0). Longitude/latitude are
  * the spherical angles of the rotated vector; proper motions are the
  * tangential velocity components over distance (kappa = 4.740470
  * km/s per pc per arcsec/yr); radial velocity is the projection onto
  * the line of sight. Pure per-row Catalyst math — no UDF.
  */
object OffsetFrame {

  /** Adds lon_deg, lat_deg, pm_lon_coslat_mas_yr, pm_lat_mas_yr,
    * dist_pc, rv_kms to a frame with centered x,y,z [pc] and
    * vx,vy,vz [km/s] columns.
    */
  def project(df: DataFrame, coord: (Double, Double, Double)): DataFrame = {
    val (cx, cy, cz) = coord
    val r0 = math.sqrt(cx * cx + cy * cy + cz * cz)
    require(r0 > 0, "observer coordinate must be nonzero")
    val lon0 = math.atan2(cy, cx)
    val lat0 = math.asin(cz / r0)
    val (cosL, sinL) = (math.cos(lon0), math.sin(lon0))
    val (cosB, sinB) = (math.cos(lat0), math.sin(lat0))

    // rotated world vector
    def rot(x: Column, y: Column, z: Column): (Column, Column, Column) = {
      val x1 = x * cosL + y * sinL
      val y1 = y * cosL - x * sinL
      val x2 = x1 * cosB + z * sinB
      val z2 = z * cosB - x1 * sinB
      (x2, y1, z2)
    }
    val (wx, wy, wz) = rot(col("x") + cx, col("y") + cy, col("z") + cz)
    val (ux, uy, uz) = rot(col("vx"), col("vy"), col("vz"))
    val d = sqrt(wx * wx + wy * wy + wz * wz)
    val lon = atan2(wy, wx)
    val lat = asin(wz / d)
    // spherical unit vectors in the rotated frame
    val rxy = sqrt(wx * wx + wy * wy)
    val vLon = (uy * wx - ux * wy) / rxy                   // v . e_lon
    val vLat = (uz * rxy - (ux * wx + uy * wy) * wz / rxy) / d  // v . e_lat
    val vR = (ux * wx + uy * wy + uz * wz) / d             // v . e_r

    df.withColumn("lon_deg", degrees(lon))
      .withColumn("lat_deg", degrees(lat))
      .withColumn("pm_lon_coslat_mas_yr", vLon / (lit(Astro.PM_KAPPA) * d) * 1000.0)
      .withColumn("pm_lat_mas_yr", vLat / (lit(Astro.PM_KAPPA) * d) * 1000.0)
      .withColumn("dist_pc", d)
      .withColumn("rv_kms", vR)
  }
}
