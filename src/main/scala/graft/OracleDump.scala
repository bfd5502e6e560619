package graft

import java.nio.file.{Files, Paths}

/** Write SparkEntry.oracleSql as oracle_sql.json WITHOUT starting a
  * SparkSession — the oracle map is static Scala, and gate tooling
  * (assemble/merge/sharded compares) often needs a fresh copy of the
  * full map next to already-dumped query outputs.
  *
  * Usage: OracleDump <outDir>
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    new java.io.File(outDir).mkdirs()
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"wrote ${SparkEntry.oracleSql.size} oracles to $outDir")
  }
}
