package graft

import graft.sources.CsvCorpus

/** Behavior contract of the CSV corpus source: RFC-4180 quote
  * handling, field-level quarantine (null-filled bad fields, which
  * Spark's CSV reader does NOT mark corrupt), and the ingest report.
  */
class CsvCorpusSpec extends SparkSpec {

  private def writeLines(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("csv_spec")
    java.nio.file.Files.writeString(dir.resolve("part0.csv"),
      lines.mkString("\n"))
    dir.toString
  }

  test("RFC-4180 quoting: embedded commas and doubled quotes parse") {
    val dir = writeLines(Seq(
      "1,\"a, b\",en,src",
      "2,\"say \"\"hi\"\"\",fr,\"quoted,src\""))
    val rows = CsvCorpus.clean(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3))).sortBy(_._1)
    assert(rows === Array(
      (1L, "a, b", "src"),
      (2L, "say \"hi\"", "quoted,src")))
  }

  test("bad fields and short arity quarantine the same under any projection") {
    val dir = writeLines(Seq(
      "1,good text,en,src",
      "oops,bad id,en,src",      // doc_id unparseable -> corrupt
      "2,short arity,en"))       // missing source -> corrupt
    // corruption is a property of the LINE: count() (no columns
    // required) and collect() (all columns) must agree — the exact
    // disagreement spark.read.csv's pruned parse exhibits
    assert(CsvCorpus.clean(spark, dir).count() == 1)
    assert(CsvCorpus.clean(spark, dir).collect().length == 1)
    val rep = CsvCorpus.report(spark, dir).collect()(0)
    assert(rep.getLong(0) == 3 && rep.getLong(1) == 1 && rep.getLong(2) == 2)
    val q = CsvCorpus.quarantine(spark, dir).collect().map(_.getString(0))
    assert(q.length == 2 && q.exists(_.contains("bad id")) &&
      q.exists(_.contains("short arity")))
  }

  test("a giant unquoted shard stays line-splittable (multiLine off)") {
    val lines = (1 to 500).map(i => s"$i,text number $i,en,src${i % 3}")
    val dir = writeLines(lines)
    val df = CsvCorpus.clean(spark, dir)
    assert(df.count() == 500)
    assert(df.agg(org.apache.spark.sql.functions.sum("doc_id"))
      .collect()(0).getLong(0) == 500L * 501 / 2)
  }
}
