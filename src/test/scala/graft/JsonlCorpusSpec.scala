package graft

import graft.sources.JsonlCorpus
import java.nio.file.{Files, Paths}

class JsonlCorpusSpec extends SparkSpec {

  private def fixture(): String = {
    val dir = Files.createTempDirectory("jsonl").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "meta": {"url": "x"}}""",
      // malformed JSON line — must quarantine, not kill the read
      """{"doc_id": 3, "text": "broken""",
      // parses, but missing the required text field — pipeline-malformed
      """{"doc_id": 4, "lang": "en", "source": "web"}""",
      // unknown extra field — additive drift must stay readable
      """{"doc_id": 5, "text": "extra", "lang": "en", "source": "web", "new_field": 9}""",
      "not json at all")
    Files.write(Paths.get(dir, "part0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("clean keeps exactly the well-formed documents; drift fields ignored") {
    val dir = fixture()
    val rows = JsonlCorpus.clean(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSet == Set((1L, "hello world"), (2L, "bonjour"),
      (5L, "extra")))
    // the meta map survives when present
    val meta = JsonlCorpus.clean(spark, dir)
      .where("doc_id = 2").select("meta").collect()(0)
      .getMap[String, String](0)
    assert(meta("url") == "x")
  }

  test("quarantine captures every broken or structurally-empty line") {
    val dir = fixture()
    val raw = JsonlCorpus.quarantine(spark, dir).collect().map(_.getString(0))
    assert(raw.length == 3)
    assert(raw.exists(_.contains("broken")), "malformed JSON kept verbatim")
    assert(raw.exists(_.contains("not json at all")))
  }

  test("report counts reconcile: total = parsed + quarantined") {
    val dir = fixture()
    val r = JsonlCorpus.report(spark, dir).collect()(0)
    assert(r.getLong(0) == 6 && r.getLong(1) == 3 && r.getLong(2) == 3)
    assert(r.getLong(0) == r.getLong(1) + r.getLong(2))
  }

  test("round-trip: documents written as JSONL read back identically") {
    val dir = Files.createTempDirectory("jsonl_rt").toString
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "text", "lang", "source")
    docs.write.json(s"$dir/out")
    val back = JsonlCorpus.clean(spark, s"$dir/out")
      .select("doc_id", "text", "lang", "source")
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    assert(JsonlCorpus.quarantine(spark, s"$dir/out").count() == 0)
  }
}
