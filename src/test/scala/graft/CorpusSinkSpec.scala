package graft

import graft.operators.CorpusSink
import org.apache.spark.sql.functions._

class CorpusSinkSpec extends SparkSpec {

  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("corpus_sink_").toFile
    d.deleteOnExit()
    d
  }

  test("shard store round-trips with deterministic layout") {
    val docs = Tables(spark, sfDir).documents
    val dir = tmpDir().getAbsolutePath
    CorpusSink.write(docs, dir, shards = 4)

    val back = CorpusSink.load(spark, dir)
    assert(back.count() == docs.count())
    val cols = docs.columns.sorted.map(col).toSeq
    assert(back.select(cols: _*).exceptAll(docs.select(cols: _*)).count() == 0)
    assert(docs.select(cols: _*).exceptAll(back.select(cols: _*)).count() == 0)

    // layout: one dir per source, at most `shards` data files each
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
    assert(subdirs.nonEmpty && subdirs.forall(_.getName.startsWith("source=")))
    subdirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty && files.length <= 4, s"${d.getName}: ${files.length} files")
    }

    // re-run writes byte-identical shard contents (pure function of data)
    val dir2 = tmpDir().getAbsolutePath
    CorpusSink.write(docs, dir2, shards = 4)
    def digest(root: String): Map[String, String] = {
      val base = java.nio.file.Paths.get(root)
      java.nio.file.Files.walk(base).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map { p =>
          val bytes = java.nio.file.Files.readAllBytes(p)
          val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
          // file names embed the write-job UUID; shard identity is
          // (partition dir, task index) — part-NNNNN
          val rel = base.relativize(p).toString
          val key = rel.replaceAll("(part-\\d+)-.*", "$1")
          key -> md.map("%02x".format(_)).mkString
        }.toMap
    }
    assert(digest(dir) == digest(dir2), "shard layout/content not reproducible")
  }

  test("reads prune on the source partition column") {
    val docs = Tables(spark, sfDir).documents
    val dir = tmpDir().getAbsolutePath
    CorpusSink.write(docs, dir, shards = 4)
    val one = CorpusSink.load(spark, dir).filter(col("source") === "src3")
    assert(one.count() == docs.filter(col("source") === "src3").count())
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("src3"),
      s"source filter not pushed to partition pruning:\n$plan")
  }

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
