package graft.queries

import java.nio.file.{Files, Path}

/** Session-scoped scratch directories (round-6 ADVICE): queries that
  * rewrite the corpus into a local directory (q256/q258/q259/q289, the
  * streaming flush/checkpoint sinks) previously created one
  * `Files.createTempDirectory` per invocation and never deleted it, so
  * repeated bench/gate passes accumulated corpus copies in /tmp for
  * the life of the machine. All scratch now nests under ONE per-JVM
  * root that a shutdown hook deletes recursively — repeated passes
  * reuse bounded disk instead of growing it, and a crashed run leaves
  * at most one root to sweep.
  */
object Scratch {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(r.toFile)))
    r
  }

  private def deleteRec(f: java.io.File): Unit = {
    val kids = f.listFiles
    if (kids != null) kids.foreach(deleteRec)
    f.delete()
    ()
  }

  /** A fresh scratch dir under the self-cleaning per-JVM root. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString
}
