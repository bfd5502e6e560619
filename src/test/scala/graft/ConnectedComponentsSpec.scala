package graft

import graft.operators.ConnectedComponents

/** Randomized equivalence of the distributed min-label propagation
  * against a driver-side union-find oracle, plus the worst-case
  * diameter shape (a path graph, where propagation needs the most
  * rounds). Seeded: failures reproduce.
  */
class ConnectedComponentsSpec extends SparkSpec {

  /** Union-find where the smaller root always wins — find() is the
    * component minimum, the same label ConnectedComponents assigns.
    */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents
      .components(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches union-find on seeded random graphs (sparse, dense, multi-edge)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val n = 20 + rnd.nextInt(40)
      val m = 10 + rnd.nextInt(50)
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)) // self-loops + dups OK
      assert(run(edges) == unionFind(edges), s"trial $trial (n=$n m=$m) diverged")
    }
  }

  test("path graph (worst-case diameter) converges to one component") {
    val chain = (0L until 19L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.values.toSet == Set(0L), "chain must collapse to min label 0")
    assert(got.keySet == (0L to 19L).toSet)
  }
}
