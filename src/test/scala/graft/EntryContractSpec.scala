package graft

/** Driver-contract invariants on SparkEntry itself.
  *
  * The driver's correctness gate only checks queries that appear in
  * oracleSql — a `queries` entry whose oracle registration was
  * forgotten silently downgrades from hash-verified to rows-only (it
  * nearly happened to q341), and an oracle whose query was renamed
  * dangles. Pin exact key parity so either slip fails CI instead.
  */
class EntryContractSpec extends SparkSpec {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("query names are unique across the module maps") {
    val maps = Seq(
      graft.queries.Relational.queries, graft.queries.AstroQueries.queries,
      graft.queries.Pipeline.queries, graft.queries.LlmText.queries,
      graft.queries.DedupOps.queries, graft.queries.EmbeddingOps.queries,
      graft.queries.SessionOps.queries, graft.queries.JoinOps.queries,
      graft.queries.TrainPrep.queries, graft.queries.VectorOps.queries,
      graft.queries.EventAnalytics.queries, graft.queries.Retrieval.queries,
      graft.queries.GraphOps.queries, graft.queries.StatsOps.queries,
      graft.queries.TpchShapes.queries, graft.queries.TemporalOps.queries,
      graft.queries.LayoutOps.queries, graft.queries.SqlSurface.queries,
      graft.queries.PatternOps.queries, graft.queries.MaintOps.queries,
      graft.queries.PlannerOps.queries, graft.queries.ProfileOps.queries,
      graft.queries.OpsAnalytics.queries, graft.queries.CorpusOps.queries)
    val all = maps.flatMap(_.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty, s"duplicate query names shadow each other: $dups")
    assert(all.size === SparkEntry.queries.size,
      "a module map entry was lost in the ++ fold")
  }

  test("entry() smoke: flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
