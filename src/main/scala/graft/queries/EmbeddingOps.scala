package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity-search operators (SURVEY.md §2 q30–q31).
  *
  * q30 is the correctness baseline: brute-force cosine top-k for a
  * bounded query set (query-set x corpus, never corpus x corpus). q31
  * is the scale path: random-hyperplane LSH buckets the corpus so each
  * query only scores its own bucket — at 100 TB the bucket id becomes
  * the shuffle/partition key and the per-bucket join replaces the full
  * cross product.
  *
  * The dot products are higher-order array folds (zip_with + aggregate)
  * — codegen'd, no UDF. A custom Catalyst expression with doGenCode is
  * the planned upgrade (SURVEY §7 step 7).
  */
object EmbeddingOps {

  val TOP_K = 5
  /** Fixed query-set size: the first NUM_QUERIES vec_ids. A CONSTANT,
    * not a fraction of the corpus — so the broadcast query side is
    * O(NUM_QUERIES * dim) bytes at every corpus scale (a percentage
    * query set would grow to terabytes at 100 TB and kill the
    * executors). An external workload would supply its own bounded
    * query table here.
    */
  val NUM_QUERIES = 20
  val NUM_PLANES = 4          // hyperplanes per hash table (bucket bits)
  val NUM_TABLES = 8          // independent hash tables (candidate union)

  /** Cosine similarity between two array<float> columns: the native
    * codegen'd Catalyst expression (graft.plans.CosineSimilarity).
    * Double left-to-right accumulation, same fold order as DuckDB's
    * list functions — oracle-comparable bit-for-bit.
    */
  def cosine(a: Column, b: Column): Column =
    graft.plans.CosineSimilarity(a, b)

  /** q30: brute-force cosine top-k — every query vector scored against
    * the full corpus, rank by similarity. The corpus side broadcasts
    * the (tiny) query set, so the scan is one pass, no shuffle until
    * the per-query top-k aggregate.
    */
  def q30EmbeddingTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val queries = emb.filter(col("vec_id") < NUM_QUERIES)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TOP_K)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  val q30Sql: String =
    s"""WITH q AS (
      |  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
      |  WHERE vec_id < $NUM_QUERIES),
      |scored AS (
      |  SELECT q.query_id, e.vec_id,
      |    list_sum(list_transform(generate_series(1, len(e.embedding)),
      |      i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(q.q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      |  FROM embeddings e, q WHERE e.vec_id != q.query_id),
      |ranked AS (
      |  SELECT query_id, vec_id,
      |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
      |  FROM scored)
      |SELECT query_id, rank, vec_id AS neighbor_id
      |FROM ranked WHERE rank <= $TOP_K
      |ORDER BY query_id, rank""".stripMargin

  /** Embedding dimensionality of the corpus (driver test tables). */
  val EMB_DIM = 64

  /** Deterministic pseudo-random hyperplane for (table, plane):
    * md5-derived weights in [-1, 1), materialized ONCE on the driver
    * and embedded as a literal array — constant-folded by Catalyst, so
    * the per-row work is a single zip_with dot product, not EMB_DIM
    * md5 calls. No RNG state: every executor (and every rerun) gets
    * identical planes with zero coordination.
    */
  private def planeWeights(table: Int, plane: Int): Seq[Double] = {
    def w(d: Int): Double = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t${table}p$plane:$d".getBytes("UTF-8"))
      val v = ((dig(0) & 0xffL) << 16) | ((dig(1) & 0xffL) << 8) | (dig(2) & 0xffL)
      ((v % 2000) - 1000).toDouble / 1000.0
    }
    (0 until EMB_DIM).map(w)
  }

  /** All table buckets in one fused native pass (tables x planes
    * separate HOF folds are interpreted per element; the weight matrix
    * is driver-materialized and shipped once with the expression).
    */
  private def allBuckets(emb: Column): Column = {
    val weights = Array.tabulate(NUM_TABLES * NUM_PLANES) { i =>
      planeWeights(i / NUM_PLANES, i % NUM_PLANES).toArray
    }
    graft.plans.HyperplaneBuckets(emb, weights, NUM_TABLES, NUM_PLANES)
  }

  /** q31: multi-table random-hyperplane LSH ANN — NUM_TABLES
    * independent bucket ids per vector (array -> posexplode), queries
    * join candidates per (table, bucket), the candidate union is scored
    * once, top-k per query. On near-uniform vectors one table has poor
    * recall; the table union trades candidate-set size for recall
    * (~0.8 recall scanning ~40% here; tighter on clustered real data).
    * Scale: the (table, bucket) key is the shuffle key — uniform by
    * construction; candidate dedup keys on (query, vec), never O(N^2).
    * Oracle: q31Sql replicates the deterministic hyperplanes as SQL
    * literals (full hash gate); the spec additionally pins recall
    * against exact q30.
    */
  def q31LshAnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
      .withColumn("buckets", allBuckets(col("embedding")))
    val banded = emb.select(col("vec_id"), col("embedding"),
      posexplode(col("buckets")).as(Seq("table_id", "bucket")))
    val queries = banded.filter(col("vec_id") < NUM_QUERIES)
      .select(col("vec_id").as("query_id"), col("table_id").as("q_table"),
        col("bucket").as("q_bucket"))
    val cand = banded.join(broadcast(queries),
        col("table_id") === col("q_table") && col("bucket") === col("q_bucket") &&
        col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id", "embedding")
      .dropDuplicates("query_id", "vec_id")
    val qEmb = Tables(spark, dir).embeddings
      .filter(col("vec_id") < NUM_QUERIES)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = cand.join(broadcast(qEmb), "query_id")
      .withColumn("sim", cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TOP_K)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** q31 DuckDB oracle: the hyperplanes are deterministic md5-derived
    * LITERALS (planeWeights), so the whole LSH pipeline is
    * SQL-expressible — embed the 32x64 weight matrix as a VALUES table,
    * recompute each vector's per-table sign bits, bucket-join, and
    * exact-score the candidate union. The bucket id formula need not
    * match the native bit packing — only the PARTITION matters (two
    * vectors collide iff all plane signs match), and `sum(bit <<
    * plane)` induces the same partition as the native `|= 1L << p`.
    * Sign parity holds because both engines fold the dot product
    * left-to-right in double (same reason q30's cosine matches).
    */
  val q31Sql: String = {
    val planeRows = (for {
      t <- 0 until NUM_TABLES
      p <- 0 until NUM_PLANES
    } yield {
      val wts = planeWeights(t, p).map(_.toString).mkString("[", ", ", "]")
      s"($t, $p, $wts)"
    }).mkString(",\n|    ")
    s"""WITH planes(table_id, plane, wts) AS (
      |  VALUES $planeRows),
      |bits AS (
      |  SELECT e.vec_id, p.table_id, p.plane,
      |    CASE WHEN list_sum(list_transform(generate_series(1, len(e.embedding)),
      |      i -> CAST(e.embedding[i] AS DOUBLE) * p.wts[i])) >= 0
      |    THEN 1 ELSE 0 END AS bit
      |  FROM embeddings e CROSS JOIN planes p),
      |buckets AS (
      |  SELECT vec_id, table_id, sum(bit << plane) AS bucket
      |  FROM bits GROUP BY vec_id, table_id),
      |cand AS (
      |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id
      |  FROM buckets q
      |  JOIN buckets c ON q.table_id = c.table_id AND q.bucket = c.bucket
      |                AND c.vec_id != q.vec_id
      |  WHERE q.vec_id < $NUM_QUERIES),
      |scored AS (
      |  SELECT cand.query_id, cand.vec_id,
      |    list_sum(list_transform(generate_series(1, len(ce.embedding)),
      |      i -> CAST(qe.embedding[i] AS DOUBLE) * CAST(ce.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(qe.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(ce.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      |  FROM cand
      |  JOIN embeddings qe ON qe.vec_id = cand.query_id
      |  JOIN embeddings ce ON ce.vec_id = cand.vec_id),
      |ranked AS (
      |  SELECT query_id, vec_id,
      |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
      |  FROM scored)
      |SELECT query_id, rank, vec_id AS neighbor_id
      |FROM ranked WHERE rank <= $TOP_K
      |ORDER BY query_id, rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_embedding_topk" -> (q30EmbeddingTopk _),
    "q31_lsh_ann" -> (q31LshAnn _))

  val oracles: Map[String, String] = Map(
    "q30_embedding_topk" -> q30Sql,
    "q31_lsh_ann" -> q31Sql)
}
