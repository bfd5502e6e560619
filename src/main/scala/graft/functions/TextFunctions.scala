package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text / dedup column builders for the LLM-data-pipeline operators
  * (SURVEY.md §2 q26–q29, q32–q35).
  *
  * All builders are Catalyst expression trees over higher-order array
  * functions (transform/aggregate/filter) — whole-stage codegen, no
  * UDFs, no shuffle until the caller groups or joins. Hashes are
  * md5-derived so a DuckDB oracle can reproduce them bit-for-bit
  * (engine-native hash() functions differ; md5 is standardized).
  *
  * Scale: per-row cost is O(len * K); at 100 TB these run map-side in
  * the scan stage. The explode for LSH banding happens in the query
  * layer only where a join genuinely needs rows (SURVEY §4).
  */
object TextFunctions {

  /** Distinct character n-gram shingles of a text column (by name).
    * Order of the distinct result is engine-specific, so downstream
    * users must be order-insensitive (min / sum / set ops are).
    */
  def shingles(textCol: String, n: Int): Column =
    array_distinct(expr(
      s"transform(sequence(1, length($textCol) - ${n - 1}), i -> substring($textCol, i, $n))"))

  /** 32-bit integer hash of a string via md5 prefix — reproducible in
    * DuckDB as CAST('0x' || substr(md5(s),1,8) AS BIGINT).
    */
  def md5Hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Mersenne prime modulus for the affine MinHash family. */
  val MINHASH_P = 2147483647L

  /** Deterministic affine-family coefficients (a_k, b_k): md5-derived
    * on the driver, embedded as literals in the plan AND the SQL
    * oracle. Universal-family rehashing means ONE md5 per shingle
    * instead of k — the md5 is the cost at scale, not the affine map.
    */
  def minhashCoeff(k: Int): (Long, Long) = {
    def h(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    (h(s"a:$k") % (MINHASH_P - 1) + 1, h(s"b:$k") % MINHASH_P)
  }

  /** Base shingle hash array: one md5 per shingle, reduced mod p. */
  def shingleHashes(shingleArr: Column): Column =
    transform(shingleArr,
      s => conv(substring(md5(s), 1, 8), 16, 10).cast("long") % MINHASH_P)

  /** Full MinHash signature over the base hash array: sig_k =
    * min over h of (a_k*h + b_k) mod p. a_k < p and h < p keeps
    * a_k*h < 2^62 — no 64-bit overflow in either engine.
    */
  def minhashSignature(hashArr: Column, k: Int): Column =
    array((0 until k).map { i =>
      val (a, b) = minhashCoeff(i)
      array_min(transform(hashArr, h => (h * a + b) % MINHASH_P))
    }: _*)

  /** SimHash fingerprint over the distinct-shingle hash array: for each
    * of `bits` bit positions, majority vote (strictly more ones than
    * half sets the bit). Order-insensitive over the array.
    */
  def simhash(hashArr: Column, bits: Int): Column = {
    val n = size(hashArr)
    (0 until bits).map { j =>
      val ones = aggregate(hashArr, lit(0L),
        (acc, h) => acc + (shiftright(h, j).bitwiseAND(lit(1L))))
      when(ones * 2 > n, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Whitespace token array, empties removed, lower-cased. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Canonical cleaning transform (q54 and the corpus-prep demo):
    * Unicode NFC (native expression), control characters to spaces,
    * whitespace runs collapsed, ends trimmed. Regex patterns stay in
    * the Java/RE2 common subset for oracle parity.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(
      graft.plans.NormalizeNfc(text),
      "[\\x00-\\x1f\\x7f]", " "), "\\s+", " "))

  /** Number of tokens belonging to a stopword list. Counts repeats —
    * frequency matters for language scoring.
    */
  def stopwordHits(tokenArr: Column, stopwords: Seq[String]): Column =
    size(filter(tokenArr, t => t.isin(stopwords.map(lit): _*)))

  /** Polynomial rolling hash of the full text: fold of
    * acc*31 + codepoint(char) mod 1e9+7. Stable across engines
    * (DuckDB: list_reduce with the same fold).
    */
  def rollingHash(textCol: String): Column =
    expr(s"aggregate(sequence(1, length($textCol)), 0L, " +
      s"(acc, i) -> (acc * 31L + ascii(substring($textCol, i, 1))) % 1000000007L)")

  /** Language stopword lists used by q32/q33 (shared with the SQL
    * oracles — keep in sync with LlmText.stopSql).
    */
  val STOP_EN = Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for")
  val STOP_FR = Seq("le", "la", "les", "de", "des", "un", "une", "et", "en", "est")
  val STOP_DE = Seq("der", "die", "das", "und", "ist", "ein", "eine", "mit", "von", "zu")
  val STOP_ES = Seq("el", "los", "las", "de", "un", "una", "y", "es", "en", "que")
}
