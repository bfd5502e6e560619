package graft.plans

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused SimHash fingerprint: text -> long in one pass (shingle
  * rolling hash + per-bit majority vote). Replaces the HOF pipeline
  * (shingles -> hashes array -> 32 aggregate() folds), which is
  * interpreted per element and rescans the array per bit. Same rolling
  * hash family as MinHashSignature, so the DuckDB oracle shares the
  * `hs` fragment. Votes run over the shingle MULTISET (no distinct):
  * repeated shingles legitimately weigh more.
  */
case class SimHashFingerprint(child: Expression, shingleN: Int, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_fingerprint"

  private val P = TextFunctions.MINHASH_P

  def compute(s: UTF8String): Long = {
    val cps = s.toString.codePoints().toArray
    val m = cps.length - shingleN + 1
    // Texts shorter than one shingle have no votes: return 0 (matches
    // the HOF variant and the DuckDB oracle). Without this guard the
    // vote `2 * ones(j) > m` is vacuously true for negative m and the
    // fingerprint becomes all-ones.
    if (m <= 0) return 0L
    val ones = new Array[Int](bits)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < shingleN) { h = h * 31L + cps(i + j); j += 1 }
      h %= P
      j = 0
      while (j < bits) {
        if (((h >> j) & 1L) == 1L) ones(j) += 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (2 * ones(j) > m) fp |= 1L << j
      j += 1
    }
    fp
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashExpr", this, classOf[SimHashFingerprint].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashFingerprint =
    copy(child = newChild)
}

object SimHashFingerprint {
  def apply(text: Column, shingleN: Int, bits: Int): Column =
    GraftBridge.column(
      SimHashFingerprint(GraftBridge.expression(text), shingleN, bits))
}

/** Fused polynomial rolling hash of the whole text, mod 1e9+7 — the
  * O(n) replacement for the HOF fold, whose substring(text, i, 1)
  * indexing is O(n) per character (O(n^2) per document) on UTF8String.
  */
case class PolyHash(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  def compute(s: UTF8String): Long = {
    val it = s.toString.codePoints().iterator()
    var acc = 0L
    while (it.hasNext) acc = (acc * 31L + it.nextInt()) % 1000000007L
    acc
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("polyHashExpr", this, classOf[PolyHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  def apply(text: Column): Column =
    GraftBridge.column(PolyHash(GraftBridge.expression(text)))
}

/** Distinct shingle rolling-hash set: text -> array<long> (one fused
  * pass + open-address dedup). Long keys shuffle ~6x smaller than the
  * shingle strings they replace in the q29 candidate/intersection
  * joins; distinctness makes explode output the per-doc shingle SET.
  */
case class ShingleHashSet(child: Expression, shingleN: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_set"

  private val P = TextFunctions.MINHASH_P

  def compute(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val cps = s.toString.codePoints().toArray
    val m = cps.length - shingleN + 1
    val seen = new java.util.HashSet[Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](math.max(m, 0))
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      // Mod INSIDE the fold: identical to the end-mod form wherever that
      // form doesn't overflow (mod is a ring homomorphism), and keeps
      // h*31+cp < 2^36 for ANY shingleN — the end-mod form silently
      // wraps Long for shingleN >= 12 and diverges from the SQL oracle
      // (where the same fold raises an int64 overflow error instead).
      while (j < shingleN) { h = (h * 31L + cps(i + j)) % P; j += 1 }
      if (seen.add(h)) out += h
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashExpr", this, classOf[ShingleHashSet].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

object ShingleHashSet {
  def apply(text: Column, shingleN: Int): Column =
    GraftBridge.column(ShingleHashSet(GraftBridge.expression(text), shingleN))
}

/** All multi-table LSH bucket ids of an embedding in ONE fused pass
  * (replaces tables x planes separate zip_with/aggregate folds, which
  * are interpreted per element). The hyperplane weight matrix is
  * materialized once on the driver and shipped with the expression;
  * output is array<long> of length numTables.
  */
case class HyperplaneBuckets(
    child: Expression,
    weights: Array[Array[Double]],   // [tables*planes][dim]
    numTables: Int,
    numPlanes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val buckets = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var p = 0
      while (p < numPlanes) {
        val w = weights(t * numPlanes + p)
        var dot = 0.0
        var i = 0
        val lim = math.min(n, w.length)
        while (i < lim) { dot += arr.getFloat(i) * w(i); i += 1 }
        if (dot >= 0.0) bucket |= 1L << p
        p += 1
      }
      buckets(t) = bucket
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(buckets)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshExpr", this, classOf[HyperplaneBuckets].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)

  // Array fields break case-class equality; compare on config AND a
  // content digest of the weight matrix — nothing enforces that weights
  // are a pure function of (tables, planes), and two instances that
  // compare equal with different planes would let Catalyst's
  // subexpression elimination silently substitute one for the other.
  private lazy val weightsDigest: Int = java.util.Arrays.deepHashCode(
    weights.asInstanceOf[Array[AnyRef]])
  override def equals(o: Any): Boolean = o match {
    case h: HyperplaneBuckets =>
      h.child == child && h.numTables == numTables && h.numPlanes == numPlanes &&
        h.weightsDigest == weightsDigest &&
        java.util.Arrays.deepEquals(
          h.weights.asInstanceOf[Array[AnyRef]], weights.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(numTables),
      Integer.valueOf(numPlanes), Integer.valueOf(weightsDigest))
}

object HyperplaneBuckets {
  def apply(emb: Column, weights: Array[Array[Double]],
            numTables: Int, numPlanes: Int): Column =
    GraftBridge.column(HyperplaneBuckets(
      GraftBridge.expression(emb), weights, numTables, numPlanes))
}

/** Fused robust-winnowing fingerprint: text ->
  * struct(n_grams, n_fp, fp_digest) in ONE document-local pass — the
  * zero-shuffle replacement for the window formulation of q106 (even a
  * single sliding-frame window pass shuffles the ~|corpus|-sized gram
  * table on doc_id; winnowing is document-local, so the scale-right
  * plan never leaves the scan stage).
  *
  * Semantics are identical to the SQL oracle: k-gram hashes are
  * lowercase md5 hex of the UTF-8 bytes of each k-codepoint substring
  * (string compare = lexicographic in both engines); each of the
  * m-w+1 complete windows selects its RIGHTMOST minimal hash (robust
  * winnowing, via a monotonic deque with <=-pops — O(m) total);
  * repeated selections collapse (selected positions are monotone, so
  * a last-position check equals DISTINCT); fp_digest = md5 hex of the
  * "pos:hash" list joined with "," in position order (1-based pos).
  * Texts with fewer than w grams select nothing: n_fp = 0 and
  * fp_digest = md5("") — callers gate on length >= k+w-1 as the SQL
  * formulation did via its starts filter.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_grams", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_fp", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("fp_digest", StringType, nullable = false)))
  override def prettyName: String = "winnow_fingerprint"

  private def hex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      sb.append(Character.forDigit((bytes(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(bytes(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  def compute(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val cps = s.toString.codePoints().toArray
    val m = cps.length - k + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    if (m <= 0) {
      return org.apache.spark.sql.catalyst.InternalRow(0L, 0L,
        UTF8String.fromString(hex(md.digest(Array.emptyByteArray))))
    }
    val hashes = new Array[String](m)
    var i = 0
    while (i < m) {
      md.reset()
      hashes(i) = hex(md.digest(
        new String(cps, i, k).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      i += 1
    }
    val dq = new java.util.ArrayDeque[Integer]()
    val sb = new java.lang.StringBuilder
    var nSel = 0L
    var lastSel = -1
    var j = 0
    while (j < m) {
      // <=-pop keeps the LATEST index among equal minima = rightmost rule
      while (!dq.isEmpty && hashes(j).compareTo(hashes(dq.peekLast)) <= 0)
        dq.pollLast()
      dq.addLast(j)
      val start = j - w + 1
      if (start >= 0) {
        while (dq.peekFirst < start) dq.pollFirst()
        val sel = dq.peekFirst
        if (sel != lastSel) {
          if (lastSel >= 0) sb.append(',')
          sb.append(sel + 1).append(':').append(hashes(sel))
          lastSel = sel
          nSel += 1
        }
      }
      j += 1
    }
    md.reset()
    val dig = hex(md.digest(
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    org.apache.spark.sql.catalyst.InternalRow(m.toLong, nSel,
      UTF8String.fromString(dig))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowExpr", this, classOf[WinnowFingerprint].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object WinnowFingerprint {
  def apply(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(
      WinnowFingerprint(GraftBridge.expression(text), k, w))
}

/** Fused bigram-repetition statistics: text ->
  * struct(n_bigrams: long, max_rep: long) in one tokenize-and-count
  * pass (whitespace tokens, lowercased — same token definition as
  * TextFunctions.tokens). The O(n) native replacement for the
  * sort + equal-run HOF fold, which evaluates interpreted per array
  * element and dominated the q52 scan.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_bigrams", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("max_rep", LongType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  def compute(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = s.toString.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
    val m = toks.length - 1
    if (m <= 0) {
      org.apache.spark.sql.catalyst.InternalRow(0L, 0L)
    } else {
      val counts = new java.util.HashMap[String, Long](m * 2)
      var best = 0L
      var i = 0
      while (i < m) {
        val bg = toks(i) + " " + toks(i + 1)
        val c = counts.merge(bg, 1L, (a, b) => a + b)
        if (c > best) best = c
        i += 1
      }
      org.apache.spark.sql.catalyst.InternalRow(m.toLong, best)
    }
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repStatsExpr", this, classOf[RepetitionStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  def apply(text: Column): Column =
    GraftBridge.column(RepetitionStats(GraftBridge.expression(text)))
}
