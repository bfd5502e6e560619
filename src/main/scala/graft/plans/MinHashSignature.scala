package graft.plans

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused MinHash signature: text -> array<long> of `numHashes` minima
  * in ONE pass — shingling, rolling hash, and the affine hash family
  * with no intermediate arrays (SURVEY §4: the hash pass is the map-
  * side cost at 100 TB; this is the codegen-path replacement for
  * shingles -> md5 -> k transforms).
  *
  * Shingle hash = fold(codepoints, acc*31 + cp) mod p over `shingleN`
  * characters; sig_k = min over shingles of (a_k*h + b_k) mod p with
  * the TextFunctions.minhashCoeff family. Oracle-reproducible in
  * DuckDB with list_transform/list_reduce arithmetic (no md5 needed).
  * Texts shorter than one shingle yield the sentinel p in every slot.
  */
case class MinHashSignature(child: Expression, shingleN: Int, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private val P = TextFunctions.MINHASH_P
  @transient private lazy val coeffA: Array[Long] =
    (0 until numHashes).map(TextFunctions.minhashCoeff(_)._1).toArray
  @transient private lazy val coeffB: Array[Long] =
    (0 until numHashes).map(TextFunctions.minhashCoeff(_)._2).toArray

  /** Single fused loop; called from both eval and generated code. */
  def computeSig(s: UTF8String): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val m = cps.length - shingleN + 1
    val mins = Array.fill(numHashes)(P)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < shingleN) { h = h * 31L + cps(i + j); j += 1 }
      h %= P
      var k = 0
      while (k < numHashes) {
        val v = (h * coeffA(k) + coeffB(k)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override def nullSafeEval(input: Any): Any =
    computeSig(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashExpr", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeSig($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  def apply(text: Column, shingleN: Int, numHashes: Int): Column =
    GraftBridge.column(
      MinHashSignature(GraftBridge.expression(text), shingleN, numHashes))
}
