package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused Poisson-bootstrap weight vector: key string -> array<long> of
  * `numReps` Poisson(1) draws in ONE pass (q148's hot loop). The
  * composed-expression formulation (md5 -> hex substring -> conv ->
  * threshold CASEs, x32 per row) pays interpreted string parsing per
  * replicate; here each md5 digest's BYTES feed eight 16-bit uniforms
  * directly and the inverse-CDF walk is a short integer loop.
  *
  * Oracle parity: uniform b = big-endian bytes [2(b%8), 2(b%8)+1] of
  * md5("bs{b/8}:" || key) — exactly the integer DuckDB computes as
  * CAST('0x' || substr(md5hex, (b%8)*4+1, 4) AS BIGINT); the weight is
  * the count of CDF thresholds at or below the uniform, identical to
  * the CASE chain over the same literal table.
  */
case class BootstrapWeights(child: Expression, numReps: Int, cdf: Seq[Long])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bootstrap_weights"

  @transient private lazy val thresholds: Array[Long] = cdf.toArray

  /** Single fused loop; called from both eval and generated code. */
  def computeWeights(s: UTF8String): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val key = s.toString
    val out = new Array[Long](numReps)
    var j = 0
    val nDigests = (numReps + 7) / 8
    while (j < nDigests) {
      md.reset()
      val dig = md.digest(s"bs$j:$key".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var slot = 0
      while (slot < 8 && j * 8 + slot < numReps) {
        val u = ((dig(2 * slot) & 0xffL) << 8) | (dig(2 * slot + 1) & 0xffL)
        var w = 0L
        var k = 0
        while (k < thresholds.length && u >= thresholds(k)) { w += 1; k += 1 }
        out(j * 8 + slot) = w
        slot += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(input: Any): Any =
    computeWeights(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bootExpr", this, classOf[BootstrapWeights].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeWeights($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BootstrapWeights =
    copy(child = newChild)
}

object BootstrapWeights {
  def apply(key: Column, numReps: Int, cdf: Seq[Long]): Column =
    GraftBridge.column(
      BootstrapWeights(GraftBridge.expression(key), numReps, cdf))
}
