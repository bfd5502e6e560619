package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the
  * first pass of any text-cleaning pipeline (canonically composes
  * e + U+0301 into é etc. so that downstream hashing/dedup/tokenizing
  * sees one byte sequence per canonical string). Spark has no built-in
  * for this; a Scala UDF would box every row and block codegen, while
  * this participates in whole-stage codegen like the other graft
  * expressions. Oracle-parity: DuckDB's `nfc_normalize` implements the
  * same Unicode normalization form, so results are byte-identical.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for virtually all real text (ASCII in particular), so the
  * common case never materializes a new string.
  */
case class NormalizeNfc(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_nfc"

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcExpr", this, classOf[NormalizeNfc].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

object NormalizeNfc {
  def apply(text: Column): Column =
    GraftBridge.column(NormalizeNfc(GraftBridge.expression(text)))
}
