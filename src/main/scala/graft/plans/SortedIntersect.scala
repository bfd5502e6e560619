package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Thresholded sorted-set intersection size — the PPJoin verify step as
  * ONE whole-stage-codegen expression.
  *
  * `sorted_intersect_ge(a, b, t)` over two ASCENDING-sorted distinct
  * long arrays returns |a ∩ b| when that count is ≥ t, and −1 as the
  * "failed verification" sentinel otherwise. The generated Java is a
  * two-pointer merge with the classic early abort: the moment
  * `count_so_far + min(remaining_a, remaining_b) < t` the pair can no
  * longer reach the threshold and the loop exits — on a junk candidate
  * the scan stops about as soon as the overlap deficit shows, instead
  * of paying the full merge.
  *
  * Why it exists (round-7 sf1 scaling): q168's verify previously
  * intersected per-doc sparse bitmap MAPS via map_zip_with + aggregate
  * — interpreted higher-order functions that allocate per pair and
  * measured ~90 µs core-time per candidate, 94% of q168's wall time at
  * sf1 (6.3M candidates/copy × 10 copies). This expression verifies the
  * same candidates from the already-sorted id lists with no allocation
  * and codegen dispatch, and the abort bound makes junk candidates
  * (the overwhelming majority — 6.27M candidates yield 256 true pairs
  * at sf0.1) cheaper still.
  */
case class SortedIntersectGe(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(LongType), ArrayType(LongType), LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_ge"

  override def nullSafeEval(a: Any, b: Any, t: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val thr = t.asInstanceOf[Long]
    val na = x.numElements(); val nb = y.numElements()
    var i = 0; var j = 0; var cnt = 0L
    var aborted = false
    while (!aborted && i < na && j < nb) {
      if (cnt + math.min(na - i, nb - j) < thr) aborted = true
      else {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { cnt += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    }
    if (!aborted && cnt >= thr) cnt else -1L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, t) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val cnt = ctx.freshName("cnt")
      val ab = ctx.freshName("aborted")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $na = $a.numElements(), $nb = $b.numElements();
         |int $i = 0, $j = 0;
         |long $cnt = 0L;
         |boolean $ab = false;
         |while (!$ab && $i < $na && $j < $nb) {
         |  if ($cnt + java.lang.Math.min($na - $i, $nb - $j) < $t) {
         |    $ab = true;
         |  } else {
         |    long $xv = $a.getLong($i);
         |    long $yv = $b.getLong($j);
         |    if ($xv == $yv) { $cnt++; $i++; $j++; }
         |    else if ($xv < $yv) { $i++; }
         |    else { $j++; }
         |  }
         |}
         |${ev.value} = (!$ab && $cnt >= $t) ? $cnt : -1L;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SortedIntersectGe =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SortedIntersectGe {
  /** Column-API entry point for library users. */
  def apply(a: Column, b: Column, t: Column): Column =
    GraftBridge.column(SortedIntersectGe(GraftBridge.expression(a),
      GraftBridge.expression(b), GraftBridge.expression(t)))
}
