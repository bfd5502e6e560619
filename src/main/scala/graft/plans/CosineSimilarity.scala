package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Native Catalyst cosine similarity over two array<float> columns.
  *
  * The higher-order-function formulation (zip_with + aggregate) is
  * interpreted per element — fine for one pass, hot-loop-slow for ANN
  * candidate scoring. This expression participates in whole-stage
  * codegen: the generated Java is a single fused loop over the two
  * ArrayData buffers, no lambda dispatch, no boxing (SURVEY §7 step 7).
  *
  * Accumulation is double left-to-right, same fold order as the HOF
  * version and DuckDB's list functions — oracle-identical results.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $nx += $x * $x; $ny += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point for library users. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Session extension registering graft's native functions for SQL use:
  * `spark.sql.extensions=graft.plans.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * SQL surface: cosine_similarity(a, b), poly_hash(text),
  * shingle_hash_set(text, n), simhash_fingerprint(text, n, bits),
  * minhash_signature(text, n, k), repetition_stats(text),
  * normalize_nfc(text), winnow_fingerprint(text, k, w),
  * sorted_intersect_ge(a, b, t) — the int parameters must be literals
  * (they size driver-materialized state).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def reg(name: String, clazz: Class[_])(b: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        (children: Seq[Expression]) => b(children)))

    reg("cosine_similarity", classOf[CosineSimilarity]) { c =>
      CosineSimilarity(c(0), c(1))
    }
    reg("poly_hash", classOf[PolyHash])(c => PolyHash(c.head))
    reg("shingle_hash_set", classOf[ShingleHashSet]) { c =>
      ShingleHashSet(c(0), intLit(c(1), "shingle size"))
    }
    reg("simhash_fingerprint", classOf[SimHashFingerprint]) { c =>
      SimHashFingerprint(c(0), intLit(c(1), "shingle size"), intLit(c(2), "bits"))
    }
    reg("minhash_signature", classOf[MinHashSignature]) { c =>
      MinHashSignature(c(0), intLit(c(1), "shingle size"), intLit(c(2), "num hashes"))
    }
    reg("repetition_stats", classOf[RepetitionStats])(c => RepetitionStats(c.head))
    reg("sorted_intersect_ge", classOf[SortedIntersectGe]) { c =>
      SortedIntersectGe(c(0), c(1), c(2))
    }
    reg("normalize_nfc", classOf[NormalizeNfc])(c => NormalizeNfc(c.head))
    reg("winnow_fingerprint", classOf[WinnowFingerprint]) { c =>
      WinnowFingerprint(c(0), intLit(c(1), "k-gram size"), intLit(c(2), "window"))
    }

    // Whole-operator path: planner strategy for graft's custom logical
    // nodes (TopKPerGroup -> TopKPerGroupExec).
    ext.injectPlannerStrategy(_ => GraftStrategies)
    // Optimizer rule: graft-specific expression simplification
    // (NFC normalization is idempotent).
    ext.injectOptimizerRule(_ => SimplifyGraftExpressions)
  }
}
