package graft.agg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/**
 * `cosine_micro(a, b)` — a native Catalyst expression computing
 * `floor(cosine(a, b) · 10⁶)` as BIGINT in ONE fused pass over the two
 * arrays, with real `doGenCode` (no intermediate `zip_with` array, no
 * per-element lambda plumbing, no norm recomputation as separate
 * aggregate subtrees).
 *
 * Bit-parity contract with the HOF formula the ANN family uses
 * (`aggregate(zip_with(a, b, x·y))` dot, `sqrt(aggregate(transform(a, x²)))`
 * norms, `floor(dot/(na·nb) · 1e6)`): the fused loop performs the SAME
 * IEEE operations in the SAME order — float→double widening per element,
 * left-to-right double accumulation of dot and both squared norms,
 * `dot / (√na · √nb) * 1e6`, `(long) Math.floor` — so swapping it into an
 * oracle-gated query cannot move any value (VectorExprSpec pins bit-parity
 * on adversarial random vectors, plus the null/length edge contract:
 * null array → null, length mismatch → null, null element → null, exactly
 * like the zip_with padding semantics).
 *
 * Element types FLOAT and DOUBLE are both supported (embeddings are
 * float[]; the q72 path widens to double[] first), independently per side.
 */
case class CosineMicro(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_micro"

  // resolved once, not per interpreted row (the element type is fixed at
  // analysis time); transient so a serialized expression re-derives them
  @transient private lazy val leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "cosine_micro expects (ARRAY<FLOAT|DOUBLE>, ARRAY<FLOAT|DOUBLE>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val fa = leftIsFloat; val fb = rightIsFloat
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Math.floor(dot / (java.lang.Math.sqrt(na) *
      java.lang.Math.sqrt(nb)) * 1.0e6).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val getA = if (leftIsFloat) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      val getB = if (rightIsFloat) s"(double) $b.getFloat($i)"
        else s"$b.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = $getA;
         |    final double $y = $getB;
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = (long) Math.floor(
         |      $dot / (Math.sqrt($na) * Math.sqrt($nb)) * 1.0E6);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineMicro =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** The ONE cosine_micro builder — shared by [[register]] and
    * `GraftExtensions.functionDescriptions` so the two registration
    * paths cannot drift. */
  val cosineMicroBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2, "usage: cosine_micro(vec_a, vec_b)")
    CosineMicro(exprs.head, exprs(1))
  }

  /** Idempotent session registration (the NativeCountMinAgg.register
    * pattern) — query builders call this before constructing plans that
    * use `call_function("cosine_micro", ...)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_micro", cosineMicroBuilder, "built-in")
}
