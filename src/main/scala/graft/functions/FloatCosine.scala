package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, NullType}

/** Native Catalyst expression: cosine similarity between two
  * `array<float>` columns, in one fused pass.
  *
  * Why an Expression and not functions._: the composable form
  * (`aggregate(zip_with(...))`) evaluates on Catalyst's interpreted
  * higher-order-function path — per-pair lambda dispatch dominates any
  * pairwise similarity join. This node generates a tight primitive
  * loop inside WholeStageCodegen (`doGenCode`), with an interpreted
  * `nullSafeEval` twin for completeness.
  *
  * Numeric contract (oracle bit-parity): floats are widened to double
  * (exact), and dot/normA/normB each accumulate in INDEX ORDER — the
  * same IEEE-754 op sequence as DuckDB
  * `list_sum(list_transform(...))`, so
  * `dot/(sqrt(na)*sqrt(nb))` is bit-identical to the SQL oracle's
  * norm-then-divide formulation. Null ARRAY inputs yield NULL
  * (BinaryExpression default); null ELEMENTS are not expected
  * (embeddings are dense) and would read as 0.0.
  *
  * Edge cases yield NULL rather than NaN: a zero-norm (or empty)
  * vector would produce 0/0 = NaN, which Spark sorts ABOVE every
  * double — a garbage vector would falsely rank first in a top-k
  * desc sort — while DuckDB's division returns NULL; NULL on both
  * engines keeps parity and drops the row from >= filters. Mismatched
  * lengths also yield NULL (a truncated dot product is silently wrong
  * data).
  *
  * Registered for SQL as `float_cosine` via [[GraftFunctions]].
  */
case class FloatCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case NullType => true // NULL literal — evaluation null-propagates
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) null else dot / denom
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // A NullType child (literal NULL argument) has no ArrayData value
    // to call numElements() on — emit the constant-null result instead
    // of codegen that fails to compile and forces the interpreted
    // fallback for the whole stage.
    if (left.dataType == NullType || right.dataType == NullType) {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      return ev.copy(code =
        code"""
           |boolean ${ev.isNull} = true;
           |double ${ev.value} = 0.0;
         """.stripMargin)
    }
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $x.getFloat($i);
         |    double $yi = (double) $y.getFloat($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  double $denom =
         |    java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  if ($denom == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / $denom; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatCosine =
    copy(left = newLeft, right = newRight)
}
