package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `t_test_p(t, df)` — two-sided Student-t p-value
  * 2·P(T_{df} > |t|) as a native codegen'd expression.
  *
  * The numeric kernel is `graft.ml.Stats.tTwoSidedP` (regularized
  * incomplete beta via modified-Lentz continued fraction, 1e-12
  * accuracy, pinned by StatsSpec against closed forms); this wrapper
  * gives it the same standing as the text kernels: the call compiles
  * INTO the WholeStageCodegen stage (Scala emits a static forwarder
  * on the `Stats` mirror class, so generated Java calls it like any
  * `Math` method) instead of crossing a scala.Function2 UDF bridge
  * with its per-row boxing and codegen fence. Replaces the last
  * Scala UDF in src/main (the former g10b justification — "no
  * expression composes an incomplete beta" — conflated the FORMULA
  * with the PLUMBING: the formula stays in Stats, only the plumbing
  * needed an Expression).
  *
  * NULL semantics: null in → null out (BinaryExpression default).
  * Domain: df <= 0 is the caller's bug — Stats.tTwoSidedP yields NaN
  * there, mirroring R's cor.test behavior on degenerate n. */
case class TTestPValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (lt, rt) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, double), got " +
          s"(${lt.simpleString}, ${rt.simpleString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "t_test_p"

  override def nullSafeEval(t: Any, df: Any): Any =
    graft.ml.Stats.tTwoSidedP(
      t.asInstanceOf[Double], df.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, df) =>
      s"${ev.value} = graft.ml.Stats.tTwoSidedP($t, $df);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TTestPValue =
    copy(left = newLeft, right = newRight)
}

/** `chi2_p(x2, df)` — upper-tail chi-square p-value P(X² ≥ x2) as a
  * native codegen'd expression, the chi-square analog of `t_test_p`
  * above and the same plumbing: the numeric kernel is
  * `graft.ml.Stats.chiSquareUpperP` (regularized incomplete gamma,
  * series + modified-Lentz continued fraction, pinned by StatsSpec
  * against the integer-df closed forms and erfc), and the generated
  * Java calls the static forwarder inside WholeStageCodegen — no UDF
  * bridge.
  *
  * NULL semantics: null in → null out (BinaryExpression default).
  * Domain: df <= 0 is the caller's bug — Stats throws, mirroring
  * R's chisq.test on a degenerate table. */
case class ChiSquarePValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (lt, rt) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, double), got " +
          s"(${lt.simpleString}, ${rt.simpleString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "chi2_p"

  override def nullSafeEval(x2: Any, df: Any): Any =
    graft.ml.Stats.chiSquareUpperP(
      x2.asInstanceOf[Double], df.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x2, df) =>
      s"${ev.value} = graft.ml.Stats.chiSquareUpperP($x2, $df);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ChiSquarePValue =
    copy(left = newLeft, right = newRight)
}
