package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static Jaro–Winkler kernel, shared by the interpreted and codegen
  * paths (the generated code emits one static call per row — the same
  * shape as Spark's built-in `levenshtein`, which calls
  * `UTF8String.levenshteinDistance` from inside WholeStageCodegen; the
  * match/transposition loops are too stateful to inline profitably).
  *
  * Semantics contract (oracle bit-parity with DuckDB
  * `jaro_winkler_similarity`, probed 2026-08-15):
  *  - either side empty → 0.0 (DuckDB returns 0 even for two empty
  *    strings, unlike implementations that define jaro("","") = 1);
  *  - match window = max(|a|,|b|)/2 − 1, floored at 0 (so "ab" vs
  *    "ba" scores 0: window 0 admits no cross matches);
  *  - transpositions = half the matched-position disagreements
  *    (integer halving — the classic two-pass Jaro);
  *  - jaro combined as (m/|a| + m/|b| + (m−t)/m) / 3 in that
  *    left-to-right IEEE order;
  *  - the Winkler prefix boost (ℓ ≤ 4 common chars, p = 0.1) applies
  *    only when jaro > 0.7, as j + ℓ·0.1·(1−j) left-to-right.
  * Probe cases (MARTHA/MARHTA 0.9611…, DIXON/DICKSONX 0.8133…,
  * ab/abzzz… boosted, abqq/abzzz… NOT boosted) reproduce DuckDB's
  * doubles bit-for-bit under this op order; JoinsSpec pins them.
  *
  * Operates on UTF-16 code units (Java chars) — identical to DuckDB's
  * per-character comparison for ASCII and the BMP; astral-plane
  * clusters count as two units (irrelevant for the name-matching
  * domain, documented so nobody "fixes" it into a parity break).
  */
object JaroWinkler {

  /** Jaro–Winkler similarity in [0, 1]. */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val la = s.length
    val lb = t.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && s.charAt(i) == t.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val tHalf = trans / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - tHalf) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && s.charAt(l) == t.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** Native Catalyst expression: `jaro_winkler(a, b)` over two string
  * columns — the scoring kernel for blocked record linkage (j11).
  *
  * Why an Expression and not a UDF: the score runs once per CANDIDATE
  * PAIR, i.e. inside the hot inner loop of a fuzzy join; a Scala UDF
  * would pay serialization + lambda dispatch there and break the
  * surrounding WholeStageCodegen span, while this node stays inside
  * the generated join consumer. Spark itself has `levenshtein` but no
  * Jaro–Winkler — this fills that gap natively.
  *
  * Registered for SQL as `jaro_winkler` via [[GraftFunctions]].
  */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t == StringType || t == NullType
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    if (left.dataType == NullType || right.dataType == NullType) {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      return ev.copy(code =
        code"""
           |boolean ${ev.isNull} = true;
           |double ${ev.value} = 0.0;
         """.stripMargin)
    }
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.similarity($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSimilarity =
    copy(left = newLeft, right = newRight)
}
