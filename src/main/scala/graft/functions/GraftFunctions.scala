package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.expr

/** Registration for graft's native Catalyst expressions.
  *
  * Two paths:
  *  - library user: `SparkSession.builder.withExtensions(new
  *    GraftExtensions)` registers `float_cosine` permanently;
  *  - ad hoc: `GraftFunctions.register(spark)` installs it into the
  *    session's function registry (idempotent), after which
  *    `expr("float_cosine(a, b)")` / SQL both resolve it.
  */
object GraftFunctions {
  /** `stopword_count`'s word list arrives as a foldable string
    * literal (comma-joined) so the function is SQL-addressable; it is
    * folded into the expression at build time. */
  private def literalWords(e: Expression): Seq[String] =
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String =>
        s.toString.split(",").toSeq
      case other => throw new IllegalArgumentException(
        s"stopword_count expects a foldable string word list, got $other")
    }

  private def literalInt(e: Expression): Int =
    e.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"expected a foldable int literal, got $other")
    }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "float_cosine" -> (exprs => FloatCosine(exprs(0), exprs(1))),
    "token_count" -> (exprs => TokenCount(exprs(0))),
    "stopword_count" ->
      (exprs => StopwordCount(exprs(0), literalWords(exprs(1)))),
    "ngrams" -> (exprs => NGramGenerator(exprs(0), literalInt(exprs(1)))),
    "ngrams_distinct" -> (exprs =>
      NGramGenerator(exprs(0), literalInt(exprs(1)), distinct = true)),
    "distinct_ngram_count" ->
      (exprs => DistinctNgramCount(exprs(0), literalInt(exprs(1)))),
    "t_test_p" -> (exprs => TTestPValue(exprs(0), exprs(1))),
    "chi2_p" -> (exprs => ChiSquarePValue(exprs(0), exprs(1))),
    "jaro_winkler" ->
      (exprs => JaroWinklerSimilarity(exprs(0), exprs(1))))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  /** `float_cosine` as a Column over two column names/paths (requires
    * `register(spark)` or the extensions to have run). */
  def floatCosine(a: String, b: String): Column =
    expr(s"float_cosine($a, $b)")
}

/** SparkSessionExtensions entry point (spark.sql.extensions=
  * graft.functions.GraftExtensions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private val infoClass: Map[String, String] = Map(
    "float_cosine" -> classOf[FloatCosine].getName,
    "token_count" -> classOf[TokenCount].getName,
    "stopword_count" -> classOf[StopwordCount].getName,
    "ngrams" -> classOf[NGramGenerator].getName,
    "ngrams_distinct" -> classOf[NGramGenerator].getName,
    "distinct_ngram_count" -> classOf[DistinctNgramCount].getName,
    "t_test_p" -> classOf[TTestPValue].getName,
    "chi2_p" -> classOf[ChiSquarePValue].getName,
    "jaro_winkler" -> classOf[JaroWinklerSimilarity].getName)

  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(infoClass(name), name), builder))
    }
}
