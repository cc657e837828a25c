package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField,
  StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `ngrams(text, n)` — a native Catalyst table-generating function
  * (UDTF): one input row fans out to one output row per n-token
  * window, WITHOUT materializing an intermediate array column. The
  * `split → transform(sequence(...)) → explode` composition that d2/d3
  * avoid builds the whole shingle array per row before exploding it
  * (and runs the lambda interpreted); a Generator streams windows
  * straight into `GenerateExec`, which is also where Spark's own
  * explode/posexplode/stack live — this is the missing UDTF leg of the
  * extension trio next to the Aggregators (WeightedMedian,
  * HeavyHitters) and scalar expressions (FloatCosine, TokenCount).
  *
  * Emits (ngram string, pos int), pos 0-based; docs shorter than n
  * tokens emit nothing; NULL text emits nothing. Tokenization is the
  * engine-wide single-space split (SURVEY §2.8). `CodegenFallback` is
  * deliberate: GenerateExec drives generators through `eval` — only
  * the explode family has a fused codegen path, and row expansion
  * never fuses into the parent WSCG stage anyway.
  *
  * `distinct = true` (SQL name `ngrams_distinct`) suppresses repeat
  * windows WITHIN the row, keeping the first occurrence's pos — the
  * row-local dedup that lets per-document set semantics (x13
  * contamination, d2's shingle sets) stream out of the generator
  * instead of paying a corpus-wide `.distinct()` exchange on the
  * exploded pairs. The set lives only for the row's iteration, so
  * memory is bounded by the row's own window count. */
case class NGramGenerator(child: Expression, n: Int,
    distinct: Boolean = false)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, s"ngrams window must be >= 1, got $n")

  // fail at analysis, not with a mid-job ClassCastException in eval
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngrams requires a string input, got ${child.dataType.catalogString}")

  override def elementSchema: StructType = StructType(Seq(
    StructField("ngram", StringType, nullable = false),
    StructField("pos", IntegerType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) Iterator.empty
    else {
      // limit -1: keep trailing empty tokens, matching the engine-wide
      // Catalyst `split(text, ' ')` contract (TextKernels) and the
      // oracle's string_split — Java's default limit 0 drops them
      val tokens = raw.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (tokens.length < n) Iterator.empty
      else {
        val windows = (0 to tokens.length - n).iterator.map { i =>
          val sb = new java.lang.StringBuilder(tokens(i))
          var j = 1
          while (j < n) { sb.append(' ').append(tokens(i + j)); j += 1 }
          (sb.toString, i)
        }
        val kept =
          if (!distinct) windows
          else {
            val seen = new java.util.HashSet[String]()
            windows.filter { case (g, _) => seen.add(g) }
          }
        kept.map { case (g, i) =>
          InternalRow(UTF8String.fromString(g), i)
        }
      }
    }
  }

  override protected def withNewChildInternal(c: Expression)
      : NGramGenerator = copy(child = c)
}
