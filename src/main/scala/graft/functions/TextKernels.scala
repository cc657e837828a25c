package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd kernels for the text-analysis hot path.
  *
  * Why Expressions and not `size(split(...))` / `size(filter(...))`:
  * Catalyst higher-order functions (ArrayFilter & friends) are
  * CodegenFallback — any projection containing one drops out of
  * WholeStageCodegen and evaluates the lambda per token per row, and
  * `split` additionally materializes a per-row token ARRAY only to
  * count it. These kernels scan the UTF8 bytes once, allocation-free,
  * inside WholeStageCodegen — the difference between scan-speed and
  * lambda-dispatch speed over 100 TB of documents.
  *
  * Semantics contract (oracle bit-parity): both kernels reproduce the
  * single-space regex-split with limit -1 EXACTLY:
  * `token_count` = (number of 0x20 bytes) + 1 — split on a
  * single-char pattern keeps empty tokens, so fields = separators + 1
  * (including leading/trailing/adjacent-space empties);
  * `stopword_count` counts delimiter-bounded segments byte-equal to a
  * word in the fixed list (an empty segment never matches — the lists
  * hold non-empty words). 0x20 never occurs inside a UTF-8 multibyte
  * sequence, so byte scanning is unicode-safe. Counts are exact
  * integers — no floating-point parity concerns; the DuckDB oracle
  * keeps the equivalent `len(string_split(...))` formulations.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | NullType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.simpleString}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    var cnt = 1
    var i = 0
    val n = s.numBytes()
    while (i < n) {
      if (s.getByte(i) == 0x20.toByte) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    if (child.dataType == NullType) {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      return ev.copy(code =
        code"""
           |boolean ${ev.isNull} = true;
           |int ${ev.value} = 0;
         """.stripMargin)
    }
    nullSafeCodeGen(ctx, ev, s => {
      val i = ctx.freshName("i")
      val nb = ctx.freshName("nb")
      s"""
         |${ev.value} = 1;
         |int $nb = $s.numBytes();
         |for (int $i = 0; $i < $nb; $i++) {
         |  if ($s.getByte($i) == (byte) 0x20) ${ev.value}++;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenCount = copy(child = newChild)
}

/** Static kernel behind [[DistinctNgramCount]] — a plain JVM method
  * so the generated code can call it (the hash set a distinct count
  * needs is not worth inlining into codegen text; the CALL stays
  * inside WholeStageCodegen either way, which is what matters). */
object NgramKernels {
  /** Number of DISTINCT n-token windows of the single-space-split
    * token sequence — byte-exact twin of
    * `size(array_distinct(transform(sequence(1, nTok-n+1),
    *   i -> concat_ws(' ', slice(split(text,' '), i, n)))))`:
    * because the separator is a single space, each window IS the
    * byte slice of the original string from token i's start to token
    * (i+n−1)'s end — empties and multi-space runs reproduce exactly.
    * Windows are zero-copy UTF8String views hashed into one set. */
  def distinctNgramCount(s: UTF8String, n: Int): Int = {
    val nb = s.numBytes()
    var nTok = 1
    var i = 0
    while (i < nb) {
      if (s.getByte(i) == 0x20.toByte) nTok += 1
      i += 1
    }
    if (nTok < n) return 0
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    var st = 0
    i = 0
    while (i <= nb) {
      if (i == nb || s.getByte(i) == 0x20.toByte) {
        starts(t) = st; ends(t) = i; t += 1; st = i + 1
      }
      i += 1
    }
    val bytes = s.getBytes
    val seen = new java.util.HashSet[UTF8String]()
    var w = 0
    while (w + n <= nTok) {
      seen.add(UTF8String.fromBytes(bytes, starts(w),
        ends(w + n - 1) - starts(w)))
      w += 1
    }
    seen.size()
  }
}

/** `distinct_ngram_count(text, n)` — distinct n-token windows as one
  * codegen'd kernel call (n=1 ≡ distinct tokens / type count). The
  * Catalyst formulation (`array_distinct` over a `transform`d
  * `sequence`) materializes the token array AND the window array per
  * row on the interpreted HOF path; this stays inside
  * WholeStageCodegen and allocates only the distinct set. */
case class DistinctNgramCount(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"distinct_ngram_count window must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | NullType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.simpleString}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "distinct_ngram_count"

  override def nullSafeEval(input: Any): Any =
    NgramKernels.distinctNgramCount(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    if (child.dataType == NullType) {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      return ev.copy(code =
        code"""
           |boolean ${ev.isNull} = true;
           |int ${ev.value} = 0;
         """.stripMargin)
    }
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NgramKernels" +
        s".distinctNgramCount($s, $n);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): DistinctNgramCount = copy(child = newChild)
}

/** Count of whitespace tokens belonging to a FIXED word list —
  * `size(filter(split(text, ' '), t -> t IN (...)))` as one
  * codegen'd byte scan (see the file doc for the contract). The word
  * list is a construction-time constant (language stopword profiles),
  * carried as a reference object, compared word-by-word: lists are
  * 6–8 entries, so linear probing beats hash-set allocation. */
case class StopwordCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | NullType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.simpleString}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "stopword_count"

  @transient private lazy val wordBytes: Array[UTF8String] =
    words.map(UTF8String.fromString).toArray

  private def segmentMatches(s: UTF8String, start: Int, len: Int): Boolean = {
    var w = 0
    while (w < wordBytes.length) {
      val wd = wordBytes(w)
      if (wd.numBytes() == len) {
        var k = 0
        var eq = true
        while (eq && k < len) {
          if (s.getByte(start + k) != wd.getByte(k)) eq = false
          k += 1
        }
        if (eq) return true
      }
      w += 1
    }
    false
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var cnt = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.getByte(i) == 0x20.toByte) {
        if (segmentMatches(s, start, i - start)) cnt += 1
        start = i + 1
      }
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    if (child.dataType == NullType) {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      return ev.copy(code =
        code"""
           |boolean ${ev.isNull} = true;
           |int ${ev.value} = 0;
         """.stripMargin)
    }
    val wordsRef = ctx.addReferenceObj("stopWords", wordBytes,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, s => {
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val start = ctx.freshName("start")
      val len = ctx.freshName("len")
      val w = ctx.freshName("w")
      val k = ctx.freshName("k")
      val wd = ctx.freshName("wd")
      val eq = ctx.freshName("eq")
      s"""
         |${ev.value} = 0;
         |int $nb = $s.numBytes();
         |int $start = 0;
         |for (int $i = 0; $i <= $nb; $i++) {
         |  if ($i == $nb || $s.getByte($i) == (byte) 0x20) {
         |    int $len = $i - $start;
         |    for (int $w = 0; $w < $wordsRef.length; $w++) {
         |      org.apache.spark.unsafe.types.UTF8String $wd = $wordsRef[$w];
         |      if ($wd.numBytes() == $len) {
         |        boolean $eq = true;
         |        for (int $k = 0; $eq && $k < $len; $k++) {
         |          if ($s.getByte($start + $k) != $wd.getByte($k)) {
         |            $eq = false;
         |          }
         |        }
         |        if ($eq) { ${ev.value}++; break; }
         |      }
         |    }
         |    $start = $i + 1;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): StopwordCount = copy(child = newChild)
}
