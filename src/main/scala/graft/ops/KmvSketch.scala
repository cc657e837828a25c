package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders,
  SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** KMV (k-minimum-values, "bottom-k theta") DISTINCT-SET sketch —
  * the set-OPERATION member of the mergeable-sketch family
  * ([[Sketches]]: HLL answers "how many distinct", CMS "how often",
  * KLL "what quantile"; KMV answers "how many distinct IN COMMON").
  * The canonical pipeline question it serves is AUDIENCE OVERLAP:
  * "how many users both clicked and purchased" across a 100 TB event
  * log without an exact distinct-join (Beyer et al. 2007, "On
  * synopses for distinct-value estimation"; the same bottom-k
  * construction under DataSketches' theta name).
  *
  * The sketch of a set is its k smallest DISTINCT hash values. Why
  * that one summary answers every set-algebra question:
  *  - cardinality: the k-th smallest of D uniform points on [0, U)
  *    sits near k·U/D, so D̂ = (k−1)·U / v_k (unbiased for the
  *    reciprocal); retaining FEWER than k values means the sketch
  *    holds the whole distinct set and the estimate is EXACT — the
  *    property the x52b gate isolates;
  *  - union: the k smallest of S_A ∪ S_B IS the sketch of A ∪ B
  *    (bottom-k of a union = bottom-k of the unioned bottom-k's) —
  *    merge never loses information, same as HLL register-max;
  *  - intersection: within the union's bottom-k — a uniform sample
  *    of A ∪ B — the fraction of values present in BOTH input
  *    sketches estimates the Jaccard similarity, and |A∩B| =
  *    Ĵ · |A∪B| (the standard KMV/theta intersection rule).
  *
  * Scale shape: the aggregation is a typed `Aggregator` with a
  * ≤ k-entry buffer — partition-local bottom-k's, shuffle carries
  * ONE ≤ k-entry array per partition per group, merge keeps the k
  * smallest of the union. No global distinct shuffle ever happens:
  * that is the entire point (exact overlap is `d1`-shaped — right
  * when you need the user lists themselves, wrong when five event
  * types × pairwise overlap would mean ten distinct-joins).
  * Estimates are DETERMINISTIC: the hash is the repo's fixed
  * SQL-replayable Knuth mix, the buffer is a set (order-free), and
  * bottom-k-of-union is order-independent — same corpus, same
  * estimates, always.
  *
  * Gate (the x18b/x27b bounded-domain discipline): x52b runs the
  * IDENTICAL machinery — per-type sketch build, pairwise merge,
  * intersection read-out — over a cohort domain bounded UNDER k
  * (user_id mod [[GateCohorts]] < k), where every sketch retains its
  * full set, every estimate is the exact distinct count, and the
  * oracle is plain COUNT(DISTINCT)+join SQL over the same planted
  * per-type audiences. The open-domain x52 keeps a rows-only
  * contract plus a SketchesSpec relative-error envelope vs exact.
  */
object KmvSketch {

  /** Sketch size: 256 bottom values → ~1/√(k−2) ≈ 6 % relative
    * error on cardinalities, 2 KiB per sketch. */
  private[graft] val K = 256

  /** Hash domain [0, 2³¹). Two hashes, deliberately different:
    *  - the ESTIMATOR (x52) needs avalanche — the k-th-minimum rule
    *    assumes values uniform on the FULL domain, and the repo's
    *    shift-based Knuth mix maps small keys into a tiny prefix
    *    (id·K ≫ 16 never exceeds ~6·10⁷ for id < 1500), which blows
    *    the estimate up by domain/prefix; so x52 hashes with
    *    xxhash64 (rows-only, no SQL replay needed);
    *  - the GATE (x52b) needs SQL REPLAY, not uniformity — under-full
    *    sketches retain every distinct hash whatever its spread — so
    *    it keeps the repo's overflow-masked Knuth mix (x18b guard). */
  private[graft] val HashDomain = 1L << 31

  private[graft] def mixExpr(c: Column): Column =
    shiftright(pmod(c, lit(2147483648L)) * 2654435761L, 16) %
      HashDomain

  private[graft] def avalancheExpr(c: Column): Column =
    pmod(xxhash64(c), lit(HashDomain))

  /** Bottom-k distinct values as a typed Aggregator. Buffer is a
    * HashSet grown to ≤ 2k then TRIMMED back to the k smallest —
    * amortized O(1) per element, and sound because any value a trim
    * evicts exceeds the current k-th smallest and so can never
    * belong to the final bottom-k. (A TreeSet would be the textbook
    * buffer, but Kryo cannot reinstantiate one — no zero-arg
    * Ordering — so the shuffle-codec-safe shape is set + trim.) */
  private[graft] def kmvAgg(k: Int)
      : Aggregator[Long, mutable.HashSet[Long], Seq[Long]] =
    new Aggregator[Long, mutable.HashSet[Long], Seq[Long]] {
      private def trim(b: mutable.HashSet[Long]): mutable.HashSet[Long] =
        if (b.size <= k) b
        else {
          val kept = b.toArray
          java.util.Arrays.sort(kept)
          val out = mutable.HashSet.empty[Long]
          var i = 0
          while (i < k) { out += kept(i); i += 1 }
          out
        }

      override def zero: mutable.HashSet[Long] = mutable.HashSet.empty

      override def reduce(b: mutable.HashSet[Long], h: Long)
          : mutable.HashSet[Long] = {
        // negative = the null sentinel (both hash exprs land in
        // [0, 2³¹), so no real hash is ever skipped): callers that
        // can't pre-filter nulls out of the frame (per-file stats
        // aggs that also count ALL rows) gate them to -1 and the
        // sketch ignores them — NDV stays COUNT(DISTINCT)-semantics
        if (h < 0) return b
        b += h
        if (b.size > 2 * k) trim(b) else b
      }

      override def merge(a: mutable.HashSet[Long],
          b: mutable.HashSet[Long]): mutable.HashSet[Long] = {
        a ++= b
        trim(a)
      }

      override def finish(b: mutable.HashSet[Long]): Seq[Long] = {
        val arr = b.toArray
        java.util.Arrays.sort(arr)
        arr.take(k).toSeq
      }

      override def bufferEncoder: Encoder[mutable.HashSet[Long]] =
        Encoders.kryo[mutable.HashSet[Long]]
      override def outputEncoder: Encoder[Seq[Long]] =
        ExpressionEncoder()
    }

  /** Column form: bottom-[[K]] sketch of a LONG hash column. */
  def kmv(k: Int)(hash: Column): Column =
    udaf(kmvAgg(k), Encoders.scalaLong).apply(hash)

  /** D̂ from one sketch: exact size when under-full (the whole
    * distinct set is retained), else the (k−1)·U/v_k estimator. */
  private[graft] def distinctEst(s: Seq[Long], k: Int): Double =
    if (s.size < k) s.size.toDouble
    else (k - 1).toDouble * HashDomain / s.last

  /** The k smallest of the union — the sketch of A ∪ B. */
  private[graft] def unionSketch(a: Seq[Long], b: Seq[Long], k: Int)
      : Seq[Long] = (a ++ b).distinct.sorted.take(k)

  /** (D̂_union, D̂_intersection) by the theta intersection rule. */
  private[graft] def overlapEst(a: Seq[Long], b: Seq[Long], k: Int)
      : (Double, Double) = {
    val u = unionSketch(a, b, k)
    val (aSet, bSet) = (a.toSet, b.toSet)
    val common = u.count(h => aSet(h) && bSet(h))
    val dU = distinctEst(u, k)
    (dU, dU * common / u.size)
  }

  /** Shared shape of x52/x52b: per-type audience sketches (ONE
    * bounded-buffer aggregation pass over events), then all pairwise
    * overlaps driver-side over the ≤ 5 collected sketches. `audience`
    * maps (user domain column) → hash column; `filt` plants the
    * per-type audience predicate (x52b) or keeps everything (x52). */
  private def overlapTable(s: SparkSession, dir: String,
      domain: Column, filt: Column, exact: Boolean): DataFrame = {
    import s.implicits._
    val hash = if (exact) mixExpr(domain) else avalancheExpr(domain)
    val sketches = Tables.events(s, dir)
      .filter(domain.isNotNull && filt)
      .select(col("event_type"), hash.as("h"))
      .groupBy("event_type")
      .agg(kmv(K)(col("h")).as("sk"))
      .as[(String, Seq[Long])]
      .collect().sortBy(_._1)
    val rows = for {
      i <- sketches.indices
      j <- (i + 1) until sketches.length
    } yield {
      val (ta, sa) = sketches(i)
      val (tb, sb) = sketches(j)
      val (dU, dI) = overlapEst(sa, sb, K)
      (ta, tb, distinctEst(sa, K), distinctEst(sb, K), dU, dI)
    }
    val df = rows.toSeq
      .toDF("type_a", "type_b", "d_a", "d_b", "d_union", "d_intersect")
    if (exact)
      // bounded domain: every estimate is an exact integer count
      df.select(col("type_a"), col("type_b"),
        col("d_a").cast("bigint").as("d_a"),
        col("d_b").cast("bigint").as("d_b"),
        col("d_union").cast("bigint").as("d_union"),
        col("d_intersect").cast("bigint").as("d_intersect"))
    else
      df.select(col("type_a"), col("type_b"),
        Det.r4(col("d_a")).as("d_a"), Det.r4(col("d_b")).as("d_b"),
        Det.r4(col("d_union")).as("d_union"),
        Det.r4(col("d_intersect")).as("d_intersect"))
  }

  /** X52 — pairwise audience-overlap estimates over the REAL user
    * domain (sf0.1: 1500 distinct users ≫ k — the true sketch
    * regime). Rows-only; SketchesSpec pins the error envelope vs
    * exact and determinism. */
  def x52AudienceOverlap(s: SparkSession, dir: String): DataFrame =
    overlapTable(s, dir, col("user_id"), lit(true), exact = false)

  /** Gate-corpus dials: cohort domain [[GateCohorts]] < [[K]] (every
    * sketch under-full at ANY SF ⇒ exact), audiences differentiated
    * by per-type cohort strides so the pairwise intersections are
    * non-trivial proper subsets. */
  private[graft] val GateCohorts = 199L
  private[graft] val GateStride: Map[String, Int] = Map(
    "click" -> 2, "view" -> 3, "purchase" -> 5, "signup" -> 1,
    "error" -> 7)

  private def strideExpr: Column =
    GateStride.foldLeft(lit(1)) { case (acc, (t, p)) =>
      when(col("event_type") === t, lit(p)).otherwise(acc)
    }

  /** X52B — the KMV EXACTNESS ORACLE GATE (completing the sketch
    * quartet x9b/x18b/x19b/x27b): the IDENTICAL build → merge →
    * intersection read-out over per-type audiences on a cohort
    * domain bounded far under k — cohort = user_id mod 199, kept
    * when cohort divides by the type's stride (2/3/5/7/1), so e.g.
    * click∩view is the cohorts ≡ 0 (mod 6) that both types observed.
    * Under-full sketches retain their entire distinct-hash sets, so
    * d_a/d_b/d_union/d_intersect are EXACT distinct-cohort counts —
    * plain COUNT(DISTINCT) + set SQL in the oracle. A build, hash,
    * merge, or intersection-rule bug breaks the hash match. */
  def x52bKmvExactGate(s: SparkSession, dir: String): DataFrame =
    overlapTable(s, dir,
      pmod(col("user_id"), lit(GateCohorts)),
      pmod(pmod(col("user_id"), lit(GateCohorts)),
        strideExpr.cast("long")) === 0L,
      exact = true)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x52_audience_overlap" -> x52AudienceOverlap,
    "x52b_kmv_exact_gate" -> x52bKmvExactGate)

  /** x52 is rows-only (estimates); x52b's bounded domain is exact. */
  val oracle: Map[String, String] = Map(
    "x52b_kmv_exact_gate" -> {
      val strideSql = GateStride.toSeq
        .map { case (t, p) => s"WHEN event_type = '$t' THEN $p" }
        .mkString("CASE ", " ", " ELSE 1 END")
      s"""WITH aud AS (
           SELECT DISTINCT event_type,
             ((user_id % $GateCohorts) * 2654435761 >> 16)
               % $HashDomain AS h
           FROM events
           WHERE user_id IS NOT NULL
             AND (user_id % $GateCohorts) % ($strideSql) = 0),
         types AS (SELECT DISTINCT event_type FROM aud),
         pairs AS (
           SELECT a.event_type AS type_a, b.event_type AS type_b
           FROM types a JOIN types b ON a.event_type < b.event_type)
         SELECT type_a, type_b,
           (SELECT cast(count(*) AS bigint) FROM aud
             WHERE event_type = type_a) AS d_a,
           (SELECT cast(count(*) AS bigint) FROM aud
             WHERE event_type = type_b) AS d_b,
           (SELECT cast(count(DISTINCT h) AS bigint) FROM aud
             WHERE event_type IN (type_a, type_b)) AS d_union,
           (SELECT cast(count(*) AS bigint) FROM
             (SELECT h FROM aud WHERE event_type = type_a
              INTERSECT
              SELECT h FROM aud WHERE event_type = type_b))
             AS d_intersect
         FROM pairs"""
    })
}
