package graft.text

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Trained document-quality classification — the GPT-3 §2.2 /
  * CCNet-style data-selection gate: a cheap linear classifier
  * separates a curated reference slice from the raw crawl and every
  * document gets a quality score, the filter that runs BEFORE any
  * expensive LM scoring. The heuristic tier (x2 quality signals, x12
  * unigram NLL) ships beside it; this is the learned tier.
  *
  * Spark shape, built for 100 TB:
  *  - features are [[HashingTF]] over whitespace tokens — hashing has
  *    NO vocabulary state (nothing to fit, broadcast, or keep
  *    consistent across a cluster), so feature extraction is a pure
  *    scan: each task hashes its own partition's tokens into the
  *    fixed 4096-dim space.
  *  - the model is one [[LogisticRegression]] fit (seeded; L2) — the
  *    iterative driver–executor loop ML always costs — and scoring
  *    is `model.transform`: the 4096-dim coefficient vector
  *    broadcasts once and scoring is again scan-level.
  *  - train/score separation is key-derived (doc_id parity), so the
  *    held-out half is reproducible without RNG state.
  *
  * The synthetic corpus has no real curated slice, so the reference
  * signal is PLANTED, the d7/n7/x16 pattern: docs with
  * `doc_id % 5 == 0` get two marker tokens appended — a stand-in for
  * the stylistic signature the real reference corpus carries. That
  * makes the gate closed-form-checkable: QualityClassifierSpec pins
  * held-out separation (planted docs score above every unplanted
  * doc: AUC = 1 on the marker subspace) while the query stays
  * rows-only for the driver (LBFGS probabilities are not
  * SQL-expressible). */
object QualityClassifier {

  private val markers = " qualmark0 qualmark1"

  /** The planted corpus: curated label + marker tokens on the
    * positive slice, whitespace-tokenized. */
  private[text] def planted(docs: DataFrame): DataFrame =
    docs
      .withColumn("label",
        when(col("doc_id") % 5 === 0, 1.0).otherwise(0.0))
      .withColumn("tokens",
        split(concat(col("text"),
          when(col("label") === 1.0, lit(markers)).otherwise(lit(""))),
          " "))

  /** Fit on the even-doc_id half, score EVERY doc. Returns
    * (doc_id, label, is_train, p_quality). */
  def scoreAll(docs: DataFrame): DataFrame = {
    val base = planted(docs)
    val tf = new HashingTF()
      .setInputCol("tokens").setOutputCol("features")
      .setNumFeatures(4096)
    val feat = tf.transform(base)
    val lr = new LogisticRegression()
      .setMaxIter(30).setRegParam(0.01).setStandardization(false)
    val model = lr.fit(feat.filter(col("doc_id") % 2 === 0))
    model.transform(feat)
      .select(col("doc_id"), col("label"),
        (col("doc_id") % 2 === 0).as("is_train"),
        element_at(vector_to_array(col("probability")), 2)
          .as("p_quality"))
  }

  /** X32 — quality scores for the corpus; rows-only (one row per
    * doc), separation gated in QualityClassifierSpec. */
  def x32QualityClassifier(s: SparkSession, dir: String): DataFrame =
    scoreAll(Tables.documents(s, dir))

  /** X32B — the learned-classifier ORACLE GATE (the planted-recovery
    * closed form, extending the d7/n7 pattern to a TRAINED model):
    * the top-k documents by trained quality score, k = the planted
    * curated-slice size, must be EXACTLY the planted set — the
    * marker tokens are a perfect signal, so any fit that deserves
    * the name ranks every curated doc above every raw doc
    * (QualityClassifierSpec pins this separation on the held-out
    * half; the fit is seeded LBFGS over deterministic features, so
    * the ranking is reproducible). Set membership — not the
    * probability values, which stay rows-only in x32 — is what the
    * DuckDB oracle can state: SELECT the planted ids. This
    * value-gates the whole learned tier end to end: whitespace
    * tokenize → stateless HashingTF → LR fit on the key-derived
    * train half → broadcast scoring — a wrong hash bucket, a
    * mis-joined label, or a diverged fit all break set equality. */
  def x32bClassifierGate(s: SparkSession, dir: String): DataFrame = {
    val scored = scoreAll(Tables.documents(s, dir))
    val k = scored.filter(col("label") === 1.0).count()
    scored.orderBy(col("p_quality").desc, col("doc_id"))
      .limit(k.toInt)
      .select(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x32_quality_classifier" -> x32QualityClassifier,
    "x32b_classifier_gate" -> x32bClassifierGate)

  val oracle: Map[String, String] = Map(
    "x32b_classifier_gate" ->
      "SELECT doc_id FROM documents WHERE doc_id % 5 = 0")
}
