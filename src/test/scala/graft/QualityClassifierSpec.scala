package graft

import org.apache.spark.sql.functions._
import graft.text.QualityClassifier

/** The learned quality gate's separation contract: the planted
  * curated slice must score above every unplanted doc on the
  * HELD-OUT half (doc_id odd — never seen by the fit), i.e. AUC = 1
  * on the marker subspace. The threshold-free min/max form keeps the
  * pin exact without depending on LBFGS iteration details. */
class QualityClassifierSpec extends SparkTestBase {

  test("held-out planted docs separate cleanly; one score per doc") {
    val docs = Tables.documents(spark, sfTest)
    val scored = QualityClassifier.scoreAll(docs).cache()
    try {
      assert(scored.count() == docs.count())

      val heldOut = scored.filter(!col("is_train"))
      assert(heldOut.filter(col("label") === 1.0).count() > 10)
      val minPos = heldOut.filter(col("label") === 1.0)
        .agg(min("p_quality")).head.getDouble(0)
      val maxNeg = heldOut.filter(col("label") === 0.0)
        .agg(max("p_quality")).head.getDouble(0)
      assert(minPos > maxNeg,
        s"held-out separation failed: min planted $minPos <= " +
          s"max unplanted $maxNeg")
    } finally scored.unpersist()
  }
}
