package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** General-k regression diagnostics (reference R:527–531 `vif`,
  * R:613–614 `bptest`) via auxiliary OLS refits on the spark.ml
  * machinery — the path for arbitrarily many regressors. For the
  * 3-feature oracle surface the closed pairwise-correlation forms in
  * [[graft.ops.Aggregates.m9Vif]] / `m9BreuschPagan` are the
  * single-pass equivalents; MlMultimodalSpec pins that both paths
  * agree on the same data.
  *
  * Each auxiliary fit uses the deterministic normal-equation solver;
  * cost is k small OLS fits over one cached table — at 100 TB the
  * aggregate-side closed forms (or a sampled fit) are the first
  * choice, this is the exact general fallback.
  */
object MlDiagnostics {

  private def olsR2(df: DataFrame, label: String,
      features: Array[String]): Double = {
    val lr = new LinearRegression().setLabelCol(label)
      .setFeaturesCol("features").setSolver("normal")
    val model = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(features).setOutputCol("features"))
      :+ lr).fit(df)
    new RegressionEvaluator().setLabelCol(label)
      .setPredictionCol("prediction").setMetricName("r2")
      .evaluate(model.transform(df))
  }

  /** VIF_j = 1/(1−R²_j) of feature j regressed on the others. */
  def vifOls(df: DataFrame, features: Array[String]): Seq[(String, Double)] =
    features.toSeq.map { f =>
      val r2 = olsR2(df, f, features.filterNot(_ == f))
      (f, 1.0 / (1.0 - r2))
    }

  /** BP = n·R²_aux of squared main-fit residuals regressed on the
    * regressors; under H₀ (homoskedasticity) BP ~ χ²(k). */
  def breuschPaganOls(df: DataFrame, label: String,
      features: Array[String]): Double = {
    val lr = new LinearRegression().setLabelCol(label)
      .setFeaturesCol("features").setSolver("normal")
    val model = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(features).setOutputCol("features"))
      :+ lr).fit(df)
    val withE2 = model.transform(df)
      .withColumn("e2",
        (col(label) - col("prediction")) * (col(label) - col("prediction")))
      .drop("features", "prediction")
    val n = withE2.count().toDouble
    n * olsR2(withE2, "e2", features)
  }
}
