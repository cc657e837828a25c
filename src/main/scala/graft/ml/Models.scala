package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{OneHotEncoder, PCA, StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.regression.{LinearRegression, RandomForestRegressor}
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Det

/** spark.ml re-expression of the reference's statistical layer
  * (SURVEY §2.9: prcomp/lm/glmnet/randomForest/stepAIC/metrics).
  * These are `queries` entries WITHOUT oracle SQL (model fitting is
  * not SQL-expressible) — the driver records a rows-only check and
  * MlSpec pins behavior.
  *
  * Feature table: per-customer aggregates (the testdata analog of the
  * reference's per-complex feature table, R:1035–1082). Deterministic:
  * aggregation + normal-equation solver + seeded RF.
  */
object Models {

  /** Per-customer modeling table: label = total order spend;
    * features = order stats + acctbal + market segment (categorical). */
  private[ml] def featureTable(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).cast("double").as("n_orders"),
        avg("o_totalprice").as("avg_price"),
        max("o_totalprice").as("max_price"),
        min("o_totalprice").as("min_price"),
        sum("o_totalprice").as("label"))
    Tables.customer(s, dir)
      .select(col("c_custkey").as("custkey"), col("c_acctbal"),
        col("c_mktsegment"))
      .join(perCust, Seq("custkey"), "inner")
  }

  private val numFeatures =
    Array("n_orders", "avg_price", "max_price", "min_price", "c_acctbal")

  /** M3 — one-hot encoding drop-last (R:1219–1244 `model.matrix[,−1]`)
    * + assembler, shared by the fitting pipelines. */
  private def encoder(withSegment: Boolean): Array[org.apache.spark.ml.PipelineStage] = {
    if (!withSegment)
      Array(new VectorAssembler().setInputCols(numFeatures)
        .setOutputCol("features"))
    else Array(
      new StringIndexer().setInputCol("c_mktsegment")
        .setOutputCol("seg_idx").setStringOrderType("alphabetAsc"),
      new OneHotEncoder().setInputCol("seg_idx").setOutputCol("seg_oh")
        .setDropLast(true),
      new VectorAssembler().setInputCols(numFeatures :+ "seg_oh")
        .setOutputCol("features"))
  }

  /** M8 — RMSE / R² via RegressionEvaluator; MAPE as an aggregate
    * (MLmetrics::MAPE, R:1291–1315). */
  private def metricsOf(pred: DataFrame): Seq[(String, Double)] = {
    val ev = new RegressionEvaluator().setLabelCol("label")
      .setPredictionCol("prediction")
    val mape = pred.agg(avg(abs((col("label") - col("prediction"))
      / col("label")))).head().getDouble(0)
    Seq("rmse" -> ev.setMetricName("rmse").evaluate(pred),
      "r2" -> ev.setMetricName("r2").evaluate(pred),
      "mape" -> mape)
  }

  private def kv(s: SparkSession, rows: Seq[(String, Double)]): DataFrame = {
    import s.implicits._
    rows.toDF("metric", "value")
      .select(col("metric"), Det.r6(col("value")).as("value"))
  }

  /** M1 — PCA with scaling (R:537–570 `prcomp(scale=TRUE)`): scaled
    * numeric features → 3 PCs; outputs per-component explained
    * variance plus loadings in long form (component, feature, loading
    * magnitude — sign is basis-dependent, so magnitude only).
    * Generic over (table, feature list) so the parking per-complex
    * table reuses it (ParkingPipeline.pcaOnComplex). */
  private[graft] def pcaOf(s: SparkSession, df: DataFrame,
      features: Array[String], k: Int = 3): DataFrame = {
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(features).setOutputCol("raw"),
      new StandardScaler().setInputCol("raw").setOutputCol("scaled")
        .setWithMean(true).setWithStd(true),
      new PCA().setK(k).setInputCol("scaled").setOutputCol("pcs")))
    val model = pipe.fit(df)
    val pca = model.stages(2).asInstanceOf[org.apache.spark.ml.feature.PCAModel]
    val ev = pca.explainedVariance.toArray
    val pc = pca.pc // features × k
    val rows = for {
      c <- 0 until k; f <- features.indices
    } yield (s"pc${c + 1}", features(f),
      math.abs(pc(f, c)), ev(c))
    import s.implicits._
    rows.toDF("component", "feature", "abs_loading", "explained_variance")
      .select(col("component"), col("feature"),
        Det.r6(col("abs_loading")).as("abs_loading"),
        Det.r6(col("explained_variance")).as("explained_variance"))
  }

  def m1Pca(s: SparkSession, dir: String): DataFrame =
    pcaOf(s, featureTable(s, dir), numFeatures)

  /** M2+M3+M7+M8 — OLS linear regression through the one-hot pipeline
    * (R:1093, R:1176–1244), normal-equation solver for determinism;
    * outputs coefficients and fit metrics in long form. */
  def m2Linreg(s: SparkSession, dir: String): DataFrame = {
    val df = featureTable(s, dir)
    val lr = new LinearRegression().setLabelCol("label")
      .setFeaturesCol("features").setSolver("normal")
    val model = new Pipeline().setStages(encoder(withSegment = true) :+ lr)
      .fit(df)
    val lrm = model.stages.last
      .asInstanceOf[org.apache.spark.ml.regression.LinearRegressionModel]
    val pred = model.transform(df)
    val coefRows = lrm.coefficients.toArray.zipWithIndex.map {
      case (c, i) => (s"coef_$i", c)
    }.toSeq :+ ("intercept" -> lrm.intercept)
    // summary(lm)'s inference columns (reference prints them at every
    // model checkpoint, R:593–619): exact std errors / t-values from
    // the normal-equation solver's (X'X)⁻¹ (intercept LAST in
    // spark.ml's convention).
    val ses = lrm.summary.coefficientStandardErrors
    val ts = lrm.summary.tValues
    val seRows = ses.dropRight(1).zipWithIndex.map {
      case (v, i) => (s"se_$i", v)
    }.toSeq :+ ("se_intercept" -> ses.last)
    val tRows = ts.dropRight(1).zipWithIndex.map {
      case (v, i) => (s"t_$i", v)
    }.toSeq :+ ("t_intercept" -> ts.last)
    // summary(lm)'s Pr(>|t|) column — spark.ml derives these from the
    // t distribution internally; StatsSpec independently cross-checks
    // them against graft.ml.Stats' incomplete-beta CDF at the emitted
    // df_residual, so the two implementations gate each other.
    val ps = lrm.summary.pValues
    val pRows = ps.dropRight(1).zipWithIndex.map {
      case (v, i) => (s"p_$i", v)
    }.toSeq :+ ("p_intercept" -> ps.last)
    val dfRow = Seq("df_residual" ->
      lrm.summary.degreesOfFreedom.toDouble)
    kv(s, coefRows ++ seRows ++ tRows ++ pRows ++ dfRow ++ metricsOf(pred))
  }

  /** M4 — LASSO with cross-validated regularization path
    * (R:1247–1254 `cv.glmnet(alpha=1, nfolds=10)`): elasticNet=1.0,
    * 5-fold CV (the reference's trainControl fold count,
    * R:1085–1086) over a small λ grid (CV cost = folds × grid fits).
    * Outputs best λ and CV/fit metrics. The REPEATED form the
    * reference declares is [[m10RepeatedCv]]. */
  def m4LassoCv(s: SparkSession, dir: String): DataFrame =
    lassoCvOf(s, featureTable(s, dir), numFeatures)

  /** Generic LASSO-CV body — shared with the parking per-complex
    * table (ParkingPipeline.lassoCvOnComplex). */
  private[graft] def lassoCvOf(s: SparkSession, df: DataFrame,
      features: Array[String]): DataFrame = {
    val lr = new LinearRegression().setLabelCol("label")
      .setFeaturesCol("features").setElasticNetParam(1.0)
      .setMaxIter(50)
    val pipe = new Pipeline().setStages(Array[org.apache.spark.ml.PipelineStage](
      new VectorAssembler().setInputCols(features).setOutputCol("features"))
      :+ lr)
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.01, 1.0, 100.0)).build()
    val cv = new CrossValidator().setEstimator(pipe)
      .setEvaluator(new RegressionEvaluator().setLabelCol("label")
        .setPredictionCol("prediction").setMetricName("rmse"))
      .setEstimatorParamMaps(grid).setNumFolds(5).setSeed(3)
    val cvModel = cv.fit(df)
    val best = cvModel.bestModel.asInstanceOf[PipelineModel].stages.last
      .asInstanceOf[org.apache.spark.ml.regression.LinearRegressionModel]
    val pred = cvModel.transform(df)
    kv(s, Seq("best_reg_param" -> best.getRegParam,
      "n_nonzero_coefs" ->
        best.coefficients.toArray.count(_ != 0.0).toDouble)
      ++ metricsOf(pred))
  }

  /** M10 — REPEATED k-fold CV (R:1085–1088:
    * `trainControl(method="repeatedcv", number=5)`): the single
    * 5-fold CV of m4 re-run `repeats` times under different seeds
    * (each seed re-randomizes the fold assignment), reporting the
    * per-repeat best λ and CV-RMSE plus their mean and SD — the
    * spread is the point of repeating: one fold split's RMSE is a
    * noisy estimate, the across-repeat SD quantifies that noise.
    * Cost = repeats × folds × grid fits over a CACHED table. */
  def m10RepeatedCv(s: SparkSession, dir: String): DataFrame =
    repeatedCvOf(s, featureTable(s, dir), numFeatures, repeats = 3)

  private[graft] def repeatedCvOf(s: SparkSession, df0: DataFrame,
      features: Array[String], repeats: Int): DataFrame = {
    val df = df0.cache()
    val lr = new LinearRegression().setLabelCol("label")
      .setFeaturesCol("features").setElasticNetParam(1.0)
      .setMaxIter(50)
    val pipe = new Pipeline().setStages(Array[org.apache.spark.ml.PipelineStage](
      new VectorAssembler().setInputCols(features).setOutputCol("features"))
      :+ lr)
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.01, 1.0, 100.0)).build()
    val perRepeat = (1 to repeats).map { r =>
      val cv = new CrossValidator().setEstimator(pipe)
        .setEvaluator(new RegressionEvaluator().setLabelCol("label")
          .setPredictionCol("prediction").setMetricName("rmse"))
        .setEstimatorParamMaps(grid).setNumFolds(5).setSeed(r.toLong)
      val m = cv.fit(df)
      val (bestRmse, bestIdx) = m.avgMetrics.zipWithIndex.minBy(_._1)
      val bestReg = grid(bestIdx)
        .get(lr.regParam).getOrElse(Double.NaN)
      (r, bestReg, bestRmse)
    }
    df.unpersist()
    val rmses = perRepeat.map(_._3)
    val mean = rmses.sum / repeats
    val sd =
      if (repeats < 2) 0.0
      else math.sqrt(rmses.map(x => (x - mean) * (x - mean)).sum
        / (repeats - 1))
    kv(s, perRepeat.flatMap { case (r, reg, rmse) =>
      Seq(s"repeat_${r}_best_reg" -> reg, s"repeat_${r}_cv_rmse" -> rmse)
    } ++ Seq("cv_rmse_mean" -> mean, "cv_rmse_sd" -> sd))
  }

  /** M5 — random-forest regression + variable importance (R:1259–1267;
    * `set.seed(4)` ≡ setSeed(4)). Importance per feature, long form. */
  def m5RandomForest(s: SparkSession, dir: String): DataFrame = {
    val df = featureTable(s, dir)
    val rf = new RandomForestRegressor().setLabelCol("label")
      .setFeaturesCol("features").setNumTrees(10).setSeed(4)
    val model = new Pipeline().setStages(encoder(withSegment = false) :+ rf)
      .fit(df)
    val rfm = model.stages.last
      .asInstanceOf[org.apache.spark.ml.regression.RandomForestRegressionModel]
    val pred = model.transform(df)
    val importances = rfm.featureImportances.toArray.zip(numFeatures)
      .map { case (imp, f) => (s"importance_$f", imp) }.toSeq
    kv(s, importances ++ metricsOf(pred))
  }

  /** M6 — stepwise backward elimination by AIC (R:632–634
    * `MASS::stepAIC`). No spark.ml built-in: a bounded driver-side
    * greedy loop refitting OLS; AIC from the Gaussian log-likelihood,
    * AIC = n·ln(RSS/n) + 2(k+2). Outputs one row per step. */
  def m6StepwiseAic(s: SparkSession, dir: String): DataFrame =
    stepwiseAicOf(s, featureTable(s, dir), numFeatures)

  /** Generic stepwise body — shared with the parking per-complex
    * table (ParkingPipeline.stepAicOnComplex). */
  private[graft] def stepwiseAicOf(s: SparkSession, df0: DataFrame,
      features: Array[String]): DataFrame = {
    val df = df0.cache()
    val n = df.count().toDouble
    def fitAic(feats: Array[String]): Double = {
      val lr = new LinearRegression().setLabelCol("label")
        .setFeaturesCol("features").setSolver("normal")
      val model = new Pipeline().setStages(Array(
        new VectorAssembler().setInputCols(feats).setOutputCol("features"))
        :+ lr).fit(df)
      val pred = model.transform(df)
      val rss = pred.agg(sum(pow(col("label") - col("prediction"), 2)))
        .head().getDouble(0)
      n * math.log(rss / n) + 2.0 * (feats.length + 2)
    }
    var current = features
    var steps = Seq(("start", current.mkString("+"), fitAic(current)))
    var improved = true
    while (improved && current.length > 1) {
      val candidates = current.map(drop =>
        (drop, current.filterNot(_ == drop)))
        .map { case (drop, rest) => (drop, rest, fitAic(rest)) }
      val (bestDrop, bestRest, bestAic) = candidates.minBy(_._3)
      if (bestAic < steps.last._3) {
        current = bestRest
        steps = steps :+ ((s"drop_$bestDrop", bestRest.mkString("+"),
          bestAic))
      } else improved = false
    }
    df.unpersist()
    import s.implicits._
    steps.toDF("step", "features", "aic")
      .select(col("step"), col("features"), Det.r4(col("aic")).as("aic"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_pca" -> m1Pca,
    "m2_linreg" -> m2Linreg,
    "m4_lasso_cv" -> m4LassoCv,
    "m10_repeated_cv" -> m10RepeatedCv,
    "m5_random_forest" -> m5RandomForest,
    "m6_stepwise_aic" -> m6StepwiseAic)

  /** No oracle — spark.ml surface; rows-only checked by the driver,
    * semantics pinned in MlSpec. */
  val oracle: Map[String, String] = Map.empty
}
