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

  /** M2b — the OLS math of m2, ORACLE-GATED: label ~ n_orders +
    * c_acctbal solved by the 3×3 normal equations in closed form.
    *
    * Why this is hash-gateable when m2's full spark.ml fit is not:
    * two different solvers (spark.ml's LAPACK path, any SQL replay)
    * accumulate floats in different orders, and a ULP near the 1e−6
    * floor boundary breaks a hash. Here every MOMENT is an EXACT
    * decimal sum (o_totalprice/c_acctbal are cents-exact — the
    * Det.d2 pattern; counts are integers), so both engines hold
    * bit-identical moments; the Cramer solve is then the IDENTICAL
    * double expression tree on both sides — deterministic end to
    * end. MlSpec pins that spark.ml's normal-equation fit on the
    * same design reproduces these coefficients, which transitively
    * value-gates m2's machinery (the remaining m2 surface — one-hot
    * design, se/t/p — stays rows-only + spec-pinned). */
  def m2bLinregNormal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // per-customer exact design: n (count), bal (cents-exact),
    // y = exact decimal spend
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n"),
        sum(Det.d2(col("o_totalprice"))).cast(
          org.apache.spark.sql.types.DecimalType(12, 2)).as("y"))
    val dm = Tables.customer(s, dir)
      .select(col("c_custkey").as("custkey"),
        Det.d2(col("c_acctbal")).as("bal"))
      .join(perCust, Seq("custkey"), "inner")
      .select(col("n").cast(org.apache.spark.sql.types.DecimalType(10, 0))
        .as("x1"), col("bal").as("x2"), col("y"))
    // exact decimal moments — order-independent, cross-engine exact
    val m = dm.agg(
      count(lit(1)).cast("double").as("s1"),
      sum(col("x1")).cast("double").as("sx1"),
      sum(col("x2")).cast("double").as("sx2"),
      sum(col("x1") * col("x1")).cast("double").as("sx11"),
      sum(col("x1") * col("x2")).cast("double").as("sx12"),
      sum(col("x2") * col("x2")).cast("double").as("sx22"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("x1") * col("y")).cast("double").as("sx1y"),
      sum(col("x2") * col("y")).cast("double").as("sx2y"),
      sum(col("y") * col("y")).cast("double").as("syy"))
    // Cramer's rule on [s1 sx1 sx2; sx1 sx11 sx12; sx2 sx12 sx22]
    // β = [sy sx1y sx2y] — formula text mirrored in the oracle
    val det = col("s1") * (col("sx11") * col("sx22")
      - col("sx12") * col("sx12")) -
      col("sx1") * (col("sx1") * col("sx22")
        - col("sx12") * col("sx2")) +
      col("sx2") * (col("sx1") * col("sx12")
        - col("sx11") * col("sx2"))
    val b0 = (col("sy") * (col("sx11") * col("sx22")
      - col("sx12") * col("sx12")) -
      col("sx1") * (col("sx1y") * col("sx22")
        - col("sx12") * col("sx2y")) +
      col("sx2") * (col("sx1y") * col("sx12")
        - col("sx11") * col("sx2y"))) / det
    val b1 = (col("s1") * (col("sx1y") * col("sx22")
      - col("sx12") * col("sx2y")) -
      col("sy") * (col("sx1") * col("sx22")
        - col("sx12") * col("sx2")) +
      col("sx2") * (col("sx1") * col("sx2y")
        - col("sx1y") * col("sx2"))) / det
    val b2 = (col("s1") * (col("sx11") * col("sx2y")
      - col("sx1y") * col("sx12")) -
      col("sx1") * (col("sx1") * col("sx2y")
        - col("sx1y") * col("sx2")) +
      col("sy") * (col("sx1") * col("sx12")
        - col("sx11") * col("sx2"))) / det
    // R² from the same moments: SSE = syy − b0·sy − b1·sx1y − b2·sx2y,
    // SST = syy − sy²/n
    val sse = col("syy") - b0 * col("sy") - b1 * col("sx1y") -
      b2 * col("sx2y")
    val sst = col("syy") - col("sy") * col("sy") / col("s1")
    m.select(explode(array(
      struct(lit("intercept").as("metric"), Det.r6(b0).as("value")),
      struct(lit("coef_n_orders").as("metric"), Det.r6(b1).as("value")),
      struct(lit("coef_acctbal").as("metric"), Det.r6(b2).as("value")),
      struct(lit("r2").as("metric"),
        Det.r6(lit(1.0) - sse / sst).as("value")))).as("kv"))
      .select(col("kv.metric").as("metric"), col("kv.value").as("value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_pca" -> m1Pca,
    "m2_linreg" -> m2Linreg,
    "m2b_linreg_normal" -> m2bLinregNormal,
    "m4_lasso_cv" -> m4LassoCv,
    "m10_repeated_cv" -> m10RepeatedCv,
    "m5_random_forest" -> m5RandomForest,
    "m6_stepwise_aic" -> m6StepwiseAic)

  /** m2b replays exactly in SQL (exact-decimal moments + the same
    * closed-form solve); the remaining fits are spark.ml surface —
    * rows-only checked by the driver, semantics pinned in MlSpec. */
  val oracle: Map[String, String] = Map(
    "m2b_linreg_normal" -> {
      val det = """(s1 * (sx11 * sx22 - sx12 * sx12) -
        sx1 * (sx1 * sx22 - sx12 * sx2) +
        sx2 * (sx1 * sx12 - sx11 * sx2))"""
      val b0 = s"""((sy * (sx11 * sx22 - sx12 * sx12) -
        sx1 * (sx1y * sx22 - sx12 * sx2y) +
        sx2 * (sx1y * sx12 - sx11 * sx2y)) / $det)"""
      val b1 = s"""((s1 * (sx1y * sx22 - sx12 * sx2y) -
        sy * (sx1 * sx22 - sx12 * sx2) +
        sx2 * (sx1 * sx2y - sx1y * sx2)) / $det)"""
      val b2 = s"""((s1 * (sx11 * sx2y - sx1y * sx12) -
        sx1 * (sx1 * sx2y - sx1y * sx2) +
        sy * (sx1 * sx12 - sx11 * sx2)) / $det)"""
      val sse = s"(syy - $b0 * sy - $b1 * sx1y - $b2 * sx2y)"
      val sst = "(syy - sy * sy / s1)"
      s"""WITH percust AS (
           SELECT o_custkey AS custkey,
             cast(count(*) AS decimal(10,0)) AS x1,
             cast(sum(cast(o_totalprice AS decimal(12,2)))
               AS decimal(12,2)) AS y
           FROM orders GROUP BY 1),
         dm AS (
           SELECT x1, cast(c_acctbal AS decimal(12,2)) AS x2, y
           FROM customer JOIN percust ON c_custkey = custkey),
         m AS (
           SELECT cast(count(*) AS double) AS s1,
             cast(sum(x1) AS double) AS sx1,
             cast(sum(x2) AS double) AS sx2,
             cast(sum(x1 * x1) AS double) AS sx11,
             cast(sum(x1 * x2) AS double) AS sx12,
             cast(sum(x2 * x2) AS double) AS sx22,
             cast(sum(y) AS double) AS sy,
             cast(sum(x1 * y) AS double) AS sx1y,
             cast(sum(x2 * y) AS double) AS sx2y,
             cast(sum(y * y) AS double) AS syy
           FROM dm)
         SELECT metric, value FROM (
           SELECT 'intercept' AS metric,
             ${Det.sql(b0, 6)} AS value FROM m
           UNION ALL
           SELECT 'coef_n_orders', ${Det.sql(b1, 6)} FROM m
           UNION ALL
           SELECT 'coef_acctbal', ${Det.sql(b2, 6)} FROM m
           UNION ALL
           SELECT 'r2', ${Det.sql(s"1.0 - $sse / $sst", 6)} FROM m)"""
    })
}
