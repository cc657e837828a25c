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

  /** M8B — the METRICS ORACLE GATE (VERDICT r9 §4: m2b gates the
    * OLS coefficients but nothing value-gated the RMSE/MAPE/R²
    * arithmetic itself — a MAPE sign/abs slip would have passed):
    * run the IDENTICAL [[metricsOf]] kernel (RegressionEvaluator +
    * the MAPE aggregate, the exact code path every fit query emits
    * through) over a PLANTED prediction frame whose label and
    * prediction are closed-form column arithmetic, so all three
    * metrics replay as plain SQL:
    *   rmse = √(Σ(l−p)²/n)   (RegressionMetrics: /n, not /(n−1))
    *   r²   = 1 − SSerr/SStot, SStot about the label mean
    *   mape = avg(|l−p| / l)  (MLmetrics::MAPE, R:1291–1315).
    * The plant keeps labels strictly positive (MAPE-safe) and the
    * residual driven by o_orderkey % 97 — deterministic, scale-free
    * of the fit machinery being gated. */
  def m8bMetricsClosed(s: SparkSession, dir: String): DataFrame = {
    val pred = Tables.orders(s, dir).select(
      col("o_totalprice").cast("double").as("label"),
      (col("o_totalprice") * 0.9 +
        pmod(col("o_orderkey"), lit(97)).cast("double") * 50.0)
        .as("prediction"))
    kv(s, metricsOf(pred))
  }

  /** M3B — the ONE-HOT LAYOUT ORACLE GATE (VERDICT r9 §4: M3 ran
    * only inside the m2/m4/m5 pipelines, where a wrong category→slot
    * mapping would shuffle coefficients m2b can't attribute): run the
    * IDENTICAL [[encoder]] stage pair (StringIndexer alphabetAsc →
    * OneHotEncoder dropLast, the model.matrix[,−1] layout,
    * R:1219–1244) and emit the layout it actually produced — one row
    * per segment: its index, the encoded width, and the 1-based hot
    * slot (0 = the dropped last category). The oracle states the
    * layout contract in SQL: alphabetical dense-rank indices, width =
    * |categories| − 1, slot = index + 1 except the last. */
  def m3bOnehotGate(s: SparkSession, dir: String): DataFrame = {
    val df = featureTable(s, dir)
    val enc = new Pipeline().setStages(encoder(withSegment = true)).fit(df)
    enc.transform(df)
      .select(col("c_mktsegment").as("segment"),
        col("seg_idx").cast("int").as("seg_idx"),
        org.apache.spark.ml.functions.vector_to_array(col("seg_oh"))
          .as("oh"))
      .select(col("segment"), col("seg_idx"),
        size(col("oh")).as("oh_size"),
        expr("array_position(oh, 1.0D)").cast("int").as("active_slot"))
      .distinct()
  }

  /** M7B — the TRANSFORM ORACLE GATE (completing the M3/M7/M8
    * standalone-gate trio with [[m3bOnehotGate]]/[[m8bMetricsClosed]]):
    * fit the assembler+OLS pipeline on a label that is EXACTLY linear
    * in the feature (y = 2.5·x + 1000, zero residual), then score a
    * deterministic order subset with `model.transform` — the same
    * Pipeline/PipelineModel scoring path every fit query uses (M7,
    * R:589/R:638/R:1272–1280 `predict`). With an exact-fit design the
    * normal-equation solver recovers the plant to machine precision,
    * so each prediction equals the closed form within ~1e-8 and the
    * cents-rounded emission replays as literal SQL arithmetic. The
    * intercept's trailing .001 keeps every planted value 0.1 cents
    * AWAY from a rounding boundary: 2.5 × a 2-decimal price lands
    * exactly ON half-cent boundaries, where the fit's ~1e-8 noise
    * would flip floor(v·100+0.5) differently per engine (observed on
    * 3/76 rows before the shift). Gates the transform leg itself:
    * feature assembly order, coefficient application, the fit→score
    * round trip. */
  def m7bTransformClosed(s: SparkSession, dir: String): DataFrame = {
    val df = Tables.orders(s, dir).select(
      col("o_orderkey"),
      col("o_totalprice").cast("double").as("x"),
      (col("o_totalprice") * 2.5 + 1000.001).as("label"))
    val lr = new LinearRegression().setLabelCol("label")
      .setFeaturesCol("features").setSolver("normal")
    val model = new Pipeline().setStages(Array[org.apache.spark.ml.PipelineStage](
      new VectorAssembler().setInputCols(Array("x"))
        .setOutputCol("features")) :+ lr).fit(df)
    model.transform(df.filter(col("o_orderkey") % 199 === 0))
      .select(col("o_orderkey"),
        Det.r2(col("prediction")).as("prediction"))
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
      features: Array[String], repeats: Int,
      lambdas: Array[Double] = Array(0.01, 1.0, 100.0)): DataFrame = {
    val df = df0.cache()
    val lr = new LinearRegression().setLabelCol("label")
      .setFeaturesCol("features").setElasticNetParam(1.0)
      .setMaxIter(50)
    val pipe = new Pipeline().setStages(Array[org.apache.spark.ml.PipelineStage](
      new VectorAssembler().setInputCols(features).setOutputCol("features"))
      :+ lr)
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, lambdas).build()
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
  /** Shared exact-decimal design moments behind every closed-form ML
    * gate (m2b OLS, m1b PCA, m4b lasso path, m6b AIC lattice): one
    * row of order-independent decimal sums over the per-customer
    * design (x1 = order count, x2 = acctbal cents, y = exact-decimal
    * spend), cast to double only at the end — so Spark and DuckDB
    * hold bit-identical moments and every downstream closed form is
    * the same IEEE expression tree in both engines (the m2b
    * argument; see [[m2bLinregNormal]]). */
  private[ml] def exactMoments(s: SparkSession, dir: String): DataFrame = {
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
    dm.agg(
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
  }

  /** The same moment table as a DuckDB CTE chain (percust/dm/m) —
    * prepended to every gate oracle so the SQL reads the identical
    * exact-decimal moments. */
  private val momentsSqlCte: String =
    s"""percust AS (
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
         FROM dm)"""

  // Cramer's rule on [s1 sx1 sx2; sx1 sx11 sx12; sx2 sx12 sx22]
  // β = [sy sx1y sx2y] — shared by m2b (coefficients) and m6b (the
  // full-model RSS); formula text mirrored in the oracles
  private val cDet = col("s1") * (col("sx11") * col("sx22")
    - col("sx12") * col("sx12")) -
    col("sx1") * (col("sx1") * col("sx22")
      - col("sx12") * col("sx2")) +
    col("sx2") * (col("sx1") * col("sx12")
      - col("sx11") * col("sx2"))
  private val cB0 = (col("sy") * (col("sx11") * col("sx22")
    - col("sx12") * col("sx12")) -
    col("sx1") * (col("sx1y") * col("sx22")
      - col("sx12") * col("sx2y")) +
    col("sx2") * (col("sx1y") * col("sx12")
      - col("sx11") * col("sx2y"))) / cDet
  private val cB1 = (col("s1") * (col("sx1y") * col("sx22")
    - col("sx12") * col("sx2y")) -
    col("sy") * (col("sx1") * col("sx22")
      - col("sx12") * col("sx2")) +
    col("sx2") * (col("sx1") * col("sx2y")
      - col("sx1y") * col("sx2"))) / cDet
  private val cB2 = (col("s1") * (col("sx11") * col("sx2y")
    - col("sx1y") * col("sx12")) -
    col("sx1") * (col("sx1") * col("sx2y")
      - col("sx1y") * col("sx2")) +
    col("sy") * (col("sx1") * col("sx12")
      - col("sx11") * col("sx2"))) / cDet

  def m2bLinregNormal(s: SparkSession, dir: String): DataFrame = {
    val m = exactMoments(s, dir)
    val (b0, b1, b2) = (cB0, cB1, cB2)
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

  /** M1B — the PCA ORACLE GATE (the m2b pattern for prcomp): the
    * 2-feature STANDARDIZED design's PCA is closed-form. Scaling to
    * unit variance makes the covariance of the scaled data the
    * correlation matrix [[1, r], [r, 1]], whose eigen-structure is
    * a textbook identity: eigenvalues 1 ± |r| (explained-variance
    * proportions (1 ± |r|)/2) and eigenvectors (1, ±1)/√2 — every
    * (component, feature) loading has magnitude 1/√2. r comes off
    * the exact-decimal moments, so both engines evaluate the same
    * IEEE expression tree end to end. MlMultimodalSpec bridges this
    * to spark.ml: [[pcaOf]] on the same 2-column design reproduces
    * the proportions and |loadings| to 1e-6, transitively
    * value-gating m1's machinery (scaler → covariance →
    * eigensolver); m1's 5-feature surface stays rows-only. */
  def m1bPcaClosed(s: SparkSession, dir: String): DataFrame = {
    val m = exactMoments(s, dir)
    val r = (col("s1") * col("sx12") - col("sx1") * col("sx2")) /
      sqrt((col("s1") * col("sx11") - col("sx1") * col("sx1")) *
        (col("s1") * col("sx22") - col("sx2") * col("sx2")))
    val load = lit(1.0) / sqrt(lit(2.0))
    val ev1 = (lit(1.0) + abs(r)) / lit(2.0)
    val ev2 = (lit(1.0) - abs(r)) / lit(2.0)
    def rowOf(c: String, f: String, ev: org.apache.spark.sql.Column) =
      struct(lit(c).as("component"), lit(f).as("feature"),
        Det.r6(load).as("abs_loading"),
        Det.r6(ev).as("explained_variance"))
    m.select(explode(array(
      rowOf("pc1", "n_orders", ev1), rowOf("pc1", "acctbal", ev1),
      rowOf("pc2", "n_orders", ev2), rowOf("pc2", "acctbal", ev2)))
      .as("kv"))
      .select(col("kv.component").as("component"),
        col("kv.feature").as("feature"),
        col("kv.abs_loading").as("abs_loading"),
        col("kv.explained_variance").as("explained_variance"))
  }

  /** M6B — the stepwise-AIC ORACLE GATE: the 2-predictor model
    * lattice {x1,x2}, {x1}, {x2}, {intercept} has every RSS in
    * closed form from the moments (full model via the shared Cramer
    * solve, simple regressions via RSS = SST − Sxy²/Sxx), so each
    * model's AIC = n·ln(RSS/n) + 2(k+2) — the exact formula
    * [[stepwiseAicOf]] optimizes — is statable in SQL, and so is the
    * first backward-elimination DECISION (which drop wins, with
    * minBy's first-on-tie order). ln() is the one primitive whose
    * last ulp differs between engines (the x28 finding), so the ln
    * is quantized to 1e-4 BEFORE the n· multiply on both sides; all
    * other arithmetic is identical IEEE. MlMultimodalSpec bridges
    * the lattice to stepwiseAicOf's spark.ml refits (≤0.05 AIC,
    * the quantization envelope) and pins the same greedy choice. */
  def m6bStepAicLattice(s: SparkSession, dir: String): DataFrame = {
    val m = exactMoments(s, dir)
    val n = col("s1")
    val sst = col("syy") - col("sy") * col("sy") / n
    val rssF = col("syy") - cB0 * col("sy") - cB1 * col("sx1y") -
      cB2 * col("sx2y")
    val d1 = col("sx1y") - col("sx1") * col("sy") / n
    val v1 = col("sx11") - col("sx1") * col("sx1") / n
    val d2 = col("sx2y") - col("sx2") * col("sy") / n
    val v2 = col("sx22") - col("sx2") * col("sx2") / n
    val rss1 = sst - d1 * d1 / v1 // model {x1}
    val rss2 = sst - d2 * d2 / v2 // model {x2}
    def aic(rss: org.apache.spark.sql.Column, k: Int) =
      n * Det.r4(log(rss / n)) + lit(2.0 * (k + 2))
    val (aicF, aic1, aic2, aic0) =
      (aic(rssF, 2), aic(rss1, 1), aic(rss2, 1), aic(sst, 0))
    // backward step 1 from the full model, minBy-first-on-tie over
    // candidates in feature order: [drop x1 → {x2}, drop x2 → {x1}]
    // → 0 = keep full, 1 = drop x1, 2 = drop x2
    val greedy = when(least(aic1, aic2) >= aicF, lit(0.0))
      .when(aic2 <= aic1, lit(1.0)).otherwise(lit(2.0))
    m.select(explode(array(
      struct(lit("aic_full").as("metric"), Det.r4(aicF).as("value")),
      struct(lit("aic_x1").as("metric"), Det.r4(aic1).as("value")),
      struct(lit("aic_x2").as("metric"), Det.r4(aic2).as("value")),
      struct(lit("aic_intercept").as("metric"), Det.r4(aic0).as("value")),
      struct(lit("greedy_step1").as("metric"), greedy.as("value"))))
      .as("kv"))
      .select(col("kv.metric").as("metric"), col("kv.value").as("value"))
  }

  /** M4B — the LASSO λ-PATH ORACLE GATE: for ONE predictor the lasso
    * solution is the closed-form soft threshold. Under spark.ml's
    * objective — features and label standardized by their
    * POPULATION std (÷n: the ∑/n in the 1/(2n)-scaled aggregator
    * absorbs the scaling, verified against the solver in
    * MlMultimodalSpec — a sample-std (n−1) model misses by exactly
    * √(n/(n−1))), penalty λ/σ_y on the standardized coefficient —
    * the standardized solution is β̃(λ) = sign(r)·max(|r| − λ/σ_y, 0)
    * (r = corr(x, y)), mapped back by β = β̃·σ_y/σ_x, b₀ = ȳ − β·x̄.
    * The path is reported at λ = {0, ½, 2}·λ_max where
    * λ_max = σ_y·|r| is the smallest λ that zeroes the coefficient —
    * exercising the OLS limit, a genuinely shrunk fit, and the zero
    * regime. Every input is an exact-decimal moment, so the whole
    * path is engine-identical. MlMultimodalSpec bridges it to
    * spark.ml's OWLQN solver at the same λ's (≤1e-3 relative —
    * solver convergence, not ulp). */
  def m4bLassoPathClosed(s: SparkSession, dir: String): DataFrame = {
    val m = exactMoments(s, dir)
    val n = col("s1")
    val sxxC = col("sx11") - col("sx1") * col("sx1") / n
    val syyC = col("syy") - col("sy") * col("sy") / n
    val sxyC = col("sx1y") - col("sx1") * col("sy") / n
    val sigX = sqrt(sxxC / n)
    val sigY = sqrt(syyC / n)
    val r = sxyC / sqrt(sxxC * syyC)
    val lamMax = sigY * abs(r)
    val xBar = col("sx1") / n
    val yBar = col("sy") / n
    def betaAt(lam: org.apache.spark.sql.Column) =
      signum(r) * greatest(abs(r) - lam / sigY, lit(0.0)) *
        sigY / sigX
    def rows(tag: String, lam: org.apache.spark.sql.Column) = {
      val b = betaAt(lam)
      Seq(struct(lit(s"beta_$tag").as("metric"), Det.r6(b).as("value")),
        struct(lit(s"intercept_$tag").as("metric"),
          Det.r6(yBar - b * xBar).as("value")))
    }
    m.select(explode(array(
      Seq(struct(lit("lambda_max").as("metric"),
        Det.r6(lamMax).as("value"))) ++
        rows("at_0", lit(0.0)) ++
        rows("at_half_max", lamMax * lit(0.5)) ++
        rows("at_2x_max", lamMax * lit(2.0)): _*)).as("kv"))
      .select(col("kv.metric").as("metric"), col("kv.value").as("value"))
  }

  /** M5B — the tree-regressor EXACTNESS ORACLE GATE (the x9b/x19b
    * bounded-domain idea, for CART): a random forest with
    * bootstrap=false, numTrees=1 and all features per split is a
    * deterministic variance-split CART tree, and on a design whose
    * single feature has 8 ordered values with integer labels the
    * fully-grown tree's leaves are unions of feature values with
    * IDENTICAL label means — so every prediction equals the per-value
    * label mean EXACTLY (variance splitting has positive gain
    * whenever child means differ, minInfoGain = 0 and maxDepth = 8 >
    * the worst-case 7-deep chain let it run to purity; integer label
    * sums ≪ 2^53 are order-independent in double, and the final
    * sum/count division is the identical IEEE op in both engines).
    * The oracle is the plain GROUP BY mean. This value-gates
    * spark.ml's tree machinery — binning, variance-gain argmax,
    * leaf stats — which m5's 5-feature forest (rows-only) cannot. */
  def m5bTreeExactGate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.regression.RandomForestRegressor
    val data = Tables.orders(s, dir).select(
      (col("o_orderkey") % 8).cast("double").as("x"),
      (col("o_orderkey") % 97).cast("double").as("label"))
    val rf = new RandomForestRegressor().setLabelCol("label")
      .setFeaturesCol("features").setNumTrees(1).setBootstrap(false)
      .setFeatureSubsetStrategy("all").setMaxDepth(8).setSeed(4)
    val model = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(Array("x"))
        .setOutputCol("features"), rf)).fit(data)
    val grid = data.groupBy(col("x"))
      .agg(count(lit(1)).cast("bigint").as("n_rows"))
    model.transform(grid)
      .select(col("x").cast("bigint").as("bucket"), col("n_rows"),
        col("prediction"))
  }

  /** M10B — the repeated-CV PLANTED ORACLE GATE (the n7 idea for
    * model selection): on a design where the label is EXACTLY linear
    * in the single feature (y = 3x + 7, integers), the λ = 0 entry
    * of the grid fits every fold to machine precision (normal
    * solver: no L1 at regParam 0), so every repeat's CV-RMSE is
    * ~1e−9 — 0 after the 1e−6 quantization — while λ = 1 pays a
    * shrinkage bias orders of magnitude above it. The closed form is
    * therefore constant: best_reg = 0, cv_rmse = 0 for every repeat,
    * mean = sd = 0 — REGARDLESS of how the seeds assign folds. What
    * it gates: the fold machinery ran, the per-fold fits converged
    * to the exact solution, and selection picked the exact-fit λ in
    * all repeats × folds × grid cells. */
  def m10bCvPlantedGate(s: SparkSession, dir: String): DataFrame = {
    val df = Tables.orders(s, dir).select(
      (col("o_orderkey") % 100).cast("double").as("x"),
      ((col("o_orderkey") % 100) * 3 + 7).cast("double").as("label"))
    repeatedCvOf(s, df, Array("x"), repeats = 3,
      lambdas = Array(0.0, 1.0))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_pca" -> m1Pca,
    "m1b_pca_closed" -> m1bPcaClosed,
    "m2_linreg" -> m2Linreg,
    "m2b_linreg_normal" -> m2bLinregNormal,
    "m3b_onehot_gate" -> m3bOnehotGate,
    "m7b_transform_closed" -> m7bTransformClosed,
    "m8b_metrics_closed" -> m8bMetricsClosed,
    "m4_lasso_cv" -> m4LassoCv,
    "m4b_lasso_path_closed" -> m4bLassoPathClosed,
    "m10_repeated_cv" -> m10RepeatedCv,
    "m10b_cv_planted_gate" -> m10bCvPlantedGate,
    "m5_random_forest" -> m5RandomForest,
    "m5b_tree_exact_gate" -> m5bTreeExactGate,
    "m6_stepwise_aic" -> m6StepwiseAic,
    "m6b_stepaic_lattice" -> m6bStepAicLattice)

  // SQL fragments of the shared Cramer solve (mirrors cB0/cB1/cB2)
  private val sqlDet = """(s1 * (sx11 * sx22 - sx12 * sx12) -
    sx1 * (sx1 * sx22 - sx12 * sx2) +
    sx2 * (sx1 * sx12 - sx11 * sx2))"""
  private val sqlB0 = s"""((sy * (sx11 * sx22 - sx12 * sx12) -
    sx1 * (sx1y * sx22 - sx12 * sx2y) +
    sx2 * (sx1y * sx12 - sx11 * sx2y)) / $sqlDet)"""
  private val sqlB1 = s"""((s1 * (sx1y * sx22 - sx12 * sx2y) -
    sy * (sx1 * sx22 - sx12 * sx2) +
    sx2 * (sx1 * sx2y - sx1y * sx2)) / $sqlDet)"""
  private val sqlB2 = s"""((s1 * (sx11 * sx2y - sx1y * sx12) -
    sx1 * (sx1 * sx2y - sx1y * sx2) +
    sy * (sx1 * sx12 - sx11 * sx2)) / $sqlDet)"""

  /** Closed-form gates replay exactly in SQL (exact-decimal moments
    * + the same IEEE expression tree); the full spark.ml fits stay
    * rows-only, each value-gated by its b-twin plus an
    * MlMultimodalSpec bridge (m1↔m1b, m2↔m2b, m4↔m4b, m5↔m5b,
    * m6↔m6b, m10↔m10b). */
  val oracle: Map[String, String] = Map(
    // the three metric formulas in plain SQL over the same planted
    // prediction frame (see m8bMetricsClosed scaladoc)
    "m8b_metrics_closed" -> {
      val p = """(SELECT cast(o_totalprice AS double) AS l,
        cast(o_totalprice AS double) * 0.9
          + (o_orderkey % 97) * 50.0 AS pr
        FROM orders)"""
      s"""WITH p AS $p,
         s AS (SELECT avg(l) AS lbar FROM p),
         m AS (SELECT
             sqrt(sum((l - pr) * (l - pr)) / count(*)) AS rmse,
             1.0 - sum((l - pr) * (l - pr))
               / sum((l - lbar) * (l - lbar)) AS r2,
             avg(abs(l - pr) / l) AS mape
           FROM p, s)
         SELECT 'rmse' AS metric, ${Det.sql("rmse", 6)} AS value FROM m
         UNION ALL SELECT 'r2', ${Det.sql("r2", 6)} FROM m
         UNION ALL SELECT 'mape', ${Det.sql("mape", 6)} FROM m"""
    },
    // the planted exact-fit line, scored by model.transform and
    // replayed as literal arithmetic (see m7bTransformClosed scaladoc)
    "m7b_transform_closed" ->
      s"""SELECT o_orderkey,
           ${Det.sql("cast(o_totalprice AS double) * 2.5 + 1000.001", 2)}
             AS prediction
         FROM orders WHERE o_orderkey % 199 = 0""",
    // the drop-last alphabetical layout contract in SQL (see
    // m3bOnehotGate scaladoc); segments restricted to customers that
    // HAVE orders — featureTable's inner join
    "m3b_onehot_gate" ->
      """WITH seg AS (
           SELECT DISTINCT c_mktsegment AS segment FROM customer
           WHERE c_custkey IN (SELECT o_custkey FROM orders)),
         n AS (SELECT count(*) AS total FROM seg),
         r AS (SELECT segment,
             cast(dense_rank() OVER (ORDER BY segment) - 1 AS int)
               AS seg_idx
           FROM seg)
         SELECT segment, seg_idx,
           cast(total - 1 AS int) AS oh_size,
           cast(CASE WHEN seg_idx < total - 1 THEN seg_idx + 1
                ELSE 0 END AS int) AS active_slot
         FROM r, n""",
    "m2b_linreg_normal" -> {
      val sse = s"(syy - $sqlB0 * sy - $sqlB1 * sx1y - $sqlB2 * sx2y)"
      val sst = "(syy - sy * sy / s1)"
      s"""WITH $momentsSqlCte
         SELECT metric, value FROM (
           SELECT 'intercept' AS metric,
             ${Det.sql(sqlB0, 6)} AS value FROM m
           UNION ALL
           SELECT 'coef_n_orders', ${Det.sql(sqlB1, 6)} FROM m
           UNION ALL
           SELECT 'coef_acctbal', ${Det.sql(sqlB2, 6)} FROM m
           UNION ALL
           SELECT 'r2', ${Det.sql(s"1.0 - $sse / $sst", 6)} FROM m)"""
    },
    "m1b_pca_closed" -> {
      val r = """((s1 * sx12 - sx1 * sx2) /
        sqrt((s1 * sx11 - sx1 * sx1) * (s1 * sx22 - sx2 * sx2)))"""
      val load = Det.sql("1.0 / sqrt(2.0)", 6)
      s"""WITH $momentsSqlCte
         SELECT component, feature, $load AS abs_loading,
           CASE WHEN component = 'pc1'
             THEN ${Det.sql(s"(1.0 + abs($r)) / 2.0", 6)}
             ELSE ${Det.sql(s"(1.0 - abs($r)) / 2.0", 6)}
           END AS explained_variance
         FROM m, (VALUES ('pc1', 'n_orders'), ('pc1', 'acctbal'),
                         ('pc2', 'n_orders'), ('pc2', 'acctbal'))
              AS t(component, feature)"""
    },
    "m6b_stepaic_lattice" -> {
      val sst = "(syy - sy * sy / s1)"
      val rssF = s"(syy - $sqlB0 * sy - $sqlB1 * sx1y - $sqlB2 * sx2y)"
      val rss1 = s"""($sst - (sx1y - sx1 * sy / s1) * (sx1y - sx1 * sy / s1)
        / (sx11 - sx1 * sx1 / s1))"""
      val rss2 = s"""($sst - (sx2y - sx2 * sy / s1) * (sx2y - sx2 * sy / s1)
        / (sx22 - sx2 * sx2 / s1))"""
      def aic(rss: String, k: Int) =
        s"(s1 * (${Det.sql(s"ln($rss / s1)", 4)}) + ${2.0 * (k + 2)})"
      val (aF, a1, a2, a0) =
        (aic(rssF, 2), aic(rss1, 1), aic(rss2, 1), aic(sst, 0))
      s"""WITH $momentsSqlCte
         SELECT metric, value FROM (
           SELECT 'aic_full' AS metric, ${Det.sql(aF, 4)} AS value FROM m
           UNION ALL SELECT 'aic_x1', ${Det.sql(a1, 4)} FROM m
           UNION ALL SELECT 'aic_x2', ${Det.sql(a2, 4)} FROM m
           UNION ALL SELECT 'aic_intercept', ${Det.sql(a0, 4)} FROM m
           UNION ALL SELECT 'greedy_step1',
             CASE WHEN least($a1, $a2) >= $aF THEN 0.0
                  WHEN $a2 <= $a1 THEN 1.0 ELSE 2.0 END FROM m)"""
    },
    "m4b_lasso_path_closed" -> {
      val sxxC = "(sx11 - sx1 * sx1 / s1)"
      val syyC = "(syy - sy * sy / s1)"
      val sxyC = "(sx1y - sx1 * sy / s1)"
      val sigX = s"sqrt($sxxC / s1)"
      val sigY = s"sqrt($syyC / s1)"
      val r = s"($sxyC / sqrt($sxxC * $syyC))"
      val lamMax = s"($sigY * abs($r))"
      def beta(lam: String) =
        s"""(sign($r) * greatest(abs($r)
          - $lam / $sigY, 0.0) * $sigY / $sigX)"""
      def pair(tag: String, lam: String) = {
        val b = beta(lam)
        s"""SELECT 'beta_$tag' AS metric, ${Det.sql(b, 6)} AS value FROM m
           UNION ALL SELECT 'intercept_$tag',
             ${Det.sql(s"sy / s1 - $b * (sx1 / s1)", 6)} FROM m"""
      }
      s"""WITH $momentsSqlCte
         SELECT metric, value FROM (
           SELECT 'lambda_max' AS metric, ${Det.sql(lamMax, 6)} AS value
           FROM m
           UNION ALL ${pair("at_0", "0.0")}
           UNION ALL ${pair("at_half_max", s"($lamMax * 0.5)")}
           UNION ALL ${pair("at_2x_max", s"($lamMax * 2.0)")})"""
    },
    "m5b_tree_exact_gate" ->
      """SELECT cast(o_orderkey % 8 AS bigint) AS bucket,
           cast(count(*) AS bigint) AS n_rows,
           cast(sum(o_orderkey % 97) AS double)
             / cast(count(*) AS double) AS prediction
         FROM orders GROUP BY 1""",
    "m10b_cv_planted_gate" ->
      """SELECT metric, cast(value AS double) AS value FROM (VALUES
           ('repeat_1_best_reg', 0.0), ('repeat_1_cv_rmse', 0.0),
           ('repeat_2_best_reg', 0.0), ('repeat_2_cv_rmse', 0.0),
           ('repeat_3_best_reg', 0.0), ('repeat_3_cv_rmse', 0.0),
           ('cv_rmse_mean', 0.0), ('cv_rmse_sd', 0.0))
         AS t(metric, value)""")
}
