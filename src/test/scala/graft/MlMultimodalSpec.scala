package graft

import org.apache.spark.sql.functions._
import graft.ml.{MlDiagnostics, Models}
import graft.multimodal.Multimodal
import graft.ops.Aggregates

/** Sanity for the spark.ml layer and the multimodal plumbing — the
  * non-SQL-expressible queries the DuckDB oracle can't gate. */
class MlMultimodalSpec extends SparkTestBase {

  test("m8b metrics gate: evaluator equals hand-computed rmse/r2/mape") {
    val got = Models.m8bMetricsClosed(spark, sfSmoke).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val p = Tables.orders(spark, sfSmoke).select(
        col("o_totalprice").cast("double"),
        col("o_totalprice") * 0.9 +
          pmod(col("o_orderkey"), lit(97)).cast("double") * 50.0)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val n = p.length.toDouble
    val sse = p.map { case (l, pr) => (l - pr) * (l - pr) }.sum
    val lbar = p.map(_._1).sum / n
    val sst = p.map { case (l, _) => (l - lbar) * (l - lbar) }.sum
    val mape = p.map { case (l, pr) => math.abs(l - pr) / l }.sum / n
    // the query emits Det.r6-rounded values: allow the rounding step
    def close(a: Double, b: Double) =
      math.abs(a - b) <= 5.5e-7 + 1e-6 * math.abs(b)
    assert(close(got("rmse"), math.sqrt(sse / n)), s"rmse ${got("rmse")}")
    assert(close(got("r2"), 1.0 - sse / sst), s"r2 ${got("r2")}")
    assert(close(got("mape"), mape), s"mape ${got("mape")}")
  }

  test("m7b transform gate: exact-fit predictions equal the planted line") {
    val rows = Models.m7bTransformClosed(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    val prices = Tables.orders(spark, sfSmoke)
      .filter(col("o_orderkey") % 199 === 0)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val want = prices(r.getLong(0)) * 2.5 + 1000.001
      assert(math.abs(r.getDouble(1) - want) <= 0.006,
        s"order ${r.getLong(0)}: ${r.getDouble(1)} vs $want")
    }
  }

  test("m3b one-hot layout gate: alphabetical indices, drop-last width " +
    "and slot") {
    val rows = Models.m3bOnehotGate(spark, sfSmoke).collect()
    val segs = rows.map(_.getString(0)).sorted
    assert(segs.length >= 3, "fixture needs several segments")
    rows.foreach { r =>
      val idx = segs.indexOf(r.getString(0))
      assert(r.getInt(1) == idx, s"${r.getString(0)}: index ${r.getInt(1)}")
      assert(r.getInt(2) == segs.length - 1, "encoded width")
      assert(r.getInt(3) ==
        (if (idx < segs.length - 1) idx + 1 else 0), "hot slot")
    }
  }

  test("m2 linear regression fits and reports finite metrics") {
    val out = Models.m2Linreg(spark, sfSmoke)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.contains("intercept"))
    assert(out("rmse") >= 0 && !out("rmse").isNaN)
    assert(out("r2") <= 1.0 + 1e-9)
    assert(out("mape") >= 0)
    // inference columns: t must equal coef/se (summary(lm) contract)
    out.keys.filter(_.startsWith("coef_")).foreach { k =>
      val i = k.stripPrefix("coef_")
      val (se, t) = (out(s"se_$i"), out(s"t_$i"))
      assert(se > 0, s"se_$i not positive")
      // summary's tValues come from the solver's internal precision —
      // consistent with coef/se to ~1e-5 relative, not bit-equal
      assert(math.abs(t - out(k) / se) < 1e-4 * math.max(1.0, math.abs(t)),
        s"t_$i inconsistent with coef/se")
    }
    assert(out("se_intercept") > 0 && !out("t_intercept").isNaN)
  }

  test("m2b closed-form OLS == spark.ml normal-equation fit") {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.regression.{LinearRegression, LinearRegressionModel}
    val m2b = Models.m2bLinregNormal(spark, sfSmoke)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the same 2-feature design through m2's machinery (spark.ml
    // LAPACK normal solver) must land on the oracle-gated closed-form
    // coefficients — this transitively value-gates the m2 path
    val design = Tables.orders(spark, sfSmoke)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).cast("double").as("n_orders"),
        sum("o_totalprice").as("label"))
      .join(Tables.customer(spark, sfSmoke)
        .select(col("c_custkey").as("custkey"), col("c_acctbal")),
        Seq("custkey"), "inner")
    val model = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(Array("n_orders", "c_acctbal"))
        .setOutputCol("features"),
      new LinearRegression().setLabelCol("label")
        .setFeaturesCol("features").setSolver("normal"))).fit(design)
    val lrm = model.stages.last.asInstanceOf[LinearRegressionModel]
    def close(a: Double, b: Double): Boolean =
      math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b))
    assert(close(lrm.intercept, m2b("intercept")),
      s"intercept ${lrm.intercept} vs ${m2b("intercept")}")
    assert(close(lrm.coefficients(0), m2b("coef_n_orders")))
    assert(close(lrm.coefficients(1), m2b("coef_acctbal")))
    assert(m2b("r2") <= 1.0 && m2b("r2") > 0.0)
  }

  test("m1 PCA explains decreasing variance over 3 components") {
    val ev = Models.m1Pca(spark, sfSmoke)
      .select("component", "explained_variance").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ev.size == 3)
    assert(ev("pc1") >= ev("pc2") && ev("pc2") >= ev("pc3"))
    assert(ev("pc1") > 0)
  }

  test("m4 LASSO CV picks a lambda and zeroes no more than all coefs") {
    val out = Models.m4LassoCv(spark, sfSmoke)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(Set(0.01, 1.0, 100.0).contains(out("best_reg_param")))
    assert(out("n_nonzero_coefs") >= 0 && out("n_nonzero_coefs") <= 5)
  }

  test("m10 repeated CV: mean/sd consistent with per-repeat RMSEs") {
    val out = Models.m10RepeatedCv(spark, sfSmoke)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rmses = (1 to 3).map(r => out(s"repeat_${r}_cv_rmse"))
    assert(rmses.forall(v => v > 0 && !v.isNaN))
    (1 to 3).foreach(r =>
      assert(Set(0.01, 1.0, 100.0).contains(out(s"repeat_${r}_best_reg"))))
    // kv rounds to 1e-6 — mean/sd must agree with the emitted repeats
    // at that grain
    val mean = rmses.sum / 3
    assert(math.abs(out("cv_rmse_mean") - mean) < 1e-5)
    val sd = math.sqrt(rmses.map(x => (x - mean) * (x - mean)).sum / 2)
    assert(math.abs(out("cv_rmse_sd") - sd) < 1e-5)
    assert(out("cv_rmse_sd") >= 0.0)
  }

  test("m5 random forest importances sum to ~1") {
    val out = Models.m5RandomForest(spark, sfSmoke).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val total = out.collect {
      case (k, v) if k.startsWith("importance_") => v
    }.sum
    assert(math.abs(total - 1.0) < 1e-6, s"importances sum $total")
  }

  test("m6 stepwise AIC strictly improves per step") {
    val steps = Models.m6StepwiseAic(spark, sfSmoke)
      .select("aic").collect().map(_.getDouble(0))
    assert(steps.nonEmpty)
    steps.sliding(2).foreach {
      case Array(a, b) => assert(b < a, s"AIC went up: $a -> $b")
      case _ =>
    }
  }

  /** The shared 2-feature row-level design behind the b-gates
    * (x1 = per-customer order count, x2 = acctbal, label = spend) —
    * the row form of Models.exactMoments. */
  private def gateDesign = Tables.orders(spark, sfSmoke)
    .groupBy(col("o_custkey").as("custkey"))
    .agg(count(lit(1)).cast("double").as("x1"),
      sum("o_totalprice").as("label"))
    .join(Tables.customer(spark, sfSmoke)
      .select(col("c_custkey").as("custkey"),
        col("c_acctbal").cast("double").as("x2")),
      Seq("custkey"), "inner")

  test("m1b closed-form PCA == spark.ml scaler+PCA on the same design") {
    val gate = Models.m1bPcaClosed(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val ml = Models.pcaOf(spark, gateDesign, Array("x1", "x2"), k = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    // same eigen-structure: explained-variance proportions (1±|r|)/2
    // and |loading| = 1/√2 on every (component, feature) pair
    for ((c, f) <- Seq(("pc1", "x1"), ("pc1", "x2"),
        ("pc2", "x1"), ("pc2", "x2"))) {
      val gf = if (f == "x1") "n_orders" else "acctbal"
      val (gl, gev) = gate((c, gf))
      val (l, ev) = ml((c, f))
      assert(math.abs(l - gl) < 1e-6, s"($c,$f) loading $l vs $gl")
      assert(math.abs(ev - gev) < 1e-6, s"($c,$f) ev $ev vs $gev")
    }
  }

  test("m6b AIC lattice == stepwiseAicOf's spark.ml refits, same " +
      "greedy decision") {
    val lattice = Models.m6bStepAicLattice(spark, sfSmoke).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val steps = Models.stepwiseAicOf(spark, gateDesign,
      Array("x1", "x2")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    // the lattice's ln is 1e-4-quantized before the n· multiply;
    // n ≈ |customers| at sf0.001 → ≤ n·5e-5 AIC divergence
    val tol = 0.1
    assert(math.abs(steps.head._3 - lattice("aic_full")) < tol,
      s"start ${steps.head._3} vs ${lattice("aic_full")}")
    lattice("greedy_step1") match {
      case 0.0 => assert(steps.length == 1, s"expected no drop: $steps")
      case 1.0 =>
        assert(steps(1)._1 == "drop_x1" && steps(1)._2 == "x2")
        assert(math.abs(steps(1)._3 - lattice("aic_x2")) < tol)
      case 2.0 =>
        assert(steps(1)._1 == "drop_x2" && steps(1)._2 == "x1")
        assert(math.abs(steps(1)._3 - lattice("aic_x1")) < tol)
      case g => fail(s"unexpected greedy code $g")
    }
  }

  test("m4b closed-form soft-threshold path == spark.ml lasso at the " +
      "same lambdas") {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.regression.{LinearRegression, LinearRegressionModel}
    val path = Models.m4bLassoPathClosed(spark, sfSmoke).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val lamMax = path("lambda_max")
    assert(lamMax > 0)
    def fitAt(lam: Double): (Double, Double) = {
      val lr = new LinearRegression().setLabelCol("label")
        .setFeaturesCol("features").setElasticNetParam(1.0)
        .setRegParam(lam).setMaxIter(200).setTol(1e-9)
      val m = new Pipeline().setStages(Array(
        new VectorAssembler().setInputCols(Array("x1"))
          .setOutputCol("features"), lr)).fit(gateDesign)
        .stages.last.asInstanceOf[LinearRegressionModel]
      (m.coefficients(0), m.intercept)
    }
    def relClose(a: Double, b: Double, scale: Double): Boolean =
      math.abs(a - b) <= 1e-3 * math.max(scale, math.abs(b))
    val (b0, i0) = fitAt(0.0)
    assert(relClose(b0, path("beta_at_0"), 1e-3),
      s"OLS beta $b0 vs ${path("beta_at_0")}")
    assert(relClose(i0, path("intercept_at_0"), 1.0))
    val (bH, iH) = fitAt(0.5 * lamMax)
    assert(relClose(bH, path("beta_at_half_max"), 1e-3),
      s"half-max beta $bH vs ${path("beta_at_half_max")}")
    assert(relClose(iH, path("intercept_at_half_max"), 1.0))
    // at 2·λ_max the soft threshold (and OWLQN) zero the coefficient
    // EXACTLY, and the intercept collapses to ȳ
    val (b2, i2) = fitAt(2.0 * lamMax)
    assert(b2 == 0.0, s"expected exact zero at 2x lambda_max, got $b2")
    assert(path("beta_at_2x_max") == 0.0)
    assert(relClose(i2, path("intercept_at_2x_max"), 1.0))
  }

  test("k2 MICE single-target: idempotent across sweeps (each refit " +
      "sees only the originally-observed rows)") {
    val base = ml.KnnImpute.k1Base(spark, sfSmoke)
      .withColumn("bal", col("bal").cast("double"))
    def run(sw: Int): Map[Long, Double] =
      ml.MiceImpute.miceOf(base, Seq("bal"),
        Seq("f_orders", "f_spend"), sweeps = sw, exact = true)
        .filter(col("miss_bal")).select("custkey", "bal")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val once = run(1)
    assert(once.nonEmpty && once.values.forall(v => !v.isNaN))
    assert(run(3) == once,
      "single-target MICE must be a fixpoint after one sweep")
  }

  test("m5b tree gate: predictions equal per-bucket label means " +
      "exactly") {
    val gate = Models.m5bTreeExactGate(spark, sfSmoke)
    val truth = Tables.orders(spark, sfSmoke)
      .groupBy((col("o_orderkey") % 8).cast("bigint").as("bucket"))
      .agg((sum(col("o_orderkey") % 97).cast("double") /
        count(lit(1)).cast("double")).as("want"))
    val bad = gate.join(truth, "bucket")
      .filter(col("prediction") =!= col("want"))
    assert(bad.count() == 0, "tree prediction != exact bucket mean")
    assert(gate.count() == 8)
  }

  test("m9 VIF: aux-OLS path agrees with the closed pairwise-corr form") {
    val feats = Array("l_quantity", "l_extendedprice", "l_discount")
    val df = Tables.lineitem(spark, sfSmoke).select(feats.head,
      feats.tail.toSeq: _*)
    val ols = MlDiagnostics.vifOls(df, feats).toMap
    val closed = Aggregates.m9Vif(spark, sfSmoke).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(closed.keySet == ols.keySet)
    closed.foreach { case (f, v) =>
      assert(math.abs(v - ols(f)) < 1e-4, s"$f: closed $v vs ols ${ols(f)}")
      assert(v >= 1.0, s"VIF must be >= 1, got $v for $f")
    }
  }

  test("m9 Breusch-Pagan: aux-OLS path agrees with the closed corr form") {
    val df = Tables.lineitem(spark, sfSmoke)
      .select(col("l_extendedprice").as("y"), col("l_quantity").as("x"))
    val ols = MlDiagnostics.breuschPaganOls(df, "y", Array("x"))
    val closed = Aggregates.m9BreuschPagan(spark, sfSmoke)
      .head().getDouble(0)
    assert(closed > 0.0, s"expected a nonzero BP, got $closed")
    // the closed form emits Det.r4-rounded values (1e-4 grid)
    assert(math.abs(closed - ols) < 5e-4, s"closed $closed vs ols $ols")
  }

  test("x5 multimodal decode: byte counts match source, histograms normalized") {
    val feats = Multimodal.x5MultimodalFeatures(spark, sfSmoke)
    val docs = Tables.documents(spark, sfSmoke)
      .select(col("doc_id").as("media_id"),
        length(col("text")).cast("long").as("n_chars_len"))
    val joined = feats.join(docs, "media_id")
    // ASCII text → byte length == char length
    assert(joined.filter(col("n_bytes") =!= col("n_chars_len")).count() == 0)
    val histSum = (0 until 8).map(i => col(s"h$i")).reduce(_ + _)
    assert(feats.filter(abs(histSum - 1.0) > 1e-3).count() == 0)
    assert(feats.select(countDistinct("kind")).head().getLong(0) == 3)
  }

  test("x5c: resize identity preserves pixels; downsample picks the " +
      "nearest-neighbor grid; output is a valid BMP") {
    // identity: same dims in and out → pixel area byte-identical
    val src = Multimodal.encodeBmp(6, 4, "stripe".getBytes)
    val same = Multimodal.resizeBmp(src, 6, 4)
    assert(Multimodal.decodeBmp(same) == ((6, 4, 24)))
    // pixel bytes identical row by row (padding content is
    // format-unspecified and deliberately not compared)
    val row = ((6 * 3 + 3) / 4) * 4
    for (y <- 0 until 4)
      assert(same.slice(54 + y * row, 54 + y * row + 18).toSeq ==
        src.slice(54 + y * row, 54 + y * row + 18).toSeq)
    // downsample 4x2 -> 2x1: output pixels = src (0,0) and (2,0)
    val s2 = Multimodal.encodeBmp(4, 2,
      Array.tabulate[Byte](24)(_.toByte))
    val thumb = Multimodal.resizeBmp(s2, 2, 1)
    assert(Multimodal.decodeBmp(thumb) == ((2, 1, 24)))
    // srcRow = 12; px(0,0)=bytes 0,1,2; px(2,0)=bytes 6,7,8
    assert(thumb.slice(54, 60).toSeq ==
      Seq[Byte](0, 1, 2, 6, 7, 8))
    // wrong depth is rejected loudly, not guessed
    val bad = Multimodal.encodeBmp(2, 2, Array.emptyByteArray)
    bad(28) = 8 // claim 8bpp
    intercept[IllegalArgumentException] {
      Multimodal.resizeBmp(bad, 1, 1)
    }
  }

  test("x5b: BMP/WAV encode→decode round-trips; garbage is rejected") {
    // kernel round-trip on planted params (no Spark needed)
    val bmp = Multimodal.encodeBmp(7, 5, "abc".getBytes)
    assert(Multimodal.decodeBmp(bmp) == ((7, 5, 24)))
    // spec'd row padding: rows of 7px × 3B = 21 → padded to 24
    assert(bmp.length == 54 + 24 * 5)
    val wav = Multimodal.encodeWav(16000, 2, 100, "xy".getBytes)
    assert(Multimodal.decodeWav(wav) == ((16000, 2, 16)))
    assert(wav.length == 44 + 100 * 2 * 2)
    intercept[IllegalArgumentException] {
      Multimodal.decodeBmp("not an image at all....".getBytes ++
        new Array[Byte](64))
    }
    intercept[IllegalArgumentException] { Multimodal.decodeWav(bmp) }

    // distributed decode: every doc decodes, fields in generator range
    val dec = Multimodal.x5bMultimodalDecode(spark, sfSmoke).cache()
    try {
      assert(dec.count() == Tables.documents(spark, sfSmoke).count())
      assert(dec.filter(col("kind") === "image" &&
        (col("width") < 1 || col("width") > 16 ||
         col("bits") =!= 24)).count() == 0)
      assert(dec.filter(col("kind") === "audio" &&
        !col("sample_rate").isin(8000, 16000, 24000)).count() == 0)
    } finally dec.unpersist()
  }

  test("frame sampling yields n frames of the requested size") {
    val media = Multimodal.mediaTable(spark, sfSmoke).toDF()
    val framed = Multimodal.frameSample(media, n = 4, frameBytes = 16)
    import spark.implicits._
    assert(framed.filter(size($"frames") =!= 4).count() == 0)
    val badLen = framed
      .select(explode($"frames").as("f"))
      .filter(length($"f") =!= 16)
    assert(badLen.count() == 0)
  }
}
