package graft

import org.apache.spark.sql.functions._
import graft.parking.ParkingPipeline._

/** Golden end-to-end checks of the parking pipeline against the
  * actual reference CSVs (BASELINE.md / FIXTURES.md goldens: row
  * counts, sentinel counts, the absent 090 band, split exactness). */
class ParkingSpec extends SparkTestBase {

  private val trainCsv = "/root/reference/train.csv"
  private val testCsv = "/root/reference/test.csv"

  private lazy val train = clean(loadTrain(spark, trainCsv)).cache()

  test("s2 encoding sniff: the reference CSVs sniff as UTF-8 with " +
    "multibyte evidence; planted encodings resolve correctly") {
    import graft.sources.EncodingSniff
    // the real files the reference guess_encoding's (R:69)
    Seq(trainCsv, testCsv).foreach { p =>
      val ranked = EncodingSniff.sniff(spark, p)
      assert(ranked.head == ("UTF-8" -> 1.0),
        s"$p sniffed as ${ranked.head}")
    }
    // planted fixtures, incl. the ASCII ambiguity contract
    val ascii = "plain,ascii\n1,2\n".getBytes("US-ASCII")
    val ranked = EncodingSniff.sniffBytes(ascii)
    assert(ranked.head == ("UTF-8" -> 0.8),
      "ASCII must call UTF-8 first at reduced confidence")
    assert(ranked.map(_._1).take(2) == Seq("UTF-8", "EUC-KR"))
    val euckr = "주차 데이터".getBytes("EUC-KR")
    assert(EncodingSniff.sniffBytes(euckr).head._1 == "EUC-KR")
  }

  test("s2 sniff is TOTAL: arbitrary byte soup never throws, every " +
    "candidate always ranked, scores in [0,1], deterministic") {
    import graft.sources.EncodingSniff
    val all = Set("UTF-8", "EUC-KR", "UTF-16LE", "UTF-16BE",
      "ISO-8859-1")
    val rnd = new scala.util.Random(42) // fixed seed: reproducible
    (1 to 200).foreach { i =>
      val bytes = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      val r = EncodingSniff.sniffBytes(bytes)
      assert(r.map(_._1).toSet == all, s"case $i lost a candidate")
      assert(r.forall { case (_, c) => c >= 0.0 && c <= 1.0 })
      assert(r.map(-_._2) == r.map(-_._2).sorted,
        s"case $i ranking not confidence-descending")
      assert(r == EncodingSniff.sniffBytes(bytes),
        s"case $i nondeterministic")
    }
    // the empty file: a legal (if useless) input, not a crash
    assert(EncodingSniff.sniffBytes(Array.empty[Byte])
      .map(_._1).toSet == all)
  }

  test("golden: train is 2952 rows × 15 cols, 423 complexes; test 1022/150") {
    assert(train.count() == 2952)
    assert(train.columns.length == 15)
    assert(train.select("단지코드").distinct().count() == 423)
    val te = clean(loadTest(spark, testCsv))
    assert(te.count() == 1022)
    assert(te.select("단지코드").distinct().count() == 150)
  }

  test("golden: sentinel cleaning nulled exactly the dirty rents") {
    // train.csv: 569 empty + 12 '-' in 임대보증금; 569 + 21 in 임대료
    assert(train.filter(col("임대보증금").isNull).count() == 569 + 12)
    assert(train.filter(col("임대료").isNull).count() == 569 + 21)
    // cleaned values are genuine doubles (spot value from train.csv:2)
    val v = train
      .filter(col("단지코드") === "C2483" && col("전용면적") === 39.72)
      .select(min("임대보증금")).head().getDouble(0)
    assert(v == 15667000.0)
  }

  test("golden: transit nulls before impute (211 subway, 4 bus)") {
    assert(train.filter(col("지하철역수").isNull).count() == 211)
    assert(train.filter(col("버스정류장수").isNull).count() == 4)
  }

  test("complex-level column discovery finds the per-complex columns") {
    val cols = complexLevelColumns(train, "단지코드")
    // the label and complex-wide features repeat per complex (SURVEY §1.4)
    assert(cols.contains("등록차량수"))
    assert(cols.contains("총세대수"))
    assert(cols.contains("지역"))
    // the unit-type grain columns must NOT be complex-level
    assert(!cols.contains("전용면적"))
    assert(!cols.contains("전용면적별세대수"))
  }

  test("golden: feature table is one row per complex with full schema") {
    val feats = featureTable(spark, trainCsv).cache()
    assert(feats.count() == 423)
    assert(feats.select("단지코드").distinct().count() == 423)
    // fixed band schema incl. the empty 090 band...
    bands.foreach(b => assert(feats.columns.contains(f"전용면적_$b%03d")))
    // ...which is all-zero in train (변수별_분포그림 has no 090 PNG)
    assert(feats.agg(sum("전용면적_090")).head().getLong(0) == 0)
    // no nulls survive imputation in the modeling columns
    Seq("임대보증금", "임대료", "지하철역수", "버스정류장수", "총면적")
      .foreach { c =>
        assert(feats.filter(col(c).isNull).count() == 0, s"nulls in $c")
      }
  }

  test("household conservation: band histogram sums to total area rows") {
    val feats = featureTable(spark, trainCsv)
    val bandSum = bands.map(b => col(f"전용면적_$b%03d")).reduce(_ + _)
    val totalHouseholds = train
      .agg(sum("전용면적별세대수")).head().getLong(0)
    val pivotTotal = feats.agg(sum(bandSum)).head().getLong(0)
    assert(pivotTotal == totalHouseholds)
  }

  test("entry point C: lm + rf fit the parking data and score sanely") {
    val scores = fitAndScore(spark, trainCsv)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    Seq("lm", "rf").foreach { m =>
      assert(scores((m, "rmse")) > 0 && !scores((m, "rmse")).isNaN)
      assert(scores((m, "r2")) <= 1.0 + 1e-9)
      assert(scores((m, "mape")) > 0)
    }
    // both models must beat the trivial mean-predictor (r2 > 0)
    assert(scores(("lm", "r2")) > 0, s"lm r2 = ${scores(("lm", "r2"))}")
    assert(scores(("rf", "r2")) > 0, s"rf r2 = ${scores(("rf", "r2"))}")
  }

  test("pca/lasso/stepAIC run on the per-complex table (R model breadth)") {
    // PCA: 3 components × 10 base features, decreasing explained var
    val pca = pcaOnComplex(spark, trainCsv)
    assert(pca.count() == 30)
    val ev = pca.select("component", "explained_variance").distinct()
      .orderBy("component").collect().map(_.getDouble(1))
    assert(ev.length == 3 && ev.forall(v => v > 0 && v <= 1))
    assert(ev(0) >= ev(1) && ev(1) >= ev(2))
    // LASSO-CV: picks a lambda from the grid, metrics finite
    val lasso = lassoCvOnComplex(spark, trainCsv)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(Set(0.01, 1.0, 100.0).contains(lasso("best_reg_param")))
    assert(lasso("r2") > 0 && lasso("rmse") > 0)
    // repeated CV (the declared trainControl): summary agrees with
    // the per-repeat RMSEs at the emitted rounding grain
    val rcv = repeatedCvOnComplex(spark, trainCsv)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rmses = (1 to 3).map(r => rcv(s"repeat_${r}_cv_rmse"))
    assert(rmses.forall(v => v > 0 && !v.isNaN))
    assert(math.abs(rcv("cv_rmse_mean") - rmses.sum / 3) < 1e-5)
    // stepwise AIC: monotone improvement, never eliminates every feature
    val steps = stepAicOnComplex(spark, trainCsv).collect()
    val aics = steps.map(_.getDouble(2))
    assert(aics.length >= 1 && aics.zip(aics.tail).forall { case (a, b) => b < a })
    assert(steps.forall(_.getString(1).nonEmpty))
  }

  test("knn impute (R:820-829's commented path): matches a brute-force " +
      "recomputation for every unpriced complex") {
    val cleaned = clean(loadTrain(spark, trainCsv))
    // the pre-impute frame the operator runs on, collected (423 rows)
    val base = perComplex(cleaned)
      .join(broadcast(totalArea(cleaned)), Seq("단지코드"))
      .join(broadcast(weightedRentRaw(cleaned)), Seq("단지코드"))
      .select(col("단지코드"), col("총세대수").cast("double"),
        col("공가수"), col("단지내주차면수"), col("총면적"),
        col("임대보증금"))
      .collect()
      .map(r => (r.getString(0), Array(r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    val complete = base.filter(_._3.isDefined)
    val missing = base.filter(_._3.isEmpty)
    assert(missing.nonEmpty && complete.length > 5,
      "fixture lost its unpriced complexes")
    // independent brute force: population sigma over complete rows,
    // standardized euclidean, (dist2, key) order, mean of 5
    val n = complete.length.toDouble
    val sds = (0 until 4).map { j =>
      val s = complete.map(_._2(j)).sum
      val ss = complete.map(v => v._2(j) * v._2(j)).sum
      math.sqrt((ss - s * s / n) / n)
    }
    val want = missing.map { case (key, f, _) =>
      val nn = complete.map { case (ck, cf, cb) =>
        val d = (0 until 4).map { j =>
          val z = (f(j) - cf(j)) / sds(j); z * z
        }.sum
        (d, ck, cb.get)
      }.sortBy(t => (t._1, t._2)).take(5)
      key -> nn.map(_._3).sum / 5.0
    }.toMap
    val got = knnImputeRentsOnComplex(spark, trainCsv).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) <= 1e-6 * math.max(1.0, want(k)),
        s"$k: got $v want ${want(k)}")
    }
    // imputed values live inside the observed price range
    val (lo, hi) = (complete.map(_._3.get).min, complete.map(_._3.get).max)
    got.values.foreach(v => assert(v >= lo && v <= hi))
  }

  test("mice impute (the other commented reference path): chained " +
      "2-column rent imputation converges, deltas shrink per sweep") {
    val cleaned = clean(loadTrain(spark, trainCsv))
    val base = perComplex(cleaned)
      .join(broadcast(totalArea(cleaned)), Seq("단지코드"))
      .join(broadcast(weightedRentRaw(cleaned)), Seq("단지코드"))
      .select(col("단지코드"), col("총세대수").cast("double").as("총세대수"),
        col("총면적"), col("임대보증금"), col("임대료"))
    def imputed(sw: Int): Map[String, (Double, Double)] =
      graft.ml.MiceImpute.miceOf(base, Seq("임대보증금", "임대료"),
        Seq("총세대수", "총면적"), sweeps = sw)
        .filter(col("miss_임대보증금") || col("miss_임대료"))
        .select("단지코드", "임대보증금", "임대료")
        .collect()
        .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
        .toMap
    val (i1, i2, i3) = (imputed(1), imputed(2), imputed(3))
    assert(i1.nonEmpty && i1.keySet == i2.keySet && i2.keySet == i3.keySet)
    i3.values.foreach { case (a, b) =>
      assert(!a.isNaN && !a.isInfinite && !b.isNaN && !b.isInfinite)
    }
    // the chained fixpoint iteration contracts: sweep-over-sweep
    // movement of the imputed cells shrinks
    def delta(a: Map[String, (Double, Double)],
        b: Map[String, (Double, Double)]): Double =
      a.keys.map { k =>
        math.max(math.abs(a(k)._1 - b(k)._1), math.abs(a(k)._2 - b(k)._2))
      }.max
    val (d12, d23) = (delta(i1, i2), delta(i2, i3))
    assert(d23 <= d12 + 1e-9, s"deltas grew: $d12 -> $d23")
  }

  test("demographic join: 16-region broadcast adds shares, keeps grain") {
    val feats = featureTable(spark, trainCsv)
    val ag = loadAgeGender(spark, "/root/reference/age_gender_info.csv")
    assert(ag.count() == 16)
    val joined = withDemographics(feats, ag)
    assert(joined.count() == 423)
    assert(joined.columns.length == feats.columns.length + ag.columns.length - 1)
    // every region resolves — no lost rows, no null shares
    val shareCol = ag.columns.filterNot(_ == "지역").head
    assert(joined.filter(col(shareCol).isNull).count() == 0)
  }

  test("submission: test.csv scores into a (code, num) CSV, one row per complex") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sub").toString
    val sub = submission(spark, trainCsv, testCsv, Some(dir)).cache()
    assert(sub.count() == 150)
    assert(sub.columns.toSeq == Seq("code", "num"))
    assert(sub.select("code").distinct().count() == 150)
    assert(sub.filter(col("num").isNull || col("num") < 0).count() == 0)
    // codes match sample_submission.csv exactly
    val sample = spark.read.option("header", true)
      .csv("/root/reference/sample_submission.csv")
    assert(sub.select("code").exceptAll(sample.select("code")).count() == 0)
    assert(sample.select("code").exceptAll(sub.select("code")).count() == 0)
    // the sink round-trips
    val back = spark.read.option("header", true).csv(dir)
    assert(back.count() == 150)
  }

  test("s5 sweep on the real per-complex frame: the reference's 15-PNG " +
    "변수별_분포그림 artifact set, 090-band absence included") {
    import graft.sources.PlotSink
    // tr_uniq_df at the plotting point (R:363 follows the R:272 area
    // join and the R:315 band join; rents join later) = perComplex +
    // totalArea + areaBandPivot, transit NAs still in place — hist()
    // drops NAs, which plotColumns now mirrors (ADVICE r10)
    val uniq = perComplex(train)
      .join(totalArea(train), Seq("단지코드"))
      .join(areaBandPivot(train), Seq("단지코드"))
      .cache()
    // cols_num (R:328–334): numeric columns minus the label
    // 등록차량수; the reference's DATA-DRIVEN pivot has no 090 column
    // at all, so its artifact dir holds exactly these 15 PNGs
    val refCols = Seq("총세대수", "공가수", "지하철역수", "버스정류장수",
      "단지내주차면수") ++
      Seq(10, 20, 30, 40, 50, 60, 70, 80, 100)
        .map(b => f"전용면적_$b%03d") ++ Seq("총면적")
    assert(refCols.size == 15)
    val refPngs = new java.io.File("/root/reference/변수별_분포그림")
      .listFiles().map(_.getName).toSet
    assert(refPngs == refCols.map(c => s"training_$c.png").toSet,
      s"reference artifact set drifted: $refPngs")
    assert(!refPngs.contains("training_전용면적_090.png"))
    // the sweep: one histogram + one boxplot PNG per reference column
    val dir = java.nio.file.Files
      .createTempDirectory("graft_parking_plots").toString
    val paths = PlotSink.plotColumns(spark, uniq, refCols, dir)
    assert(paths.size == 30)
    assert(paths.forall(p => new java.io.File(p).length > 0))
    // decode-back geometry on one column (the SourcesSessionSpec
    // gate, here on the real frame): 총세대수 boxplot feature x's
    val st = uniq.agg(
      min(col("총세대수")).cast("double"),
      expr("percentile(`총세대수`, array(0.25, 0.5, 0.75))"),
      max(col("총세대수")).cast("double")).head()
    val (mn, mx) = (st.getDouble(0), st.getDouble(2))
    val qs = st.getSeq[Double](1)
    def px(v: Double): Int = PlotSink.Margin +
      math.floor((v - mn) / (mx - mn) * (PlotSink.TrackW - 1) + 0.5).toInt
    val (boxCols, med) = PlotSink.measureBox(s"$dir/총세대수_box.png")
    assert(med == px(qs(1)), s"median tick at $med, expected ${px(qs(1))}")
    assert(boxCols.contains(px(qs(0))) && boxCols.contains(px(qs(2))))
    // transit NAs really were dropped, not bucketed: the subway
    // histogram's bars sum to the 423 − 211 observed complexes
    val subwayNulls = uniq.filter(col("지하철역수").isNull).count()
    assert(subwayNulls > 0, "fixture drift: expected transit NAs")
    val subwayBars = PlotSink.measureBars(s"$dir/지하철역수_hist.png", 12)
    val sObs = uniq.filter(col("지하철역수").isNotNull)
    val sSt = sObs.agg(min(col("지하철역수")).cast("double"),
      max(col("지하철역수")).cast("double")).head()
    val (smn, smx) = (sSt.getDouble(0), sSt.getDouble(1))
    val sspan = if (smx > smn) smx - smn else 1.0
    val expBars = sObs.groupBy(
        least(floor((col("지하철역수") - smn) / sspan * 12), lit(11))
          .cast("int").as("b"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sMaxN = expBars.values.max
    assert(subwayBars ==
      expBars.map { case (b, n) => b -> PlotSink.barPx(n, sMaxN) },
      "decoded subway bars must equal the null-dropped histogram")
    // our PINNED schema keeps 090 as an all-zero column — the same
    // absence the reference renders by having no PNG: all mass in
    // bucket 0, one full-height bar, every other slot empty
    val p090 = PlotSink.plotColumns(spark, uniq, Seq("전용면적_090"), dir)
    assert(p090.size == 2)
    val bars090 = PlotSink.measureBars(s"$dir/전용면적_090_hist.png", 12)
    assert(bars090 == Map(0 -> PlotSink.BarH),
      s"090 band must render as the degenerate all-zero bar: $bars090")
    uniq.unpersist()
  }

  test("stratified split is key-derived ~80/20, disjoint, no sort") {
    val feats = featureTable(spark, trainCsv)
    val (tr, te) = stratifiedSplit(feats)
    val (nTr, nTe) = (tr.count(), te.count())
    assert(nTr + nTe == 423)
    assert(tr.join(te, Seq("단지코드"), "inner").count() == 0)
    // overall share concentrates near 80% (hash-uniform over 423 keys)
    val frac = nTr.toDouble / 423
    assert(frac > 0.72 && frac < 0.88, s"train fraction $frac")
    // deterministic: same membership on re-evaluation
    val (tr2, _) = stratifiedSplit(feats)
    assert(tr.select("단지코드").exceptAll(tr2.select("단지코드")).count() == 0)
    // scale contract: membership is a filter, not a window sort
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    assert(tr.queryExecution.optimizedPlan
      .collect { case w: LWindow => w }.isEmpty, "Window in split plan")
  }
}
