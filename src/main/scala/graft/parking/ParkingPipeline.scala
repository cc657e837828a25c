package graft.parking

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference pipeline itself (SURVEY §3 entry points A/B/C),
  * re-expressed end-to-end on the actual parking-competition CSVs at
  * /root/reference (read-only). This is the fidelity layer: every
  * stage cites the R lines it reproduces; ParkingSpec pins the
  * goldens (423 complexes, sentinel counts, the missing 090 band).
  *
  * Deliberate divergences from the reference (SURVEY §5: "replicate
  * capabilities, not bugs"): fixed pivot band lists (the reference's
  * data-dependent pivot silently drops empty bands); apartment model
  * fits apartment data (the reference fits shop data via the
  * `apt_df <- method1_shop_df` copy-paste at R:1036); the stratified
  * split is key-derived, not RNG-seeded (deterministic cross-engine).
  */
object ParkingPipeline {

  /** Explicit schema (FIXTURES.md §A): rents stay STRING at read —
    * they carry ""/"-" sentinels (R:114–129) — and are cleaned by the
    * dirty-cast stage, never by inference. */
  private val trainSchema = StructType(Seq(
    StructField("단지코드", StringType),
    StructField("총세대수", IntegerType),
    StructField("임대건물구분", StringType),
    StructField("지역", StringType),
    StructField("공급유형", StringType),
    StructField("전용면적", DoubleType),
    StructField("전용면적별세대수", IntegerType),
    StructField("공가수", DoubleType),
    StructField("자격유형", StringType),
    StructField("임대보증금", StringType),
    StructField("임대료", StringType),
    StructField("도보 10분거리 내 지하철역 수(환승노선 수 반영)", DoubleType),
    StructField("도보 10분거리 내 버스정류장 수", DoubleType),
    StructField("단지내주차면수", DoubleType),
    StructField("등록차량수", DoubleType)))

  private def testSchema =
    StructType(trainSchema.fields.dropRight(1))

  /** S1 — CSV scan with header + UTF-8 (R:84–97). */
  def loadTrain(s: SparkSession, path: String): DataFrame =
    s.read.option("header", true).option("encoding", "UTF-8")
      .schema(trainSchema).csv(path)

  def loadTest(s: SparkSession, path: String): DataFrame =
    s.read.option("header", true).option("encoding", "UTF-8")
      .schema(testSchema).csv(path)

  /** C1 + C9 — sentinel→NULL rent cast (R:122–129) and long→short
    * transit renames (R:133–139). */
  def clean(df: DataFrame): DataFrame = {
    def dirty(c: String) =
      when(col(c).isin("", "-"), lit(null)).otherwise(col(c))
        .cast("double").as(c)
    df.withColumn("임대보증금", dirty("임대보증금"))
      .withColumn("임대료", dirty("임대료"))
      .withColumnRenamed("도보 10분거리 내 지하철역 수(환승노선 수 반영)",
        "지하철역수")
      .withColumnRenamed("도보 10분거리 내 버스정류장 수", "버스정류장수")
  }

  /** G4 — data-driven discovery of complex-level columns (R:174–191):
    * a column is complex-level iff the sum over complexes of its
    * per-complex distinct-non-NA count is ≤ #complexes. Driver-side
    * metadata: one 1-row aggregate, collected. */
  def complexLevelColumns(df: DataFrame, key: String): Seq[String] = {
    val others = df.columns.filterNot(_ == key)
    val perGroup = df.groupBy(key)
      .agg(countDistinct(col(others.head)).as(others.head),
        others.tail.map(c => countDistinct(col(c)).as(c)).toSeq: _*)
    val sums = perGroup
      .agg(sum(col(others.head)).as(others.head),
        others.tail.map(c => sum(col(c)).as(c)).toSeq: _*)
      .head()
    val nKeys = df.select(key).distinct().count()
    key +: others.filter(c => sums.getAs[Long](c) <= nKeys).toSeq
  }

  /** P1 + G5 — per-complex dimension table (R:194–196): project the
    * complex-level columns, dedup to one row per complex. */
  def perComplex(df: DataFrame): DataFrame = {
    val cols = complexLevelColumns(df, "단지코드")
    df.select(cols.map(col): _*).dropDuplicates("단지코드")
  }

  /** C3 + G1 — total residential area per complex (R:264–272):
    * Σ 전용면적 × 전용면적별세대수. */
  def totalArea(df: DataFrame): DataFrame =
    df.groupBy("단지코드")
      .agg(sum(col("전용면적") * col("전용면적별세대수")).as("총면적"))

  /** Fixed band list 10..100 — pinned, unlike the reference's
    * data-dependent pivot (R:290–312), so train and test always share
    * a schema; the empty 090 band becomes an all-zero column. */
  val bands: Seq[Int] = (1 to 10).map(_ * 10)

  /** C4 + V1 — area-band household histogram (R:290–315): R's
    * `round(전용면적, -1)` is half-to-EVEN → `bround`; clamp [10,100]
    * (R:292–296 `pmax/pmin`); pivot with zero-fill and `str_pad`-style
    * column names (R:306). */
  def areaBandPivot(df: DataFrame): DataFrame = {
    val band = least(greatest(bround(col("전용면적"), -1), lit(10.0)),
      lit(100.0)).cast("int")
    val pivoted = df.withColumn("band", band)
      .groupBy("단지코드").pivot("band", bands)
      .sum("전용면적별세대수")
      .na.fill(0, bands.map(_.toString))
    bands.foldLeft(pivoted) { (d, b) =>
      d.withColumnRenamed(b.toString, f"전용면적_$b%03d")
    }
  }

  /** V2 variant — the same pivot restricted to one building type
    * (R:856–877 `split()` + per-group pivot ≡ filtered pivot). */
  def areaBandPivotFor(df: DataFrame, buildingType: String): DataFrame =
    areaBandPivot(df.filter(col("임대건물구분") === buildingType))

  /** G9 — per-complex household-weighted mean rent with all-NULL
    * groups kept NULL (R:922–940: the `group_split`+`map_df` loop as
    * ONE hash aggregate) — the pre-impute frame both imputers
    * ([[weightedRent]] median, [[knnImputeRentsOnComplex]] k-NN)
    * start from. */
  def weightedRentRaw(df: DataFrame): DataFrame = {
    def weighted(c: String) =
      (sum(when(col(c).isNotNull, col(c) * col("전용면적별세대수")))
        / sum(when(col(c).isNotNull, col("전용면적별세대수")))).as(c)
    df.groupBy("단지코드")
      .agg(weighted("임대보증금"), weighted("임대료"))
  }

  /** C6 — [[weightedRentRaw]] + exact-median imputation (R:941–943,
    * the ACTIVE imputation path of the reference). */
  def weightedRent(df: DataFrame): DataFrame = {
    val perComplexRent = weightedRentRaw(df)
    val meds = perComplexRent.agg(
      expr("percentile(`임대보증금`, 0.5)"),
      expr("percentile(`임대료`, 0.5)")).head()
    perComplexRent
      .withColumn("임대보증금",
        coalesce(col("임대보증금"), lit(meds.getDouble(0))))
      .withColumn("임대료", coalesce(col("임대료"), lit(meds.getDouble(1))))
  }

  /** The COMMENTED-OUT reference imputation (R:820–829
    * `knnImputation`, packages loaded at R:56–60 but never called),
    * made runnable: complexes whose weighted 임대보증금 is NULL (no
    * priced unit at all) take the mean over their 5 nearest
    * fully-priced complexes in (총세대수, 공가수, 단지내주차면수,
    * 총면적) space — the always-present per-complex numerics —
    * through the shared [[graft.ml.KnnImpute]] kernel (broadcast
    * scored join + TopKPerKey + keyed mean). Returns (단지코드,
    * imputed 임대보증금); ParkingSpec pins the full output against a
    * driver-side brute-force recomputation. */
  def knnImputeRentsOnComplex(s: SparkSession, path: String): DataFrame = {
    val cleaned = clean(loadTrain(s, path))
    val base = perComplex(cleaned)
      .join(broadcast(totalArea(cleaned)), Seq("단지코드"))
      .join(broadcast(weightedRentRaw(cleaned)), Seq("단지코드"))
      .select(col("단지코드"), col("총세대수").cast("double").as("총세대수"),
        col("공가수"), col("단지내주차면수"), col("총면적"),
        col("임대보증금"))
    graft.ml.KnnImpute.imputeOf(base, "단지코드",
      Seq("총세대수", "공가수", "단지내주차면수", "총면적"),
      "임대보증금", k = 5)
      .select(col("q_key").as("단지코드"),
        col("imputed").as("임대보증금_knn"))
  }

  /** Entry point A+B (SURVEY §3.1–3.2): the full per-complex feature
    * table — dedup → enrich (area, bands, rents) → impute transit
    * NAs (C5, R:350–358) → derived ratios (C3, R:421–424). One lazy
    * DAG; every join is a broadcast (423-row dimension side).
    * `featureTableOf` takes an already-cleaned frame so the SAME
    * enrichment runs on train.csv and (label-less) test.csv — the
    * submission path needs both under one schema. */
  def featureTableOf(cleaned0: DataFrame): DataFrame = {
    val cleaned = cleaned0.cache()
    val dim = perComplex(cleaned)
    val enriched = dim
      .join(broadcast(totalArea(cleaned)), Seq("단지코드"))
      .join(broadcast(areaBandPivot(cleaned)), Seq("단지코드"))
      .join(broadcast(weightedRent(cleaned)), Seq("단지코드"))
      .na.fill(0.0, Seq("지하철역수", "버스정류장수"))
    enriched
      .withColumn("세대당주차면수", col("단지내주차면수") / col("총세대수"))
      .withColumn("대중교통수", col("지하철역수") + col("버스정류장수"))
  }

  def featureTable(s: SparkSession, path: String): DataFrame =
    featureTableOf(clean(loadTrain(s, path)))

  /** Demographic enrichment (R:1040–1044, the commented-out
    * `merge(x=apt_df, y=age_gender, by="지역")`): age_gender_info.csv
    * is a 16-region × 22-share dimension — the canonical tiny
    * broadcast join; the fact side never shuffles. */
  def loadAgeGender(s: SparkSession, path: String): DataFrame =
    s.read.option("header", true).option("encoding", "UTF-8")
      .option("inferSchema", true).csv(path)

  def withDemographics(features: DataFrame, ageGender: DataFrame): DataFrame =
    features.join(broadcast(ageGender), Seq("지역"), "left")

  /** Entry point C (SURVEY §3.3, R:1176–1315): fit OLS and a seeded
    * random forest on the per-complex feature table predicting
    * 등록차량수, score RMSE / R² / MAPE on the held-out 20%.
    * (The reference's own numbers describe a buggy run — its
    * "apartment" model was fit on shop data, R:1036 — so these are
    * capability parity, not bit targets; BASELINE.md caveats.) */
  def fitAndScore(s: SparkSession, path: String): DataFrame = {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.evaluation.RegressionEvaluator
    import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer, VectorAssembler}
    import org.apache.spark.ml.regression.{LinearRegression, RandomForestRegressor}
    val feats = featureTable(s, path)
      .withColumnRenamed("등록차량수", "label")
    val (train, test) = stratifiedSplit(feats)
    val prep: Array[org.apache.spark.ml.PipelineStage] = Array(
      new StringIndexer().setInputCol("지역").setOutputCol("region_idx")
        .setStringOrderType("alphabetAsc").setHandleInvalid("keep"),
      new OneHotEncoder().setInputCol("region_idx")
        .setOutputCol("region_oh").setDropLast(true),
      new VectorAssembler().setInputCols(numCols :+ "region_oh")
        .setOutputCol("features"))
    val ev = new RegressionEvaluator().setLabelCol("label")
      .setPredictionCol("prediction")
    def score(model: org.apache.spark.ml.PipelineModel,
        name: String): Seq[(String, String, Double)] = {
      val pred = model.transform(test)
      val mape = pred.filter(col("label") =!= 0.0)
        .agg(avg(abs((col("label") - col("prediction")) / col("label"))))
        .head().getDouble(0)
      Seq((name, "rmse", ev.setMetricName("rmse").evaluate(pred)),
        (name, "r2", ev.setMetricName("r2").evaluate(pred)),
        (name, "mape", mape))
    }
    val lm = new Pipeline().setStages(prep :+
      new LinearRegression().setLabelCol("label")
        .setFeaturesCol("features").setSolver("normal")).fit(train)
    val rf = new Pipeline().setStages(prep :+
      new RandomForestRegressor().setLabelCol("label")
        .setFeaturesCol("features").setNumTrees(50).setSeed(4)).fit(train)
    import s.implicits._
    (score(lm, "lm") ++ score(rf, "rf"))
      .toDF("model", "metric", "value")
  }

  /** Numeric feature list shared by the model entry points. */
  private[parking] val numCols: Array[String] =
    Array("총세대수", "공가수", "지하철역수", "버스정류장수",
      "단지내주차면수", "총면적", "임대보증금", "임대료",
      "세대당주차면수", "대중교통수") ++
      bands.map(b => f"전용면적_$b%03d")

  /** The 10 base (non-band) features — the stepwise/PCA surface the
    * reference explores (R:537–570, R:632–634 work on the compact
    * per-complex frame, not the band histogram). */
  private[parking] val baseCols: Array[String] = numCols.take(10)

  /** M1 on the parking table (R:537–570: `prcomp(scale=TRUE)` on the
    * per-complex frame). */
  def pcaOnComplex(s: SparkSession, path: String): DataFrame =
    graft.ml.Models.pcaOf(s, featureTable(s, path), baseCols)

  /** M4 on the parking table (R:1247–1254: `cv.glmnet(alpha=1)`
    * over the apartment frame). */
  def lassoCvOnComplex(s: SparkSession, path: String): DataFrame =
    graft.ml.Models.lassoCvOf(s,
      featureTable(s, path).withColumnRenamed("등록차량수", "label"),
      numCols)

  /** M10 on the parking table — the REPEATED 5-fold control the
    * reference declares at R:1085–1088 (`trainControl(method=
    * "repeatedcv", number=5)`), run on the frame it was declared
    * for. */
  def repeatedCvOnComplex(s: SparkSession, path: String): DataFrame =
    graft.ml.Models.repeatedCvOf(s,
      featureTable(s, path).withColumnRenamed("등록차량수", "label"),
      numCols, repeats = 3)

  /** M6 on the parking table (R:632–634: `MASS::stepAIC` backward
    * elimination over the per-complex regression). */
  def stepAicOnComplex(s: SparkSession, path: String): DataFrame =
    graft.ml.Models.stepwiseAicOf(s,
      featureTable(s, path).withColumnRenamed("등록차량수", "label"),
      baseCols)

  /** The competition artifact (R:1005–1016 / sample_submission.csv
    * shape): fit on the FULL training table, build the same feature
    * table from label-less test.csv, predict per complex, and write
    * a (code, num) CSV via the S3 sink. Returns the submission frame
    * (150 rows on the reference data). */
  def submission(s: SparkSession, trainPath: String, testPath: String,
      outDir: Option[String] = None): DataFrame = {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer, VectorAssembler}
    import org.apache.spark.ml.regression.RandomForestRegressor
    val train = featureTable(s, trainPath)
      .withColumnRenamed("등록차량수", "label")
    val test = featureTableOf(clean(loadTest(s, testPath)))
    val prep: Array[org.apache.spark.ml.PipelineStage] = Array(
      new StringIndexer().setInputCol("지역").setOutputCol("region_idx")
        .setStringOrderType("alphabetAsc").setHandleInvalid("keep"),
      new OneHotEncoder().setInputCol("region_idx")
        .setOutputCol("region_oh").setDropLast(true),
      new VectorAssembler().setInputCols(numCols :+ "region_oh")
        .setOutputCol("features").setHandleInvalid("keep"))
    val rf = new Pipeline().setStages(prep :+
      new RandomForestRegressor().setLabelCol("label")
        .setFeaturesCol("features").setNumTrees(50).setSeed(4)).fit(train)
    val sub = rf.transform(test)
      .select(col("단지코드").as("code"), col("prediction").as("num"))
      .orderBy("code")
    outDir.foreach(dir => graft.sources.CsvIO.writeCsv(sub, dir))
    sub
  }

  /** O3 — deterministic 80/20 split (R:962–992's seeded stratified
    * split), KEY-DERIVED per SURVEY §7.1: membership is
    * `pmod(xxhash64(단지코드), 5) < 4`, a pure scan-level filter — no
    * RNG, no per-stratum window sort (the earlier rank-within-region
    * form sorted each of ~16 regions in a single task; at 100× that
    * is a straggler by construction). The hash decorrelates the
    * decision from the code's lexicographic structure, so each
    * region's train share concentrates near 80% without any exact
    * per-stratum guarantee — the scale-correct trade. */
  def stratifiedSplit(features: DataFrame): (DataFrame, DataFrame) = {
    val inTrain = pmod(xxhash64(col("단지코드")), lit(5)) < 4
    (features.filter(inTrain), features.filter(!inTrain))
  }
}
