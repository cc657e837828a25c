package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType
import graft.Tables

/** Projection / filter / scalar-expression operators (SURVEY.md §2.2).
  *
  * Each op re-expresses a reference semantic (cited `R:NNN` into
  * /root/reference/20210803_이승하.R) on the testdata star schema.
  * All are single-pass narrow plans: projections and predicates stay
  * inside WholeStageCodegen and push down to the parquet scan, so at
  * 100 TB these are scan-bound with no shuffle at all.
  */
object Relational {

  /** S1 — catalog scan: row count per table (R:72, R:78–97 glob→catalog).
    * Driver-side union of tiny 1-row aggregates; each count is a
    * scan-only job that reads zero columns (parquet footer count). */
  def s1ScanCatalog(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.names.map { n =>
      Tables.load(s, dir, n).agg(count(lit(1)).as("n_rows"))
        .select(lit(n).as("table_name"), col("n_rows"))
    }
    counts.reduce(_.unionByName(_))
  }

  /** P1 — named projection (R:183, R:195: `select(all_of(cols))`). */
  def p1Project(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select("c_custkey", "c_name", "c_acctbal")

  /** P2 — lexicographically sorted column order after reshape (R:312, R:876). */
  def p2ProjectSorted(s: SparkSession, dir: String): DataFrame = {
    val df = Tables.lineitem(s, dir).filter(col("l_linenumber") === 1)
    df.select(df.columns.sorted.map(col).toSeq: _*)
  }

  /** P3 — predicate-typed projection: numeric columns only, data-driven
    * from the schema (R:328–338 `select(where(is.numeric))`). The column
    * list is driver-side metadata — no extra job. */
  def p3ProjectTyped(s: SparkSession, dir: String): DataFrame = {
    val df = Tables.lineitem(s, dir)
    val numCols = df.schema.fields
      .filter(_.dataType.isInstanceOf[NumericType]).map(_.name).sorted
    df.filter(col("l_orderkey") % 100 === 0)
      .select(numCols.map(col).toSeq: _*)
  }

  /** F1 — equality filter (R:171, R:902: `filter(임대건물구분 == "상가")`). */
  def f1FilterEq(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")

  /** F2 — membership filter (R:451–463 16-way `subset` ≡ one isin). */
  def f2FilterIn(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select("c_custkey", "c_name", "c_mktsegment")

  /** F3 — null-predicate filter (R:350–351 `filter(is.na(지하철역수))`).
    * Testdata has no physical NULLs, so nulls are synthesized with the
    * C1 sentinel rule first (qty==1 → NULL), then filtered. */
  def f3FilterNull(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .withColumn("qty_or_null",
        when(col("l_quantity") === 1.0, lit(null)).otherwise(col("l_quantity")))
      .filter(col("qty_or_null").isNull)
      .select("l_orderkey", "l_linenumber", "l_quantity")

  /** F4 — count filter after aggregation (R:237 `Freq > 0`): groups
    * larger than the mean group size — scale-free, so the filter is
    * non-trivial at every sf. The 1-row mean is a broadcast scalar. */
  def f4FilterHaving(s: SparkSession, dir: String): DataFrame = {
    val total = Tables.orders(s, dir).count()
    Tables.orders(s, dir)
      .groupBy("o_orderpriority", "o_orderstatus").count()
      .filter(col("count") > total / 15.0)
  }

  /** C1 — sentinel→NULL dirty numeric cast (R:114–129: `""`/`"-"` → NA →
    * double). Testdata carries no dirty strings, so the dirty column is
    * derived deterministically from the key, then cleaned exactly as the
    * reference does: sentinel → NULL, else cast to double. */
  def c1DirtyCast(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("dirty",
        when(col("o_orderkey") % 7 === 0, lit(""))
          .when(col("o_orderkey") % 11 === 0, lit("-"))
          .otherwise(col("o_orderkey").cast("string")))
      .withColumn("parsed",
        when(col("dirty").isin("", "-"), lit(null))
          .otherwise(col("dirty")).cast("double"))
      .select("o_orderkey", "dirty", "parsed")

  /** C2 — conditional bucketing chain (R:431–434: bus stops → {0..4}). */
  def c2Bucket(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .withColumn("qty_bucket",
        when(col("l_quantity") < 10, 0)
          .when(col("l_quantity") < 20, 1)
          .when(col("l_quantity") < 30, 2)
          .when(col("l_quantity") < 40, 3)
          .otherwise(4))
      .select("l_orderkey", "l_linenumber", "l_quantity", "qty_bucket")

  /** C3 — arithmetic derivation (R:421, R:424: per-household ratios). */
  def c3Arith(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        Det.r2(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("revenue"),
        Det.r2(col("l_extendedprice") / col("l_quantity")).as("unit_price"))

  /** C4 — negative-digit rounding + clamping (R:292–296:
    * `round(전용면적, -1)` then `pmin(·,100)`/`pmax(·,10)`).
    * NOTE on rounding modes (SURVEY §7.2): R rounds half-to-even, Spark
    * `round` is half-up, DuckDB half-away-from-zero. For non-negative
    * inputs half-up == half-away, so `round` is used here for oracle
    * parity; `bround` is the half-even variant when R parity matters. */
  def c4RoundClamp(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        round(col("l_quantity"), -1).as("qty_tens"),
        least(greatest(round(col("l_quantity"), -1), lit(10.0)), lit(40.0))
          .as("qty_band"))

  /** C5 — constant null-fill (R:352, R:358: NA→0 on transit counts). */
  def c5NullFill(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .withColumn("qty_or_null",
        when(col("l_quantity") === 1.0, lit(null).cast("double"))
          .otherwise(col("l_quantity")))
      .na.fill(0.0, Seq("qty_or_null"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("qty_or_null").as("qty_filled"))

  /** C6 — column-median null imputation (R:941–943). Exact
    * `percentile(x, 0.5)` (interpolating, matches DuckDB `median`) —
    * the approx variant (`approx_percentile`) is the 100 TB path but
    * breaks oracle exactness, so the exact aggregate is used here.
    * Two jobs: a 1-row median agg broadcast into a scan-wide coalesce. */
  def c6MedianImpute(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .withColumn("qty_or_null",
        when(col("l_quantity") >= 49.0, lit(null).cast("double"))
          .otherwise(col("l_quantity")))
    val med = li.agg(expr("percentile(qty_or_null, 0.5)")).head().getDouble(0)
    li.select(col("l_orderkey"), col("l_linenumber"),
      Det.r1(coalesce(col("qty_or_null"), lit(med))).as("qty_imputed"))
  }

  /** C7 — membership tag (R:994–1000: training/test label). At scale the
    * isin-list becomes a broadcast join; here the rule is key-derived and
    * fully deterministic. */
  def c7Tag(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        when(col("o_custkey") % 5 < 4, "training").otherwise("test")
          .as("tr_te"))

  /** C8 — log transform (R:1061–1064: `log(등록차량수)` = natural log). */
  def c8Log(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        Det.r6(log(col("o_totalprice"))).as("log_price"))

  /** C9 — string padding / glue / rename (R:306: `str_pad` + glue
    * `전용면적_{...}`; R:81 filename-stem `word`). */
  def c9Strings(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        concat(lit("sz_"), lpad(col("p_size").cast("string"), 3, "0"))
          .as("size_tag"),
        split(col("p_type"), " ").getItem(0).as("type_stem"))

  /** C10 — the date/time scalar inventory (SURVEY §2.8's temporal
    * functions, exercised in one gated query): calendar parts,
    * month truncation, calendar-aware month addition (both engines
    * clamp Jan 31 + 3m to Apr 30), and last-day. The one convention
    * gap is day-of-week — Spark numbers Sunday=1, DuckDB Sunday=0 —
    * normalized here rather than hidden in the oracle. */
  def c10Datetime(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      quarter(col("o_orderdate")).as("q"),
      month(col("o_orderdate")).as("m"),
      (dayofweek(col("o_orderdate")) - 1).as("dow"),
      trunc(col("o_orderdate"), "month").as("month_start"),
      add_months(col("o_orderdate"), 3).as("plus3m"),
      last_day(col("o_orderdate")).as("eom"))

  /** C11 — the array/list scalar inventory (SURVEY §2.8): size,
    * slice, sort, membership, negative indexing, distinct — the
    * collection half of the function surface, gated in one query.
    * Array-valued OUTPUTS are deliberately flattened to strings/ints
    * (array_join / size): the hash gate stringifies engine-side, and
    * list renderings differ even when the values match. */
  def c11Arrays(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(toks).cast("bigint").as("n_tokens"),
      array_join(array_sort(slice(toks, 1, 3)), "-").as("first3_sorted"),
      array_contains(toks, "scan").cast("int").as("has_scan"),
      element_at(toks, -1).as("last_token"),
      size(array_distinct(toks)).cast("bigint").as("n_distinct"))
  }

  /** C12 — semi-structured JSON extraction (the events table's
    * `props` payload): pull a typed field out of a JSON string column
    * and aggregate it — the op every lake runs on event payloads
    * before they earn real columns. `get_json_object` evaluates
    * per-row with no schema inference pass; at 100 TB the follow-up
    * move is materializing hot fields into real columns (schema
    * evolution via readParquetMerged) so the scan prunes instead of
    * parsing. k is integral, so sums are exact and avg rounds
    * deterministically. */
  def c12Json(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        Det.r4(avg("k")).as("avg_k"))

  /** C13 — the conditional / null-handling scalar inventory (SURVEY
    * §2.8's remaining slice, one gated query): NULLIF (sentinel →
    * NULL, the inverse of C5's fill), NVL2-style three-way branch,
    * multi-arm coalesce, null-aware least/greatest (both engines skip
    * NULLs rather than propagate), and the boolean aggregates
    * bool_and/bool_or (dialect-shared names). All outcomes are exact
    * integers/booleans — no rounding concerns. */
  def c13Conditionals(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_acctbal"), col("c_mktsegment"),
        nullif(col("c_custkey") % 7, lit(0)).as("mod7_or_null"),
        coalesce(nullif(col("c_custkey") % 3, lit(0)),
          nullif(col("c_custkey") % 5, lit(0)), lit(-1)).as("first_rem"),
        least(col("c_custkey") % 11, col("c_custkey") % 13)
          .as("min_rem"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(when(col("mod7_or_null").isNull, 1).otherwise(0))
          .as("n_sevens"),
        sum(when(col("c_acctbal") > 0, 1).otherwise(0)).as("n_solvent"),
        sum("first_rem").as("sum_first_rem"),
        max("min_rem").as("max_min_rem"),
        expr("bool_and(c_acctbal > -1000.0)").as("all_above_floor"),
        expr("bool_or(c_acctbal < 0.0)").as("any_overdrawn"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_scan_catalog" -> s1ScanCatalog,
    "c10_datetime" -> c10Datetime,
    "c13_conditionals" -> c13Conditionals,
    "c11_arrays" -> c11Arrays,
    "c12_json" -> c12Json,
    "p1_project" -> p1Project,
    "p2_project_sorted" -> p2ProjectSorted,
    "p3_project_typed" -> p3ProjectTyped,
    "f1_filter_eq" -> f1FilterEq,
    "f2_filter_in" -> f2FilterIn,
    "f3_filter_null" -> f3FilterNull,
    "f4_filter_having" -> f4FilterHaving,
    "c1_dirty_cast" -> c1DirtyCast,
    "c2_bucket" -> c2Bucket,
    "c3_arith" -> c3Arith,
    "c4_round_clamp" -> c4RoundClamp,
    "c5_null_fill" -> c5NullFill,
    "c6_median_impute" -> c6MedianImpute,
    "c7_tag" -> c7Tag,
    "c8_log" -> c8Log,
    "c9_strings" -> c9Strings)

  val oracle: Map[String, String] = Map(
    "s1_scan_catalog" ->
      Tables.names.map(n =>
        s"SELECT '$n' AS table_name, count(*) AS n_rows FROM $n")
        .mkString(" UNION ALL "),
    "c13_conditionals" ->
      """SELECT c_mktsegment, count(*) AS n,
         cast(sum(CASE WHEN nullif(c_custkey % 7, 0) IS NULL
                       THEN 1 ELSE 0 END) AS bigint) AS n_sevens,
         cast(sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END)
              AS bigint) AS n_solvent,
         cast(sum(coalesce(nullif(c_custkey % 3, 0),
                           nullif(c_custkey % 5, 0), -1))
              AS bigint) AS sum_first_rem,
         cast(max(least(c_custkey % 11, c_custkey % 13))
              AS bigint) AS max_min_rem,
         bool_and(c_acctbal > -1000.0) AS all_above_floor,
         bool_or(c_acctbal < 0.0) AS any_overdrawn
         FROM customer GROUP BY 1""",
    "c12_json" -> {
      // json_valid guard: Spark's get_json_object yields NULL on a
      // malformed payload, but DuckDB's ->> raises — without the CASE
      // the gate diverges (pass vs crash) on exactly the dirty rows a
      // json-ish column exists to exercise
      val k = "CASE WHEN json_valid(props) THEN props->>'$.k' END"
      s"""SELECT event_type, count(*) AS n,
         cast(sum(cast($k AS bigint)) AS bigint) AS sum_k,
         ${Det.sql(s"avg(cast($k AS bigint))", 4)} AS avg_k
         FROM events GROUP BY 1"""
    },
    "c11_arrays" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
         SELECT doc_id,
           cast(len(toks) AS bigint) AS n_tokens,
           array_to_string(list_sort(toks[1:3]), '-') AS first3_sorted,
           cast(list_contains(toks, 'scan') AS int) AS has_scan,
           toks[-1] AS last_token,
           cast(len(list_distinct(toks)) AS bigint) AS n_distinct
         FROM t""",
    "c10_datetime" ->
      """SELECT o_orderkey,
         cast(year(o_orderdate) AS int) AS y,
         cast(quarter(o_orderdate) AS int) AS q,
         cast(month(o_orderdate) AS int) AS m,
         cast(dayofweek(o_orderdate) AS int) AS dow,
         cast(date_trunc('month', o_orderdate) AS date) AS month_start,
         cast(cast(o_orderdate AS date) + INTERVAL 3 MONTH AS date)
           AS plus3m,
         last_day(cast(o_orderdate AS date)) AS eom
         FROM orders""",
    "p1_project" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer",
    "p2_project_sorted" ->
      """SELECT l_discount, l_extendedprice, l_linenumber, l_linestatus,
         l_orderkey, l_partkey, l_quantity, l_returnflag, l_shipdate,
         l_suppkey, l_tax FROM lineitem WHERE l_linenumber = 1""",
    "p3_project_typed" ->
      """SELECT l_discount, l_extendedprice, l_linenumber, l_orderkey,
         l_partkey, l_quantity, l_suppkey, l_tax
         FROM lineitem WHERE l_orderkey % 100 = 0""",
    "f1_filter_eq" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F'""",
    "f2_filter_in" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')""",
    "f3_filter_null" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE (CASE WHEN l_quantity = 1.0 THEN NULL ELSE l_quantity END)
           IS NULL""",
    "f4_filter_having" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS count
         FROM orders GROUP BY 1, 2
         HAVING count(*) > (SELECT count(*) / 15.0 FROM orders)""",
    "c1_dirty_cast" ->
      """SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN ''
              WHEN o_orderkey % 11 = 0 THEN '-'
              ELSE cast(o_orderkey AS varchar) END AS dirty,
         cast(CASE WHEN (CASE WHEN o_orderkey % 7 = 0 THEN ''
                              WHEN o_orderkey % 11 = 0 THEN '-'
                              ELSE cast(o_orderkey AS varchar) END)
                        IN ('', '-') THEN NULL
              ELSE (CASE WHEN o_orderkey % 7 = 0 THEN ''
                         WHEN o_orderkey % 11 = 0 THEN '-'
                         ELSE cast(o_orderkey AS varchar) END) END
              AS double) AS parsed
         FROM orders""",
    "c2_bucket" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
         CASE WHEN l_quantity < 10 THEN 0 WHEN l_quantity < 20 THEN 1
              WHEN l_quantity < 30 THEN 2 WHEN l_quantity < 40 THEN 3
              ELSE 4 END AS qty_bucket
         FROM lineitem""",
    "c3_arith" ->
      s"""SELECT l_orderkey, l_linenumber,
         ${Det.sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 2)}
           AS revenue,
         ${Det.sql("l_extendedprice / l_quantity", 2)} AS unit_price
         FROM lineitem""",
    "c4_round_clamp" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
         round(l_quantity, -1) AS qty_tens,
         least(greatest(round(l_quantity, -1), 10.0), 40.0) AS qty_band
         FROM lineitem""",
    "c5_null_fill" ->
      """SELECT l_orderkey, l_linenumber,
         coalesce(CASE WHEN l_quantity = 1.0 THEN NULL ELSE l_quantity END,
                  0.0) AS qty_filled
         FROM lineitem""",
    "c6_median_impute" ->
      s"""WITH x AS (SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity >= 49.0 THEN NULL ELSE l_quantity END
             AS qty_or_null FROM lineitem),
         m AS (SELECT median(qty_or_null) AS med FROM x)
         SELECT l_orderkey, l_linenumber,
           ${Det.sql("coalesce(qty_or_null, med)", 1)} AS qty_imputed
         FROM x, m""",
    "c7_tag" ->
      """SELECT o_orderkey,
         CASE WHEN o_custkey % 5 < 4 THEN 'training' ELSE 'test' END
           AS tr_te
         FROM orders""",
    "c8_log" ->
      s"SELECT o_orderkey, ${Det.sql("ln(o_totalprice)", 6)} AS log_price FROM orders",
    "c9_strings" ->
      """SELECT p_partkey,
         concat('sz_', lpad(cast(p_size AS varchar), 3, '0')) AS size_tag,
         split_part(p_type, ' ', 1) AS type_stem
         FROM part""")
}
