package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Pivot / unpivot operators (SURVEY.md §2.5).
  *
  * Pivot determinism at scale (SURVEY §4): every `.pivot` call passes
  * an EXPLICIT value list — this removes the extra distinct-scan job
  * AND fixes the output schema regardless of which bands appear in the
  * data (the reference gets this wrong: its data-dependent pivot drops
  * the empty 090 band, R:290–312 / FIXTURES.md §A).
  */
object Reshape {

  /** The reference's area-band rule (R:292–296): round to tens, clamp.
    * Bands here: l_quantity ∈ [1,50] → {10,20,30,40,50}. */
  private def band = least(greatest(round(col("l_quantity"), -1),
    lit(10.0)), lit(50.0)).cast("int")

  private val bands = Seq(10, 20, 30, 40, 50)

  /** V1 — pivot wider: per-supplier household-histogram analog
    * (R:290–312: per-complex area-band pivot, `str_pad` column names,
    * fill 0, sorted column order). One shuffle (the groupBy); the
    * pivot itself is a map-side projection given the fixed band list. */
  def v1Pivot(s: SparkSession, dir: String): DataFrame = {
    val pivoted = Tables.lineitem(s, dir)
      .withColumn("band", band)
      .groupBy("l_suppkey")
      .pivot("band", bands)
      .agg(round(sum("l_quantity"), 1))
      .na.fill(0.0, bands.map(_.toString))
    val renamed = bands.foldLeft(pivoted) { (df, b) =>
      df.withColumnRenamed(b.toString, f"qty_$b%03d")
    }
    renamed.select(col("l_suppkey") +:
      bands.map(b => col(f"qty_$b%03d")): _*)
  }

  /** V2 — pivot per partition-of-a-column (R:856–877: `split()` by
    * building type + per-group pivot ≡ filtered pivots, parameterized). */
  def v2PivotGrouped(s: SparkSession, dir: String): DataFrame = {
    def onePivot(flag: String): DataFrame = {
      val pivoted = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === flag)
        .withColumn("band", band)
        .groupBy("l_suppkey")
        .pivot("band", bands)
        .agg(Det.r1(sum("l_quantity")))
        .na.fill(0.0, bands.map(_.toString))
      val renamed = bands.foldLeft(pivoted) { (df, b) =>
        df.withColumnRenamed(b.toString, f"qty_$b%03d")
      }
      renamed.select(lit(flag).as("returnflag") +: col("l_suppkey") +:
        bands.map(b => col(f"qty_$b%03d")): _*)
    }
    onePivot("A").unionByName(onePivot("R"))
  }

  /** U1 — unpivot / melt wide→long (R:399, R:582: `gather`). Spark-native
    * `unpivot` (3.4+); the ids stay, stats become (stat, value) rows. */
  def u1Unpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = Tables.customer(s, dir)
      .groupBy("c_mktsegment")
      .agg(Det.r2(avg("c_acctbal")).as("avg_bal"),
        Det.r2(min("c_acctbal")).as("min_bal"),
        Det.r2(max("c_acctbal")).as("max_bal"))
    wide.unpivot(Array(col("c_mktsegment")),
      Array(col("avg_bal"), col("min_bal"), col("max_bal")),
      "stat", "value")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v1_pivot" -> v1Pivot,
    "v2_pivot_grouped" -> v2PivotGrouped,
    "u1_unpivot" -> u1Unpivot)

  private def bandSql = "least(greatest(round(l_quantity, -1), 10.0), 50.0)"

  private def caseSums(indent: String): String = bands.map { b =>
    val det = Det.sql(
      s"sum(CASE WHEN cast($bandSql AS int) = $b THEN l_quantity END)", 1)
    f"coalesce($det, 0.0) AS qty_$b%03d"
  }.mkString(s",\n$indent")

  val oracle: Map[String, String] = Map(
    "v1_pivot" ->
      s"""SELECT l_suppkey,
          ${caseSums("          ")}
          FROM lineitem GROUP BY 1""",
    "v2_pivot_grouped" ->
      s"""SELECT 'A' AS returnflag, l_suppkey,
          ${caseSums("          ")}
          FROM lineitem WHERE l_returnflag = 'A' GROUP BY 2
          UNION ALL
          SELECT 'R', l_suppkey,
          ${caseSums("          ")}
          FROM lineitem WHERE l_returnflag = 'R' GROUP BY 2""",
    "u1_unpivot" ->
      s"""WITH wide AS (
           SELECT c_mktsegment,
             ${Det.sql("avg(c_acctbal)", 2)} AS avg_bal,
             ${Det.sql("min(c_acctbal)", 2)} AS min_bal,
             ${Det.sql("max(c_acctbal)", 2)} AS max_bal
           FROM customer GROUP BY 1)
         SELECT c_mktsegment, s.stat AS stat,
           CASE s.stat WHEN 'avg_bal' THEN avg_bal
                       WHEN 'min_bal' THEN min_bal
                       ELSE max_bal END AS value
         FROM wide CROSS JOIN
           (SELECT unnest(['avg_bal','min_bal','max_bal']) AS stat) s""")
}
