package graft.sources

import java.awt.image.BufferedImage
import java.io.File

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Aggregates

/** S5 — the PLOT SINK (reference R:363–381: per numeric column,
  * histogram + boxplot → PNG files), the one §2 row previously scoped
  * to "the stats feeding it". The full sink ships here with ZERO new
  * dependencies: rendering is plain JDK raster writes (BufferedImage
  * + ImageIO — headless-safe, no Graphics2D/Toolkit), so the engine
  * stays self-contained.
  *
  * Scale shape — the same split the reference's ggplot call has: the
  * DATA work (the histogram aggregate / the exact five-number
  * summary) runs DISTRIBUTED and reduces to ≤ bucket-count rows; the
  * render consumes those collected rows driver-side, O(pixels) with
  * no data dependence — the x42 dataset-card cost class.
  *
  * Gate (the x5b/x5c discipline — never trust a write that was not
  * read back): the `s5_plot_sink` query renders the g12 histogram to
  * a real PNG, DECODES it with an independent ImageIO read, MEASURES
  * each bucket's bar height in pixels off the decoded raster, and
  * emits (bucket, n_orders, bar_px); the DuckDB oracle recomputes
  * bar_px from the count arithmetic alone — floor-based scaling, the
  * Det rounding discipline, so a render, write, decode, or measure
  * bug hash-mismatches. The boxplot leg is geometry-gated the same
  * way in ScalaTest (exact percentile positions → measured pixel
  * columns). */
object PlotSink {

  /** Fixed canvas geometry — part of the gate contract (the oracle
    * replays the scaling arithmetic against these constants). */
  val BarW = 20
  val BarH = 180 // max bar height in px
  val Margin = 10
  private val BarRgb = 0xCC3333
  private val BoxRgb = 0x3355CC
  private val MedianRgb = 0xCC3333
  private val WhiteRgb = 0xFFFFFF

  /** Pixel height of a count bar: floor-based half-up scaling against
    * the max count (Det.r discipline — identical IEEE ops in the SQL
    * replay), floored at 1 px so a non-empty bucket is never
    * invisible. */
  def barPx(n: Long, maxN: Long): Int =
    math.max(1, math.floor(n * 180.0 / maxN + 0.5).toInt)

  /** Render a (slot → count) histogram to a PNG bar chart. `slots` is
    * the FIXED slot count (missing buckets stay empty — slot position
    * is the bucket VALUE, so the mapping is data-independent and
    * SQL-replayable). Returns the canvas (width, height). */
  def histogramPng(counts: Map[Int, Long], slots: Int, path: String)
      : (Int, Int) = {
    require(counts.nonEmpty, "plot sink: empty histogram")
    require(counts.keys.forall(b => b >= 0 && b < slots),
      s"plot sink: bucket outside [0, $slots)")
    val maxN = counts.values.max
    val (w, h) = (2 * Margin + slots * BarW, 2 * Margin + BarH)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, WhiteRgb)
    val baseline = Margin + BarH
    counts.foreach { case (b, n) =>
      val hb = barPx(n, maxN)
      val x0 = Margin + b * BarW + 2
      val x1 = Margin + (b + 1) * BarW - 2
      for (x <- x0 until x1; y <- baseline - hb until baseline)
        img.setRGB(x, y, BarRgb)
    }
    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    require(ImageIO.write(img, "png", f), s"no PNG writer for $path")
    (w, h)
  }

  /** Independent read-back: decode the PNG and measure each slot's
    * bar height by counting non-background pixels down the slot's
    * center column. */
  def measureBars(path: String, slots: Int): Map[Int, Int] = {
    val img = ImageIO.read(new File(path))
    require(img != null, s"plot sink: unreadable PNG at $path")
    val baseline = Margin + BarH
    (0 until slots).flatMap { b =>
      val x = Margin + b * BarW + BarW / 2
      val hb = (Margin until baseline)
        .count(y => (img.getRGB(x, y) & 0xFFFFFF) != WhiteRgb)
      if (hb > 0) Some(b -> hb) else None
    }.toMap
  }

  /** Render a horizontal boxplot (min/q1/median/q3/max, pre-computed
    * EXACTLY by the caller — reference boxplot.stats semantics are
    * the caller's concern) to a PNG. Values scale linearly into a
    * fixed 400-px track; the median tick draws in a distinct color so
    * read-back can locate every feature unambiguously. Returns the
    * five pixel x-positions in value order. */
  val TrackW = 400
  def boxplotPng(min: Double, q1: Double, med: Double, q3: Double,
      max: Double, path: String): Seq[Int] = {
    require(min <= q1 && q1 <= med && med <= q3 && q3 <= max,
      "plot sink: five-number summary out of order")
    val span = if (max > min) max - min else 1.0
    def px(v: Double): Int =
      Margin + math.floor((v - min) / span * (TrackW - 1) + 0.5).toInt
    val (w, h) = (2 * Margin + TrackW, 2 * Margin + 60)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, WhiteRgb)
    val (yTop, yMid, yBot) = (Margin, Margin + 30, Margin + 60)
    val xs = Seq(min, q1, med, q3, max).map(px)
    // whisker line min→max at mid height
    for (x <- xs.head to xs.last) img.setRGB(x, yMid, BoxRgb)
    // box q1→q3
    for (x <- xs(1) to xs(3); y <- Seq(yTop, yBot - 1))
      img.setRGB(x, y, BoxRgb)
    for (y <- yTop until yBot; x <- Seq(xs(1), xs(3)))
      img.setRGB(x, y, BoxRgb)
    // median tick, distinct color, full box height
    for (y <- yTop until yBot) img.setRGB(xs(2), y, MedianRgb)
    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    require(ImageIO.write(img, "png", f), s"no PNG writer for $path")
    xs
  }

  /** Locate the boxplot features in a decoded PNG: the median tick
    * (its color is unique) and the box verticals (full-height box
    * color columns). Degenerate summaries collapse features onto one
    * pixel column: the median tick draws LAST, so a q1/q3 vertical at
    * the same x reads back as the median — callers measuring a
    * near-constant column should expect `boxCols` to omit such
    * overdrawn verticals rather than report them twice. */
  def measureBox(path: String): (Seq[Int], Int) = {
    val img = ImageIO.read(new File(path))
    require(img != null, s"plot sink: unreadable PNG at $path")
    val (yTop, yBot) = (Margin, Margin + 60)
    def colIs(x: Int, rgb: Int): Boolean =
      (yTop until yBot).forall(y => (img.getRGB(x, y) & 0xFFFFFF) == rgb)
    val boxCols = (0 until img.getWidth)
      .filter(x => colIs(x, BoxRgb))
    val medCols = (0 until img.getWidth)
      .filter(x => colIs(x, MedianRgb))
    require(medCols.size == 1, s"plot sink: ${medCols.size} median ticks")
    (boxCols, medCols.head)
  }

  private def scratchPng(s: SparkSession, tag: String): String =
    new File(new File(sys.props("java.io.tmpdir"),
      s"graft_plot_$tag"), s"${s.sparkContext.applicationId}.png")
      .toString

  /** S5 as a gated query: distributed g12 histogram → PNG render →
    * independent decode+measure → (bucket, n_orders, bar_px). The
    * oracle recomputes bar_px from counts alone. */
  def s5PlotSink(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hist: Map[Int, Long] = Aggregates.g12Histogram(s, dir)
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val png = scratchPng(s, "hist")
    histogramPng(hist, slots = 12, png)
    val measured = measureBars(png, slots = 12)
    new File(png).delete()
    hist.toSeq.sortBy(_._1).map { case (b, n) =>
      (b.toLong, n, measured(b))
    }.toDF("bucket", "n_orders", "bar_px")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s5_plot_sink" -> s5PlotSink)

  val oracle: Map[String, String] = Map(
    // bar_px replayed from the count arithmetic alone — a render,
    // PNG write, decode, or measure bug breaks the hash
    "s5_plot_sink" ->
      """WITH h AS (
           SELECT cast(least(floor(o_totalprice / 50000.0), 11)
               AS bigint) AS bucket,
             cast(count(*) AS bigint) AS n_orders
           FROM orders GROUP BY 1),
         m AS (SELECT max(n_orders) AS mx FROM h)
         SELECT bucket, n_orders,
           cast(greatest(1, floor(n_orders * 180.0 / mx + 0.5)) AS int)
             AS bar_px
         FROM h, m""")

  /** The per-numeric-column sweep the reference runs (R:363–381
    * loops columns): one histogram + one boxplot PNG per column,
    * stats distributed, renders driver-side. Returns the written
    * paths. Boxplot five-number summary = EXACT percentiles (the
    * reference's quantile type-7 differences are below pixel
    * resolution at TrackW=400 and are pinned in the spec). */
  def plotColumns(s: SparkSession, df: DataFrame, cols: Seq[String],
      outDir: String): Seq[String] = {
    cols.flatMap { c =>
      // NULLs are dropped BEFORE any aggregate (the reference's
      // hist() NA semantics). Without this, Spark's null-skipping
      // least(null, 11) = 11 would silently route every null row
      // into the TOP bucket, inflating the last bar (ADVICE r10).
      val obs = df.filter(col(c).isNotNull)
      // back-quoted: the per-complex frame's column names are Korean
      // (e.g. 총세대수), invalid as unquoted SQL identifiers
      val stats = obs.agg(
        min(col(c)).cast("double").as("mn"),
        expr(s"percentile(`$c`, array(0.25, 0.5, 0.75))").as("qs"),
        max(col(c)).cast("double").as("mx")).head()
      require(!stats.isNullAt(0),
        s"plotColumns: column '$c' has no non-null values — nothing " +
          "to plot (the reference's hist() errors on this too)")
      val (mn, mx) = (stats.getDouble(0), stats.getDouble(2))
      val qs = stats.getSeq[Double](1)
      val nBuckets = 12
      val span = if (mx > mn) mx - mn else 1.0
      val histDf = obs.groupBy(
          least(floor((col(c) - mn) / span * nBuckets),
            lit(nBuckets - 1)).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n"))
      val hist = histDf.collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val hPath = s"$outDir/${c}_hist.png"
      val bPath = s"$outDir/${c}_box.png"
      histogramPng(hist, nBuckets, hPath)
      boxplotPng(mn, qs(0), qs(1), qs(2), mx, bPath)
      Seq(hPath, bPath)
    }
  }
}
