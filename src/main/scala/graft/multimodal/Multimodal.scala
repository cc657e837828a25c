package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Det

/** Typed metadata carried alongside every media payload. */
case class MediaMeta(width: Int, height: Int, sampleRate: Int)

/** One multimodal record: opaque binary payload + typed metadata.
  * The schema a 100 TB media lake would use: content stays an opaque
  * `binary` column (parquet keeps it out of dictionary encoding),
  * metadata is a typed struct usable for partition pruning. */
case class MediaItem(media_id: Long, kind: String,
    content: Array[Byte], meta: MediaMeta)

/** Decoded features (what a real image/audio decoder would emit). */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
    histogram: Array[Double])

/** Multimodal-column plumbing over opaque binary payloads.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic FAKE (byte-bucket histogram) standing
  * in for a real decoder — the Spark-side plumbing is real: binary
  * columns, typed metadata struct, partition-preserving batched
  * `mapPartitions` over a `Dataset[MediaItem]` (the Scala analog of a
  * Pandas-UDF/`mapInPandas` batch transform: one iterator per
  * partition, amortizing per-batch decoder setup).
  */
object Multimodal {

  /** Synthesize a media table from `documents` (payload = utf-8 text
    * bytes; kind/meta derived from doc_id) — deterministic. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaItem] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("content"),
        struct(
          (col("doc_id") % 640 + 16).cast("int").as("width"),
          (col("doc_id") % 480 + 16).cast("int").as("height"),
          lit(16000).as("sampleRate")).as("meta"))
      .as[MediaItem]
  }

  /** STUB decoder — a real deployment swaps this body for an actual
    * codec call (e.g. JNI/ImageIO); deterministic fake: 8-bucket
    * normalized byte histogram. Everything around it (batching,
    * schema, partitioning) is production-shaped. */
  private[multimodal] def decodeStub(content: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](8)
    var i = 0
    while (i < content.length) {
      hist((content(i) & 0xff) >>> 5) += 1.0
      i += 1
    }
    val n = math.max(content.length, 1).toDouble
    hist.map(_ / n)
  }

  /** Batched per-partition decode: the `mapInPandas` analog. One
    * decoder "session" per partition (the `// decoder init` line),
    * streamed row-at-a-time without materializing the partition. */
  def decodeFeatures(media: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { items =>
      // decoder init would happen here, once per partition/batch
      items.map { m =>
        MediaFeatures(m.media_id, m.kind, m.content.length.toLong,
          decodeStub(m.content))
      }
    }
  }

  /** Frame sampling: split a payload into `n` evenly-spaced fixed-size
    * "frames" (what video frame-extraction plumbing looks like with an
    * opaque codec). Pure expression — codegen'd, no shuffle. */
  def frameSample(media: DataFrame, n: Int, frameBytes: Int): DataFrame =
    media.withColumn("frames",
      expr(s"""transform(sequence(0, ${n - 1}),
        i -> substring(content,
               1 + cast(i * greatest(length(content) - $frameBytes, 0)
                   / ${math.max(n - 1, 1)} AS int),
               $frameBytes))"""))

  /** X5 — the queries() entry: synthesize → batched decode → per-kind
    * feature profile. Rows-only (stub decode isn't SQL-expressible);
    * MultimodalSpec pins byte counts and histogram normalization. */
  def x5MultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    val feats = decodeFeatures(mediaTable(s, dir))
    val cols = Seq(col("media_id"), col("kind"), col("n_bytes")) ++
      (0 until 8).map(i =>
        Det.r6(element_at(col("histogram"), i + 1)).as(s"h$i"))
    feats.toDF().select(cols: _*)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x5_multimodal_features" -> x5MultimodalFeatures)

  val oracle: Map[String, String] = Map.empty
}
