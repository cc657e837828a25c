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
  * Two decode tiers: x5b is a REAL format decode — byte-exact BMP and
  * WAV files built to the public specs, parsed back by header
  * (magic + little-endian fields at spec offsets) and hash-gated
  * against a DuckDB oracle that recomputes the ground truth
  * independently. The deeper content stage (`decodeStub`, x5) stays a
  * clearly-marked deterministic FAKE (byte-bucket histogram) standing
  * in for a pixel/sample codec the container doesn't ship — around
  * it, the Spark-side plumbing is real: binary columns, typed
  * metadata struct, partition-preserving batched `mapPartitions` over
  * a `Dataset[MediaItem]` (the Scala analog of a Pandas-UDF/
  * `mapInPandas` batch transform: one iterator per partition,
  * amortizing per-batch decoder setup).
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

  // ---------------------------------------------------------------
  // X5b — REAL format decode. The payloads are genuine BMP (Windows
  // BITMAPINFOHEADER, little-endian, 24bpp, 4-byte row padding) and
  // WAV (RIFF/WAVE with a canonical 16-byte PCM fmt chunk) files
  // built byte-for-byte to the public specs; the decoder parses the
  // headers the way any codec front-end does — validate magic, read
  // little-endian fields at spec offsets — with NO access to the
  // generator's parameters. Geometry/rates derive from doc_id
  // arithmetic, so the DuckDB oracle recomputes the expected decode
  // output independently: a hash-matched gate over a real binary
  // parse.
  // ---------------------------------------------------------------

  private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
    le16(b, off, v & 0xffff); le16(b, off + 2, (v >>> 16) & 0xffff)
  }
  private def rd16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def rd32(b: Array[Byte], off: Int): Int =
    rd16(b, off) | (rd16(b, off + 2) << 16)

  /** 24bpp bottom-up BMP; pixel rows padded to 4 bytes per the spec.
    * `fill` cycles into the pixel area (content plumbing is real even
    * though the pixels are synthetic). */
  private[graft] def encodeBmp(width: Int, height: Int,
      fill: Array[Byte]): Array[Byte] = {
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val b = new Array[Byte](54 + dataSize)
    b(0) = 'B'; b(1) = 'M'
    le32(b, 2, b.length); le32(b, 10, 54)
    le32(b, 14, 40) // BITMAPINFOHEADER
    le32(b, 18, width); le32(b, 22, height)
    le16(b, 26, 1); le16(b, 28, 24) // planes, bpp
    le32(b, 34, dataSize)
    var i = 0
    while (i < dataSize) {
      b(54 + i) = if (fill.isEmpty) 0 else fill(i % fill.length)
      i += 1
    }
    b
  }

  /** Canonical 44-byte-header PCM WAV (16-bit). */
  private[graft] def encodeWav(sampleRate: Int, channels: Int,
      frames: Int, fill: Array[Byte]): Array[Byte] = {
    val dataSize = frames * channels * 2
    val b = new Array[Byte](44 + dataSize)
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    le32(b, 4, 36 + dataSize)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
    le32(b, 16, 16); le16(b, 20, 1) // PCM
    le16(b, 22, channels); le32(b, 24, sampleRate)
    le32(b, 28, sampleRate * channels * 2) // byte rate
    le16(b, 32, channels * 2); le16(b, 34, 16) // block align, bits
    b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
    le32(b, 40, dataSize)
    var i = 0
    while (i < dataSize) {
      b(44 + i) = if (fill.isEmpty) 0 else fill(i % fill.length)
      i += 1
    }
    b
  }

  /** (width, height, bpp) from a BMP header; loud failure on bad
    * magic — a 100 TB decode job must quarantine, not guess. */
  private[graft] def decodeBmp(b: Array[Byte]): (Int, Int, Int) = {
    require(b.length >= 54 && b(0) == 'B' && b(1) == 'M',
      "not a BMP payload")
    (rd32(b, 18), rd32(b, 22), rd16(b, 28))
  }

  /** (sampleRate, channels, bitsPerSample) from a RIFF/WAVE header. */
  private[graft] def decodeWav(b: Array[Byte]): (Int, Int, Int) = {
    require(b.length >= 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E' &&
      b(12) == 'f' && b(13) == 'm' && b(14) == 't' && b(15) == ' ',
      "not a WAV payload")
    (rd32(b, 24), rd16(b, 22), rd16(b, 34))
  }

  /** The encoded media lake: real BMP for even doc_ids, real WAV for
    * odd — geometry/rate/length all doc_id-derived (the oracle's
    * ground truth), pixels/samples filled from the text bytes. */
  def encodedMediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select("doc_id", "text")
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val fill = text.getBytes("UTF-8")
          if (id % 2 == 0) {
            val w = (id % 16 + 1).toInt
            val h = (id % 12 + 1).toInt
            (id, "image", encodeBmp(w, h, fill))
          } else {
            val rate = (8000 * (id % 3 + 1)).toInt
            val ch = ((id / 2) % 2 + 1).toInt
            val frames = (id % 100 + 10).toInt
            (id, "audio", encodeWav(rate, ch, frames, fill))
          }
        }
      }.toDF("media_id", "kind", "content")
  }

  /** X5b — batched REAL header decode over the encoded lake: one
    * parser "session" per partition, schema typed at the boundary.
    * Hash-gated: the oracle recomputes every field from doc_id
    * arithmetic while this path reads them out of the bytes. */
  def x5bMultimodalDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    encodedMediaTable(s, dir).as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, content) =>
          if (kind == "image") {
            val (w, h, bpp) = decodeBmp(content)
            (id, kind, w, h, bpp / 8, 0, bpp, content.length.toLong)
          } else {
            val (rate, ch, bits) = decodeWav(content)
            (id, kind, 0, 0, ch, rate, bits, content.length.toLong)
          }
        }
      }.toDF("media_id", "kind", "width", "height", "channels",
        "sample_rate", "bits", "n_bytes")
  }

  /** Nearest-neighbor resize of a 24bpp bottom-up BMP to (ow, oh) — a
    * REAL pixel-grid transform, not a stub: each output pixel copies
    * the source pixel at (⌊x·w/ow⌋, ⌊y·h/oh⌋), re-encoded as a valid
    * BMP. Integer-only arithmetic so the oracle can replay pixel
    * selection exactly. */
  private[graft] def resizeBmp(b: Array[Byte], ow: Int,
      oh: Int): Array[Byte] = {
    val (w, h, bpp) = decodeBmp(b)
    require(bpp == 24, s"resize expects 24bpp, got $bpp")
    val srcRow = ((w * 3 + 3) / 4) * 4
    val dstRow = ((ow * 3 + 3) / 4) * 4
    val out = encodeBmp(ow, oh, Array.emptyByteArray)
    var y = 0
    while (y < oh) {
      val sy = y * h / oh
      var x = 0
      while (x < ow) {
        val sx = x * w / ow
        val so = 54 + sy * srcRow + sx * 3
        val dofs = 54 + y * dstRow + x * 3
        out(dofs) = b(so); out(dofs + 1) = b(so + 1)
        out(dofs + 2) = b(so + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** X5c — batched resize over the encoded image lake: every BMP
    * payload downsampled to a 4×3 thumbnail through [[resizeBmp]]
    * (decode → pixel-grid sample → re-encode), per-partition batches
    * like the other decode tiers. Emitted per image: geometry plus the
    * SUM of the thumbnail's 36 pixel bytes — a value the DuckDB
    * oracle recomputes INDEPENDENTLY from doc_id arithmetic and the
    * text fill pattern (pixel (x,y,c) of the thumbnail is source
    * byte sy·row + sx·3 + c, which the encoder filled with
    * text[offset mod len]), so the whole decode→resize→re-encode
    * path is hash-gated, not just smoke-tested. */
  def x5cMultimodalResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    encodedMediaTable(s, dir).as[(Long, String, Array[Byte])]
      .filter(_._2 == "image")
      .mapPartitions { it =>
        val dstRow = ((4 * 3 + 3) / 4) * 4
        it.map { case (id, _, content) =>
          val out = resizeBmp(content, 4, 3)
          var sum = 0L
          var y = 0
          while (y < 3) {
            var x = 0
            while (x < 4) {
              var c = 0
              while (c < 3) {
                sum += (out(54 + y * dstRow + x * 3 + c) & 0xff)
                c += 1
              }
              x += 1
            }
            y += 1
          }
          (id, 4, 3, sum)
        }
      }.toDF("media_id", "out_w", "out_h", "pix_sum")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x5_multimodal_features" -> x5MultimodalFeatures,
    "x5b_multimodal_decode" -> x5bMultimodalDecode,
    "x5c_multimodal_resize" -> x5cMultimodalResize)

  /** x5b ground truth re-derived from the generation arithmetic —
    * independent of the binary parse under test. */
  val oracle: Map[String, String] = Map(
    "x5b_multimodal_decode" ->
      """SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
           cast(CASE WHEN doc_id % 2 = 0 THEN doc_id % 16 + 1
                     ELSE 0 END AS int) AS width,
           cast(CASE WHEN doc_id % 2 = 0 THEN doc_id % 12 + 1
                     ELSE 0 END AS int) AS height,
           cast(CASE WHEN doc_id % 2 = 0 THEN 3
                     ELSE (doc_id // 2) % 2 + 1 END AS int) AS channels,
           cast(CASE WHEN doc_id % 2 = 0 THEN 0
                     ELSE 8000 * (doc_id % 3 + 1) END AS int) AS sample_rate,
           cast(CASE WHEN doc_id % 2 = 0 THEN 24 ELSE 16 END AS int) AS bits,
           cast(CASE WHEN doc_id % 2 = 0
                     THEN 54 + ((doc_id % 16 + 1) * 3 + 3) // 4 * 4
                            * (doc_id % 12 + 1)
                     ELSE 44 + (doc_id % 100 + 10)
                            * ((doc_id // 2) % 2 + 1) * 2
                END AS bigint) AS n_bytes
         FROM documents""",
    // Independent replay of decode→resize→re-encode: thumbnail pixel
    // (y, x, c) is source byte sy·srcRow + sx·3 + c of the pixel
    // area, which encodeBmp filled with text[offset mod len]. k runs
    // over the 36 output bytes: y = k//12, x = (k%12)//3, c = k%3.
    "x5c_multimodal_resize" ->
      """WITH img AS (SELECT doc_id, text, len(text) AS L,
             doc_id % 16 + 1 AS w, doc_id % 12 + 1 AS h,
             ((doc_id % 16 + 1) * 3 + 3) // 4 * 4 AS srow
           FROM documents WHERE doc_id % 2 = 0),
         g AS (SELECT doc_id, unnest(range(0, 36)) AS k FROM img),
         p AS (SELECT g.doc_id,
                 ((g.k // 12) * i.h // 3) * i.srow
                   + ((g.k % 12) // 3 * i.w // 4) * 3 + g.k % 3 AS so,
                 i.L, i.text
               FROM g JOIN img i ON g.doc_id = i.doc_id)
         SELECT doc_id AS media_id,
           cast(4 AS int) AS out_w, cast(3 AS int) AS out_h,
           cast(sum(ord(substr(text, cast(so % L AS int) + 1, 1)))
             AS bigint) AS pix_sum
         FROM p GROUP BY 1""")
}
