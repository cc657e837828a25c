package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.{Charset, CodingErrorAction}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Det

/** S2 — ENCODING SNIFF (readr::guess_encoding, R:69 — the reference
  * sniffs its Korean CSVs before declaring a charset), previously
  * scoped to "no-op: declared UTF-8 at read". The real operator ships
  * here: score a byte sample against candidate charsets with the
  * JVM's own strict decoders (CodingErrorAction.REPORT — no new
  * dependency, no ICU), deterministically.
  *
  * This is a DIAGNOSTIC an ingest runs once per source, not a reader
  * mode: production reads keep their DECLARED charset (SURVEY §2.1's
  * original rationale stands — inference per read is a second scan
  * and nondeterministic under dirty data); sniff is how the
  * declaration gets established and audited. Cost shape: ONE bounded
  * head-of-file read (64 KiB default) through the Hadoop FS API — no
  * Spark job, no full scan, works against any store the engine reads.
  *
  * Scoring rules (fixed, documented, deterministic — the gate
  * contract):
  *  - a candidate whose strict decode REJECTS the sample scores 0;
  *  - UTF-8: 1.0 with multibyte evidence, 0.8 for pure ASCII (ASCII
  *    is valid UTF-8 but equally valid everything-else);
  *  - EUC-KR: 0.9 with high-byte evidence, 0.6 ASCII-only;
  *  - UTF-16LE/BE: 0.95 with the matching BOM; 0.1 otherwise (any
  *    even-length byte string decodes as SOME UTF-16, so a BOM-less
  *    "valid" decode is near-zero evidence);
  *  - ISO-8859-1: flat 0.5 — it decodes anything, the last resort;
  *  - noise penalty, applied to EVERY candidate's decoded text: > 1 %
  *    control characters (outside \t\r\n) → score ×0.1. This is how
  *    a wrong-charset decode that happens to be byte-valid (the
  *    classic UTF-16-of-ASCII case, but equally a control-riddled
  *    "UTF-8" or Latin-1 decode) gets demoted below honest readings.
  * Ties break by candidate order (stricter first). */
object EncodingSniff {

  /** (charset, ASCII-only confidence, evidence confidence). */
  private val Candidates: Seq[(String, Double, Double)] = Seq(
    ("UTF-8", 0.8, 1.0),
    ("EUC-KR", 0.6, 0.9),
    ("UTF-16LE", 0.1, 0.95),
    ("UTF-16BE", 0.1, 0.95),
    ("ISO-8859-1", 0.5, 0.5))

  /** Strict decode with `endOfInput = false`: a SAMPLE may cut the
    * file mid-sequence, and a truncated FINAL multibyte char is not
    * evidence against the charset (it rejected the real UTF-8
    * reference CSV before this) — only interior malformations are.
    * The decoder underflows at a trailing partial sequence instead of
    * erroring; flush is deliberately not called. */
  private def decodes(bytes: Array[Byte], cs: Charset): Option[String] =
    try {
      val dec = cs.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val out = java.nio.CharBuffer.allocate(bytes.length + 1)
      val res = dec.decode(ByteBuffer.wrap(bytes), out, false)
      if (res.isError) None else Some(out.flip().toString)
    } catch { case _: Exception => None }

  private def controlRatio(s: String): Double =
    if (s.isEmpty) 0.0
    else s.count(c => c.isControl && c != '\t' && c != '\r' && c != '\n')
      .toDouble / s.length

  private def hasHighByte(bytes: Array[Byte]): Boolean =
    bytes.exists(b => (b & 0x80) != 0)

  private def bomOf(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xfe) Some("UTF-16LE")
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe &&
      (bytes(1) & 0xff) == 0xff) Some("UTF-16BE")
    else None

  /** Score a byte sample against every supported candidate,
    * best-first. Pure function of the bytes — replayable anywhere. */
  def sniffBytes(bytes: Array[Byte]): Seq[(String, Double)] = {
    val bom = bomOf(bytes)
    val scored = Candidates
      .filter { case (name, _, _) => Charset.isSupported(name) }
      .map { case (name, asciiConf, evidenceConf) =>
        val cs = Charset.forName(name)
        val conf = decodes(bytes, cs) match {
          case None => 0.0
          case Some(txt) =>
            val base = name match {
              case "UTF-8" | "EUC-KR" =>
                if (hasHighByte(bytes)) evidenceConf else asciiConf
              case "UTF-16LE" | "UTF-16BE" =>
                if (bom.contains(name)) evidenceConf else asciiConf
              case _ => asciiConf
            }
            if (controlRatio(txt) > 0.01) base * 0.1 else base
        }
        name -> conf
      }
    // stable: order by confidence desc, then candidate (strictness) order
    val rank = Candidates.map(_._1).zipWithIndex.toMap
    scored.sortBy { case (n, c) => (-c, rank(n)) }
  }

  /** Sniff the head of a file through the Hadoop FS API (any store
    * the engine reads: local, HDFS, object stores). */
  def sniff(s: SparkSession, path: String,
      sampleBytes: Int = 64 << 10): Seq[(String, Double)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val buf = new Array[Byte](sampleBytes)
    val n = try {
      var off = 0
      var r = 0
      while (off < sampleBytes && r >= 0) {
        r = in.read(buf, off, sampleBytes - off)
        if (r > 0) off += r
      }
      off
    } finally in.close()
    sniffBytes(java.util.Arrays.copyOf(buf, n))
  }

  /** S2 as a gated query: four planted byte fixtures — UTF-8 Korean,
    * EUC-KR Korean, Latin-1 accents, BOM'd UTF-16LE — each sniffed
    * through [[sniffBytes]]; emits every fixture's top-1 call plus
    * UTF-8's score on it. The oracle pins the contract's expected
    * table literally (the scoring rules are a fixed, documented
    * function of the bytes — the x5b "replay the generation
    * arithmetic" discipline, degenerated to constants because the
    * fixtures are constants); ParkingSpec additionally sniffs the
    * real reference CSV head. */
  def s2EncodingSniff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val korean = "단지코드,총세대수\nC1397,404\n주차 데이터"
    val latin = "résumé, naïve, café\n"
    val fixtures: Seq[(String, Array[Byte])] = Seq(
      ("utf8_korean", korean.getBytes(Charset.forName("UTF-8"))),
      ("euckr_korean", korean.getBytes(Charset.forName("EUC-KR"))),
      ("latin1_accents", latin.getBytes(Charset.forName("ISO-8859-1"))),
      ("utf16le_bom", ("\ufeff" + korean).getBytes(
        Charset.forName("UTF-16LE"))))
    fixtures.map { case (name, bytes) =>
      val ranked = sniffBytes(bytes)
      val utf8 = ranked.find(_._1 == "UTF-8").map(_._2).getOrElse(0.0)
      (name, ranked.head._1, ranked.head._2, utf8)
    }.toDF("fixture", "best_charset", "confidence", "utf8_confidence")
      .select(col("fixture"), col("best_charset"),
        Det.r2(col("confidence")).as("confidence"),
        Det.r2(col("utf8_confidence")).as("utf8_confidence"))
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s2_encoding_sniff" -> s2EncodingSniff)

  val oracle: Map[String, String] = Map(
    // the contract's expected calls: UTF-8 Korean bytes are invalid
    // EUC-KR at the trailing truncation-free sample and score 1.0;
    // EUC-KR bytes are malformed UTF-8 (0.0) and carry high bytes
    // (0.9); Latin-1 accents are invalid in both multibyte sets; the
    // BOM picks UTF-16LE over everything
    "s2_encoding_sniff" ->
      """SELECT fixture, best_charset,
           cast(confidence AS double) AS confidence,
           cast(utf8_confidence AS double) AS utf8_confidence
         FROM (VALUES
           ('utf8_korean',  'UTF-8',      1.0,  1.0),
           ('euckr_korean', 'EUC-KR',     0.9,  0.0),
           ('latin1_accents','ISO-8859-1',0.5,  0.0),
           ('utf16le_bom',  'UTF-16LE',   0.95, 0.0))
         AS t(fixture, best_charset, confidence, utf8_confidence)""")
}
