package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decode/feature-extract as partition-parallel batch transforms.
  *
  * The payloads are REAL images: every media row carries a binary P6 PPM
  * (the netpbm raw format — ASCII header + raw RGB triples, no compression,
  * so encode and decode are pure JVM code with no codec dependency), whose
  * pixel bytes derive deterministically from doc_id so the DuckDB oracle
  * can reproduce every decoded statistic from the same arithmetic. The
  * DECODE step is a real parser: it validates the P6 magic, reads
  * width/height/maxval from the header, and computes integer Rec.601 mean
  * luma over the pixel rows — swap the body for a JPEG/JNI codec in
  * production and nothing else changes. The Spark shape is the
  * mapInPandas-equivalent: per-partition batches of typed records through
  * the decoder, columnar in, columnar out, no shuffle, no driver
  * involvement.
  */
object Multimodal {

  /** Typed media record: payload + metadata struct, the schema a 100 TB
    * media lake would carry (payload pointer/bytes, modality tag, dims). */
  case class MediaRecord(
      doc_id: Long,
      modality: String,
      width: Int,
      height: Int,
      payload: Array[Byte])

  case class MediaFeatures(
      doc_id: Long,
      modality: String,
      n_bytes: Int,
      n_pixels: Long,
      brightness: Double) // Rec.601 mean luma decoded from the PPM payload

  // Public (not private) because the Dataset encoder's generated code
  // constructs it from another package.
  case class MediaKey(doc_id: Long, modality: String,
      width: Int, height: Int)

  /** P6 PPM encoder — the fixture's "camera": ASCII header
    * `P6\n{w} {h}\n255\n` followed by 3wh raw RGB bytes, where pixel byte i
    * is `(seed*31 + 7i) mod 256` (7 is coprime to 256, so the byte stream
    * cycles through every value — a full-range test card the oracle
    * reproduces with the same arithmetic). A real lake replaces this with
    * actual capture/ingest; everything downstream is format-real. */
  private[graft] def encodePpm(w: Int, h: Int, seed: Long): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](3 * w * h)
    var i = 0
    while (i < px.length) {
      px(i) = ((seed * 31 + i.toLong * 7) % 256).toByte
      i += 1
    }
    header ++ px
  }

  /** REAL P6 decoder: validates the magic, reads width/height/maxval from
    * the ASCII header, then computes integer Rec.601 mean luma over the
    * pixel rows — sum of 299 R + 587 G + 114 B per pixel (exact longs; one
    * double division at the end, so any engine reproducing the integer sum
    * reproduces the double bit-for-bit). Returns (width, height, luma).
    * This is the production decode shape: header parse + one pass over
    * pixel data; a JPEG build swaps the body, not the pipeline. */
  private[graft] def decodePpm(payload: Array[Byte]): (Int, Int, Double) = {
    require(payload.length >= 2 && payload(0) == 'P' && payload(1) == '6',
      "not a P6 PPM payload")
    var pos = 2
    def nextInt(): Int = {
      while (pos < payload.length && payload(pos).toChar.isWhitespace) pos += 1
      require(pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9',
        "malformed PPM header")
      var v = 0
      while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
        v = v * 10 + (payload(pos) - '0')
        pos += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxv = nextInt()
    require(maxv == 255, s"unsupported PPM maxval $maxv")
    pos += 1 // exactly one whitespace byte separates the header from pixels
    require(payload.length >= pos + 3 * w * h, "truncated PPM pixel data")
    var lum = 0L
    var p = 0
    while (p < w * h) {
      val o = pos + 3 * p
      lum += 299L * (payload(o) & 0xff) +
        587L * (payload(o + 1) & 0xff) +
        114L * (payload(o + 2) & 0xff)
      p += 1
    }
    (w, h, lum / (1000.0 * (w * h)))
  }

  /** Build the media lake from documents: width/height derived
    * deterministically, payload a real P6 PPM encoded per-partition (the
    * typed-batch shape — no shuffle, no driver involvement). */
  def mediaTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("modality"),
        (col("n_chars") % 64 + 1).cast(IntegerType).as("width"),
        (col("doc_id") % 48 + 1).cast(IntegerType).as("height"))
      .as[MediaKey]
      .mapPartitions(_.map(k => MediaRecord(k.doc_id, k.modality, k.width,
        k.height, encodePpm(k.width, k.height, k.doc_id))))
      .toDF()
  }

  /** Metadata/feature projection over the binary column — length, pixel
    * count, payload digest. The digest is md5 over the payload's UPPERCASE
    * HEX rendering (not the raw bytes) because the differential oracle's
    * md5 is VARCHAR-only — same collision resistance, both engines hash
    * the identical string. */
  def mediaMeta(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .select(
        col("doc_id"), col("modality"), col("width"), col("height"),
        length(col("payload")).as("n_bytes"),
        (col("width").cast(LongType) * col("height")).as("n_pixels"),
        md5(upper(hex(col("payload")))).as("payload_md5"))
      .orderBy("doc_id")

  // The oracle rebuilds the exact PPM bytes as a hex string — header via
  // hex(ascii header), pixels via the generator arithmetic — and hashes it.
  val mediaMetaSql: String =
    """WITH m AS (SELECT doc_id,
            CASE WHEN doc_id % 3 = 0 THEN 'image'
                 WHEN doc_id % 3 = 1 THEN 'audio'
                 ELSE 'video' END AS modality,
            CAST(n_chars % 64 + 1 AS INT) AS width,
            CAST(doc_id % 48 + 1 AS INT) AS height
          FROM documents),
       px AS (SELECT doc_id,
                string_agg(lpad(to_hex((doc_id * 31 + i * 7) % 256), 2, '0'),
                           '' ORDER BY i) AS phex
              FROM m, generate_series(0, 3 * 64 * 48 - 1) t(i)
              WHERE i < 3 * width * height
              GROUP BY doc_id)
       SELECT m.doc_id, m.modality, m.width, m.height,
         CAST(length('P6' || chr(10) || m.width || ' ' || m.height || chr(10)
                || '255' || chr(10)) + 3 * m.width * m.height AS INT) AS n_bytes,
         CAST(m.width * m.height AS BIGINT) AS n_pixels,
         md5(upper(hex('P6' || chr(10) || m.width || ' ' || m.height || chr(10)
                || '255' || chr(10)) || px.phex)) AS payload_md5
       FROM m JOIN px USING (doc_id) ORDER BY m.doc_id"""

  /** Partition-parallel feature extraction over binary payloads: the
    * mapInPandas-equivalent batch shape. Executors stream partitions of
    * [[MediaRecord]] through the REAL [[decodePpm]] parser; width/height
    * and pixel count come from the DECODED header, not the metadata
    * columns — the decode is load-bearing. No shuffle, no driver collect. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { r =>
        val (w, h, luma) = decodePpm(r.payload)
        MediaFeatures(
          doc_id = r.doc_id,
          modality = r.modality,
          n_bytes = r.payload.length,
          n_pixels = w.toLong * h,
          brightness = luma)
      }
    }
  }

  /** End-to-end: build media table -> typed Dataset -> batch decode +
    * feature extraction. Oracle-checked exactly: the integer Rec.601 sum is
    * reproduced from the generator arithmetic, and the single double
    * division + 4-dp round match bit-for-bit. */
  def mediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    extractFeatures(mediaTable(s, d).as[MediaRecord])
      .toDF()
      .withColumn("brightness", round(col("brightness"), 4))
      .orderBy("doc_id")
  }

  val mediaFeaturesSql: String =
    """WITH m AS (SELECT doc_id,
            CASE WHEN doc_id % 3 = 0 THEN 'image'
                 WHEN doc_id % 3 = 1 THEN 'audio'
                 ELSE 'video' END AS modality,
            CAST(n_chars % 64 + 1 AS INT) AS w,
            CAST(doc_id % 48 + 1 AS INT) AS h
          FROM documents),
       lum AS (SELECT doc_id,
                 CAST(sum((CASE i % 3 WHEN 0 THEN 299 WHEN 1 THEN 587 ELSE 114 END)
                      * ((doc_id * 31 + i * 7) % 256)) AS BIGINT) AS lsum
               FROM m, generate_series(0, 3 * 64 * 48 - 1) t(i)
               WHERE i < 3 * w * h
               GROUP BY doc_id)
       SELECT m.doc_id, m.modality,
         CAST(length('P6' || chr(10) || m.w || ' ' || m.h || chr(10)
                || '255' || chr(10)) + 3 * m.w * m.h AS INT) AS n_bytes,
         CAST(m.w * m.h AS BIGINT) AS n_pixels,
         round(CAST(lum.lsum AS DOUBLE) / (1000.0 * m.w * m.h), 4) AS brightness
       FROM m JOIN lum USING (doc_id) ORDER BY m.doc_id"""

  /** Frame sampling + stride-2 resize over "video" payloads — the frame
    * buffer is a fixture (the document's UTF-8 bytes stand in for a raw
    * width×height frame sequence); every piece of the Spark plumbing is
    * real: per-video frame geometry, every-2nd-frame sampling via a
    * generated sequence (bounded, no row explosion beyond sampled frames),
    * per-frame byte slicing, and a half-resolution downsample that
    * reassembles every 2nd row INSIDE one `transform` expression — array
    * functions, no UDF, no shuffle except the presentation sort. A real
    * codec swaps into the substring step without touching the plan shape. */
  def mediaFrames(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") % 3 === 2) // the mediaTable "video" slice
      .select(col("doc_id"),
        (col("n_chars") % 64 + 1).cast(IntegerType).as("width"),
        (col("doc_id") % 48 + 1).cast(IntegerType).as("height"),
        col("text"), col("n_chars"))
      .withColumn("fs", col("width") * col("height"))
      .withColumn("nf", expr("n_chars div fs"))
      .filter(col("nf") >= 1)
      .select(col("doc_id"), col("width"), col("height"), col("fs"), col("text"),
        explode(expr("sequence(0, cast(least(nf - 1, 6) as int), 2)"))
          .as("frame_no"))
      .withColumn("off", col("frame_no") * col("fs"))
      .select(
        col("doc_id"), col("frame_no"),
        md5(expr("substring(text, off + 1, fs)")).as("frame_md5"),
        md5(expr(
          """array_join(transform(sequence(0, height - 1, 2),
               r -> substring(text, off + r * width + 1, width)), '')"""))
          .as("half_res_md5"))
      .orderBy("doc_id", "frame_no")

  val mediaFramesSql: String =
    """WITH v AS (SELECT doc_id,
                    CAST(n_chars % 64 + 1 AS INT) AS w,
                    CAST(doc_id % 48 + 1 AS INT) AS h,
                    text, n_chars
                  FROM documents WHERE doc_id % 3 = 2),
        f AS (SELECT doc_id, w, h, text, w * h AS fs,
                     n_chars // (w * h) AS nf
              FROM v WHERE n_chars // (w * h) >= 1),
        e AS (SELECT doc_id, w, h, text, fs,
                     unnest(generate_series(0, CAST(least(nf - 1, 6) AS INT), 2))
                       AS frame_no
              FROM f)
        SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
               md5(substring(text, frame_no * fs + 1, fs)) AS frame_md5,
               md5(array_to_string(list_transform(generate_series(0, h - 1, 2),
                     r -> substring(text, frame_no * fs + CAST(r AS INT) * w + 1, w)),
                   '')) AS half_res_md5
        FROM e ORDER BY doc_id, frame_no"""
}
