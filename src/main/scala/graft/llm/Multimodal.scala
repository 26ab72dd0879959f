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

  // ==========================================================================
  // Audio: real RIFF/WAVE (8-bit mono PCM) — binary little-endian headers,
  // the OTHER format family (netpbm headers are ASCII; WAV fields are raw
  // LE integers, so this parser exercises byte-order handling too).
  // ==========================================================================

  /** Audio geometry: sample rate 8-15 kHz, 100-599 samples. */
  private def audioGeometry(docId: Long, nChars: Long): (Int, Int) =
    ((8000 + (docId % 8) * 1000).toInt, (nChars % 500 + 100).toInt)

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Canonical 44-byte-header WAV encoder: RIFF/WAVE + fmt (PCM, mono,
    * 8-bit) + data, samples s_i = (seed*13 + 11i) mod 256 (unsigned PCM,
    * 128 = silence). */
  private[graft] def encodeWav(sampleRate: Int, nSamples: Int,
      seed: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(36 + nSamples), 0, 4)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    out.write(le32(16), 0, 4)       // fmt chunk size
    out.write(le16(1), 0, 2)        // PCM
    out.write(le16(1), 0, 2)        // mono
    out.write(le32(sampleRate), 0, 4)
    out.write(le32(sampleRate), 0, 4) // byte rate (8-bit mono)
    out.write(le16(1), 0, 2)        // block align
    out.write(le16(8), 0, 2)        // bits per sample
    out.write("data".getBytes("US-ASCII"))
    out.write(le32(nSamples), 0, 4)
    var i = 0
    while (i < nSamples) {
      out.write(((seed * 13 + i.toLong * 11) % 256).toInt)
      i += 1
    }
    out.toByteArray
  }

  case class AudioFeatures(
      doc_id: Long,
      sample_rate: Int,
      n_samples: Int,
      duration_ms: Long,
      mean_abs_dev: Double)

  /** REAL WAV parser: validates the RIFF/WAVE/fmt/data magics, reads the
    * little-endian format fields, requires 8-bit mono PCM, then one pass
    * over the sample bytes for mean absolute deviation from silence
    * (Σ|s−128| as an exact integer; one double division at the end — the
    * engine-portability discipline). duration_ms is integer arithmetic. */
  private[graft] def decodeWav(payload: Array[Byte]): (Int, Int, Long, Double) = {
    def ascii(off: Int, s: String): Boolean =
      payload.length >= off + s.length &&
        s.indices.forall(i => payload(off + i) == s.charAt(i))
    def rdLe32(off: Int): Int =
      (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8) |
        ((payload(off + 2) & 0xff) << 16) | ((payload(off + 3) & 0xff) << 24)
    def rdLe16(off: Int): Int =
      (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8)
    require(ascii(0, "RIFF") && ascii(8, "WAVE"), "not a RIFF/WAVE payload")
    require(ascii(12, "fmt ") && rdLe32(16) == 16, "unsupported fmt chunk")
    require(rdLe16(20) == 1, "not PCM")
    require(rdLe16(22) == 1, "not mono")
    val sampleRate = rdLe32(24)
    require(rdLe16(34) == 8, "not 8-bit samples")
    require(ascii(36, "data"), "missing data chunk")
    val n = rdLe32(40)
    require(payload.length >= 44 + n, "truncated sample data")
    var dev = 0L
    var i = 0
    while (i < n) {
      dev += math.abs((payload(44 + i) & 0xff) - 128)
      i += 1
    }
    (sampleRate, n, n.toLong * 1000 / sampleRate, dev / n.toDouble)
  }

  /** Audio feature extraction over the "audio" slice: encode a real WAV
    * per document (typed batch shape), re-parse it with [[decodeWav]] —
    * every reported field comes from the DECODED header/samples, not the
    * generator — and report rate, sample count, duration and mean absolute
    * deviation. The oracle reproduces all of it from the generator
    * arithmetic; a mis-read LE field or sample offset fails the gate. */
  def mediaAudio(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .filter(col("doc_id") % 3 === 1) // the mediaTable "audio" slice
      .select(col("doc_id"), col("n_chars").cast(LongType).as("n_chars"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        val (rate, ns) = audioGeometry(id, nChars)
        val (dRate, dn, durMs, dev) = decodeWav(encodeWav(rate, ns, id))
        AudioFeatures(id, dRate, dn, durMs, dev)
      })
      .toDF()
      .withColumn("mean_abs_dev", round(col("mean_abs_dev"), 4))
      .orderBy("doc_id")
  }

  val mediaAudioSql: String =
    """WITH a AS (SELECT doc_id,
            CAST(8000 + (doc_id % 8) * 1000 AS INT) AS rate,
            CAST(n_chars % 500 + 100 AS INT) AS ns
          FROM documents WHERE doc_id % 3 = 1),
        dev AS (SELECT doc_id,
                  CAST(sum(abs(((doc_id * 13 + i * 11) % 256) - 128)) AS BIGINT) AS sdev
                FROM a, generate_series(0, 598) t(i)
                WHERE i < ns
                GROUP BY doc_id)
        SELECT a.doc_id, a.rate AS sample_rate, a.ns AS n_samples,
               CAST(a.ns * 1000 // a.rate AS BIGINT) AS duration_ms,
               round(CAST(dev.sdev AS DOUBLE) / a.ns, 4) AS mean_abs_dev
        FROM a JOIN dev USING (doc_id) ORDER BY a.doc_id"""

  /** Frame geometry moduli of the video fixture — the SINGLE source of the
    * bounds both fixture SQL oracles interpolate (w <= VideoWMod,
    * h <= VideoHMod, nf <= VideoFMod + 1), so changing the geometry here
    * re-sizes the oracles' generate_series enumeration with it instead of
    * silently under-enumerating frames/pixels. */
  private[graft] val VideoWMod = 16
  private[graft] val VideoHMod = 12
  private[graft] val VideoFMod = 4

  /** Frame geometry of the video fixture: small grayscale frames so the
    * multi-frame payloads stay modest (w <= 16, h <= 12, 2-5 frames). */
  private def videoGeometry(docId: Long, nChars: Long): (Int, Int, Int) =
    ((nChars % VideoWMod + 1).toInt, (docId % VideoHMod + 1).toInt,
      (docId % VideoFMod + 2).toInt)

  /** Multi-frame P5 PGM stream encoder — the video fixture's "camera": a
    * raw grayscale video as `nf` concatenated binary PGM images (the
    * netpbm multi-image convention: each frame is a complete
    * `P5\n{w} {h}\n255\n` header + w*h gray bytes). Frame f's pixel i is
    * `(seed*17 + f*101 + i*7) mod 256` — deterministic, frame-distinct,
    * oracle-reproducible. */
  private[graft] def encodePgmStream(w: Int, h: Int, nf: Int,
      seed: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    (0 until nf).foreach { f =>
      out.write(s"P5\n$w $h\n255\n".getBytes("US-ASCII"))
      var i = 0
      while (i < w * h) {
        out.write(((seed * 17 + f.toLong * 101 + i.toLong * 7) % 256).toInt)
        i += 1
      }
    }
    out.toByteArray
  }

  case class FrameRow(
      doc_id: Long,
      frame_no: Int,
      width: Int,
      height: Int,
      frame_md5: String,
      half_res_md5: String)

  private def hexMd5(bytes: Array[Byte]): String = {
    val hex = bytes.map(b => f"${b & 0xff}%02X").mkString
    java.security.MessageDigest.getInstance("MD5")
      .digest(hex.getBytes("US-ASCII"))
      .map(b => f"${b & 0xff}%02x").mkString
  }

  /** REAL multi-frame P5 parser: walks the payload sequentially — each
    * frame's pixel offset depends on its parsed header length, so a wrong
    * parse shifts every later frame and the digest gate catches it. Emits
    * every SECOND frame (the sampling step) with the decoded dims, a
    * digest of the frame's pixel bytes, and a digest of its stride-2
    * vertical downsample (every 2nd pixel row). Digests are md5 over the
    * uppercase hex rendering — the [[mediaMeta]] convention, because the
    * differential oracle's md5 is VARCHAR-only. */
  /** Sequential walk of a multi-image P5 payload: every frame's pixel
    * offset depends on its parsed header length, so a wrong parse shifts
    * every later frame (the digest gates catch that). Shared by the
    * sampling decoder and the motion profiler. */
  private[graft] def parseP5Frames(
      payload: Array[Byte]): Seq[(Int, Int, Int, Array[Byte])] = {
    val frames = scala.collection.mutable.ListBuffer.empty[(Int, Int, Int, Array[Byte])]
    var pos = 0
    var frameNo = 0
    while (pos < payload.length) {
      require(pos + 2 <= payload.length &&
        payload(pos) == 'P' && payload(pos + 1) == '5',
        s"not a P5 frame header at offset $pos")
      pos += 2
      def nextInt(): Int = {
        while (pos < payload.length && payload(pos).toChar.isWhitespace) pos += 1
        require(pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9',
          "malformed PGM header")
        var v = 0
        while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
          v = v * 10 + (payload(pos) - '0')
          pos += 1
        }
        v
      }
      val w = nextInt(); val h = nextInt(); val maxv = nextInt()
      require(maxv == 255, s"unsupported PGM maxval $maxv")
      pos += 1 // single whitespace before pixel data
      require(payload.length >= pos + w * h, "truncated PGM frame")
      frames += ((frameNo, w, h,
        java.util.Arrays.copyOfRange(payload, pos, pos + w * h)))
      pos += w * h
      frameNo += 1
    }
    frames.toList
  }

  private[graft] def decodePgmFrames(docId: Long,
      payload: Array[Byte]): Seq[FrameRow] =
    parseP5Frames(payload).collect { case (frameNo, w, h, frame)
        if frameNo % 2 == 0 =>
      val half = (0 until h by 2).flatMap(r =>
        frame.slice(r * w, (r + 1) * w)).toArray
      FrameRow(docId, frameNo, w, h, hexMd5(frame), hexMd5(half))
    }

  /** Frame sampling + stride-2 resize over REAL video payloads: the video
    * slice encodes a genuine multi-frame binary P5 stream per document
    * (per-partition, the typed-batch shape), and the decoder re-parses
    * those bytes frame by frame — header-length-dependent offsets and all —
    * sampling every 2nd frame and digesting each sampled frame plus its
    * half-vertical-resolution downsample. The DuckDB oracle reproduces
    * every digest from the generator arithmetic, so a single mis-parsed
    * header byte fails the hash gate. No shuffle except the presentation
    * sort; a production codec (e.g. MJPEG) swaps into the two
    * encode/decode bodies without touching the pipeline. */
  def mediaFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .filter(col("doc_id") % 3 === 2) // the mediaTable "video" slice
      .select(col("doc_id"), col("n_chars").cast(LongType).as("n_chars"))
      .as[(Long, Long)]
      .mapPartitions(_.flatMap { case (id, nChars) =>
        val (w, h, nf) = videoGeometry(id, nChars)
        decodePgmFrames(id, encodePgmStream(w, h, nf, id))
      })
      .toDF()
      .orderBy("doc_id", "frame_no")
  }

  // Per sampled frame: rebuild the pixel hex (and its even-row subset) from
  // the generator arithmetic and hash it. Constant series bounds with WHERE
  // filters (DuckDB's generate_series takes no lateral column bounds).
  val mediaFramesSql: String =
    s"""WITH v AS (SELECT doc_id,
                    CAST(n_chars % $VideoWMod + 1 AS INT) AS w,
                    CAST(doc_id % $VideoHMod + 1 AS INT) AS h,
                    CAST(doc_id % $VideoFMod + 2 AS INT) AS nf
                  FROM documents WHERE doc_id % 3 = 2),
        e AS (SELECT doc_id, w, h, f.f AS frame_no
              FROM v, generate_series(0, $VideoFMod, 2) f(f)
              WHERE f.f < nf),
        px AS (SELECT e.doc_id, e.frame_no,
                 string_agg(lpad(to_hex((e.doc_id * 17 + e.frame_no * 101 + i * 7) % 256),
                                 2, '0'), '' ORDER BY i) AS fhex,
                 string_agg(lpad(to_hex((e.doc_id * 17 + e.frame_no * 101 + i * 7) % 256),
                                 2, '0'), '' ORDER BY i)
                   FILTER (WHERE (i // e.w) % 2 = 0) AS hhex
               FROM e, generate_series(0, $VideoWMod * $VideoHMod - 1) t(i)
               WHERE i < e.w * e.h
               GROUP BY e.doc_id, e.frame_no)
        SELECT e.doc_id, CAST(e.frame_no AS INT) AS frame_no,
               e.w AS width, e.h AS height,
               md5(upper(px.fhex)) AS frame_md5,
               md5(upper(px.hhex)) AS half_res_md5
        FROM e JOIN px USING (doc_id, frame_no)
        ORDER BY e.doc_id, e.frame_no"""

  case class MotionRow(
      doc_id: Long,
      frame_from: Int,
      npix: Long,
      sad: Long,
      mean_centi: Long)

  /** Temporal motion profile over the REAL video payloads: every
    * consecutive frame pair's sum of absolute pixel differences (SAD — the
    * kernel under scene-cut detection, shot segmentation, and codec motion
    * search), integer-exact end to end: sad is a plain long sum, the mean
    * is reported in integer centi-levels (sad*100 div npix). The decoder
    * re-parses the multi-frame P5 stream through [[parseP5Frames]] —
    * header-length-dependent offsets and all — so the SAD gate doubles as
    * a full-payload parse gate (the sampling decoder only touches every
    * 2nd frame; this touches them all). Per-partition typed mapPartitions,
    * no shuffle except the presentation sort. */
  def mediaMotion(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .filter(col("doc_id") % 3 === 2) // the mediaTable "video" slice
      .select(col("doc_id"), col("n_chars").cast(LongType).as("n_chars"))
      .as[(Long, Long)]
      .mapPartitions(_.flatMap { case (id, nChars) =>
        val (w, h, nf) = videoGeometry(id, nChars)
        val frames = parseP5Frames(encodePgmStream(w, h, nf, id))
        frames.sliding(2).collect { case Seq((f0, _, _, a), (_, _, _, b)) =>
          var sad = 0L; var i = 0
          while (i < a.length) {
            sad += math.abs((a(i) & 0xff) - (b(i) & 0xff)); i += 1
          }
          MotionRow(id, f0, a.length.toLong, sad, sad * 100 / a.length)
        }
      })
      .toDF()
      .orderBy("doc_id", "frame_from")
  }

  /** Oracle: the generator arithmetic gives pixel i of frame f directly,
    * so the SAD is a series sum of |p(f+1,i) - p(f,i)|. */
  val mediaMotionSql: String =
    s"""WITH v AS (SELECT doc_id,
                    CAST(n_chars % $VideoWMod + 1 AS INT) AS w,
                    CAST(doc_id % $VideoHMod + 1 AS INT) AS h,
                    CAST(doc_id % $VideoFMod + 2 AS INT) AS nf
                  FROM documents WHERE doc_id % 3 = 2),
       p AS (SELECT doc_id, w, h, f.f AS frame_from
             FROM v, generate_series(0, ${VideoFMod - 1}) f(f)
             WHERE f.f < nf - 1),
       sads AS (SELECT p.doc_id, p.frame_from,
                  CAST(p.w * p.h AS BIGINT) AS npix,
                  CAST(sum(abs(
                    (p.doc_id * 17 + (p.frame_from + 1) * 101 + i * 7) % 256
                    - (p.doc_id * 17 + p.frame_from * 101 + i * 7) % 256))
                    AS BIGINT) AS sad
                FROM p, generate_series(0, $VideoWMod * $VideoHMod - 1) t(i)
                WHERE i < p.w * p.h
                GROUP BY p.doc_id, p.frame_from, p.w, p.h)
       SELECT doc_id, CAST(frame_from AS INT) AS frame_from, npix, sad,
         CAST(sad * 100 // npix AS BIGINT) AS mean_centi
       FROM sads ORDER BY doc_id, frame_from"""
}
