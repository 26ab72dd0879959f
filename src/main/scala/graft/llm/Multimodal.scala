package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decode/feature-extract as partition-parallel batch transforms.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * deterministic fake (documented below); everything Spark-side — schema,
  * binary column handling, batch-shaped `mapPartitions` transform, metadata
  * struct propagation, partitioning — is real and oracle-/spec-tested.
  * In production the fake decoder body is the only thing that changes
  * (swap in e.g. a JNI codec); the plumbing, shuffle and schema contracts
  * stay identical. This is the Scala/Tungsten analog of a Pandas
  * `mapInPandas` decode: per-partition batches, columnar in, columnar out,
  * no per-row driver involvement.
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
      brightness: Double) // fake decode output — deterministic from bytes

  /** Build a media table from documents: UTF-8 payload bytes standing in for
    * encoded media; width/height derived deterministically. Oracle-checkable
    * (all arithmetic is reproducible in DuckDB). */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("modality"),
        (col("n_chars") % 64 + 1).cast(IntegerType).as("width"),
        (col("doc_id") % 48 + 1).cast(IntegerType).as("height"),
        encode(col("text"), "UTF-8").as("payload"))

  /** Metadata/feature projection over the binary column — length, pixel
    * count, payload digest. Pure column expressions; the oracle mirrors it. */
  def mediaMeta(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .select(
        col("doc_id"), col("modality"), col("width"), col("height"),
        length(col("payload")).as("n_bytes"),
        (col("width").cast(LongType) * col("height")).as("n_pixels"),
        md5(col("payload")).as("payload_md5"))
      .orderBy("doc_id")

  val mediaMetaSql: String =
    """SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality,
       CAST(n_chars % 64 + 1 AS INT) AS width,
       CAST(doc_id % 48 + 1 AS INT) AS height,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       CAST((n_chars % 64 + 1) * (doc_id % 48 + 1) AS BIGINT) AS n_pixels,
       md5(text) AS payload_md5
       FROM documents ORDER BY doc_id"""

  /** DECODE STUB — deterministic fake standing in for a real media decoder
    * (no codecs in this container). Real implementation would decode
    * `payload` and compute e.g. mean luma; the fake averages payload bytes so
    * output is reproducible and the full pipeline stays testable. */
  private def decodeStub(payload: Array[Byte]): Double =
    if (payload.isEmpty) 0.0
    else payload.map(b => (b & 0xff).toDouble).sum / payload.length

  /** Partition-parallel feature extraction over binary payloads: the
    * mapInPandas-equivalent batch shape. Executors stream partitions of
    * [[MediaRecord]] through the decoder; no shuffle, no driver collect. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { r =>
        MediaFeatures(
          doc_id = r.doc_id,
          modality = r.modality,
          n_bytes = r.payload.length,
          n_pixels = r.width.toLong * r.height,
          brightness = decodeStub(r.payload))
      }
    }
  }

  /** End-to-end: build media table -> typed Dataset -> batch feature
    * extraction. Even the stub is oracle-checked: payload bytes are UTF-8 of
    * ASCII text, so DuckDB can reproduce "brightness" from character codes. */
  def mediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    extractFeatures(mediaTable(s, d).as[MediaRecord])
      .toDF()
      .withColumn("brightness", round(col("brightness"), 4))
      .orderBy("doc_id")
  }

  val mediaFeaturesSql: String =
    """SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       CAST((n_chars % 64 + 1) * (doc_id % 48 + 1) AS BIGINT) AS n_pixels,
       round(CAST(list_aggregate(list_transform(string_split(text, ''), x -> ord(x)), 'sum') AS DOUBLE)
             / length(text), 4) AS brightness
       FROM documents ORDER BY doc_id"""

  /** Frame sampling + stride-2 resize over "video" payloads — the decode
    * step is the documented stub (the payload's UTF-8 bytes stand in for a
    * raw width×height frame sequence); every piece of the Spark plumbing is
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
