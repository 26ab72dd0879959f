package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Drop-in re-implementation of the reference pipeline's API surface
  * (Song-Analytics-with-Spark/transform-data.py) — a user of the reference
  * can run the same star-schema build through these functions. Citations are
  * to the reference file (`T:`).
  *
  * Differences from the reference, by design:
  *  - T:296's `row_number() over (order by "idx")` orders by a string
  *    CONSTANT (nondeterministic ids); we order by the documented intent
  *    (the id column).
  *  - T:128's timestamp UDF used driver-local timezone; we use
  *    timestamp_millis (UTC session semantics) and no Python/Scala UDF at
  *    all — every step is a codegen'd column expression.
  */
object SongAnalytics {

  /** Input schemas, exactly as declared in the reference (T:186-197,
    * T:207-226; recorded in FIXTURES.md §A). */
  val songSchema: StructType = StructType(Seq(
    StructField("num_songs", IntegerType),
    StructField("artist_id", StringType),
    StructField("artist_latitude", FloatType),
    StructField("artist_longitude", FloatType),
    StructField("artist_location", StringType),
    StructField("artist_name", StringType),
    StructField("song_id", StringType),
    StructField("title", StringType),
    StructField("duration", FloatType),
    StructField("year", IntegerType)))

  val logSchema: StructType = StructType(Seq(
    StructField("artist", StringType),
    StructField("auth", StringType),
    StructField("firstName", StringType),
    StructField("gender", StringType),
    StructField("itemInSession", LongType),
    StructField("lastName", StringType),
    StructField("length", DoubleType),
    StructField("level", StringType),
    StructField("location", StringType),
    StructField("method", StringType),
    StructField("page", StringType),
    StructField("registration", DoubleType),
    StructField("sessionId", LongType),
    StructField("song", StringType),
    StructField("status", StringType),
    StructField("ts", StringType), // epoch millis as string — reference quirk
    StructField("userAgent", StringType),
    StructField("userId", StringType)))

  /** read_s3_data analog (T:64-81): schema-explicit JSON scan. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.format("json").schema(schema).load(path)

  /** process_songs_dataframe (T:85-108): fillna lat/long -> songs + artists
    * dims with dedup. */
  def cleanSongs(songs: DataFrame): DataFrame =
    songs.na.fill(Map("artist_latitude" -> 0.0, "artist_longitude" -> 0.0))

  def buildSongsDim(songsClean: DataFrame): DataFrame =
    songsClean
      .select("song_id", "title", "artist_id", "year", "duration")
      .dropDuplicates()

  def buildArtistsDim(songsClean: DataFrame): DataFrame =
    songsClean
      .select(
        col("artist_id"),
        col("artist_name").as("name"),
        col("artist_location").as("location"),
        col("artist_latitude").as("latitude"),
        col("artist_longitude").as("longitude"))
      .dropDuplicates()

  /** process_logs_dataframe, cleaning part (T:112-132): keep listen events,
    * epoch-ms string -> timestamp (pure expression, replaces the reference's
    * Python UDF), registration double -> long. */
  def cleanLogs(logs: DataFrame): DataFrame =
    logs
      .filter(col("page") === "NextSong")
      .withColumn("ts_converted",
        timestamp_millis(col("ts").cast(LongType)))
      .withColumn("registration_converted",
        col("registration").cast(LongType))

  /** Users dim (T:135-138). */
  def buildUsersDim(logsClean: DataFrame): DataFrame =
    logsClean
      .select(
        col("userId").as("user_id"),
        col("firstName").as("first_name"),
        col("lastName").as("last_name"),
        col("gender"),
        col("level"))
      .dropDuplicates()

  /** Time dim (T:168-177): 8 date parts off the converted timestamp. */
  def buildTimeDim(logsClean: DataFrame): DataFrame =
    logsClean
      .select(col("ts_converted").as("start_time")).distinct()
      .withColumn("day", dayofmonth(col("start_time")))
      .withColumn("month", month(col("start_time")))
      .withColumn("year", year(col("start_time")))
      .withColumn("hour", hour(col("start_time")))
      .withColumn("minute", minute(col("start_time")))
      .withColumn("second", second(col("start_time")))
      .withColumn("week", weekofyear(col("start_time")))
      .withColumn("weekday", dayofweek(col("start_time")))

  /** user_level_listen report (T:144-165): paid/free listen counts joined,
    * anonymous users dropped, full-name concat + distinct. */
  def buildUserLevelListen(logsClean: DataFrame, users: DataFrame): DataFrame = {
    val paid = logsClean.filter(col("level") === "paid")
      .groupBy(col("userId")).agg(count(lit(1)).as("paid_use_count"))
    val free = logsClean.filter(col("level") === "free")
      .groupBy(col("userId")).agg(count(lit(1)).as("free_use_count"))
    val both = paid.join(free, Seq("userId"), "inner")
      .where(col("userId") =!= "")
    users.join(both, users("user_id") === both("userId"), "inner")
      .select(
        concat_ws(" ", col("first_name"), col("last_name")).as("full_name"),
        col("paid_use_count"), col("free_use_count"))
      .distinct()
  }

  /** process_songplays (T:252-300): the flagship 4-way natural-key join +
    * sequential numbering. Joins on timestamp + artist NAME + song TITLE as
    * the reference does (T:276-285) — the string-natural-key character is the
    * point; dims are broadcast. */
  def buildSongplays(
      logsClean: DataFrame,
      timeDim: DataFrame,
      artists: DataFrame,
      songs: DataFrame): DataFrame = {
    // Qualified aliases: artists and songs usually share lineage (both derive
    // from the same cleaned songs scan), which trips Spark's ambiguous-self-
    // join detection if columns are referenced through the parent DataFrames.
    val joined = logsClean.as("l")
      .join(timeDim.as("t"), col("l.ts_converted") === col("t.start_time"), "inner")
      .join(broadcast(artists.as("a")), col("l.artist") === col("a.name"), "inner")
      .join(broadcast(songs.as("s")), col("l.song") === col("s.title"), "inner")
      .select(
        col("t.start_time"),
        col("l.userId").as("user_id"),
        col("l.level"),
        col("s.song_id"),
        col("a.artist_id"),
        col("l.sessionId").as("session_id"),
        col("l.location"),
        col("l.userAgent").as("user_agent"),
        col("t.year"),
        col("t.month"))
    // Reference bug fixed: number by a real ordering, not a string literal.
    joined
      .withColumn("idx", monotonically_increasing_id())
      .withColumn("num", row_number().over(
        Window.orderBy(col("idx"))))
      .drop("idx")
  }

  /** write_parquet_file analog (T:313-327). */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    if (cols.isEmpty) df.write.mode("overwrite").parquet(path)
    else df.repartition(cols.map(col): _*)
      .write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** CSV sink with header (T:333-335). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}
