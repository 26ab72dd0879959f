package graft

import graft.pipeline.SongAnalytics._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** End-to-end spec of the drop-in reference pipeline on inline song-shaped
  * data (the reference's own inputs are git-ignored; schemas survive as
  * FIXTURES.md §A). Every reference output table is built and checked. */
class SongAnalyticsSpec extends SparkSpec {

  private lazy val songs: DataFrame = {
    val rows = Seq(
      Row(1, "A1", null, null, "NYC", "Artist One", "S1", "Song One", 180.5f, 2001),
      Row(1, "A2", 40.7f, -74.0f, "LA", "Artist Two", "S2", "Song Two", 200.0f, 2005),
      Row(1, "A2", 40.7f, -74.0f, "LA", "Artist Two", "S2", "Song Two", 200.0f, 2005), // dup
      Row(1, "A3", null, 10.0f, "SF", "Artist Three", "S3", "Song Three", 150.25f, 0))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(
        r.get(0), r.get(1),
        Option(r.get(2)).map(_.asInstanceOf[Float]).orNull,
        Option(r.get(3)).map(_.asInstanceOf[Float]).orNull,
        r.get(4), r.get(5), r.get(6), r.get(7), r.get(8), r.get(9)))),
      songSchema)
  }

  private lazy val logs: DataFrame = {
    def ev(first: String, last: String, uid: String, level: String, page: String,
        artist: String, song: String, ts: Long, session: Long) =
      Row(artist, "Logged In", first, "F", 1L, last, 123.4, level, "NYC", "PUT",
        page, 1.541E12, session, song, "200", ts.toString, "agent", uid)
    val base = 1541207073796L
    val rows = Seq(
      ev("Ann", "Alpha", "u1", "paid", "NextSong", "Artist One", "Song One", base, 1L),
      ev("Ann", "Alpha", "u1", "free", "NextSong", "Artist Two", "Song Two", base + 60000, 1L),
      ev("Bob", "Beta", "u2", "paid", "NextSong", "Artist Two", "Song Two", base + 120000, 2L),
      ev("Bob", "Beta", "u2", "paid", "Home", "Artist Two", "Song Two", base + 180000, 2L), // filtered
      ev("", "", "", "free", "NextSong", "Artist One", "Song One", base + 240000, 3L), // anonymous
      ev("Ann", "Alpha", "u1", "paid", "NextSong", "NoSuch Artist", "No Song", base + 300000, 1L))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), logSchema)
  }

  test("cleanSongs fills null coordinates") {
    val c = cleanSongs(songs)
    assert(c.filter(col("artist_latitude").isNull || col("artist_longitude").isNull)
      .count() == 0)
  }

  test("songs/artists dims dedup to distinct keys") {
    val c = cleanSongs(songs)
    assert(buildSongsDim(c).count() == 3)
    val artists = buildArtistsDim(c)
    assert(artists.count() == 3)
    assert(artists.columns.toSeq ==
      Seq("artist_id", "name", "location", "latitude", "longitude"))
  }

  test("cleanLogs keeps NextSong only and converts epoch-ms string to UTC timestamp") {
    val c = cleanLogs(logs)
    assert(c.count() == 5)
    val t = c.orderBy("ts").select(col("ts_converted").cast("string")).head().getString(0)
    assert(t == "2018-11-03 01:04:33.796") // UTC, not driver-local tz
    assert(c.schema("registration_converted").dataType.typeName == "long")
  }

  test("users dim excludes nothing but duplicates") {
    val users = buildUsersDim(cleanLogs(logs))
    // reference semantics: dropDuplicates over ALL columns — u1 appears at
    // both levels, so (u1,paid), (u1,free), (u2,paid), ('',free)
    assert(users.count() == 4)
  }

  test("time dim date parts and distinctness") {
    val t = buildTimeDim(cleanLogs(logs))
    assert(t.count() == 5)
    assert(t.filter(col("year") =!= 2018 || col("month") =!= 11).count() == 0)
  }

  test("user_level_listen joins paid+free users, drops anonymous, concats name") {
    val c = cleanLogs(logs)
    val ull = buildUserLevelListen(c, buildUsersDim(c))
    val rows = ull.collect()
    // only u1 has both paid and free listens
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "Ann Alpha")
    assert(rows(0).getLong(1) == 2L && rows(0).getLong(2) == 1L)
  }

  test("songplays fact: natural-key 4-way join with contiguous numbering") {
    val c = cleanLogs(logs)
    val sp = buildSongplays(c, buildTimeDim(c), buildArtistsDim(cleanSongs(songs)),
      buildSongsDim(cleanSongs(songs)))
    val rows = sp.orderBy("num").collect()
    // 5 clean listens, minus 1 unmatched artist/song, = 4 matched plays
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Int]("num")).toSeq == Seq(1, 2, 3, 4))
    assert(sp.columns.contains("song_id") && sp.columns.contains("artist_id"))
  }

  test("round-trip: partitioned parquet + csv sinks") {
    val tmp = System.getProperty("java.io.tmpdir")
    val c = cleanLogs(logs)
    val t = buildTimeDim(c)
    writePartitioned(t, s"$tmp/graft_songs_time", Seq("year", "month"))
    val back = spark.read.parquet(s"$tmp/graft_songs_time")
    assert(back.count() == t.count())
    writeCsv(buildUsersDim(c), s"$tmp/graft_songs_users")
    val users = spark.read.option("header", "true").csv(s"$tmp/graft_songs_users")
    assert(users.count() == 4)
  }
}
