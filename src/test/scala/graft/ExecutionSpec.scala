package graft

import graft.llm.Multimodal
import graft.ops.{Analytics, Execution}
import org.apache.spark.sql.functions._

/** Specs for execution-control ops, the scalable row-number, the typed
  * aggregator, and the multimodal stub pipeline. */
class ExecutionSpec extends SparkSpec {
  import spark.implicits._

  test("scalableRowNumber produces a dense 1..n sequence in key order") {
    val ev = Tables.events(spark, Sf).select("event_id", "user_id")
    val numbered = Analytics.scalableRowNumber(ev, "event_id").cache()
    val n = numbered.count()
    val stats = numbered.agg(min("num"), max("num"), countDistinct("num")).head()
    assert(stats.getLong(0) == 1L && stats.getLong(1) == n && stats.getLong(2) == n)
    // order agreement: num rank must equal event_id rank
    val misordered = numbered
      .withColumn("byKey",
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy("event_id")))
      .filter(col("num") =!= col("byKey")).count()
    assert(misordered == 0)
    numbered.unpersist()
  }

  test("CentsVariance matches Spark's var_samp within tolerance") {
    val df = Execution.varianceAgg(spark, Sf)
    val ref = Tables.customer(spark, Sf)
      .groupBy("c_nationkey").agg(var_samp(col("c_acctbal")).as("v"))
    val joined = df.join(ref, "c_nationkey")
      .select(max(abs(col("bal_variance") - col("v")))).head().getDouble(0)
    assert(joined < 1e-6, s"max |centsVar - var_samp| = $joined")
  }

  test("cached fanout reports in-memory caching and both branches") {
    val rows = Execution.cachedFanout(spark, Sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("by_type", "by_user"))
    assert(rows.forall(_.getBoolean(2)), "cache was not in memory")
  }

  test("multimodal feature extraction is deterministic and complete") {
    val feats = Multimodal.mediaFeatures(spark, Sf).cache()
    assert(feats.count() == Tables.documents(spark, Sf).count())
    // Rec.601 luma of 8-bit pixels lives in [0, 255]
    val bad = feats.filter(col("brightness") < 0 || col("brightness") > 255).count()
    assert(bad == 0)
    // rerun -> identical output (encode + decode are deterministic)
    val again = Multimodal.mediaFeatures(spark, Sf)
    assert(feats.exceptAll(again).count() == 0)
    feats.unpersist()
  }

  test("PPM decoder parses a crafted 2x2 image exactly") {
    // Hand-built P6: red, green, blue, white. Integer Rec.601 sum:
    // 255*299 + 255*587 + 255*114 + 255*(299+587+114) = 255 * 1000 * 2,
    // so mean luma = 510000 / (1000 * 4) = 127.5 exactly.
    val header = "P6\n2 2\n255\n".getBytes("US-ASCII")
    val px = Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255)
      .map(_.toByte)
    val (w, h, luma) = Multimodal.decodePpm(header ++ px)
    assert(w == 2 && h == 2)
    assert(luma == 127.5)
    // Round-trips its own encoder: header dims survive the parse.
    val (w2, h2, _) = Multimodal.decodePpm(Multimodal.encodePpm(5, 3, 42L))
    assert(w2 == 5 && h2 == 3)
    // Rejects junk, a wrong magic, and truncated pixel data.
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("not an image".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("P5\n2 2\n255\n".getBytes("US-ASCII") ++ px)
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("P6\n9 9\n255\n".getBytes("US-ASCII") ++ px)
    }
  }

  test("PGM stream parser walks frame headers and samples every 2nd frame") {
    // Hand-built 3-frame stream with DIFFERENT header lengths per frame
    // (1-digit vs 2-digit width), so a parser that assumes fixed-size
    // headers lands mid-pixel and fails the digest comparison.
    def frame(w: Int, h: Int, fill: Int): Array[Byte] =
      s"P5\n$w $h\n255\n".getBytes("US-ASCII") ++
        Array.fill(w * h)(fill.toByte)
    val stream = frame(3, 2, 10) ++ frame(12, 1, 20) ++ frame(2, 2, 30)
    val rows = Multimodal.decodePgmFrames(7L, stream)
    // Frames 0 and 2 sampled; frame 1 (the 12-wide one) skipped but its
    // bytes must still be stepped over exactly.
    assert(rows.map(_.frame_no) == Seq(0, 2))
    assert(rows.map(r => (r.width, r.height)) == Seq((3, 2), (2, 2)))
    // Digest = md5 of the uppercase hex of the pixel bytes.
    def hx(bytes: Array[Byte]): String = {
      val hex = bytes.map(b => f"${b & 0xff}%02X").mkString
      java.security.MessageDigest.getInstance("MD5")
        .digest(hex.getBytes("US-ASCII"))
        .map(b => f"${b & 0xff}%02x").mkString
    }
    assert(rows.head.frame_md5 == hx(Array.fill(6)(10.toByte)))
    // Half-res of a 3x2 frame keeps row 0 only (3 bytes).
    assert(rows.head.half_res_md5 == hx(Array.fill(3)(10.toByte)))
    assert(rows(1).frame_md5 == hx(Array.fill(4)(30.toByte)))
    // Encoder round-trip: geometry survives, frames 0 and 2 of 4 sampled.
    val rt = Multimodal.decodePgmFrames(9L, Multimodal.encodePgmStream(5, 3, 4, 9L))
    assert(rt.map(_.frame_no) == Seq(0, 2))
    assert(rt.forall(r => r.width == 5 && r.height == 3))
    // Truncated trailing frame is rejected, not silently dropped.
    intercept[IllegalArgumentException] {
      Multimodal.decodePgmFrames(1L, stream.dropRight(1))
    }
  }

  test("motion profile SAD matches a direct generator-arithmetic replay") {
    val rows = Multimodal.mediaMotion(spark, Sf).collect()
    assert(rows.nonEmpty)
    // Replay one doc's SADs straight from the pixel formula.
    val id = rows.head.getLong(0)
    val nChars = Tables.documents(spark, Sf)
      .filter(col("doc_id") === id).head().getAs[Long]("n_chars")
    val (w, h, nf) = ((nChars % 16 + 1).toInt, (id % 12 + 1).toInt, (id % 4 + 2).toInt)
    def px(f: Int, i: Int): Long = (id * 17 + f.toLong * 101 + i.toLong * 7) % 256
    val expect = (0 until nf - 1).map { f =>
      (0 until w * h).map(i => math.abs(px(f + 1, i) - px(f, i))).sum
    }
    val got = rows.filter(_.getLong(0) == id).sortBy(_.getInt(1)).map(_.getLong(3)).toSeq
    assert(got == expect, s"doc $id: SADs $got != replayed $expect")
    // mean_centi is the integer-div law, and every pair of every doc obeys it
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(3) * 100 / r.getLong(2))
    }
  }

  test("WAV parser reads little-endian headers and sample deviations exactly") {
    // Encoder round-trip: fields come from the DECODED header.
    val (rate, n, durMs, dev) = Multimodal.decodeWav(
      Multimodal.encodeWav(11000, 250, 42L))
    assert(rate == 11000 && n == 250)
    assert(durMs == 250L * 1000 / 11000) // 22 ms, integer arithmetic
    // Mean |s-128| over s_i = (42*13 + 11i) mod 256 — recompute directly.
    val expect = (0 until 250).map(i => math.abs((42L * 13 + 11L * i) % 256 - 128))
      .sum / 250.0
    assert(dev == expect)
    // A hand-built 4-sample WAV: samples 128, 0, 255, 128 -> mean dev
    // (0 + 128 + 127 + 0) / 4 = 63.75.
    val crafted = Multimodal.encodeWav(8000, 4, 0L)
    // overwrite the 4 sample bytes (offset 44) with the crafted values
    crafted(44) = 128.toByte; crafted(45) = 0.toByte
    crafted(46) = 255.toByte; crafted(47) = 128.toByte
    assert(Multimodal.decodeWav(crafted)._4 == 63.75)
    // Rejects junk, a stereo claim, and truncated sample data.
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav("not audio at all, far too short".getBytes("US-ASCII"))
    }
    val stereo = Multimodal.encodeWav(8000, 4, 0L)
    stereo(22) = 2.toByte // channels LE16 -> 2
    intercept[IllegalArgumentException] { Multimodal.decodeWav(stereo) }
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(Multimodal.encodeWav(8000, 4, 0L).dropRight(1))
    }
  }

  test("pivot row sums equal per-user event counts") {
    val p = Execution.pivotCounts(spark, Sf)
      .withColumn("total",
        col("click") + col("purchase") + col("view") + col("signup") + col("error"))
      .select("user_id", "total")
    val byUser = Tables.events(spark, Sf).groupBy("user_id")
      .agg(count(lit(1)).as("n"))
    assert(p.join(byUser, "user_id").filter(col("total") =!= col("n")).count() == 0)
  }
}
