package graft

import graft.llm.QualitySignals
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Quality-signal operators: independent Scala recomputation of every row
  * (the strongest internal gate — the oracle then cross-checks DuckDB),
  * plus plan-shape guards on the shuffle-free claims. */
class QualitySignalsSpec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def texts: Map[Long, String] =
    Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("gopher rules recompute row-for-row and split the corpus") {
    val byDoc = texts
    val rows = QualitySignals.gopherRules(spark, Sf).collect()
    assert(rows.length == byDoc.size)
    rows.foreach { r =>
      val ws = byDoc(r.getAs[Long]("doc_id")).split(" ", -1).toSeq
      val nw = ws.length
      val expAwl = (byDoc(r.getAs[Long]("doc_id")).length - nw + 1).toDouble / nw
      val expStop = ws.count(TextAnalysis_Stopwords.contains)
      val expTtr = ws.distinct.length.toDouble / nw
      val expTop = ws.groupBy(identity).values.map(_.length).max.toDouble / nw
      assert(r.getAs[Int]("n_words") == nw)
      assert(math.abs(r.getAs[Double]("avg_word_len") - expAwl) < 1e-12)
      assert(r.getAs[Int]("stop_hits") == expStop)
      assert(math.abs(r.getAs[Double]("ttr") - expTtr) < 1e-12)
      assert(math.abs(r.getAs[Double]("top_word_frac") - expTop) < 1e-12)
      val flags = Seq("wc_ok", "awl_ok", "stop_ok", "ttr_ok", "top_ok")
        .map(r.getAs[Boolean])
      assert(r.getAs[Boolean]("pass") == flags.forall(identity),
        s"pass must be the conjunction of the rule flags: $r")
      assert(flags(0) == (nw >= QualitySignals.MinWords && nw <= QualitySignals.MaxWords))
      assert(flags(3) == (expTtr >= QualitySignals.MinTtr))
      assert(flags(4) == (expTop <= QualitySignals.MaxTopWordFrac))
    }
    val nPass = rows.count(_.getAs[Boolean]("pass"))
    assert(nPass > 0 && nPass < rows.length,
      s"thresholds must split the corpus, got $nPass/${rows.length} passing")
  }

  private val TextAnalysis_Stopwords = graft.llm.TextAnalysis.Stopwords.toSet

  test("word entropy recomputes exactly under the decimal-sum discipline") {
    val byDoc = texts
    val rows = QualitySignals.wordEntropy(spark, Sf).collect()
    assert(rows.length == byDoc.size)
    rows.foreach { r =>
      val ws = byDoc(r.getAs[Long]("doc_id")).split(" ", -1).toSeq
      val n = ws.length
      val counts = ws.groupBy(identity).values.map(_.length)
      // Same discipline as the operator: round each −p·ln p term to 6 dp,
      // sum exactly, round the total.
      val ent = counts.map { c =>
        val p = c.toDouble / n
        BigDecimal(round6(-p * math.log(p)))
      }.sum
      assert(r.getAs[Int]("n_words") == n)
      assert(r.getAs[Int]("n_distinct") == counts.size)
      val got = r.getAs[Double]("entropy")
      assert(math.abs(got - round6(ent.toDouble)) < 1e-9,
        s"doc ${r.getLong(0)}: entropy $got vs recomputed ${ent.toDouble}")
      // H is maximized by the uniform distribution over the distinct words.
      assert(got <= math.log(counts.size.toDouble) + 1e-4)
      val norm = r.getAs[Double]("norm_entropy")
      assert(norm >= -1e-9 && norm <= 1.0 + 1e-4)
    }
  }

  test("DSIR weights separate the target language and cover every token") {
    val out = QualitySignals.dsirWeights(spark, Sf).cache()
    val n = Tables.documents(spark, Sf).count()
    assert(out.count() == n, "every document must be scored")
    // n_tokens is the whitespace token count.
    val mismatch = out.join(
      Tables.documents(spark, Sf)
        .select(col("doc_id"), size(split(col("text"), " ")).as("exp_n")),
      "doc_id").filter(col("n_tokens") =!= col("exp_n"))
    assert(mismatch.count() == 0, "n_tokens must equal the whitespace count")
    // The whole point of importance weighting: target-language documents
    // score higher on average than the rest of the pool.
    val means = out.withColumn("is_tgt", col("lang") === QualitySignals.DsirTargetLang)
      .groupBy("is_tgt").agg(avg("avg_llr").as("m")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"target mean ${means(true)} must exceed non-target ${means(false)}")
    out.unpersist()
  }

  test("source drift is a nonnegative KL with conserved token mass") {
    val rows = QualitySignals.sourceDrift(spark, Sf).collect()
    val nSources = Tables.documents(spark, Sf).select("source").distinct().count()
    assert(rows.length == nSources)
    // Rounding each term to 6 dp bounds the additive error by vocab·5e-7.
    rows.foreach { r =>
      val slack = r.getAs[Int]("vocab") * 5e-7
      assert(r.getAs[Double]("kl_drift") >= -slack,
        s"KL must be nonnegative up to rounding: $r")
    }
    val totTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    val expTokens = Tables.documents(spark, Sf)
      .select(sum(size(split(col("text"), " ")))).head().getLong(0)
    assert(totTokens == expTokens, "per-source token masses must tile the corpus")
  }

  test("quality-weighted sample tiers honestly and keeps by the hash coin") {
    val out = QualitySignals.qualityWeightedSample(spark, Sf).cache()
    val rules = QualitySignals.gopherRules(spark, Sf)
      .select("doc_id", "pass").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val ents = QualitySignals.wordEntropy(spark, Sf)
      .select("doc_id", "norm_entropy").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = out.collect()
    assert(rows.length == rules.size, "every document must be tiered")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expTier =
        if (rules(id) && ents(id) >= QualitySignals.HighEntropyFloor) 2
        else if (rules(id)) 1 else 0
      assert(r.getAs[Int]("tier") == expTier, s"doc $id tier")
      val h = BigInt(java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(7), 16).toLong % 1000000L
      assert(r.getAs[Boolean]("kept") == (h < r.getAs[Long]("keep_ppm")),
        s"doc $id kept flag must follow the md5 coin")
    }
    // The tiering must actually stratify the corpus, and tier 2 keeps all.
    val byTier = rows.groupBy(_.getAs[Int]("tier"))
    assert(byTier.keySet == Set(0, 1, 2), s"tiers present: ${byTier.keySet}")
    assert(byTier(2).forall(_.getAs[Boolean]("kept")))
    out.unpersist()
  }

  test("gopher rules and word entropy plans shuffle only for the final sort") {
    Seq(QualitySignals.gopherRules(spark, Sf),
        QualitySignals.wordEntropy(spark, Sf)).foreach { df =>
      val shuffles = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.length <= 1,
        s"per-row quality signals must not shuffle beyond the presentation " +
          s"sort, found ${shuffles.length}")
    }
  }
}
