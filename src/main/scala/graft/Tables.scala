package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-corpus table loaders (TESTDATA.md). Every query function receives the
  * scale-factor directory and reads through here, so schema/pushdown behavior
  * is uniform: parquet scans with column pruning + predicate pushdown left to
  * Catalyst. At cluster scale these would be external tables; the API shape
  * (name -> DataFrame) is identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The corpus stores its timestamp columns (events.ts, orders.o_orderdate,
    // lineitem.l_shipdate) as parquet TIMESTAMP(MICROS, isAdjustedToUTC=false),
    // which Spark 4 infers as TIMESTAMP_NTZ by default. Every consumer in this
    // library (unix_micros, time windows, watermarks, the DuckDB oracle's
    // naive-as-UTC reading) expects TIMESTAMP_LTZ in the UTC session, so turn
    // NTZ inference off AT THE SCAN: the reader then produces LTZ natively and
    // timestamp predicates keep pushing down to parquet row-group stats — a
    // cast-on-top-of-scan would produce the same values but strand filters
    // above the scan. Wall-clock values are identical either way (UTC session).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects outright ([PARQUET_TYPE_ILLEGAL]). Read nanos as raw int64
    * (legacy conf) and convert with *integer* division — epoch-nanos
    * (~1.7e18) exceeds double's 2^53 integer range, so a double divide would
    * corrupt timestamps. Sub-microsecond precision in the corpus is zero, so
    * the ns->us truncation is lossless. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = s.read.parquet(s"$d/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // corpus file: raw nanos
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw // derived copies already carry a proper timestamp
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` queries can run —
    * mirrors the reference's createOrReplaceTempView style
    * (reference transform-data.py:269-273). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
