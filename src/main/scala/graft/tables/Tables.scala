package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness test tables (TESTDATA.md).
  *
  * One parquet file per table under the scale-factor directory. Reads are
  * plain `spark.read.parquet` so Catalyst owns column pruning and filter
  * pushdown — callers `select`/`filter` and the scan narrows itself.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark 4 refuses to
    * read as a timestamp (PARQUET_TYPE_ILLEGAL on schema inference). An
    * explicit user schema typing it as LongType reads the raw nanos
    * without touching session config (no
    * `spark.sql.legacy.parquet.nanosAsLong` mutation — that setting would
    * leak to every other read sharing the SparkSession). The micros
    * TimestampType `ts` is rebuilt via integer division (plain `/` would
    * go through double and lose precision on int64 nanos). DuckDB keeps
    * nanos; both engines floor-truncate identically, so any output derived
    * at ms/us granularity hash-matches the oracle.
    */
  val eventsRawSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType), // TIMESTAMP(NANOS) read as raw int64 nanos
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
  }
  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(eventsRawSchema).parquet(s"$dir/events.parquet")
      .withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts_ns DIV 1000)"))
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view so `spark.sql` queries resolve —
    * mirrors how the DuckDB oracle sees them. `events` must go through its
    * nanos-aware loader (a raw read throws PARQUET_TYPE_ILLEGAL, and the
    * view should expose the rebuilt TimestampType `ts` like every other
    * consumer). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }

  /** File-stream sources require a directory; stage a single parquet file
    * into a temp dir via symlink so `readStream` can list it. The dir is
    * cached per source file — every streaming query invocation reuses it
    * instead of leaking a new /tmp entry per run. */
  private val streamDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def streamDir(parquetFile: String): String =
    streamDirs.computeIfAbsent(parquetFile, { pf =>
      val src = java.nio.file.Paths.get(pf)
      val dir = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
        s"graft-stream-${Integer.toHexString(pf.hashCode)}")
      java.nio.file.Files.createDirectories(dir)
      val link = dir.resolve(src.getFileName)
      if (!java.nio.file.Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS))
        java.nio.file.Files.createSymbolicLink(link, src)
      dir.toString
    })
}
