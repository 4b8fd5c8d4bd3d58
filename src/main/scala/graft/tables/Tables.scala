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
  /** The harness has shipped `events.ts` under two physical parquet types
    * across data drops: TIMESTAMP(NANOS) — which Spark 4 refuses to infer
    * (PARQUET_TYPE_ILLEGAL) — and plain TIMESTAMP(MICROS), which reads
    * natively. The loader probes the footer once per path and adapts, so
    * the rest of the engine always sees the same shape: a micros
    * TimestampType `ts` plus a raw int64 `ts_ns` companion.
    *
    * Legacy-nanos handling: an explicit user schema types `ts` as LongType
    * to read the raw nanos without touching session config (no
    * `spark.sql.legacy.parquet.nanosAsLong` mutation — that setting would
    * leak to every other read sharing the SparkSession), then rebuilds the
    * micros `ts` via integer division (plain `/` would go through double
    * and lose precision on int64 nanos). Both engines floor-truncate
    * identically, so ms/us-granularity outputs hash-match the oracle
    * either way.
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

  /** Footer probe, cached per path: `None` = legacy nanos (schema
    * inference refuses the file — Spark 4 throws on TIMESTAMP(NANOS));
    * otherwise the inferred type of `ts`. A micros file written with
    * `isAdjustedToUTC=false` infers as TimestampNTZType, one with `=true`
    * as TimestampType — both are native reads that only need a cast to
    * the session-zone TimestampType (identity wall-clock under the UTC
    * session zone every entry point sets). */
  private val eventsTsTypeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Option[org.apache.spark.sql.types.DataType]]()
  def eventsTsType(spark: SparkSession, path: String): Option[org.apache.spark.sql.types.DataType] = {
    // keyed on (path, mtime): the harness has regenerated testdata in
    // place mid-round with a DIFFERENT physical type once already — a
    // probe cached across that boundary would silently misread
    val mtime = scala.util.Try(
      java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(path)).toMillis
    ).getOrElse(0L)
    eventsTsTypeCache.computeIfAbsent((path, mtime), { case (p, _) =>
      scala.util.Try(spark.read.parquet(p).schema).toOption
        .flatMap(_.fields.find(_.name == "ts")).map(_.dataType)
        .filter {
          case org.apache.spark.sql.types.TimestampType => true
          case org.apache.spark.sql.types.TimestampNTZType => true
          case _ => false // raw int64 etc. → treat as legacy nanos
        }
    })
  }
  def eventsTsIsNanos(spark: SparkSession, path: String): Boolean =
    eventsTsType(spark, path).isEmpty

  /** Stream-reader schema for the current events file (readStream always
    * needs one): the raw-long schema for legacy nanos, the inferred
    * timestamp flavor otherwise. */
  def eventsStreamSchema(spark: SparkSession, path: String): org.apache.spark.sql.types.StructType =
    eventsTsType(spark, path) match {
      case None => eventsRawSchema
      case Some(t) =>
        org.apache.spark.sql.types.StructType(eventsRawSchema.fields.map(f =>
          if (f.name == "ts") f.copy(dataType = t) else f))
    }

  /** Normalize a raw events frame (batch or stream) to the canonical
    * shape: micros TimestampType `ts` + int64-nanos `ts_ns`. */
  private def normalizeEvents(df: DataFrame,
      tsType: Option[org.apache.spark.sql.types.DataType]): DataFrame = {
    import org.apache.spark.sql.functions._
    tsType match {
      case None =>
        df.withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts_ns DIV 1000)"))
      case Some(org.apache.spark.sql.types.TimestampType) =>
        df.withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
      case Some(_) => // NTZ: same wall-clock instant under the UTC session zone
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
    }
  }

  def events(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val t = eventsTsType(spark, path)
    val raw =
      if (t.isEmpty) spark.read.schema(eventsRawSchema).parquet(path)
      else spark.read.parquet(path)
    normalizeEvents(raw, t)
  }

  /** The events table replayed as a file stream, normalized to the same
    * shape the batch loader exposes — all streaming queries go through
    * here so the physical-type adaptation lives in one place. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val t = eventsTsType(spark, path)
    normalizeEvents(
      spark.readStream.schema(eventsStreamSchema(spark, path))
        .parquet(streamDir(path)), t)
  }
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
