package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.tables.Tables

/** The harness has regenerated `events.parquet` mid-round with a
  * different physical timestamp type (TIMESTAMP(NANOS) → micros NTZ),
  * silently collapsing every event into 1970 under the old fixed-schema
  * loader. This suite pins the adaptive loader against checked-in
  * fixtures of all three flavors the testdata has shipped or could ship:
  *
  *   - `nanos`:      TIMESTAMP(NANOS, isAdjustedToUTC=false) — Spark 4
  *                   refuses schema inference, read via the raw-long
  *                   schema; sub-µs digits floor away on normalize
  *   - `micros-ntz`: TIMESTAMP(MICROS, isAdjustedToUTC=false) — infers
  *                   as TimestampNTZType
  *   - `micros-utc`: TIMESTAMP(MICROS, isAdjustedToUTC=true) — infers
  *                   as TimestampType
  *
  * All three encode the SAME ten logical rows (base 2024-01-01T00:00:00Z,
  * step 3661 s, +123456 µs; the nanos file adds 789 sub-µs ns), so the
  * loaders must produce identical normalized frames at µs precision.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val flavors = Seq("nanos", "micros-ntz", "micros-utc")
  private def flavorDir(f: String): String = {
    val url = getClass.getResource(s"/events-flavors/$f/events.parquet")
    assert(url != null, s"fixture $f missing from test resources")
    new java.io.File(url.toURI).getParentFile.getAbsolutePath
  }

  private val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z
  private val expectedUs = (0 until 10).map(i => baseUs + i * 3661000000L + 123456L)

  test("batch loader normalizes every physical flavor to the same µs frame") {
    val frames = flavors.map { f =>
      val df = Tables.events(spark, flavorDir(f))
      assert(df.schema("ts").dataType == TimestampType, s"$f: ts must be TimestampType")
      assert(df.schema("ts_ns").dataType == LongType, s"$f: ts_ns must be LongType")
      f -> df.select($"event_id", unix_micros($"ts").as("us"), $"user_id",
          $"event_type", $"value")
        .orderBy($"event_id").as[(Long, Long, Long, String, Double)]
        .collect().toSeq
    }.toMap
    assert(frames("nanos").map(_._2) == expectedUs,
      "nanos flavor must floor sub-µs digits to the shared µs instants")
    for (f <- flavors)
      assert(frames(f) == frames("nanos"),
        s"$f must normalize to the identical logical rows")
  }

  test("ts_ns preserves the file's full precision") {
    // nanos flavor keeps its sub-µs digits; micros flavors are exact *1000
    val ns = Tables.events(spark, flavorDir("nanos"))
      .select($"ts_ns").orderBy($"ts_ns").as[Long].collect()
    assert(ns.toSeq == expectedUs.map(_ * 1000 + 789),
      "legacy nanos path must expose raw nanos in ts_ns")
    val us = Tables.events(spark, flavorDir("micros-ntz"))
      .select($"ts_ns").orderBy($"ts_ns").as[Long].collect()
    assert(us.toSeq == expectedUs.map(_ * 1000))
  }

  test("streaming replay matches the batch loader on every flavor") {
    for (f <- flavors) {
      val dir = flavorDir(f)
      val batch = Tables.events(spark, dir)
        .select($"event_id", unix_micros($"ts").as("us"))
        .as[(Long, Long)].collect().toSet
      val name = s"tables_flavor_${f.replace('-', '_')}"
      val q = Tables.eventsStream(spark, dir)
        .select($"event_id", unix_micros($"ts").as("us"))
        .writeStream.format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val streamed = spark.table(name).as[(Long, Long)].collect().toSet
      spark.catalog.dropTempView(name)
      assert(streamed == batch, s"$f: stream replay must equal the batch read")
    }
  }
}
