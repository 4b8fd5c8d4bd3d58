package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ZOrderOps

/** Measured evidence for the z-order layout claim: with small row groups,
  * a pushed-down filter on EITHER clustered dimension reads fewer records
  * than the same filter over a layout sorted by only one column. Records
  * read = parquet scan output after row-group min/max pruning — the
  * mechanism that matters at 100 TB, measured, not asserted.
  */
class ZOrderSpec extends SparkSpec {

  private def recordsRead(body: => Unit): Long = {
    val n = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) n.add(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      var stable = 0
      var prev = -1L
      while (stable < 3) {
        Thread.sleep(100)
        if (n.sum == prev) stable += 1 else { stable = 0; prev = n.sum }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    n.sum
  }

  private def drain(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  test("z-order layout prunes row groups on both dimensions; linear sort on one") {
    val dir = "/root/testdata/sf0.01"
    val ev = graft.tables.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        dayofmonth(to_date(col("ts"))).cast("long").as("day"), col("value"))
    val zPath = tmpDir("zorder") + "/z"
    val linPath = tmpDir("zorder") + "/lin"
    ZOrderOps.writeZOrdered(ev, "user_id", "day", zPath,
      numFiles = 4, rowGroupBytes = 16L * 1024)
    // linear baseline: identical file/row-group shape, sorted by day only
    ev.repartitionByRange(4, col("day"))
      .sortWithinPartitions("day")
      .write.mode("overwrite")
      .option("parquet.block.size", (16L * 1024).toString)
      .parquet(linPath)

    val z = spark.read.parquet(zPath)
    val lin = spark.read.parquet(linPath)
    val total = ev.count()

    // same results either way (layout is physical only)
    val userPred = col("user_id") >= 10 && col("user_id") <= 19
    val dayPred = col("day") >= 3 && col("day") <= 6
    assert(z.filter(userPred).count() == lin.filter(userPred).count())
    assert(z.filter(dayPred).count() == lin.filter(dayPred).count())

    val zUser = recordsRead(drain(z.filter(userPred)))
    val linUser = recordsRead(drain(lin.filter(userPred)))
    val zDay = recordsRead(drain(z.filter(dayPred)))
    val linDay = recordsRead(drain(lin.filter(dayPred)))
    info(f"user-filter records read: z=$zUser linear=$linUser (total=$total)")
    info(f"day-filter  records read: z=$zDay linear=$linDay")
    // the day-sorted layout cannot prune the user predicate at all
    assert(linUser == total, s"expected no pruning, read $linUser of $total")
    // z-order prunes the user predicate meaningfully
    assert(zUser < total / 2, s"z layout read $zUser of $total on user filter")
    // and still prunes the day predicate (need not beat the day-sorted
    // layout — it must merely stay sub-linear on BOTH dimensions)
    assert(zDay < total, s"z layout read $zDay of $total on day filter")
    assert(linDay < total / 2, s"day-sorted layout should prune day filter")
  }

  test("zvalue bit-interleaving round-trips against a scala reference") {
    import spark.implicits._
    def ref(a: Long, b: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 31L), (12345L, 17L))
      .toDF("a", "b")
      .withColumn("z", ZOrderOps.zvalue($"a", $"b"))
      .collect()
    df.foreach(r => assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1))))
  }
}
