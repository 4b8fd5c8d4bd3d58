package graft.bench

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Measures the shuffle traffic a block of Spark jobs generates, by summing
  * per-task shuffle-write metrics from a [[SparkListener]].
  *
  * SCALE.md's shuffle-minimization claims ("the as-of join shuffles once",
  * "the bloom prefilter prunes before the exchange") are structural plan
  * arguments; this turns them into measured byte/record counts so
  * ShuffleAuditSpec can assert the optimized operator actually moves less
  * data than its naive formulation — on every run, not just the day the
  * plan was inspected.
  *
  * The listener bus is asynchronous, so after the body completes we poll
  * until the counters are quiet for a few consecutive ticks rather than
  * racing the last task-end events.
  */
object ShuffleMetrics {

  final case class Shuffle(bytes: Long, records: Long) {
    def pretty: String = f"${bytes / 1024.0 / 1024.0}%.2f MiB / $records%d rows"
  }

  def measure(spark: SparkSession)(body: => Unit): Shuffle = {
    val bytes = new LongAdder
    val records = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
        val m = taskEnd.taskMetrics
        if (m != null) {
          bytes.add(m.shuffleWriteMetrics.bytesWritten)
          records.add(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      var stable = 0
      var prev = -1L
      while (stable < 3) {
        Thread.sleep(100)
        val cur = bytes.sum + records.sum
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    Shuffle(bytes.sum, records.sum)
  }

  /** Execute a frame end-to-end without collecting rows to the driver —
    * the `noop` sink runs the full plan with production-shaped output. */
  def run(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()
}
