package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.gen.CdcGen
import graft.pipeline.Pipeline
import graft.streaming.SyncMetrics

/** The listener-side sync telemetry: batch counts and input-row totals
  * collected from the stream's own progress events (no extra scans), the
  * push-side complement of the reference's pull-side syncLag queries.
  */
class SyncMetricsSpec extends SparkSpec {

  private def writeLines(dir: String, name: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes)
  }

  test("listener ledger records every CDC batch and row exactly once") {
    val gen = new CdcGen.Gen(21)
    val t0 = 1660000000000L
    val exportDir = tmpDir("export"); val cdcDir = tmpDir("cdc")
    val ckptDir = tmpDir("ckpt"); val storeRoot = tmpDir("store")
    val m0 = gen.member(); val q0 = gen.quest()
    val mq0 = gen.memberQuest(m0.pk.stripPrefix("M_"), q0.pk.stripPrefix("Q_"))
    writeLines(exportDir, "data.json", Seq(m0, q0, mq0).map(gen.exportLine))

    val metrics = new SyncMetrics().register(spark)
    try {
      // clock starts at t0 for the initial load (which stamps the target
      // watermark) and advances past the CDC event times for the syncs
      var clock = t0
      val pipeline = new Pipeline(spark, storeRoot, () => new Timestamp(clock))
      pipeline.initialLoad(exportDir)
      clock = t0 + 60000
      val m1 = gen.member(); val m2 = gen.member()
      writeLines(cdcDir, "batch1.json", Seq(
        gen.envelope("INSERT", m1, t0 + 10000),
        gen.envelope("INSERT", m2, t0 + 11000)))
      pipeline.syncAvailable(cdcDir, ckptDir)
      assert(pipeline.member.count() == 3)

      val after1 = metrics.batches
      assert(after1.nonEmpty, "progress events must be recorded")
      assert(metrics.totalInputRows == 2,
        s"2 CDC lines in, got ${metrics.totalInputRows}")

      // a second drain with one more file adds exactly its rows
      writeLines(cdcDir, "batch2.json", Seq(
        gen.envelope("INSERT", gen.member(), t0 + 20000)))
      pipeline.syncAvailable(cdcDir, ckptDir)
      assert(metrics.totalInputRows == 3,
        s"listener must not double-count drained files: ${metrics.batches}")
      assert(metrics.batches.map(b => (b.queryName, b.batchId)).distinct.size
        == metrics.batches.size, "one ledger entry per (query, batch)")
    } finally metrics.unregister(spark)
  }

}
