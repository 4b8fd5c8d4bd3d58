package graft.queries

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.Analytics
import graft.gen.CdcGen
import graft.pipeline.Pipeline

/** The reference's pipeline surface as a driver-runnable query: generator →
  * export → initial load → two streaming CDC merge batches → rewards report
  * (the whole of SURVEY.md §3 E1-E3 in miniature, deterministic seed/clock).
  *
  * Not SQL-expressible over the harness tables → no oracle entry; the
  * driver records a rows-only check. Pipeline-internal correctness is
  * covered by PipelineSpec.
  */
object PipelineQueries {

  private val t0 = 1660000000000L

  def q23CdcPipelineE2E(spark: SparkSession, dir: String): DataFrame = {
    val gen = new CdcGen.Gen(42)
    val exportDir = Files.createTempDirectory("graft-export").toString
    val cdcDir = Files.createTempDirectory("graft-cdc").toString
    val ckptDir = Files.createTempDirectory("graft-ckpt").toString
    val storeRoot = Files.createTempDirectory("graft-store").toString

    // initial population: 20 ticks of member+quest+memberQuest
    val ticks = (1 to 20).map(_ => gen.tick())
    val exportLines = ticks.flatMap { case (m, q, mq) => Seq(m, q, mq) }
      .map(gen.exportLine)
    Files.write(Paths.get(exportDir, "data.json"),
      exportLines.mkString("\n").getBytes)

    var clock = t0
    val pipeline = new Pipeline(spark, storeRoot, () => new Timestamp(clock))
    pipeline.initialLoad(exportDir)

    // CDC batch 1: 10 new ticks (INSERTs)
    val newTicks = (1 to 10).map(_ => gen.tick())
    val batch1 = newTicks.zipWithIndex.flatMap { case ((m, q, mq), i) =>
      val ts = t0 + 10000 + i * 1000
      Seq(gen.envelope("INSERT", m, ts), gen.envelope("INSERT", q, ts + 100),
          gen.envelope("INSERT", mq, ts + 200))
    }
    Files.write(Paths.get(cdcDir, "batch1.json"), batch1.mkString("\n").getBytes)
    clock = t0 + 60000
    pipeline.syncAvailable(cdcDir, ckptDir)

    // CDC batch 2: modify half the new memberQuests, remove two members
    val batch2 =
      newTicks.take(5).zipWithIndex.map { case ((_, _, mq), i) =>
        gen.envelope("MODIFY",
          mq.copy(attrs = mq.attrs + ("dollarsEarned" -> Right(100.0 + i))),
          t0 + 70000 + i * 1000)
      } ++ newTicks.take(2).map { case (m, _, _) =>
        gen.envelope("REMOVE", m, t0 + 80000)
      }
    Files.write(Paths.get(cdcDir, "batch2.json"), batch2.mkString("\n").getBytes)
    clock = t0 + 120000
    pipeline.syncAvailable(cdcDir, ckptDir)

    Analytics.rewardsByMember(pipeline.memberQuest, pipeline.member)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_cdc_pipeline_e2e" -> (q23CdcPipelineE2E _))

  val oracles: Map[String, String] = Map.empty
}
