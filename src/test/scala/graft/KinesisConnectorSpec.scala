package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.gen.CdcGen
import graft.streaming.{CdcSource, KinesisConnectorAdapter, KinesisRecordCdcSource}

/** The live-connector adaptation layer, parity-tested against the shared
  * connector-record fixtures: a frame carrying either public connector's
  * COLUMN NAMES must parse to the identical envelope the canonical
  * record contract produces (the part of the Kinesis binding that can
  * run without the connector jar — the jar only creates the stream). */
class KinesisConnectorSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1640000000000L

  /** The shared fixture records renamed to a connector's output schema. */
  private def asConnectorFrame(rs: Seq[CdcGen.KinesisRecord],
      withShard: Boolean) = {
    val base = rs.toDF()
      .select(
        col("kinesis_data").as("data"),
        col("approximate_arrival_timestamp").as("approximateArrivalTimestamp"),
        col("partition_key").as("partitionKey"),
        col("shard_id").as("shardId"),
        col("sequence_number").as("sequenceNumber"),
        lit("activity-stream").as("streamName")) // connectors carry this too
    if (withShard) base else base.drop("shardId")
  }

  test("adapter parity: both connector column shapes parse to the canonical " +
    "envelope (shard null only where the connector omits it)") {
    val gen = new CdcGen.Gen(53)
    val recs = Seq(
      gen.kinesisRecord("INSERT", gen.member(), t0 + 1000, t0 + 1100),
      gen.kinesisRecord("MODIFY", gen.quest(), t0 + 2000, t0 + 2200),
      CdcGen.KinesisRecord("not { json".getBytes("UTF-8"),
        new Timestamp(t0 + 3000), "M_p", "shardId-000000000003", "7"))
    def envOf(df: org.apache.spark.sql.DataFrame) =
      KinesisRecordCdcSource(df).load(spark)
        .orderBy(col("sequence_number"))
        .collect().map(_.toSeq)

    val canonical = envOf(recs.toDF())
    val qubole = envOf(KinesisConnectorAdapter.adapt(
      asConnectorFrame(recs, withShard = true)))
    assert(qubole.toSeq == canonical.toSeq,
      "qubole-lineage columns must round-trip to the canonical envelope")

    val awslabs = envOf(KinesisConnectorAdapter.adapt(
      asConnectorFrame(recs, withShard = false)))
    // identical except shard_id, which that connector does not expose
    val shardIdx = KinesisRecordCdcSource(recs.toDF()).load(spark)
      .columns.indexOf("shard_id")
    assert(awslabs.map(_.updated(shardIdx, null)).toSeq ==
      canonical.map(_.updated(shardIdx, null)).toSeq)
    assert(awslabs.forall(_(shardIdx) == null),
      "absent shardId must surface as a typed null, not a failure")
    // the poison blob still quarantine-flags under both shapes
    assert(qubole.count(r => r.last != null) == 1)
    assert(awslabs.count(r => r.last != null) == 1)
  }

  test("adapter fails fast on a frame that is not a connector record") {
    val bogus = Seq(("x", 1)).toDF("payload", "n")
    val e = intercept[IllegalArgumentException](
      KinesisConnectorAdapter.adapt(bogus))
    assert(e.getMessage.contains("data"), e.getMessage)
  }

  test("connector-named records drive the full merge through the seam") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.pipeline.Pipeline
    import graft.streaming.CdcStream

    val gen = new CdcGen.Gen(59)
    val exportDir = tmpDir("kcexport")
    val ckptDir = tmpDir("kcckpt")
    val storeRoot = tmpDir("kcstore")
    val m0 = gen.member(); val q0 = gen.quest()
    val mq0 = gen.memberQuest(m0.pk.stripPrefix("M_"), q0.pk.stripPrefix("Q_"))
    val exportLines = Seq(m0, q0, mq0).map(gen.exportLine)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(exportDir, "data.json"),
      exportLines.mkString("\n").getBytes("UTF-8"))

    var clock = t0
    val pipeline = new Pipeline(spark, storeRoot, () => new Timestamp(clock))
    pipeline.initialLoad(exportDir)

    val ms = MemoryStream[CdcGen.KinesisRecord](spark)
    ms.addData(
      gen.kinesisRecord("INSERT", gen.member(), t0 + 10000),
      gen.kinesisRecord("INSERT", gen.member(), t0 + 11000))
    clock = t0 + 60000
    val stream = new CdcStream(spark, pipeline.store, () => new Timestamp(clock))
    // the live source's load() path minus the readStream.format call:
    // adapt(connector-named frame) -> record contract -> envelope
    val src = new CdcSource {
      def load(s: org.apache.spark.sql.SparkSession) =
        KinesisRecordCdcSource(KinesisConnectorAdapter.adapt(
          ms.toDF().select(
            col("kinesis_data").as("data"),
            col("approximate_arrival_timestamp")
              .as("approximateArrivalTimestamp"),
            col("partition_key").as("partitionKey"),
            col("shard_id").as("shardId"),
            col("sequence_number").as("sequenceNumber"),
            lit("activity-stream").as("streamName")))).load(s)
    }
    val q = stream.start(src, ckptDir, Trigger.AvailableNow(), None)
    q.awaitTermination()
    assert(pipeline.member.count() == 3,
      "connector-named records must merge through the adapted seam")
  }

  test("KinesisLiveCdcSource.start() end-to-end: readStream.format(stub DSv2) " +
    "-> adapter -> merge reproduces the in-memory seam's table state") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.pipeline.Pipeline
    import graft.streaming.{CdcStream, KinesisLiveCdcSource}
    import graft.testkit.StubKinesisSource

    // one record script, driven through TWO transports: (a) the LIVE glue
    // (spark.readStream.format(<stub DSv2 provider>) resolved by name at
    // runtime — exactly what a deployment does with the real connector
    // jar) and (b) the already-parity-tested in-memory record seam. The
    // final tables must match row-for-row, arrival metadata included.
    def script(gen: CdcGen.Gen): Seq[CdcGen.KinesisRecord] = {
      val m1 = gen.member(); val q1 = gen.quest()
      val mq1 = gen.memberQuest(m1.pk.stripPrefix("M_"), q1.pk.stripPrefix("Q_"))
      Seq(
        gen.kinesisRecord("INSERT", m1, t0 + 10000),
        gen.kinesisRecord("INSERT", q1, t0 + 11000),
        gen.kinesisRecord("INSERT", mq1, t0 + 12000),
        gen.kinesisRecord("MODIFY", m1, t0 + 20000),
        gen.kinesisRecord("REMOVE", q1, t0 + 21000),
        CdcGen.KinesisRecord("not { json".getBytes("UTF-8"),
          new Timestamp(t0 + 22000), "M_poison", "shardId-000000000001",
          f"${9999}%020d")) // poison blob -> quarantine, never a crash
    }
    def run(tag: String)(mkSource: Seq[CdcGen.KinesisRecord] => CdcSource)
        : (Map[String, Seq[String]], Long) = {
      val gen = new CdcGen.Gen(61)
      val exportDir = tmpDir(s"live-export-$tag")
      val storeRoot = tmpDir(s"live-store-$tag")
      // all three entities in the seed export: the merge guard aborts a
      // sync whose target is empty (C3), so each entity needs a base row
      val m0 = gen.member(); val q0 = gen.quest()
      val mq0 = gen.memberQuest(m0.pk.stripPrefix("M_"), q0.pk.stripPrefix("Q_"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(exportDir, "data.json"),
        Seq(m0, q0, mq0).map(gen.exportLine)
          .mkString("\n").getBytes("UTF-8"))
      var clock = t0
      val pipeline = new Pipeline(spark, storeRoot, () => new Timestamp(clock))
      pipeline.initialLoad(exportDir)
      clock = t0 + 60000
      val stream = new CdcStream(spark, pipeline.store,
        () => new Timestamp(clock))
      val q = stream.start(mkSource(script(gen)), tmpDir(s"live-ckpt-$tag"),
        Trigger.AvailableNow(), Some(s"$storeRoot/_quarantine"))
      q.awaitTermination()
      val tables = Seq("member", "quest", "member_quest").map { t =>
        val df = pipeline.table(t)
        t -> df.select(df.columns.sorted.map(col).toIndexedSeq: _*)
          .collect().map(_.mkString("|")).toSeq.sorted
      }.toMap
      (tables, pipeline.quarantine.count())
    }

    val (liveTables, liveQuarantined) = run("dsv2") { recs =>
      val fixture = java.nio.file.Paths.get(tmpDir("live-fix"), "recs.json")
      java.nio.file.Files.write(fixture,
        StubKinesisSource.fixtureLines(recs.map(r =>
          StubKinesisSource.Rec(r.kinesis_data, r.partition_key,
            r.sequence_number, r.approximate_arrival_timestamp.getTime)))
          .mkString("\n").getBytes("UTF-8"))
      KinesisLiveCdcSource(
        format = classOf[StubKinesisSource].getName,
        options = Map("path" -> fixture.toString))
    }
    val (memTables, memQuarantined) = run("mem") { recs =>
      val ms = MemoryStream[CdcGen.KinesisRecord](spark)
      ms.addData(recs: _*)
      new CdcSource {
        def load(s: org.apache.spark.sql.SparkSession) =
          KinesisRecordCdcSource(ms.toDF()).load(s)
      }
    }
    assert(liveTables("member").nonEmpty && liveTables("member_quest").nonEmpty)
    assert(liveTables == memTables,
      "the live DSv2 glue must produce the in-memory seam's exact tables")
    assert(liveQuarantined == 1L && memQuarantined == 1L,
      "the poison blob must quarantine identically on both transports")
  }
}
