package graft

import java.nio.file.{Files, Paths}

import graft.gen.CdcGen
import graft.streaming.SchemaDriftStream

/** Continuous CDC schema-drift monitor: per-batch drifted-field rows
  * against the typed extraction's projection lists, with the same
  * batchId-guarded sink, rotate-together refusal and count-every-row
  * contracts as the sibling stateless monitors. */
class SchemaDriftStreamSpec extends SparkSpec {

  private val t0 = 1660000000000L

  private def jsonFile(dir: String, name: String, rows: Seq[String]): Unit =
    Files.write(Paths.get(dir, name), rows.mkString("\n").getBytes)

  test("drifted fields surface per batch; replay inert; unfillables counted") {
    val gen = new CdcGen.Gen(7)
    val inDir = tmpDir("sd-in")
    val sink = tmpDir("sd-sink")
    // b0: clean tick — no drift, but one unfillable line (null dynamodb)
    val (m0, q0, mq0) = gen.tick()
    jsonFile(inDir, "b0.json", Seq(
      gen.envelope("INSERT", m0, t0),
      gen.envelope("INSERT", q0, t0 + 100),
      gen.envelope("INSERT", mq0, t0 + 200),
      """{"eventName":"INSERT","dynamodb":null}"""))
    // b1: the producer ships NEW attributes — category (S) on the
    // quest, bonusPoints (N) on the memberQuest
    val (m1, q1, mq1) = gen.tick()
    jsonFile(inDir, "b1.json", Seq(
      gen.envelope("INSERT", m1, t0 + 1000),
      gen.envelope("INSERT",
        q1.copy(attrs = q1.attrs + ("category" -> Left("daily"))),
        t0 + 1100),
      gen.envelope("INSERT",
        mq1.copy(attrs = mq1.attrs + ("bonusPoints" -> Right(12.5))),
        t0 + 1200)))

    def start(): Unit = SchemaDriftStream.run(spark,
      spark.readStream.schema(graft.model.CdcSchemas.envelope)
        .option("maxFilesPerTrigger", 1).json(inDir),
      sink).awaitTermination()
    start()

    // file→batch order is not contractual: assert on the SET of rows
    def rows(): Set[(String, String, Long, Long, Long, Long)] =
      spark.read.parquet(s"$sink/batch=*").collect().map { r =>
        (r.getAs[String]("entity"), r.getAs[String]("field"),
          r.getAs[Long]("n_events"), r.getAs[Long]("first_seen_ms"),
          r.getAs[Long]("n_numeric"), r.getAs[Long]("n_unfillable"))
      }.toSet
    val v = rows()
    assert(v == Set(
      ("quest", "category", 1L, t0 + 1100, 0L, 0L),
      ("member_quest", "bonusPoints", 1L, t0 + 1200, 1L, 0L)),
      s"drift rows: $v")
    // the clean batch committed an EMPTY marker dir (commit mark still
    // lands so replay stays inert), and its unfillable line was counted
    // into that batch, not dropped silently with the file
    val batchDirs = new java.io.File(sink).listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(batchDirs == Set("batch=0", "batch=1"), s"dirs: $batchDirs")

    // replay: drop the last commit mark and poison the input — the
    // batchId guard must leave the committed drift rows untouched
    Files.delete(Paths.get(s"$sink/_checkpoint/commits/1"))
    Files.deleteIfExists(Paths.get(s"$sink/_checkpoint/commits/.1.crc"))
    val (m2, q2, _) = gen.tick()
    jsonFile(inDir, "b1.json", Seq(
      gen.envelope("INSERT",
        q2.copy(attrs = q2.attrs + ("poison" -> Left("x"))), t0 + 9000),
      gen.envelope("INSERT", m2, t0 + 9100)))
    start()
    assert(rows() == v, "re-delivered batch must not change drift rows")
  }

  test("rotate-together: fresh checkpoint next to a used sink is refused") {
    val sink = tmpDir("sd-rot-sink")
    Files.createDirectories(Paths.get(s"$sink/batch=0"))
    val ex = intercept[IllegalArgumentException] {
      SchemaDriftStream.run(spark,
        spark.readStream.schema(graft.model.CdcSchemas.envelope)
          .json(tmpDir("sd-rot-in")), sink)
    }
    assert(ex.getMessage.contains("rotate"), ex.getMessage)
  }

  test("q234 parity: the stream's drift frame equals the batch detector's shape") {
    // one frame through the SAME projection lists both detectors share
    // (model.CdcSchemas.extractedAttrs): a drifted field aggregates
    // identically whichever door it entered through
    val gen = new CdcGen.Gen(11)
    val (_, q1, mq1) = gen.tick()
    val lines = Seq(
      gen.envelope("INSERT",
        q1.copy(attrs = q1.attrs + ("category" -> Left("weekly"))), t0),
      gen.envelope("INSERT",
        mq1.copy(attrs = mq1.attrs + ("bonusPoints" -> Right(3.25))),
        t0 + 100))
    val dir = tmpDir("sd-parity")
    jsonFile(dir, "b.json", lines)
    val batch = spark.read.schema(graft.model.CdcSchemas.envelope)
      .json(s"$dir/b.json")
    val got = SchemaDriftStream.driftFrame(spark, batch, 0L, 0L)
      .orderBy("entity", "field")
      .select("entity", "field", "n_events", "n_numeric")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      ("member_quest", "bonusPoints", 1L, 1L),
      ("quest", "category", 1L, 0L)), s"got: $got")
  }
}
