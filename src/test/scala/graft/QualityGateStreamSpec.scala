package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.streaming.QualityGateStream

/** Train-once / gate-forever streaming quality screen: the frozen gate
  * scores micro-batches exactly like its batch form, and a re-delivered
  * batch id is inert — the whole replay contract a STATELESS gate needs
  * (no WAL, unlike the dedup/span ingest terminals).
  */
class QualityGateStreamSpec extends SparkSpec {
  import spark.implicits._

  private def words(p: String, k: Int): String =
    (1 to k).map(i => f"$p$i%02dxx").mkString(" ")

  // ≥40 tokens, ≥2 stopwords, top_freq 1, mean word length in [3,10]:
  // passes every Gopher rule
  private val goodText = "the a of and " + words("tok", 40)
  private val oovText = "the a of and " + words("zzz", 40) // gopher-clean, LM-alien
  private val shortText = "the a " + words("s", 5)         // gopher wc fail

  private def jsonFile(dir: String, name: String, rows: (Long, String, String)*)
      : Unit =
    Files.write(Paths.get(dir, name), rows.map { case (id, text, lang) =>
      s"""{"doc_id":$id,"text":"$text","lang":"$lang"}"""
    }.mkString("\n").getBytes)

  test("frozen gate: stream ≡ batch, unjudged langs pass, replay inert") {
    val corpus = (0L until 6L).map(i => (i, goodText, "en", "s0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val g = QualityGateStream.freeze(spark, corpus)
    assert(g.cutoffs.contains("en") && g.n > 0)

    val inDir = tmpDir("qgate-in")
    val sink = tmpDir("qgate-sink")
    jsonFile(inDir, "b0.json",
      (10L, goodText, "en"),  // at the frozen cutoff → keep
      (11L, oovText, "en"))   // gopher-clean but LM-alien → lm_ok 0
    jsonFile(inDir, "b1.json",
      (20L, shortText, "en"), // gopher wc fail
      (21L, oovText, "xx"))   // no cutoff for 'xx' → LM passes it unjudged
    val schema = "doc_id LONG, text STRING, lang STRING"
    def start(ckpt: String) = QualityGateStream.run(spark, g,
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(inDir),
      sink).awaitTermination()
    // run() pins the checkpoint under the sink; first run processes both
    // files as two micro-batches
    start(tmpDir("unused"))

    def verdicts(): Map[Long, (Int, Int, Int)] =
      spark.read.parquet(s"$sink/batch=*").collect().map { r =>
        r.getAs[Long]("doc_id") -> ((r.getAs[Int]("gopher_ok"),
          r.getAs[Int]("lm_ok"), r.getAs[Int]("keep")))
      }.toMap
    val v = verdicts()
    assert(v(10L) == ((1, 1, 1)), s"at-cutoff doc: ${v(10L)}")
    assert(v(11L) == ((1, 0, 0)), s"LM-alien doc: ${v(11L)}")
    assert(v(20L)._1 == 0 && v(20L)._3 == 0, s"short doc: ${v(20L)}")
    assert(v(21L) == ((1, 1, 1)), s"unjudged-lang doc: ${v(21L)}")

    // stream ≡ batch: the same rows through the batch gate() give the
    // identical verdict map (the gate is stateless, batching is free)
    val statics = Seq((10L, goodText, "en"), (11L, oovText, "en"),
      (20L, shortText, "en"), (21L, oovText, "xx"))
      .toDF("doc_id", "text", "lang")
    val batchV = QualityGateStream.gate(spark, g, statics).collect().map { r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Int]("gopher_ok"),
        r.getAs[Int]("lm_ok"), r.getAs[Int]("keep")))
    }.toMap
    assert(batchV == v, "stream and batch verdicts must be identical")

    // replay: drop the LAST commit mark — the authentic crash window
    // between the sink's atomic rename and the checkpoint's commit write
    // — so the restart re-delivers that batch under the SAME id, and
    // poison its input file: the batch=<id> guard must skip it untouched.
    // (Wiping the WHOLE checkpoint is no longer a legal replay
    // simulation: fresh checkpoint + used sink is the rotation mismatch
    // run() now refuses — see the rotate-together test.)
    val stamps = Seq(0, 1).map(b =>
      new java.io.File(s"$sink/batch=$b").lastModified())
    Files.delete(Paths.get(s"$sink/_checkpoint/commits/1"))
    // the commit's Hadoop checksum sidecar must crash away with it, or
    // the re-written commit's rename trips over the stale .crc
    Files.deleteIfExists(Paths.get(s"$sink/_checkpoint/commits/.1.crc"))
    jsonFile(inDir, "b1.json", (20L, goodText, "en"), (21L, shortText, "en"))
    start(tmpDir("unused2"))
    assert(verdicts() == v, "re-delivered batches must not change verdicts")
    assert(Seq(0, 1).map(b =>
      new java.io.File(s"$sink/batch=$b").lastModified()) == stamps,
      "re-delivered batches must not rewrite their outputs")
  }

  test("rotate-together: fresh checkpoint next to a used sink is refused") {
    val g = QualityGateStream.FrozenGate(Map.empty, Map.empty, 1L, 1L, Map.empty)
    val inDir = tmpDir("qgate-rot-in")
    jsonFile(inDir, "b0.json", (1L, goodText, "en"))
    val sink = tmpDir("qgate-rot-sink")
    // a previous run's verdicts, but no checkpoint: batchIds would
    // restart at 0 and the batch=0 guard would silently skip NEW data
    Files.createDirectories(Paths.get(s"$sink/batch=0"))
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING").json(inDir)
    val ex = intercept[IllegalArgumentException] {
      QualityGateStream.run(spark, g, stream, sink)
    }
    assert(ex.getMessage.contains("rotate"), ex.getMessage)
  }

  test("unfillable rows get keep=0 verdicts instead of vanishing") {
    // empty frozen maps: no cutoffs → every judged row passes the LM
    // screen; the gopher rules still run, so the valid row keeps
    val g = QualityGateStream.FrozenGate(Map.empty, Map.empty, 1L, 1L, Map.empty)
    val inDir = tmpDir("qgate-null-in")
    // rows the schema'd reader cannot fill: null text resp. null lang —
    // score()'s inner joins would silently drop both
    Files.write(Paths.get(inDir, "b0.json"), Seq(
      s"""{"doc_id":1,"text":"$goodText","lang":"en"}""",
      """{"doc_id":2,"lang":"en"}""",
      s"""{"doc_id":3,"text":"$goodText"}""").mkString("\n").getBytes)
    val sink = tmpDir("qgate-null-sink")
    QualityGateStream.run(spark, g,
      spark.readStream.schema("doc_id LONG, text STRING, lang STRING")
        .json(inDir), sink).awaitTermination()
    val v = spark.read.parquet(s"$sink/batch=*").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("keep")).toMap
    assert(v == Map(1L -> 1, 2L -> 0, 3L -> 0),
      s"every input row needs a verdict, unfillable ones keep=0: $v")
  }
}
