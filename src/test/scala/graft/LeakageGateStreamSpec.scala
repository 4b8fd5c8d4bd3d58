package graft

import java.nio.file.{Files, Paths}

import graft.streaming.LeakageGateStream
import graft.sync.BucketedTableStore

/** Streaming leakage gate: per-doc admit/quarantine verdicts against the
  * frozen holdout shingle index, with the same batchId-guarded sink,
  * rotate-together refusal and every-row-gets-a-verdict contracts as the
  * sibling ingest terminals. The little corpus exercises the exact
  * integer Jaccard boundary: 3·inter ≥ n_h + n_t holds AT equality
  * (doc 100 vs holdout 0) and fails one shingle short (doc 200 vs
  * holdout 3). */
class LeakageGateStreamSpec extends SparkSpec {
  import spark.implicits._

  private def jsonFile(dir: String, name: String, rows: String*): Unit =
    Files.write(Paths.get(dir, name), rows.mkString("\n").getBytes)

  test("verdicts match the integer-Jaccard protocol; replay inert; nulls quarantined") {
    // md5-split: 0 → val, 3 → test (holdout); 4 → train (freeze ignores it)
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon"), // n_h = 3 shingles
      (3L, "one two three four"),             // n_h = 2
      (4L, "train side noise not indexed"))
      .toDF("doc_id", "text")
    val root = tmpDir("lg-idx")
    val store = new BucketedTableStore(spark, root, 8)
    assert(LeakageGateStream.freeze(spark, corpus, store,
      new java.sql.Timestamp(1660000000000L)) == 5L,
      "index must hold the 3 + 2 holdout shingles, nothing from train")

    val inDir = tmpDir("lg-in")
    val sink = tmpDir("lg-sink")
    // doc 100: inter 2 with holdout 0 → 3·2 ≥ 3+3 → quarantine (equality)
    // doc 101: no intersection → admit; doc 102: null text → quarantine
    jsonFile(inDir, "b0.json",
      """{"doc_id":100,"text":"alpha beta gamma delta zzz"}""",
      """{"doc_id":101,"text":"foo bar baz qux"}""",
      """{"doc_id":102,"text":null}""")
    // doc 200: inter 1 with holdout 3 → 3·1 < 2+2 → admit (one short)
    // doc 201: exact dup of holdout 3 → inter 2 → 6 ≥ 4 → quarantine
    jsonFile(inDir, "b1.json",
      """{"doc_id":200,"text":"one two three five"}""",
      """{"doc_id":201,"text":"one two three four"}""")
    val schema = "doc_id LONG, text STRING"
    def start(): Unit = LeakageGateStream.run(spark, store,
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(inDir),
      sink).awaitTermination()
    start()

    // FileStreamSource's file→batch order is not contractual — assert on
    // the verdict SET, keyed by doc_id
    def rows(): Map[Long, (Long, Long, Int)] =
      spark.read.parquet(s"$sink/batch=*").collect().map { r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_sh"), r.getAs[Long]("n_leaks"),
            r.getAs[Int]("admit")))
      }.toMap
    val v = rows()
    assert(v == Map(
      100L -> ((3L, 1L, 0)), 101L -> ((2L, 0L, 1)), 102L -> ((0L, 0L, 0)),
      200L -> ((2L, 0L, 1)), 201L -> ((2L, 1L, 0))), s"verdicts: $v")

    // replay: drop the last commit mark (the crash window between sink
    // rename and checkpoint commit) and poison the input — the batch=1
    // guard must leave the committed verdicts untouched
    val stamp = new java.io.File(s"$sink/batch=1").lastModified()
    Files.delete(Paths.get(s"$sink/_checkpoint/commits/1"))
    Files.deleteIfExists(Paths.get(s"$sink/_checkpoint/commits/.1.crc"))
    jsonFile(inDir, "b1.json",
      """{"doc_id":200,"text":"alpha beta gamma delta epsilon"}""",
      """{"doc_id":201,"text":"harmless now"}""")
    start()
    assert(rows() == v, "re-delivered batch must not change verdicts")
    assert(new java.io.File(s"$sink/batch=1").lastModified() == stamp)

    // the batch gate IS the stream's code path: same verdicts directly
    val direct = LeakageGateStream.gate(spark, store,
        Seq((100L, "alpha beta gamma delta zzz"),
          (101L, "foo bar baz qux")).toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_sh"), r.getAs[Long]("n_leaks"),
          r.getAs[Int]("admit")))).toMap
    assert(direct == Map(100L -> ((3L, 1L, 0)), 101L -> ((2L, 0L, 1))))
  }

  test("rotate-together: fresh checkpoint next to a used sink is refused") {
    val root = tmpDir("lg-rot-idx")
    val store = new BucketedTableStore(spark, root, 8)
    LeakageGateStream.freeze(spark,
      Seq((0L, "alpha beta gamma")).toDF("doc_id", "text"), store,
      new java.sql.Timestamp(1660000000000L))
    val sink = tmpDir("lg-rot-sink")
    Files.createDirectories(Paths.get(s"$sink/batch=0"))
    val ex = intercept[IllegalArgumentException] {
      LeakageGateStream.run(spark, store,
        spark.readStream.schema("doc_id LONG, text STRING")
          .json(tmpDir("lg-rot-in")), sink)
    }
    assert(ex.getMessage.contains("rotate"), ex.getMessage)
  }
}
