package graft

import java.nio.file.{Files, Paths}

import graft.streaming.VocabDriftStream

/** Streaming vocabulary-drift monitor: per-batch OOV stats against a
  * frozen persisted vocabulary table, with the same batchId-guarded sink,
  * rotate-together refusal and count-every-row contracts as the sibling
  * ingest terminals. */
class VocabDriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def jsonFile(dir: String, name: String, rows: String*): Unit =
    Files.write(Paths.get(dir, name), rows.mkString("\n").getBytes)

  test("drift rows match the batch computation; replay inert; nulls counted") {
    val corpus = Seq((0L, "alpha beta gamma delta"), (1L, "alpha beta epsilon"))
      .toDF("doc_id", "text")
    val vocabDir = tmpDir("vd-vocab")
    assert(VocabDriftStream.freeze(spark, corpus, vocabDir) == 5L,
      "frozen vocabulary must hold the 5 distinct corpus types")

    val inDir = tmpDir("vd-in")
    val sink = tmpDir("vd-sink")
    // b0: 6 tokens, 2 OOV (zeta, eta); one unfillable row (null text)
    jsonFile(inDir, "b0.json",
      """{"doc_id":10,"text":"alpha beta zeta eta alpha gamma"}""",
      """{"doc_id":11,"text":null}""")
    // b1: all in-vocab
    jsonFile(inDir, "b1.json",
      """{"doc_id":20,"text":"delta epsilon"}""")
    val schema = "doc_id LONG, text STRING"
    def start(): Unit = VocabDriftStream.run(spark, vocabDir,
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(inDir),
      sink).awaitTermination()
    start()

    // FileStreamSource's file→batch order is not contractual — assert on
    // the SET of drift rows, not on which file became batch 0
    def rows(): Set[(Long, Long, Long, Long, Long)] =
      spark.read.parquet(s"$sink/batch=*").collect().map { r =>
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_oov"), r.getAs[Long]("oov_permille"),
          r.getAs[Long]("n_unfillable"))
      }.toSet
    val v = rows()
    assert(v == Set((1L, 6L, 2L, 333L, 1L), (1L, 2L, 0L, 0L, 0L)),
      s"drift rows: $v")

    // replay: drop the last commit mark (the crash window between sink
    // rename and checkpoint commit) and poison the input — the batch=1
    // guard must leave the committed drift row untouched
    val stamp = new java.io.File(s"$sink/batch=1").lastModified()
    Files.delete(Paths.get(s"$sink/_checkpoint/commits/1"))
    Files.deleteIfExists(Paths.get(s"$sink/_checkpoint/commits/.1.crc"))
    jsonFile(inDir, "b1.json",
      """{"doc_id":20,"text":"zzz zzz zzz zzz"}""")
    start()
    assert(rows() == v, "re-delivered batch must not change drift rows")
    assert(new java.io.File(s"$sink/batch=1").lastModified() == stamp)
  }

  test("rotate-together: fresh checkpoint next to a used sink is refused") {
    val vocabDir = tmpDir("vd-rot-vocab")
    VocabDriftStream.freeze(spark,
      Seq((0L, "alpha")).toDF("doc_id", "text"), vocabDir)
    val sink = tmpDir("vd-rot-sink")
    Files.createDirectories(Paths.get(s"$sink/batch=0"))
    val ex = intercept[IllegalArgumentException] {
      VocabDriftStream.run(spark, vocabDir,
        spark.readStream.schema("doc_id LONG, text STRING")
          .json(tmpDir("vd-rot-in")), sink)
    }
    assert(ex.getMessage.contains("rotate"), ex.getMessage)
  }
}
