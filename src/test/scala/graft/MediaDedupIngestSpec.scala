package graft

import org.apache.spark.sql.functions._

import graft.operators.MediaDedupIngest

/** Media dedup-on-ingest semantics over hand-built payloads whose aHash
  * bands are exactly predictable:
  *   - increasing bytes → bands (0, 0, 0xffff, 0xffff) (top half above
  *     the mean);
  *   - decreasing bytes → bands (0xffff, 0xffff, 0, 0) — no (band, value)
  *     collision with increasing;
  *   - alternating low/high bytes → every band 0xAAAA — disjoint from
  *     both. */
class MediaDedupIngestSpec extends SparkSpec {
  import spark.implicits._

  private val inc = Array.tabulate(80)(i => (33 + i).toByte)
  private val dec = inc.reverse
  private val alt = Array.tabulate(80)(i => (if (i % 2 == 0) 40 else 90).toByte)

  private def media(rows: (Long, Array[Byte])*) =
    rows.toSeq.toDF("doc_id", "media").withColumn("kind", lit("image"))

  test("cross-batch rejection, snapshot semantics, short-payload admission") {
    val root = tmpDir("mdi")
    val corpus = media(0L -> inc)
    val batches = Seq(
      media(100L -> inc,            // identical to corpus → rejected
        101L -> dec,                // band-disjoint → admitted
        102L -> "tiny".getBytes),   // < 64 bytes: no hash → admitted
      media(200L -> dec,            // identical to ADMITTED 101 → rejected
        201L -> alt, 202L -> alt))  // identical pair, NEW: snapshot
                                    // semantics admit BOTH
    val out = try MediaDedupIngest.run(spark, root, corpus, batches)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("batch_id"), r.getAs[Int]("near_dup"),
          r.getAs[Int]("admitted")))).toMap
    finally graft.sync.TableStore.deleteRecursively(
      java.nio.file.Paths.get(root))
    assert(out == Map(
      100L -> ((1, 1, 0)), 101L -> ((1, 0, 1)), 102L -> ((1, 0, 1)),
      200L -> ((2, 1, 0)), 201L -> ((2, 0, 1)), 202L -> ((2, 0, 1))),
      s"decisions: $out")
  }

  test("rejected payloads leave no trace in the index") {
    val root = tmpDir("mdi-trace")
    // batch 1 rejects doc 100 (dup of corpus). If the rejection leaked
    // into the index, batch 2's doc 200 — identical to 100 and to the
    // corpus — would STILL be rejected (same verdict), so probe instead
    // with a payload that only ever appeared on a rejected doc: impossible
    // by construction here, so assert the index row count stays at the
    // corpus + admitted fingerprints only.
    val corpus = media(0L -> inc)
    val batches = Seq(media(100L -> inc), media(200L -> alt))
    try {
      val store = new graft.sync.BucketedTableStore(spark, root, 8,
        deltaMerges = true, autoCompactAfter = 4)
      MediaDedupIngest.seedIndex(store, corpus, spark,
        new java.sql.Timestamp(1660000000000L))
      val fps1 = MediaDedupIngest.bandFingerprints(spark, batches(0))
      val d1 = MediaDedupIngest.decide(store, batches(0), fps1, 1L)
      MediaDedupIngest.applyAdmissions(store, fps1, d1,
        new java.sql.Timestamp(1660000060000L))
      assert(d1.collect().head.getAs[Int]("admitted") == 0)
      // corpus contributed 2 distinct band values (0 and 0xffff appear in
      // two bands each → 4 fps); the rejected batch added nothing
      val n1 = store.readBuckets("pfp", None).get.count()
      assert(n1 == 4L, s"rejected doc must add no fingerprints (index $n1)")
      val fps2 = MediaDedupIngest.bandFingerprints(spark, batches(1))
      val d2 = MediaDedupIngest.decide(store, batches(1), fps2, 2L)
      MediaDedupIngest.applyAdmissions(store, fps2, d2,
        new java.sql.Timestamp(1660000120000L))
      assert(d2.collect().head.getAs[Int]("admitted") == 1)
      val n2 = store.readBuckets("pfp", None).get.count()
      assert(n2 == 8L, s"admitted doc must add its 4 band fps (index $n2)")
    } finally graft.sync.TableStore.deleteRecursively(
      java.nio.file.Paths.get(root))
  }
}
