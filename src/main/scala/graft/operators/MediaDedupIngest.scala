package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.sync.BucketedTableStore

/** Media dedup-on-ingest: the multimodal leg of the at-the-door family —
  * [[DedupIngest]] (text exact+MinHash), [[SpanIngest]] (text spans),
  * [[SemanticDedupIngest]] (embeddings) — completed for payload bytes:
  * each arriving media batch is screened against a PERSISTED perceptual-
  * hash band index that grows with the admissions. Batch k sees every
  * admission from batches 1..k-1; the index update is a merge-on-read
  * delta commit (O(batch), not O(corpus)); the corpus is never rescanned.
  *
  * Fingerprints are [[MultimodalOps.perceptualHashBands]]' four 16-bit
  * aHash bands, keyed `"p:" + band + ":" + v` in ONE [[BucketedTableStore]]
  * table — a doc is a near-dup iff ANY band value is indexed (the same
  * band-collision admission signal [[DedupIngest]] uses for its `b:`
  * MinHash buckets; the exact-Hamming verify of q174 is the PAIR
  * reporter's job, not the door's — the door only needs a conservative
  * membership answer, and a band collision at 16 bits is already a
  * strong signal on payload bytes). Payloads shorter than 64 bytes have
  * no hash (the q174 floor) — they can never be near-dups and are always
  * admitted, contributing nothing to the index.
  *
  * Decisions within one batch are taken against the index AS OF the
  * batch start (snapshot semantics — two identical new payloads in one
  * batch are both admitted), mirroring [[DedupIngest.decide]] exactly;
  * the q227 oracle replays the whole sequential run, index growth
  * included, via the q174 band chain in SQL.
  *
  * Scale shape per batch: one codegen'd phash pass over the batch, a
  * bucket-pruned index probe (touched-bucket ids are the only driver
  * materialization — ≤ nBuckets ints), one ≤4-rows-per-doc semi-join,
  * and an O(batch) delta commit with bounded auto-compaction.
  */
object MediaDedupIngest {

  /** Band fingerprints of a media frame: (doc_id, fp) with
    * fp = "p:band:v" — ≤ 4 rows per payload, none under 64 bytes. */
  def bandFingerprints(spark: SparkSession, media: DataFrame): DataFrame =
    MultimodalOps.perceptualHashBands(spark, media).toDF()
      .select(col("doc_id"), posexplode(
        array(col("b0"), col("b1"), col("b2"), col("b3"))).as(Seq("band", "v")))
      .select(col("doc_id"),
        concat(lit("p:"), col("band").cast("string"), lit(":"),
          col("v").cast("string")).as("fp"))

  /** Seed the index table from an initial corpus (may be empty). */
  def seedIndex(store: BucketedTableStore, corpus: DataFrame,
      spark: SparkSession, ts: Timestamp): Unit =
    store.writeAll("pfp",
      bandFingerprints(spark, corpus).select(col("fp")).distinct()
        .withColumn("syncTimestamp", lit(ts)), "fp")

  /** Rows of `probes` whose fp is indexed, reading only touched buckets
    * (collected: bucket IDS, bounded by the store's bucket count). */
  private def probeHits(store: BucketedTableStore, probes: DataFrame)
      : DataFrame = {
    val touched = probes.select(store.bucketCol("fp").as("_b")).distinct()
      .collect().map(_.getLong(0).toInt).toSet
    store.readBuckets("pfp", Some(touched)) match {
      case Some(idx) if idx.columns.contains("fp") =>
        probes.join(idx.select(col("fp")), Seq("fp"), "left_semi")
      case _ => probes.limit(0)
    }
  }

  /** Admit/reject ONE batch against the index as of now — pure read,
    * decisions materialized at call time (bounded: one row per doc;
    * same vacuum-race rationale as [[DedupIngest.decide]]). */
  def decide(store: BucketedTableStore, batch: DataFrame, fps: DataFrame,
      batchId: Long): DataFrame = {
    val flags = probeHits(store, fps)
      .groupBy(col("doc_id")).agg(lit(1).as("nd"))
    Materialize.thenRelease(
      batch.select(col("doc_id"))
        .join(flags, Seq("doc_id"), "left")
        .select(col("doc_id"), lit(batchId).cast("int").as("batch_id"),
          coalesce(col("nd"), lit(0)).as("near_dup"))
        .withColumn("admitted", (col("near_dup") === 0).cast("int")))
  }

  /** Merge the admitted docs' band fps into the index (delta commit +
    * bounded auto-compaction; idempotent under re-application). */
  def applyAdmissions(store: BucketedTableStore, fps: DataFrame,
      decisions: DataFrame, ts: Timestamp): Unit =
    store.applyMerge("pfp",
      fps.join(decisions.filter(col("admitted") === 1).select(col("doc_id")),
          Seq("doc_id"), "left_semi")
        .select(col("fp")).distinct()
        .withColumn("eventName", lit("INSERT")),
      "fp", ts)

  /** Seed the index from `corpus`, then ingest `batches` in order.
    * Returns one decision row per batch doc:
    * (doc_id, batch_id, near_dup, admitted), unordered. `t0` stamps the
    * index commits (deterministic clock); it never influences decisions. */
  def run(spark: SparkSession, root: String, corpus: DataFrame,
      batches: Seq[DataFrame], nBuckets: Int = 16,
      t0: Long = 1660000000000L): DataFrame = {
    val store = new BucketedTableStore(spark, root, nBuckets,
      deltaMerges = true, autoCompactAfter = 4)
    seedIndex(store, corpus, spark, new Timestamp(t0))
    val decisions = batches.zipWithIndex.map { case (batch, i) =>
      // the fp frame feeds the probe AND (filtered) the index update —
      // persisted for the batch's scope only
      val fps = bandFingerprints(spark, batch)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val decM = decide(store, batch, fps, batchId = i + 1L)
      applyAdmissions(store, fps, decM, new Timestamp(t0 + (i + 1) * 60000L))
      fps.unpersist()
      decM
    }
    decisions.reduceOption(_.unionByName(_)).getOrElse {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("doc_id", LongType),
          StructField("batch_id", IntegerType),
          StructField("near_dup", IntegerType),
          StructField("admitted", IntegerType))))
    }
  }
}
