package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.DedupIngest
import graft.sync.BucketedTableStore

/** Property-style check of the at-the-door protocol (MergePropertySpec's
  * seeded-loop idiom): random corpus/batch content assignments with a
  * random dedup-horizon point, driven through the REAL text door (store,
  * bloom-pruned probes, delta merges, auto-compaction, retire
  * tombstones) and compared decision-for-decision against a pure
  * in-memory model of the contract — fp-set membership with
  * last-admission stamps. Any store-layer defect that breaks the
  * protocol (a bloom false NEGATIVE skipping a bucket, a delta chain
  * resolving stale, a retire tombstone missing or over-reaching, a
  * compaction dropping live keys) shows up as a decision mismatch.
  */
class IngestDoorPropertySpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1660000000000L
  private def text(k: Int) = (0 until 12).map(t => s"k${k}t$t").mkString(" ")

  /** Fingerprint sets per content key, computed ONCE through the door's
    * own derivation (the model must share the fp definition, not
    * reimplement it — the property targets the sequential protocol). */
  private lazy val fpsOf: Map[Int, Set[String]] = {
    val df = (0 until 8).map(k => (k.toLong, text(k))).toDF("doc_id", "text")
    DedupIngest.fingerprints(df, 3, 8, 2).collect()
      .groupBy(_.getAs[Long]("doc_id").toInt)
      .map { case (k, rows) => k -> rows.map(_.getAs[String]("fp")).toSet }
  }

  test("property: door decisions match the fp-set model across horizons (6 seeds)") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val corpusKeys = (0 until 8).filter(_ => rnd.nextBoolean())
      val batches = (1 to 3).map { i =>
        val n = rnd.nextInt(5)
        (0 until n).map(j => (100L * i + j, rnd.nextInt(8)))
      }
      val retireAfter = rnd.nextInt(4) - 1 // -1 none, 0 after seed, 1/2 after batch

      val root = tmpDir(s"door-prop-$seed")
      val door = DedupIngest.door()
      val store = new BucketedTableStore(spark, root, 4,
        deltaMerges = true, autoCompactAfter = 2)
      val corpus = corpusKeys.map(k => (k.toLong, text(k)))
        .toDF("doc_id", "text")
      door.seedIndex(spark, store, corpus, new Timestamp(t0))

      // the model: fp -> last-admission stamp (seed = 0, batch i = i)
      var state = scala.collection.mutable.Map.empty[String, Int]
      corpusKeys.foreach(k => fpsOf(k).foreach(fp => state(fp) = 0))

      batches.zipWithIndex.foreach { case (rows, bi) =>
        val i = bi + 1
        if (retireAfter == i - 1) {
          val cutoff = new Timestamp(t0 + retireAfter * 60000L + 30000L)
          val retired = door.retireBefore(store, cutoff,
            new Timestamp(t0 + retireAfter * 60000L + 40000L))
          val modelRetired = state.filter(_._2 <= retireAfter).keys.toSeq
          assert(retired == modelRetired.size,
            s"seed $seed: retire count ${retired} != model ${modelRetired.size}")
          modelRetired.foreach(state.remove)
        }
        val batch = rows.map { case (id, k) => (id, text(k)) }
          .toDF("doc_id", "text")
        val probe = door.probeFrame(spark, batch)
        val dec = door.decide(spark, store, batch, probe, i.toLong)
        door.applyAdmissions(store, probe, dec, new Timestamp(t0 + i * 60000L))
        val got = dec.collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Int]("exact_dup"), r.getAs[Int]("near_dup"),
            r.getAs[Int]("admitted")))).toMap
        // model decisions against the PRE-batch state (snapshot semantics)
        val want = rows.map { case (id, k) =>
          val e = if (fpsOf(k).exists(fp => fp.startsWith("e:") &&
            state.contains(fp))) 1 else 0
          val nd = if (fpsOf(k).exists(fp => fp.startsWith("b:") &&
            state.contains(fp))) 1 else 0
          id -> ((e, nd, if (e == 0 && nd == 0) 1 else 0))
        }.toMap
        assert(got == want, s"seed $seed batch $i: got $got want $want " +
          s"(corpus $corpusKeys rows $rows retireAfter $retireAfter)")
        // model update: admitted docs' fps upsert with this batch's stamp
        rows.foreach { case (id, k) =>
          if (want(id)._3 == 1) fpsOf(k).foreach(fp => state(fp) = i)
        }
      }
    }
  }
}
