package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.CorpusSink

/** The corpus terminal: sized-shard parquet + manifest-last commit +
  * disk-side verification. The written layout must agree with the
  * declarative q134/q157 routing, every file must respect the size
  * bound, and verifyShards must catch a damaged shard.
  */
class CorpusSinkSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.tables.Tables
    .documents(spark, "/root/testdata/sf0.001")

  test("writeShards: bounded files, routing agrees with q157, manifest commits last") {
    val out = tmpDir("corpus-sink")
    val stats = CorpusSink.writeShards(docs, out, nShards = 4,
      maxRecordsPerFile = 40)

    // every document accounted for, no shard lost
    assert(stats.map(_.nDocs).sum == docs.count())
    assert(stats.map(_.shard).toSet.subsetOf((0 until 4).toSet))

    // file size bound respected AND actually exercised (500 docs / 4
    // shards at 40 rows/file → >1 file in at least one shard)
    val counts = stats.map(s => CorpusSink.shardFiles(out, s.shard).map { f =>
      val n = spark.read.parquet(f.toString).count(); assert(n <= 40); n
    })
    assert(counts.exists(_.size > 1), "size bound must split at least one shard")

    // the physical layout is the q157 manifest's routing: recompute the
    // per-shard checksums declaratively and compare
    val h = md5(concat($"doc_id".cast("string"), lit("|shuf")).cast("binary"))
    val declarative = docs
      .withColumn("shard", pmod(conv(substring(h, 1, 12), 16, 10)
        .cast("long"), lit(4L)).cast("int"))
      .select($"shard", $"doc_id",
        conv(substring(md5($"text".cast("binary")), 1, 15), 16, 10)
          .cast("long").as("chash"))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n"), expr("bit_xor(chash)").as("cc"),
        expr("bit_xor(doc_id)").as("ic"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    stats.foreach { s =>
      assert(declarative(s.shard) ==
        ((s.nDocs, s.contentChecksum, s.idChecksum)),
        s"shard ${s.shard} disagrees with the declarative routing")
    }

    // round-trip: the written corpus is the source corpus
    val back = spark.read.parquet(s"$out/data")
    assert(back.count() == docs.count())
    assert(back.select($"doc_id").as[Long].collect().sorted.toSeq ==
      docs.select($"doc_id").as[Long].collect().sorted.toSeq)

    // committed corpus verifies clean
    assert(CorpusSink.verifyShards(spark, out).isEmpty)
  }

  test("appendShards: O(batch) manifest update, crash window fails closed") {
    val out = tmpDir("corpus-sink-append")
    val first = docs.filter($"doc_id" < 300)
    val batch = docs.filter($"doc_id" >= 300)
    CorpusSink.writeShards(first, out, nShards = 4, maxRecordsPerFile = 40)
    val merged = CorpusSink.appendShards(batch, out, maxRecordsPerFile = 40)

    // appended corpus verifies clean and equals writeShards of the union:
    // XOR-merged checksums must match a from-scratch manifest
    assert(CorpusSink.verifyShards(spark, out).isEmpty)
    val scratch = tmpDir("corpus-sink-union")
    val full = CorpusSink.writeShards(docs, scratch, nShards = 4,
      maxRecordsPerFile = 40)
    assert(merged == full,
      "incremental XOR manifest must equal the from-scratch manifest")

    // replayed micro-batch (same batchId) is a no-op: rows, checksums,
    // and verification all unchanged — the foreachBatch exactly-once
    // contract; without the id guard the doubled rows' XOR contributions
    // would CANCEL and the corruption would verify clean
    val replayed = docs.filter($"doc_id" >= 450)
    val afterOnce = CorpusSink.appendShards(replayed, out, batchId = Some(7L))
    val afterTwice = CorpusSink.appendShards(replayed, out, batchId = Some(7L))
    assert(afterTwice == afterOnce, "replay must be a manifest no-op")
    assert(spark.read.parquet(s"$out/data").count() ==
      docs.count() + replayed.count(), "replay must not double rows")
    assert(CorpusSink.verifyShards(spark, out).isEmpty)

    // crash window: data landed, manifest not yet rewritten → the extra
    // files are unmanifested and verification reports their shards
    val rogue = docs.limit(1)
    val preManifest = Files.readString(Paths.get(out, "_MANIFEST.json"))
    CorpusSink.appendShards(rogue, out)
    Files.writeString(Paths.get(out, "_MANIFEST.json"), preManifest) // undo commit
    assert(CorpusSink.verifyShards(spark, out).nonEmpty,
      "data without its manifest update must fail verification")
  }

  test("property: random seed/batch splits — incremental ≡ from-scratch, always verified") {
    // Deterministic seeded trials (the StorePropertySpec convention):
    // however the corpus is sliced into a seed plus appended batches —
    // including empty batches — the incrementally-XOR-merged manifest
    // must equal the from-scratch manifest over the same documents, and
    // the corpus must verify after every single append, not just at the
    // end (a mid-sequence divergence would implicate the O(batch) merge).
    val rnd = new scala.util.Random(42)
    val allIds = docs.select($"doc_id").as[Long].collect().toSeq
    (1 to 3).foreach { trial =>
      val out = tmpDir(s"corpus-prop-$trial")
      val nBatches = 2 + rnd.nextInt(3)
      val assign = allIds.map(id => id -> rnd.nextInt(nBatches + 1)).toMap
      def slice(b: Int) = {
        val ids = allIds.filter(assign(_) == b)
        docs.filter($"doc_id".isin(ids: _*))
      }
      CorpusSink.writeShards(slice(0), out, nShards = 4,
        maxRecordsPerFile = 64)
      var last = Seq.empty[CorpusSink.ShardStat]
      (1 to nBatches).foreach { b =>
        last = CorpusSink.appendShards(slice(b), out, batchId = Some(b.toLong))
        assert(CorpusSink.verifyShards(spark, out).isEmpty,
          s"trial $trial: corpus must verify after append $b")
      }
      val scratch = tmpDir(s"corpus-prop-scratch-$trial")
      val full = CorpusSink.writeShards(docs, scratch, nShards = 4)
      assert(last == full,
        s"trial $trial: incremental manifest must equal from-scratch")
    }
  }

  test("verifyShards: a damaged shard is reported; no manifest fails loudly") {
    val out = tmpDir("corpus-sink-damage")
    val stats = CorpusSink.writeShards(docs, out, nShards = 4,
      maxRecordsPerFile = 40)
    // damage: delete one data file from the largest shard (a lost object
    // in transfer — exactly what the manifest exists to catch)
    val victim = stats.maxBy(_.nDocs).shard
    val files = CorpusSink.shardFiles(out, victim)
    Files.delete(files.head)
    val bad = CorpusSink.verifyShards(spark, out)
    assert(bad == Seq(victim),
      s"exactly the damaged shard must be reported, got $bad")

    // an unmanifested directory is an uncommitted write, never verified
    val uncommitted = tmpDir("corpus-sink-nomanifest")
    docs.write.mode("overwrite").parquet(s"$uncommitted/data")
    intercept[IllegalStateException](
      CorpusSink.verifyShards(spark, uncommitted))
  }
}
