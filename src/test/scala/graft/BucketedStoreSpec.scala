package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sync.BucketedTableStore

/** Partition-level snapshot store: merge touches only the buckets holding
  * staged keys, untouched buckets keep their bytes and version, and the
  * merged table state equals the whole-table delete-then-insert semantics.
  */
class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = new Timestamp(1660000000000L)
  private val t1 = new Timestamp(1660000060000L)

  private def target() = Seq(
    ("m1", "alice", t0), ("m2", "bob", t0), ("m3", "carol", t0),
    ("m4", "dave", t0), ("m5", "eve", t0), ("m6", "frank", t0))
    .toDF("memberId", "memberName", "approximateUpdateTimestamp")
    .withColumn("syncTimestamp", lit(t0))

  test("bucketed merge equals whole-table upsert semantics") {
    val root = tmpDir("bstore")
    val store = new BucketedTableStore(spark, root, nBuckets = 4)
    store.writeAll("member", target(), "memberId",
      sortBy = Some("approximateUpdateTimestamp"))

    val stage = Seq(
      ("m2", "bob2", t1, "MODIFY"),   // update
      ("m7", "grace", t1, "INSERT"),  // new key
      ("m3", "carol", t1, "REMOVE"))  // delete
      .toDF("memberId", "memberName", "approximateUpdateTimestamp", "eventName")
    store.merge("member", stage, "memberId", t1)

    val got = store.read("member").get
      .select($"memberId", $"memberName", $"syncTimestamp")
      .as[(String, String, Timestamp)].collect().toSet
    assert(got == Set(
      ("m1", "alice", t0), ("m4", "dave", t0), ("m5", "eve", t0),
      ("m6", "frank", t0),                       // untouched survive
      ("m2", "bob2", t1), ("m7", "grace", t1))) // upserted stamped t1
  }

  test("schema sidecars: reads serve the persisted schema, and a missing " +
    "or corrupt one degrades to inference, never to an error") {
    val root = tmpDir("bstore-schema")
    val store = new BucketedTableStore(spark, root, nBuckets = 4,
      deltaMerges = true, autoCompactAfter = 8)
    store.writeAll("member", target(), "memberId")
    val stage = Seq(("m2", "bob2", t1, "MODIFY"))
      .toDF("memberId", "memberName", "approximateUpdateTimestamp", "eventName")
    store.applyMerge("member", stage, "memberId", t1)
    def state() = store.read("member").get
      .select($"memberId", $"memberName").as[(String, String)]
      .collect().toSet
    val expected = state()
    assert(expected.contains(("m2", "bob2")))
    // both sidecars exist after a writeAll + delta commit
    val sf = java.nio.file.Paths.get(root, "member", "_SCHEMA")
    val df = java.nio.file.Paths.get(root, "member", "_DSCHEMA")
    assert(java.nio.file.Files.exists(sf) && java.nio.file.Files.exists(df))
    // corrupt one, delete the other: reads must still produce the same
    // table (inference fallback), not fail on the sidecar
    java.nio.file.Files.write(sf, "{not json".getBytes)
    java.nio.file.Files.delete(df)
    assert(state() == expected,
      "reads must degrade to schema inference when sidecars are lost")
  }

  test("merge leaves untouched buckets at their old version") {
    val root = tmpDir("bstore2")
    val store = new BucketedTableStore(spark, root, nBuckets = 8)
    store.writeAll("member", target(), "memberId")
    val before = store.manifest("member").get

    val stage = Seq(("m1", "alice2", t1, "MODIFY"))
      .toDF("memberId", "memberName", "approximateUpdateTimestamp", "eventName")
    store.merge("member", stage, "memberId", t1)
    val after = store.manifest("member").get

    val touchedBucket = Seq("m1").toDF("memberId")
      .select(store.bucketCol("memberId")).head().getLong(0).toInt
    assert(after(touchedBucket) == before(touchedBucket) + 1,
      "touched bucket must advance")
    val untouched = before.keySet - touchedBucket
    untouched.foreach { b =>
      assert(after(b) == before(b), s"untouched bucket $b must keep its version")
    }
    assert(untouched.nonEmpty, "fixture should spread keys over >1 bucket")
  }

  test("REMOVE draining a whole bucket leaves a valid empty snapshot") {
    val root = tmpDir("bstore3")
    val store = new BucketedTableStore(spark, root, nBuckets = 2)
    val one = Seq(("solo", "s", t0))
      .toDF("memberId", "memberName", "approximateUpdateTimestamp")
      .withColumn("syncTimestamp", lit(t0))
    store.writeAll("member", one, "memberId")
    val stage = Seq(("solo", "s", t1, "REMOVE"))
      .toDF("memberId", "memberName", "approximateUpdateTimestamp", "eventName")
    store.merge("member", stage, "memberId", t1)
    assert(store.read("member").get.count() == 0)
  }

  test("time travel: a prior manifest reconstructs the pre-merge state") {
    val root = tmpDir("bstore5")
    val store = new BucketedTableStore(spark, root, nBuckets = 4)
    store.writeAll("member", target(), "memberId")
    val stage = Seq(("m2", "bob2", t1, "MODIFY"))
      .toDF("memberId", "memberName", "approximateUpdateTimestamp", "eventName")
    store.merge("member", stage, "memberId", t1)

    val before = store.readAtManifest("member", 0).get
      .select($"memberId", $"memberName").as[(String, String)].collect().toSet
    assert(before("m2" -> "bob") && !before("m2" -> "bob2"),
      "manifest 0 must still show the pre-merge row")
    val now = store.read("member").get
      .select($"memberId", $"memberName").as[(String, String)].collect().toSet
    assert(now("m2" -> "bob2") && !now("m2" -> "bob"))
  }

  test("time travel after a schema-changing writeAll returns the files' true schema") {
    // The schema sidecar reflects the LIVE layout; a historical read
    // older than the sidecar's stamp must fall back to inference, or
    // renamed/dropped columns come back as silent nulls bound to the new
    // schema. Scenario: v0 has memberName; a later writeAll renames it
    // to displayName; readAtManifest(0) must still surface memberName
    // with its real values.
    val root = tmpDir("bstore-schemav")
    val store = new BucketedTableStore(spark, root, nBuckets = 4)
    store.writeAll("member", target(), "memberId")
    val v0 = store.manifest("member"); assert(v0.nonEmpty)
    val renamed = target().withColumnRenamed("memberName", "displayName")
    store.writeAll("member", renamed, "memberId")

    val live = store.read("member").get
    assert(live.columns.contains("displayName") &&
      !live.columns.contains("memberName"))
    val historical = store.readAtManifest("member", 0).get
    assert(historical.columns.contains("memberName"),
      "historical read must carry the old schema, not the live sidecar's")
    val names = historical.select($"memberName").as[String].collect().toSet
    assert(names.contains("alice") && !names.contains(null),
      "old column values must survive, not degrade to nulls")
  }

  test("merge inserts into a bucket that never had a manifest entry") {
    val root = tmpDir("bstore6")
    val store = new BucketedTableStore(spark, root, nBuckets = 2)
    val one = Seq(("solo", "s", t0))
      .toDF("memberId", "memberName", "approximateUpdateTimestamp")
      .withColumn("syncTimestamp", lit(t0))
    store.writeAll("member", one, "memberId") // one bucket stays empty
    assert(store.manifest("member").get.size == 1)

    // find a key hashing to the OTHER (manifest-less) bucket
    val soloBucket = Seq("solo").toDF("memberId")
      .select(store.bucketCol("memberId")).head().getLong(0)
    val newKey = (1 to 100).map(i => s"new$i").find { k =>
      Seq(k).toDF("memberId").select(store.bucketCol("memberId"))
        .head().getLong(0) != soloBucket
    }.get

    val stage = Seq((newKey, "n", t1, "INSERT"))
      .toDF("memberId", "memberName", "approximateUpdateTimestamp", "eventName")
    store.merge("member", stage, "memberId", t1)
    val got = store.read("member").get
      .select($"memberId").as[String].collect().toSet
    assert(got == Set("solo", newKey))
  }

  test("vacuum: old manifests and unreferenced bucket versions deleted, live read intact") {
    val root = tmpDir("bstore7")
    val store = new BucketedTableStore(spark, root, nBuckets = 4)
    store.writeAll("member", target(), "memberId")
    // two merges on the same key → that bucket gets three versions
    Seq(t1, new Timestamp(t1.getTime + 60000)).zipWithIndex.foreach { case (t, i) =>
      val stage = Seq(("m2", s"bob$i", t, "MODIFY"))
        .toDF("memberId", "memberName", "approximateUpdateTimestamp", "eventName")
      store.merge("member", stage, "memberId", t)
    }
    val liveBefore = store.read("member").get
      .select($"memberId", $"memberName").as[(String, String)].collect().toSet

    val (manifestsDropped, dirsDropped) = store.vacuum("member", keepManifests = 1)
    assert(manifestsDropped == 2, "manifests 0 and 1 must be swept")
    assert(dirsDropped >= 2, "the two superseded versions of m2's bucket must be swept")

    assert(store.readAtManifest("member", 0).isEmpty,
      "time travel below the retention floor must be gone")
    val liveAfter = store.read("member").get
      .select($"memberId", $"memberName").as[(String, String)].collect().toSet
    assert(liveAfter == liveBefore, "the live snapshot must be untouched")
    // sweep is idempotent
    assert(store.vacuum("member", keepManifests = 1) == ((0, 0)))
  }

  test("vacuum racing a lazy historical read fails loudly, never partially") {
    // Same freeze-or-fail contract DedupIngest gives in-flight decisions:
    // a time-travel frame planned BEFORE a retention sweep must either
    // error at execution or have been refused up front — silently
    // returning whichever buckets survived the sweep would be a wrong
    // answer wearing a green checkmark.
    val root = tmpDir("bstore-vrace")
    val store = new BucketedTableStore(spark, root, nBuckets = 4)
    store.writeAll("member", target(), "memberId")
    val stage = Seq(("m2", "bob2", t1, "MODIFY"))
      .toDF("memberId", "memberName", "approximateUpdateTimestamp", "eventName")
    store.merge("member", stage, "memberId", t1)

    // plan (lazily, no action yet) two historical reads of manifest 0
    val held = store.readAtManifest("member", 0).get
    val heldProbe = store.readWhereInAt("member", 0, "memberId", Seq("m2")).get

    // force staleness detection even if the session flips the global
    // ignore-missing switch — the store pins it off per-read
    spark.conf.set("spark.sql.files.ignoreMissingFiles", "true")
    try {
      store.vacuum("member", keepManifests = 1)

      // refused by retention: the dropped manifest is no longer addressable
      assert(store.readAtManifest("member", 0).isEmpty)
      assert(store.readWhereInAt("member", 0, "memberId", Seq("m2")).isEmpty)

      def causes(t: Throwable, seen: Int = 0): Seq[Throwable] =
        if (t == null || seen > 10) Nil else t +: causes(t.getCause, seen + 1)
      def failsLoudly(df: org.apache.spark.sql.DataFrame): Unit = {
        val e = intercept[Exception](df.count())
        assert(causes(e).exists(c => c.isInstanceOf[java.io.FileNotFoundException]
            || String.valueOf(c.getMessage).toLowerCase.contains("does not exist")
            || String.valueOf(c.getMessage).toLowerCase.contains("file not found")),
          s"expected a missing-file failure, got: $e")
      }
      failsLoudly(held)
      failsLoudly(heldProbe)
    } finally spark.conf.unset("spark.sql.files.ignoreMissingFiles")
  }

  test("TableStore vacuum: versions below the floor gone, live + retained readable") {
    val root = tmpDir("tstore-vac")
    val store = new graft.sync.TableStore(spark, root)
    (0 to 2).foreach { i =>
      store.write("member", target().withColumn("gen", lit(i)))
    }
    assert(store.vacuum("member", keepVersions = 2) == Seq(0))
    assert(store.readAt("member", 0).isEmpty)
    assert(store.readAt("member", 1).isDefined, "retained history must survive")
    assert(store.read("member").get.agg(max($"gen")).head().getInt(0) == 2)
  }

  test("lookup reads only the probed keys' bucket files") {
    val root = tmpDir("bstore8")
    val store = new BucketedTableStore(spark, root, nBuckets = 8)
    store.writeAll("member", target(), "memberId")

    val df = store.lookup("member", "memberId", Seq("m2", "m5")).get
    val got = df.select($"memberId", $"memberName").as[(String, String)]
      .collect().toSet
    assert(got == Set("m2" -> "bob", "m5" -> "eve"))

    val wantedBuckets = Seq("m2", "m5").map { k =>
      Seq(k).toDF("memberId").select(store.bucketCol("memberId"))
        .head().getLong(0).toInt
    }.toSet
    val touchedDirs = df.inputFiles.map { f =>
      f.split('/').find(_.matches("b\\d+")).get
    }.toSet
    assert(touchedDirs == wantedBuckets.map(b => s"b$b"),
      s"probe must open only the keys' buckets, opened $touchedDirs")
  }

  test("rebucket rewrites the live snapshot under a new bucket count") {
    val root = tmpDir("bstore9")
    val store = new BucketedTableStore(spark, root, nBuckets = 2)
    store.writeAll("member", target(), "memberId")
    val before = store.read("member").get
      .select($"memberId", $"memberName").as[(String, String)].collect().toSet

    val wide = store.rebucket("member", "memberId", newN = 8,
      newRoot = tmpDir("bstore9-wide"))
    val after = wide.read("member").get
      .select($"memberId", $"memberName").as[(String, String)].collect().toSet
    assert(after == before, "rebucket must preserve contents exactly")
    assert(wide.manifest("member").get.keySet.max < 8)
    assert(wide.lookup("member", "memberId", Seq("m4")).get.count() == 1)
  }

  test("stale manifest commit is rejected (lost-update protection)") {
    val root = tmpDir("bstore10")
    val store = new BucketedTableStore(spark, root, nBuckets = 4)
    store.writeAll("member", target(), "memberId") // manifest 0
    // writer A captures base 0; writer B lands a real merge first
    val stage = Seq(("m2", "bob2", t1, "MODIFY"))
      .toDF("memberId", "memberName", "approximateUpdateTimestamp", "eventName")
    store.merge("member", stage, "memberId", t1) // manifest 1
    val liveBefore = store.bucketStates("member").get

    // A's publish against its stale base must refuse, not clobber B
    intercept[java.util.ConcurrentModificationException] {
      store.commitManifest("member", Map(0 -> new graft.sync.BucketState(99, Nil)), Some(0))
    }
    assert(store.bucketStates("member").get == liveBefore,
      "refused commit must leave the live manifest untouched")

    // the retry path — re-read the base, commit against it — succeeds
    store.commitManifest("member", liveBefore, Some(1))
    assert(store.readAtManifest("member", 2).isDefined)
  }

  test("TableStore stale write is rejected the same way") {
    val root = tmpDir("tstore-occ")
    val store = new graft.sync.TableStore(spark, root)
    store.write("member", target())                  // v0
    val winner = Seq(("mW", "winner", t1, "INSERT"))
      .toDF("memberId", "memberName", "approximateUpdateTimestamp", "eventName")
    store.write("member", winner)                    // v1 (another writer)
    // the stale writer targets the SAME v1 path the winner already
    // published: it must refuse without touching the winner's bytes
    intercept[java.util.ConcurrentModificationException] {
      store.writeIfBase("member", target(), expectedBase = Some(0))
    }
    assert(store.currentVersion("member").contains(1),
      "refused write must not move the live pointer")
    assert(store.read("member").get.select($"memberId").as[String]
        .collect().toSeq == Seq("mW"),
      "refused write must not corrupt the winner's published snapshot")
  }

  test("stale bucketed merge leaves the winner's bucket data intact") {
    val root = tmpDir("bstore-occ2")
    val store = new BucketedTableStore(spark, root, nBuckets = 2)
    store.writeAll("member", target(), "memberId")   // manifest 0
    // winner lands a merge first → manifest 1
    val winner = Seq(("m2", "winner-bob", t1, "MODIFY"))
      .toDF("memberId", "memberName", "approximateUpdateTimestamp", "eventName")
    store.merge("member", winner, "memberId", t1)
    val winnerRows = store.read("member").get
      .select($"memberId", $"memberName").as[(String, String)].collect().toSet
    // stale writer: same base-0 manifest, overlapping bucket versions —
    // applyMergeAt-style race simulated by committing through merge with a
    // rolled-back pointer capture is not reachable from the public API, so
    // drive writeIfBase's bucketed analogue directly: a merge whose base
    // was read before the winner committed
    val stale = Seq(("m2", "stale-bob", t1, "MODIFY"))
      .toDF("memberId", "memberName", "approximateUpdateTimestamp", "eventName")
    intercept[java.util.ConcurrentModificationException] {
      store.mergeAtBase("member", stale, "memberId", t1, Some(0))
    }
    assert(store.read("member").get
        .select($"memberId", $"memberName").as[(String, String)].collect().toSet
      == winnerRows,
      "stale merge must not clobber the winner's published bucket versions")
  }

  // --- merge-on-read (mergeDelta / compact) ---------------------------

  private def stageBatch1 = Seq(
    ("m2", "bob2", t1, "MODIFY"),   // update
    ("m7", "grace", t1, "INSERT"),  // new key
    ("m3", "carol", t1, "REMOVE"))  // delete → tombstone on the MOR path
    .toDF("memberId", "memberName", "approximateUpdateTimestamp", "eventName")

  private def stageBatch2(t: Timestamp) = Seq(
    ("m2", "bob3", t, "MODIFY"),    // second update of the same key
    ("m7", "grace", t, "REMOVE"))   // delete a key that only exists in a delta
    .toDF("memberId", "memberName", "approximateUpdateTimestamp", "eventName")

  private def snapshot(store: BucketedTableStore): Set[(String, String, Timestamp)] =
    store.read("member").get
      .select($"memberId", $"memberName", $"syncTimestamp")
      .as[(String, String, Timestamp)].collect().toSet

  test("mergeDelta matches copy-on-write merge on the same stage sequence") {
    val t2 = new Timestamp(t1.getTime + 60000)
    val cow = new BucketedTableStore(spark, tmpDir("mor-cow"), nBuckets = 4)
    val mor = new BucketedTableStore(spark, tmpDir("mor-mor"), nBuckets = 4)
    Seq(cow, mor).foreach(_.writeAll("member", target(), "memberId"))

    cow.merge("member", stageBatch1, "memberId", t1)
    cow.merge("member", stageBatch2(t2), "memberId", t2)
    mor.mergeDelta("member", stageBatch1, "memberId", t1)
    mor.mergeDelta("member", stageBatch2(t2), "memberId", t2)

    assert(snapshot(mor) == snapshot(cow),
      "delta chains must resolve to the copy-on-write result (incl. REMOVEs)")
    // the MOR commits never rewrote a base: every touched bucket still
    // points at its v0 base with a non-empty delta chain
    val states = mor.bucketStates("member").get
    assert(states.values.forall(_.base == 0), "mergeDelta must not rewrite bases")
    assert(states.values.exists(_.deltas.nonEmpty), "touched buckets carry chains")
    // point lookups resolve through dirty buckets too
    val probe = mor.lookup("member", "memberId", Seq("m2")).get
      .select($"memberName").as[String].collect().toSeq
    assert(probe == Seq("bob3"))
  }

  test("a crashed predecessor's orphan dirs do not wedge the retry") {
    val t2 = new Timestamp(t1.getTime + 60000)
    val rootStr = tmpDir("mor-crash")
    val store = new BucketedTableStore(spark, rootStr, nBuckets = 4)
    store.writeAll("member", target(), "memberId") // manifest 0
    // simulate a writer that died between its dir moves and its commit:
    // moved-but-uncommitted v1/d1 debris in every bucket dir
    val root = java.nio.file.Paths.get(rootStr)
    (0 until 4).foreach { b =>
      val junkV = root.resolve("member").resolve(s"b$b").resolve("v1")
      val junkD = root.resolve("member").resolve(s"b$b").resolve("d1")
      java.nio.file.Files.createDirectories(junkV)
      java.nio.file.Files.createDirectories(junkD)
      java.nio.file.Files.write(junkV.resolve("part-junk"), "junk".getBytes)
    }
    // the retry of the same logical merge must sweep the debris and land,
    // not throw ConcurrentModificationException forever
    store.mergeDelta("member", stageBatch1, "memberId", t1)   // manifest 1
    store.merge("member", stageBatch2(t2), "memberId", t2)    // manifest 2
    val expect = new BucketedTableStore(spark, tmpDir("mor-crash-ref"), nBuckets = 4)
    expect.writeAll("member", target(), "memberId")
    expect.merge("member", stageBatch1, "memberId", t1)
    expect.merge("member", stageBatch2(t2), "memberId", t2)
    assert(snapshot(store) == snapshot(expect),
      "post-crash retry must produce the clean-path result")
    // a committed WINNER's dirs are never treated as debris: a stale
    // writer still refuses (its dest-version dirs are <= live manifest)
    intercept[java.util.ConcurrentModificationException] {
      store.mergeAtBase("member", stageBatch1, "memberId", t1, Some(0))
    }
  }

  test("compact discharges delta chains without changing the read") {
    val t2 = new Timestamp(t1.getTime + 60000)
    val store = new BucketedTableStore(spark, tmpDir("mor-compact"), nBuckets = 4)
    store.writeAll("member", target(), "memberId")        // manifest 0
    store.mergeDelta("member", stageBatch1, "memberId", t1) // manifest 1
    store.mergeDelta("member", stageBatch2(t2), "memberId", t2) // manifest 2
    val liveBefore = snapshot(store)
    val deltaDirsBefore = store.bucketStates("member").get.values.map(_.deltas.size).sum
    assert(deltaDirsBefore >= 2, "fixture must build real chains")

    assert(store.compact("member", minDeltas = 1) > 0)    // manifest 3
    val states = store.bucketStates("member").get
    assert(states.values.forall(_.isClean), "compaction must clear every chain")
    assert(snapshot(store) == liveBefore, "compaction must not change the read")
    // compacted read touches no d-dirs: the resolve is pure base files now
    assert(!store.read("member").get.inputFiles.exists(_.contains("/d")),
      "post-compaction read must not open delta files")

    // time travel ACROSS the compaction still resolves the old chains…
    val atManifest2 = store.readAtManifest("member", 2).get
      .select($"memberId", $"memberName", $"syncTimestamp")
      .as[(String, String, Timestamp)].collect().toSet
    assert(atManifest2 == liveBefore, "pre-compaction manifest must replay its chains")
    // …and vacuum keeps the d-dirs that retained manifest still references
    store.vacuum("member", keepManifests = 2)             // keeps manifests 2,3
    assert(store.readAtManifest("member", 2).get.count() == liveBefore.size,
      "retained delta manifest must stay readable after vacuum")
    // dropping it sweeps the now-unreferenced delta dirs
    val (_, dirs) = store.vacuum("member", keepManifests = 1)
    assert(dirs >= deltaDirsBefore, "unreferenced d-dirs must be swept")
    assert(snapshot(store) == liveBefore, "live read intact after full sweep")
  }

  test("applyMerge with deltaMerges auto-compacts at the chain threshold") {
    val store = new BucketedTableStore(spark, tmpDir("mor-auto"), nBuckets = 2,
      deltaMerges = true, autoCompactAfter = 2)
    store.writeAll("member", target(), "memberId")
    def modify(i: Int): Unit = {
      val t = new Timestamp(t1.getTime + i * 60000L)
      store.applyMerge("member",
        Seq(("m2", s"bob$i", t, "MODIFY"))
          .toDF("memberId", "memberName", "approximateUpdateTimestamp", "eventName"),
        "memberId", t)
    }
    modify(1)
    val b2 = Seq("m2").toDF("memberId").select(store.bucketCol("memberId"))
      .head().getLong(0).toInt
    assert(store.bucketStates("member").get(b2).deltas.size == 1,
      "below the threshold the chain must be left in place")
    modify(2) // chain reaches 2 → auto-compaction discharges it
    val st = store.bucketStates("member").get(b2)
    assert(st.isClean, s"auto-compaction must clear the chain, got $st")
    assert(st.base > 0, "compaction publishes a fresh base for the bucket")
    val row = store.lookup("member", "memberId", Seq("m2")).get
      .select($"memberName").as[String].collect().toSeq
    assert(row == Seq("bob2"), "latest delta wins through the compacted base")
  }

  test("mergeDelta and compact sweep uncommitted dest debris and land") {
    // An above-live v/d-dir with the manifest unchanged can only be a
    // crashed (or protocol-violating) writer's moved-but-uncommitted
    // leftovers: a real winner would have advanced the manifest, which
    // the pre-move base re-check catches separately. Pre-sweep, this
    // debris tripped the existing-dest check on EVERY retry of the same
    // logical commit — a permanent wedge after one mid-merge crash.
    val root = tmpDir("mor-occ")
    val store = new BucketedTableStore(spark, root, nBuckets = 2)
    store.writeAll("member", target(), "memberId")        // manifest 0
    val b2 = Seq("m2").toDF("memberId").select(store.bucketCol("memberId"))
      .head().getLong(0).toInt

    val d1 = java.nio.file.Paths.get(root, "member", s"b$b2", "d1")
    java.nio.file.Files.createDirectories(d1)
    java.nio.file.Files.write(d1.resolve("part-junk"), "junk".getBytes)
    store.mergeDelta("member",
      Seq(("m2", "bob2", t1, "MODIFY"))
        .toDF("memberId", "memberName", "approximateUpdateTimestamp", "eventName"),
      "memberId", t1)                                      // manifest 1
    assert(store.lookup("member", "memberId", Seq("m2")).get
        .select($"memberName").as[String].collect().toSeq == Seq("bob2"),
      "the retried delta commit must land over swept debris")

    // same on the compaction rewrite: junk at its dest v-dir is swept
    val afterDelta = snapshot(store)
    val v2 = java.nio.file.Paths.get(root, "member", s"b$b2", "v2")
    java.nio.file.Files.createDirectories(v2)
    java.nio.file.Files.write(v2.resolve("part-junk"), "junk".getBytes)
    assert(store.compact("member", minDeltas = 1) > 0)     // manifest 2
    assert(store.bucketStates("member").get.values.forall(_.isClean) &&
      snapshot(store) == afterDelta,
      "compaction over swept debris must publish the clean result")
  }

  test("merge is idempotent: reapplying the same stage is a no-op") {
    val root = tmpDir("bstore4")
    val store = new BucketedTableStore(spark, root, nBuckets = 4)
    store.writeAll("member", target(), "memberId")
    val stage = Seq(("m2", "bob2", t1, "MODIFY"))
      .toDF("memberId", "memberName", "approximateUpdateTimestamp", "eventName")
    store.merge("member", stage, "memberId", t1)
    val once = store.read("member").get.orderBy($"memberId")
      .as[(String, String, Timestamp, Timestamp, Long)].collect().toSeq
    store.merge("member", stage, "memberId", t1)
    val twice = store.read("member").get.orderBy($"memberId")
      .as[(String, String, Timestamp, Timestamp, Long)].collect().toSeq
    assert(once == twice)
  }
}
