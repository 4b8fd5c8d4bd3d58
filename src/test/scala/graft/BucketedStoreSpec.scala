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
