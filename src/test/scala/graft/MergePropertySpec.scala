package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.gen.CdcGen
import graft.ingest.Extraction
import graft.model.CdcSchemas
import graft.sync.Merge

/** Property-style tests (SURVEY.md §5 plan item 4): merge invariants over
  * seeded-random change sequences — latest-wins per key, REMOVE deletion,
  * and idempotence of re-applying a batch. A deterministic generator loop
  * stands in for ScalaCheck (same coverage, reproducible seeds).
  */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1660000000000L
  private val eventNames = Vector("INSERT", "MODIFY", "REMOVE")

  private case class Change(key: Int, eventName: String, offsetSec: Int)

  private def randomChanges(seed: Int, n: Int): List[Change] = {
    val rnd = new scala.util.Random(seed)
    List.fill(n)(Change(rnd.nextInt(5), eventNames(rnd.nextInt(3)), 1 + rnd.nextInt(500)))
  }

  private def extractedFrom(changes: List[Change]) = {
    val gen = new CdcGen.Gen(99)
    val lines = changes.map { c =>
      val item = CdcGen.Item(s"M_key${c.key}", s"Name${c.key}",
        Map("memberId" -> Left(s"key${c.key}")))
      gen.envelope(c.eventName, item, t0 + c.offsetSec * 1000L)
    }
    Extraction.extract(spark.read.schema(CdcSchemas.envelope).json(lines.toDS))
  }

  private def seedTarget = Seq(
    ("seed", "Seed", new Timestamp(t0), new Timestamp(t0))
  ).toDF("memberId", "memberName", "approximateUpdateTimestamp", "syncTimestamp")

  test("property: latest change per key wins, REMOVE deletes (15 seeds)") {
    for (seed <- 1 to 15) {
      val changes = randomChanges(seed, 12)
      val merged = Merge.syncEntity(seedTarget, extractedFrom(changes),
        Merge.members, new Timestamp(t0 + 10000000L)).get
      val got = merged.select($"memberId").as[String].collect().toSet

      // model: per key, the change with max (event ts, arrival order)
      // decides — arrival order because the merge tiebreaks equal
      // timestamps on sequencenumber, which CdcGen assigns in emit order
      val lastPerKey = changes.zipWithIndex
        .groupBy(_._1.key)
        .map { case (k, cs) => k -> cs.maxBy { case (c, i) => (c.offsetSec, i) }._1 }
      val expected = lastPerKey.collect {
        case (k, c) if c.eventName != "REMOVE" => s"key$k"
      }.toSet + "seed"
      assert(got == expected, s"seed=$seed changes=$changes")
    }
  }

  test("property: re-applying any batch to the merged target is a no-op (10 seeds)") {
    for (seed <- 100 to 109) {
      val changes = randomChanges(seed, 8)
      val extracted = extractedFrom(changes)
      val once = Merge.syncEntity(seedTarget, extracted, Merge.members,
        new Timestamp(t0 + 10000000L)).get
      val onceRows = once.collect().toIndexedSeq
      val materialized = spark.createDataFrame(
        spark.sparkContext.parallelize(onceRows), once.schema)
      val twice = Merge.syncEntity(materialized, extracted, Merge.members,
        new Timestamp(t0 + 20000000L)).get
      assert(twice.collect().toSet == onceRows.toSet, s"seed=$seed changes=$changes")
    }
  }

  test("schema evolution: stage-only columns appear, target-only survive as null") {
    val syncT = new Timestamp(t0 + 5000L)
    // upstream added `tier`; this batch modifies m1 and inserts m3
    val stage = Seq(
      ("m1", "Alice2", new Timestamp(t0 + 1000L), "gold", "MODIFY"),
      ("m3", "Carol", new Timestamp(t0 + 2000L), "silver", "INSERT")
    ).toDF("memberId", "memberName", "approximateUpdateTimestamp", "tier", "eventName")
    val target = Seq(
      ("m1", "Alice", new Timestamp(t0), new Timestamp(t0)),
      ("m2", "Bob", new Timestamp(t0), new Timestamp(t0))
    ).toDF("memberId", "memberName", "approximateUpdateTimestamp", "syncTimestamp")

    val out = Merge.applyStageEvolving(target, stage, "memberId", syncT)
    assert(out.columns.toSet ==
      Set("memberId", "memberName", "approximateUpdateTimestamp", "syncTimestamp", "tier"))
    val byId = out.select($"memberId", $"memberName", $"tier")
      .as[(String, String, Option[String])].collect().map(r => r._1 -> r).toMap
    assert(byId("m1") == ("m1", "Alice2", Some("gold")), "staged row carries new column")
    assert(byId("m2") == ("m2", "Bob", None), "surviving row gets NULL for new column")
    assert(byId("m3") == ("m3", "Carol", Some("silver")))
    // the old-schema shape is a strict subset: legacy readers keep working
    assert(out.select(target.columns.map(col).toIndexedSeq: _*).count() == 3)
  }

  test("schema evolution is append-only: a narrower stage never drops columns") {
    val syncT = new Timestamp(t0 + 5000L)
    // stage WITHOUT memberName (producer stopped sending it): column stays,
    // staged inserts get NULL
    val stage = Seq(
      ("m9", new Timestamp(t0 + 1000L), "INSERT")
    ).toDF("memberId", "approximateUpdateTimestamp", "eventName")
    val target = Seq(
      ("m2", "Bob", new Timestamp(t0), new Timestamp(t0))
    ).toDF("memberId", "memberName", "approximateUpdateTimestamp", "syncTimestamp")
    val out = Merge.applyStageEvolving(target, stage, "memberId", syncT)
    assert(out.columns.toSet == target.columns.toSet)
    val names = out.select($"memberId", $"memberName")
      .as[(String, Option[String])].collect().toMap
    assert(names("m2") == Some("Bob") && names("m9") == None)
  }
}
