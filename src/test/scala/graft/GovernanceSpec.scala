package graft

import org.apache.spark.sql.Row

/** Semantic invariants of the governance operators — properties the
  * DuckDB oracle equality can't STATE (it only replays the same
  * computation): the forget cascade must actually account for every
  * removed row and leave zero residuals, and both audits must be
  * deterministic across runs (they round-trip temp stores, so
  * nondeterminism would show up as flaky audits, not wrong SQL).
  */
class GovernanceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q235: the audit balances and proves zero residuals") {
    val rows = SparkEntry.queries("q235_forget_propagation")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("corpus", "chunks", "dedup_index", "manifest"))
    // every artifact ends clean: no row referencing a forgotten doc
    rows.values.foreach(r => assert(r.getLong(4) == 0L,
      s"${r.getString(0)}: residual must be 0, got ${r.getLong(4)}"))
    // row-level artifacts balance exactly: before - touched = after
    for (a <- Seq("corpus", "chunks")) {
      val r = rows(a)
      assert(r.getLong(1) - r.getLong(3) == r.getLong(2),
        s"$a: rows_before - n_touched must equal rows_after")
    }
    // the index never grows from a deletion
    val idx = rows("dedup_index")
    assert(idx.getLong(2) <= idx.getLong(1))
    // the manifest keeps its shard count — deletion shifts checksums,
    // never drops a shard row (shards are hash ranges, not data)
    val man = rows("manifest")
    assert(man.getLong(1) == 8L && man.getLong(2) == 8L)
  }

  test("q233/q235: audits are deterministic across runs (store round-trip)") {
    def run(name: String): Seq[Row] =
      SparkEntry.queries(name)(spark, dir).collect().toSeq
    assert(run("q233_corpus_diff") == run("q233_corpus_diff"))
    assert(run("q235_forget_propagation") == run("q235_forget_propagation"))
  }

  test("q233: every (source, status) count is positive and statuses are canonical") {
    val rows = SparkEntry.queries("q233_corpus_diff")(spark, dir).collect()
    val statuses = rows.map(_.getString(1)).toSet
    assert(statuses.subsetOf(
      Set("added", "removed", "changed", "unchanged")))
    rows.foreach(r => assert(r.getLong(2) > 0L))
    // the diff actually exercises all four transitions at this scale
    assert(statuses == Set("added", "removed", "changed", "unchanged"))
  }
}
