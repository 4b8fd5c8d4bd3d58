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

  test("q238: the SQL noise construction equals the pure-Scala geometric sampler") {
    // reference implementation of the release's randomness, independent
    // of either engine: md5 hex → 60-bit int → two 30-bit halves →
    // ctz(half | 2^30) each Geometric(1/2) → difference is the two-sided
    // geometric at α = 1/2 (ε = ln 2)
    def refNoise(source: String, lang: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"q238||$source|$lang".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val bit30 = 1L << 30
      def ctz(x: Long) = java.lang.Long.numberOfTrailingZeros(x).toLong
      ctz((h & (bit30 - 1)) | bit30) - ctz((h >> 30) | bit30)
    }
    val truth = graft.tables.Tables.documents(spark, dir)
      .groupBy("source", "lang").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val released = graft.queries.GovernanceQueries.q238DpRelease(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(released.keySet == truth.keySet,
      "the geometric mechanism publishes EVERY cell (no suppression)")
    released.foreach { case (k, rel) =>
      val want = math.max(truth(k) + refNoise(k._1, k._2), 0L)
      assert(rel == want, s"cell $k: released $rel, reference $want")
      assert(rel >= 0L)
    }
    // the ctz cap bounds any single cell's distortion at ±30
    released.foreach { case (k, rel) =>
      assert(math.abs(rel - truth(k)) <= 30L ||
        (rel == 0L && truth(k) <= 30L), s"cell $k noise out of bounds")
    }
  }

  test("q238: a secret salt re-seeds the noise (the actual-DP configuration)") {
    def rel(salt: String): Map[(String, String), Long] =
      graft.queries.GovernanceQueries.q238DpRelease(spark, dir, salt)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val pub = rel("")
    val sec = rel("keep-this-out-of-the-release")
    // same cells published either way (the mechanism never suppresses)…
    assert(pub.keySet == sec.keySet)
    // …but the noise stream is different, so a reader who only knows
    // the cell labels can no longer reconstruct it — at least one cell
    // must move (all-coincide has probability ~(1/2)^cells)
    assert(pub != sec, "secret salt must change at least one cell's noise")
  }
}
