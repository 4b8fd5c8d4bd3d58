package graft

import org.apache.spark.sql.functions._

import graft.queries.VectorQueries

/** Graph-search ANN (q242): the provable walk properties and the
  * measured-quality gate that set-recall alone would misread on
  * near-tie-dense data (see the q242 scaladoc's measurements). */
class GraphAnnSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  /** Per-query cosine mass of the top-3 of a walk result. */
  private def mass(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.filter(col("rank") <= 3)
      .groupBy(col("query_id"))
      .agg(sum(col("cosine")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("hop monotonicity: each hop's top-3 mass never decreases") {
    // frontier(h+1) ⊇ beam(h), re-scored identically ⇒ the k-th best
    // candidate can only improve — the property that makes "more hops"
    // a safe knob at any scale
    val byHop = (1 to 3).map(h =>
      mass(VectorQueries.q242GraphAnnSearch(spark, dir, hops = h)))
    for (h <- 0 until 2; (qid, m) <- byHop(h)) {
      val next = byHop(h + 1)(qid)
      assert(next >= m - 1e-9,
        s"query $qid: hop ${h + 2} mass $next < hop ${h + 1} mass $m")
    }
  }

  test("quality gate: the walk captures >= 0.95 of the exact top-3 cosine " +
    "mass and >= 0.95 set-recall@3 at the gate SF") {
    import graft.operators.VectorOps
    val emb = graft.tables.Tables.embeddings(spark, dir)
    val queries = emb.filter(pmod(col("vec_id"), lit(16)) === 0)
    // brute-force exact top-3, self excluded (the walk's ground truth)
    val exact = VectorOps.bruteForceTopK(queries, emb, k = 4)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("r", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)))
      .filter(col("r") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("r").as("rank"))
    val exactMass = mass(exact)
    val walk = VectorQueries.q242GraphAnnSearch(spark, dir)
    val gotMass = mass(walk)
    assert(gotMass.keySet == exactMass.keySet, "every query must answer")
    val ratios = gotMass.map { case (q, g) => g / exactMass(q) }
    val mean = ratios.sum / ratios.size
    // round-16 floor (H1+H2 multi-probe entries + coverage/symmetry
    // graph + beam 32 + degree 6): measured 1.00 mass / 1.00 set-recall
    // at sf0.01, 0.99 / 0.86 at sf0.1 — gate at 0.95 with headroom for
    // the deterministic gate SF (re-measure via AnnRecallProbe `graph`
    // on any change; the sf0.1 floor is gated separately below)
    assert(mean >= 0.95, f"mean cosine-mass ratio $mean%.3f < 0.95")
    ratios.foreach(r => assert(r <= 1.0 + 1e-9, s"walk cannot beat exact: $r"))
    val exSets = exact.collect().groupBy(_.getAs[Long]("query_id")).view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val gotSets = walk.filter(col("rank") <= 3).collect()
      .groupBy(_.getAs[Long]("query_id")).view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recalls = exSets.map { case (q, s) =>
      (gotSets.getOrElse(q, Set.empty[Long]) & s).size.toDouble / s.size }
    val recMean = recalls.sum / recalls.size
    assert(recMean >= 0.95, f"mean set-recall@3 $recMean%.3f < 0.95")
  }

  test("sf0.1 recall floor: the near-tie-dense corpus holds the round-16 " +
    "set-recall gain") {
    // the throughput SF where recall is genuinely hard (near-tie-dense
    // continuum; sf0.01 saturates at 1.00 and would mask a regression):
    // round-16 measured mean set-recall@3 0.864 / mass mean 0.988 with
    // beam 32 + degree 6 + Hamming-2 probes — gate at 0.80 / 0.97 with
    // drift margin (the q237-floor lesson: zero-headroom gates flake)
    val walk = VectorQueries.q242GraphAnnSearch(spark, "/root/testdata/sf0.1")
      .collect()
    val hits = walk.map(r =>
      r.getAs[Long]("query_id") -> r.getAs[Int]("hit").toDouble)
    val recall = hits.groupBy(_._1).map { case (_, h) => h.map(_._2).sum / 3.0 }
    val recMean = recall.sum / recall.size
    assert(recMean >= 0.80, f"sf0.1 mean set-recall@3 $recMean%.3f < 0.80")
  }

  test("incremental maintenance (q245): the append-built graph holds the " +
    "full-rebuild recall floor") {
    // add-after-build must not cost recall: at the gate SF both the
    // frozen-base + append-delta graph and the full rebuild saturate
    // (1.00); at sf0.1 the incremental build measured 0.93 set-recall@3
    // vs the rebuild's 0.86 — the split cell caps (64 per side) admit up
    // to twice the nominees per cell, so maintenance is measured BETTER,
    // not just not-worse. Gate both: per-query parity at sf0.01, an
    // absolute 0.85 floor at sf0.1 (above the rebuild's own 0.80 gate).
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val rows = df.collect()
      val byQ = rows.groupBy(_.getAs[Long]("query_id"))
        .map { case (_, rs) => rs.map(_.getAs[Int]("hit")).sum / 3.0 }
      byQ.sum / byQ.size
    }
    val incr = recallOf(VectorQueries.q245GraphAnnAppend(spark, dir))
    val full = recallOf(VectorQueries.q242GraphAnnSearch(spark, dir))
    assert(incr >= full - 1e-9,
      f"sf0.01 incremental recall $incr%.3f below full rebuild $full%.3f")
    val incrBig = recallOf(
      VectorQueries.q245GraphAnnAppend(spark, "/root/testdata/sf0.1"))
    assert(incrBig >= 0.85, f"sf0.1 incremental recall $incrBig%.3f < 0.85")
  }

  test("result hygiene: no self-matches, contiguous ranks, corpus members only") {
    val res = VectorQueries.q242GraphAnnSearch(spark, dir)
    val rows = res.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id"))
    }
    val ranks = rows.groupBy(_.getAs[Long]("query_id"))
      .map { case (_, rs) => rs.map(_.getAs[Int]("rank")).sorted.toSeq }
    ranks.foreach(rs => assert(rs == (1 to rs.size), s"ranks $rs"))
    val corpus = graft.tables.Tables.embeddings(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    rows.foreach(r => assert(corpus(r.getAs[Long]("neighbor_id"))))
  }
}
