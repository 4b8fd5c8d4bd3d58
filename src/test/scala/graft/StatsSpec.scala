package graft

import org.apache.spark.sql.functions._

import graft.queries.{StatsQueries, VectorQueries}

/** Semantic invariants for the corpus-statistics / split-hygiene layer —
  * properties the DuckDB hash-compare cannot express (it only pins that
  * both engines agree; these pin that what they agree ON is right). */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q206: the three splits PARTITION the corpus (no doc lost or doubled)") {
    val docs = graft.tables.Tables.documents(spark, dir)
    val total = docs.count()
    val splits = StatsQueries.q206StratifiedSplit(spark, dir)
    assert(splits.agg(sum($"n_docs")).as[Long].head() == total,
      "per-(source,split) doc counts must sum to the corpus")
    val names = splits.select($"split").distinct().as[String].collect().toSet
    assert(names.subsetOf(Set("train", "val", "test")))
    // deterministic: re-deriving the assignment is byte-identical
    val again = StatsQueries.q206StratifiedSplit(spark, dir)
    assert(splits.collect().toSeq == again.collect().toSeq)
  }

  test("q204: the growth curve's final cumulative type count IS the vocabulary") {
    val vocab = graft.tables.Tables.documents(spark, dir)
      .select(explode(split($"text", " ")).as("tok"))
      .agg(countDistinct($"tok")).as[Long].head()
    val last = StatsQueries.q204VocabGrowth(spark, dir)
      .orderBy($"bucket".desc).select($"cum_types").as[Long].head()
    assert(last == vocab, s"cum_types $last != corpus vocabulary $vocab")
  }

  test("q205: KL is non-negative for every source (information inequality)") {
    // quantization floors each term by <1 micro-nat, so allow the sum
    // that tiny slack below zero: |error| <= n_types/1e6 nats of slack
    val rows = StatsQueries.q205SourceKl(spark, dir)
      .select($"kl_nats", $"n_types", $"n_tokens").collect()
    rows.foreach { r =>
      val slack = r.getLong(1).toDouble / r.getLong(2) / 1e6 + 1e-9
      assert(r.getDouble(0) >= -slack,
        s"KL ${r.getDouble(0)} below quantization slack -$slack")
    }
  }

  test("q210: a frozen-vocab token is never OOV; rates are permille-bounded") {
    val rows = StatsQueries.q210VocabDrift(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, oov, pm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(oov <= n && pm >= 0 && pm <= 1000)
      assert(pm == oov * 1000 / n)
    }
  }

  test("q211: the k-center covering radius never increases across picks") {
    // Gonzalez greedy invariant: each pick is the farthest point from
    // the selected set, and adding centers can only shrink (or keep)
    // every point's nearest-center distance — so the radius sequence is
    // non-increasing from step 2 on (step 1 is the seed, radius 0)
    val rows = StatsQueries.q211KcenterCoreset(spark, dir)
      .orderBy($"step".asc).select($"step", $"radius").collect()
    assert(rows.head.getDouble(1) == 0.0, "the seed pick has radius 0")
    val radii = rows.tail.map(_.getDouble(1))
    radii.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-12, s"radius increased: $a -> $b")
    }
    assert(radii.forall(r => r >= 0.0 && r <= 2.0),
      "cosine distance lives in [0, 2]")
  }

  test("q217: coverage is monotone in V and ends at (or below) the full corpus") {
    val rows = StatsQueries.q217VocabCoverage(spark, dir)
      .orderBy($"v".asc).collect()
    val covered = rows.map(_.getAs[Long]("covered"))
    covered.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a, s"coverage must grow with vocabulary size: $a -> $b")
    }
    val total = graft.tables.Tables.documents(spark, dir)
      .select(explode(split($"text", " "))).count()
    assert(covered.last <= total)
    rows.foreach(r => assert(r.getAs[Long]("covered_permille") <= 1000L))
  }

  test("q220: the release is k-anonymous — floored counts, df >= k, audit row present") {
    val k = 16L
    val rows = StatsQueries.q220KanonRelease(spark, dir).collect()
    val (sup, released) = rows.partition(_.getString(0) == "<suppressed>")
    assert(sup.length == 1, "exactly one suppressed-mass audit row")
    released.foreach { r =>
      val (df, c) = (r.getAs[Long]("df_released"), r.getAs[Long]("c_released"))
      assert(df >= k && df % k == 0 && c % k == 0,
        s"released stats must be k-floored multiples: ${r.getString(0)} ($df, $c)")
    }
    // floored counts never exceed the true counts
    val truth = graft.tables.Tables.documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .groupBy($"tok").agg(countDistinct($"doc_id").as("df"),
        count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    released.foreach { r =>
      val (df, c) = truth(r.getString(0))
      assert(r.getAs[Long]("df_released") <= df && r.getAs[Long]("c_released") <= c)
    }
  }

  test("q209: the MMR set is no less diverse than plain top-5 (mean pairwise sim)") {
    // compare mean pairwise cosine of the MMR selection vs the plain
    // exact top-5 per query: greedy MMR with λ=0.7 must not INCREASE
    // redundancy relative to relevance-only selection, corpus-wide
    val emb = graft.tables.Tables.embeddings(spark, dir)
      .select($"vec_id", graft.operators.VectorOps.quantize($"embedding").as("q"))
    def meanPairSim(sel: org.apache.spark.sql.DataFrame): Double = {
      val a = sel.join(emb, sel("sel_id") === emb("vec_id"))
        .select(sel("query_id"), $"sel_id".as("a"), $"q".as("qa2"))
      val b = a.select($"query_id", $"a".as("b"), $"qa2".as("qb2"))
      a.join(b, Seq("query_id")).filter($"a" < $"b")
        .select(graft.operators.VectorOps.cosineFromParts(
          graft.operators.VectorOps.qdot($"qa2", $"qb2"),
          graft.operators.VectorOps.qnorm2($"qa2"),
          graft.operators.VectorOps.qnorm2($"qb2")).as("sim"))
        .agg(avg($"sim")).as[Double].head()
    }
    val mmr = VectorQueries.q209MmrDiverse(spark, dir)
      .select($"query_id", $"sel_id")
    val probes = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"q".as("qq"))
    val top5 = emb.join(broadcast(probes), $"vec_id" =!= $"query_id")
      .withColumn("rel", graft.operators.VectorOps.cosineFromParts(
        graft.operators.VectorOps.qdot($"qq", $"q"),
        graft.operators.VectorOps.qnorm2($"qq"),
        graft.operators.VectorOps.qnorm2($"q")))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
          .orderBy($"rel".desc, $"vec_id".asc)))
      .filter($"rnk" <= 5).select($"query_id", $"vec_id".as("sel_id"))
    val (mmrSim, topSim) = (meanPairSim(mmr), meanPairSim(top5))
    assert(mmrSim <= topSim + 1e-12,
      s"MMR mean pairwise sim $mmrSim > top-5's $topSim — selection is not diversifying")
  }
}
