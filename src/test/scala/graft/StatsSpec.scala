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

  test("q219: quarantine comes only out of train; holdout strata stay frozen") {
    def strata(df: org.apache.spark.sql.DataFrame) = df
      .select($"source", $"split", $"n_docs", $"n_tokens").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))).toMap
    val before = strata(StatsQueries.q206StratifiedSplit(spark, dir))
    val after = strata(StatsQueries.q219SplitRepair(spark, dir))
    assert(after.keys.map(_._2).toSet
      .subsetOf(Set("train", "val", "test", "quarantine")))
    // eval sets frozen: every holdout stratum unchanged doc- and token-exact
    before.keys.filter(k => k._2 == "val" || k._2 == "test").foreach { k =>
      assert(after.get(k).contains(before(k)),
        s"holdout stratum $k changed: ${before(k)} -> ${after.get(k)}")
    }
    // quarantine ⊆ former train: per source, train' + quarantine == train
    before.keys.map(_._1).toSet.foreach { (src: String) =>
      val t0 = before.getOrElse((src, "train"), (0L, 0L))
      val t1 = after.getOrElse((src, "train"), (0L, 0L))
      val q1 = after.getOrElse((src, "quarantine"), (0L, 0L))
      assert(t1._1 + q1._1 == t0._1 && t1._2 + q1._2 == t0._2,
        s"$src: train must split exactly into train' + quarantine " +
          s"($t0 -> $t1 + $q1)")
    }
  }

  test("q222: activity report is frame-consistent (permille bounds, peak floor)") {
    val thr = 140000L // mirrors the query's energy threshold
    val rows = graft.queries.MultimodalQueries
      .q222AudioActivity(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nf = r.getAs[Long]("n_frames")
      val na = r.getAs[Long]("n_active")
      val pm = r.getAs[Long]("active_permille")
      val peak = r.getAs[Long]("peak_energy")
      assert(nf >= 1 && na >= 0 && na <= nf)
      assert(pm == na * 1000 / nf && pm >= 0 && pm <= 1000)
      // an active frame exists iff the peak clears the threshold
      if (na >= 1) assert(peak >= thr) else assert(peak < thr)
      // 16 unsigned bytes bound the per-frame energy
      assert(peak >= 0 && peak <= 16L * 255 * 255)
    }
  }

  test("q223: DP lives in [0,1] and the head is the true top-20 by frequency") {
    val rows = StatsQueries.q223TokenDispersion(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val dp = r.getAs[Double]("dp")
      assert(r.getAs[Long]("sum_dev_nano") >= 0L)
      // DP = ½·Σ|v_p − s_p| ≤ ½(Σv + Σs) = 1; nano flooring only shrinks
      assert(dp >= 0.0 && dp <= 1.0, s"DP $dp outside [0,1]")
    }
    val trueHead = graft.tables.Tables.documents(spark, dir)
      .select(explode(split($"text", " ")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"tok".asc).limit(20)
      .select($"tok").as[String].collect().toSet
    assert(rows.map(_.getString(0)).toSet == trueHead,
      "dispersion must be reported for exactly the top-20 frequency head")
  }

  test("q225: every train doc gets exactly one verdict; flags are consistent") {
    val docs = graft.tables.Tables.documents(spark, dir)
    val trainIds = docs
      .filter(StatsQueries.splitOf($"doc_id") === "train")
      .select($"doc_id").as[Long].collect().sorted
    val rows = StatsQueries.q225LeakageGateIngest(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).sorted.sameElements(trainIds),
      "verdicts must cover the train split exactly — holdout is never gated")
    rows.foreach { r =>
      val (nLeaks, admit) = (r.getAs[Long]("n_leaks"), r.getAs[Int]("admit"))
      assert(admit == (if (nLeaks == 0) 1 else 0),
        "admit must be exactly the no-leak indicator")
      assert(r.getAs[Int]("batch_id") == (r.getAs[Long]("doc_id") % 2).toInt)
      assert(r.getAs[Long]("n_sh") >= 0 && nLeaks >= 0)
    }
  }

  test("q226: agreement rows are canonical image-slice pairs with a real flag") {
    val rows = graft.queries.MultimodalQueries
      .q226CrossmodalAgreement(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val (t, m, g) = (r.getAs[Int]("text_dup"), r.getAs[Int]("media_dup"),
        r.getAs[Int]("agree"))
      assert(a < b, "pairs are canonical (doc_a < doc_b), each counted once")
      assert(a % 3 == 0 && b % 3 == 0, "both endpoints are image-kind docs")
      assert(t == 1 || m == 1, "a row exists only if SOME channel flagged it")
      assert(g == t * m, "agree is exactly the AND of the two channels")
    }
    // no pair may appear twice
    val keys = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length)
  }

  test("q224: the histogram decile map is monotone in score") {
    // the bucket→decile map must assign better scores to lower deciles:
    // derive per-doc (bucket, decile) from the pre-materialize frames
    // and check decile is non-increasing as the score bucket rises,
    // starting at decile 1 for the best bucket
    val (out, base) = StatsQueries.q224Frames(spark, dir)
    out.collect() // materialize so base is populated
    val perBucket = base.select($"bucket").distinct().as[Long].collect().sorted.reverse
    // rebuild the map exactly as the query does: deciles from cum_before
    val hist = base.groupBy($"bucket").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    base.unpersist()
    val total = hist.values.sum
    var cumBefore = 0L
    var lastDecile = 0L
    perBucket.foreach { b =>
      val decile = 1 + cumBefore * 10 / total
      assert(decile >= lastDecile, s"decile regressed at bucket $b")
      assert(decile >= 1 && decile <= 10)
      if (cumBefore == 0) assert(decile == 1, "the best bucket is decile 1")
      lastDecile = decile
      cumBefore += hist(b)
    }
    assert(cumBefore == total)
  }

  test("q224: deciles partition the scored set; keep rates permille-exact") {
    val rows = StatsQueries.q224ScreenCalibration(spark, dir)
      .orderBy($"decile".asc).collect()
    val total = graft.tables.Tables.documents(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total,
      "decile doc counts must sum to the scored corpus — the histogram " +
        "bucket→decile map partitions it")
    val deciles = rows.map(_.getAs[Int]("decile"))
    assert(deciles.distinct.length == deciles.length)
    assert(deciles.forall(d => d >= 1 && d <= 10))
    rows.foreach { r =>
      val (n, k, pm) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_keep"),
        r.getAs[Long]("keep_permille"))
      assert(k >= 0 && k <= n)
      assert(pm == k * 1000 / n)
    }
  }

  test("q239: the KS rational is bounded, every batch reports, the flag is derived") {
    val rows = graft.queries.StatsQueries.q239DistDrift(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("batch_id")).toSet == (1L to 9L).toSet,
      "every arriving batch gets a verdict")
    rows.foreach { r =>
      val (nb, nr, ks, drifted) = (r.getAs[Long]("n_batch"),
        r.getAs[Long]("n_ref"), r.getAs[Long]("ks_num"),
        r.getAs[Int]("drifted"))
      assert(nb > 0 && nr > 0)
      // KS = max |cum_b·n_r − cum_r·n_b| ≤ n_b·n_r (ECDFs live in [0,1])
      assert(ks >= 0 && ks <= nb * nr, s"ks_num $ks out of [0, ${nb * nr}]")
      assert((drifted == 1) == (ks * 4 >= nb * nr),
        "the flag must be exactly the τ = 1/4 integer comparison")
    }
  }

  test("q240: envelopes are ordered, replicate accounting is bounded") {
    val rows = graft.queries.StatsQueries.q240BootstrapCi(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi, mean) = (r.getAs[Double]("ci_lo"),
        r.getAs[Double]("ci_hi"), r.getAs[Double]("mean_len"))
      val nv = r.getAs[Long]("n_valid_reps")
      assert(lo <= hi, s"envelope inverted: $lo > $hi")
      assert(nv >= 1 && nv <= 32, s"n_valid_reps $nv out of [1, 32]")
      // a weighted mean of positive lengths stays within the value range
      // the point estimate lives in — sanity, not a coverage theorem
      assert(lo > 0 && hi < mean * 32 + 1)
    }
  }

  test("q241: histogram-walk statistics are ordered and the salt is sane") {
    val rows = graft.queries.ExtendedQueries.q241SkewProfile(spark, dir)
      .collect()
    assert(rows.length == 3, "three profiled key columns")
    rows.foreach { r =>
      val (p50, p999, mx) = (r.getAs[Long]("p50_count"),
        r.getAs[Long]("p999_count"), r.getAs[Long]("max_count"))
      assert(p50 <= p999 && p999 <= mx,
        s"percentile walk must be monotone: $p50 / $p999 / $mx")
      assert(r.getAs[Long]("salt_factor") >= 1L,
        "even a uniform key needs one partition")
      // max_count ≥ mean multiplicity always ⟹ skew_bp ≥ 10000 exactly
      assert(r.getAs[Long]("skew_bp") >= 10000L)
      assert(r.getAs[Long]("n_rows") >= r.getAs[Long]("n_keys"))
    }
  }
}
