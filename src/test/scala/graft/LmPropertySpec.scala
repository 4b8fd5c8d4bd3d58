package graft

/** Randomized differential test of the bigram-LM scoring protocol
  * behind q171 and the frozen quality gate: seeded random corpora are
  * replayed against a driver-side reference model of the exact
  * micro-nat semantics — stupid backoff (c12/c1, else 0.4·Laplace),
  * Laplace (c+1)/(N+V) with the full-corpus vocabulary, every term
  * floor(ln·1e6) — and the Spark plan must agree per doc EXACTLY
  * (integer score), independent of the input's physical partitioning.
  * Tiny vocab + short docs maximize OOV/backoff/first-token edge
  * traffic per seed.
  *
  * A deterministic generator loop stands in for ScalaCheck, as in
  * [[MergePropertySpec]] — same coverage, reproducible seeds.
  */
class LmPropertySpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rnd: scala.util.Random): Seq[(Long, String, String)] = {
    val langs = Seq("en", "de", "fr")
    (0 until 12).map { id =>
      val toks = Seq.fill(1 + rnd.nextInt(12))(s"w${rnd.nextInt(6)}")
      (id.toLong, toks.mkString(" "), langs(rnd.nextInt(3)))
    }
  }

  /** Driver-side reference: per-doc (n_tokens, score_micro). */
  private def model(docs: Seq[(Long, String, String)]): Map[Long, (Long, Long)] = {
    val toks = docs.map { case (id, t, l) => (id, t.split(" ", -1).toSeq, l) }
    val train = toks.filter(_._3 == "en").map(_._2)
    val uni = train.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val big = train.flatMap(ts => ts.zip(ts.drop(1))).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val n = train.map(_.size.toLong).sum
    val v = toks.flatMap(_._2).distinct.size.toLong
    def lap(w: String): Double =
      (uni.getOrElse(w, 0L) + 1L).toDouble / (n + v).toDouble
    def term(p: Double): Long = math.floor(math.log(p) * 1000000.0).toLong
    toks.map { case (id, ts, _) =>
      val pairs = ts.zip(ts.drop(1)).map { case (a, b) =>
        big.get((a, b)) match {
          case Some(c12) => term(c12.toDouble / uni(a).toDouble)
          case None => term(0.4 * lap(b))
        }
      }.sum
      id -> ((ts.size.toLong, term(lap(ts.head)) + pairs))
    }.toMap
  }

  test("bigram-LM scores match the reference model across seeds and partitionings") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 7919L)
      val docs = corpus(rnd)
      val dir = tmpDir(s"lm-prop-$seed")
      docs.map { case (id, t, l) => (id, t, l, "s0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .repartition(1 + seed % 4)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = graft.queries.TextQueries.q171LmPerplexity(spark, dir)
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
      val want = model(docs)
      assert(got == want, s"seed $seed: spark $got vs model $want")
    }
  }

  test("frozen-gate scoring matches the same reference model") {
    // QualityGateStream.score is a REIMPLEMENTATION of the micro-nat
    // protocol over collected frozen counts — when the gate scores its
    // own training corpus, it must agree with the driver model (and
    // therefore with q171) per doc, exactly. Scoring through the frozen
    // maps exercises the OOV/backoff paths the broadcast-join path
    // shares only structurally.
    import graft.streaming.QualityGateStream
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 7919L)
      val docs = corpus(rnd)
      val df = docs.toDF("doc_id", "text", "lang")
      val gate = QualityGateStream.freeze(spark, df)
      val got = QualityGateStream.score(spark, gate, df)
        .collect().map { r =>
          val micro = math.round(
            r.getDouble(3) * r.getLong(2) * 1000000.0)
          r.getLong(0) -> ((r.getLong(2), micro))
        }.toMap
      // score() exposes avg_logprob; reconstruct score_micro from it —
      // exact because avg = micro/(n·1e6) was two correctly-rounded
      // divides of an integer ≪ 2^53, so the round-trip is lossless
      val want = model(docs)
      assert(got == want, s"seed $seed: gate $got vs model $want")
    }
  }
}
