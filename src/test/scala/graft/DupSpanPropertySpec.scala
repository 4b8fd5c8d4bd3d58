package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Randomized differential test of the ExactSubstr span machinery
  * (duplicatedSpans / duplicatedSpanStats / scrubDuplicatedSpans):
  * seeded corpora of random tokens salted with shared boilerplate
  * segments are replayed against a driver-side reference model of the
  * exact semantics — duplicated = n-gram in ≥ minDocs DISTINCT docs,
  * spans = overlap-merged gram islands (merge iff start ≤ running max
  * end; adjacency does NOT merge), scrub = positions outside all spans
  * in original order. The Spark plans must agree with the model row for
  * row, the three operators must agree with EACH OTHER (stats sums =
  * span lengths; kept + dup = total for flagged docs; unflagged docs
  * survive the scrub verbatim), and the answers must be invariant to the
  * input's physical partitioning.
  *
  * A deterministic generator loop stands in for ScalaCheck, as in
  * [[MergePropertySpec]] — same coverage, reproducible seeds.
  */
class DupSpanPropertySpec extends SparkSpec {
  import spark.implicits._

  private val n = 5

  /** Corpus: ~24 docs of 15–45 random tokens over a 40-word vocab, with
    * 35% of docs splicing in 1–2 segments from a shared 4-segment pool
    * (each 6–11 tokens) — realistic planted cross-doc duplication on top
    * of whatever the small vocab collides by chance. */
  private def corpus(rnd: scala.util.Random): Seq[(Long, String)] = {
    val pool = Seq.fill(4)(Seq.fill(6 + rnd.nextInt(6))(s"b${rnd.nextInt(40)}"))
    (0 until 24).map { id =>
      val base = Seq.fill(15 + rnd.nextInt(31))(s"w${rnd.nextInt(40)}")
      val toks =
        if (rnd.nextInt(100) >= 35) base
        else (0 until 1 + rnd.nextInt(2)).foldLeft(base) { (acc, _) =>
          val at = rnd.nextInt(acc.size + 1)
          acc.take(at) ++ pool(rnd.nextInt(pool.size)) ++ acc.drop(at)
        }
      (id.toLong, toks.mkString(" "))
    }
  }

  /** Driver-side reference: maximal duplicated spans per doc. With
    * `keepOne`, each duplicated gram's lexicographic-min (doc_id, start)
    * occurrence is exempt (the canonical copy survives). */
  private def modelSpans(docs: Seq[(Long, String)],
      keepOne: Boolean = false): Map[Long, Seq[(Int, Int)]] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val grams = toks.toSeq.flatMap { case (id, ts) =>
      if (ts.size < n) Nil
      else (0 to ts.size - n).map(i => (id, i, ts.slice(i, i + n).mkString(" ")))
    }
    val byGram = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2)
    val canon = byGram.view.mapValues(_.map(h => (h._1, h._2)).min).toMap
    grams.filter { g =>
      byGram.contains(g._3) && (!keepOne || canon(g._3) != ((g._1, g._2)))
    }
      .groupBy(_._1).view.mapValues { hs =>
        hs.map(h => (h._2, h._2 + n - 1)).sortBy(_._1)
          .foldLeft(List.empty[(Int, Int)]) {
            case ((ps, pe) :: rest, (s, e)) if s <= pe => (ps, math.max(pe, e)) :: rest
            case (acc, span) => span :: acc
          }.reverse
      }.toMap
  }

  test("property: spans/stats/scrub == model, partition-invariant (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(400L + seed)
      val docs = corpus(rnd)
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
      val expect = modelSpans(docs)
      assert(expect.nonEmpty, s"seed $seed generated no duplication — widen the pool")

      for (parts <- Seq(1, 7)) {
        val df = docs.toDF("doc_id", "text").repartition(parts)

        val gotSpans = TextOps.duplicatedSpans(df, n)
          .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2))))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
        assert(gotSpans == expect, s"seed $seed parts $parts spans mismatch")

        val stats = TextOps.duplicatedSpanStats(df, n)
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
          .toMap
        assert(stats.keySet == expect.keySet)
        expect.foreach { case (id, spans) =>
          val (nSpans, dupToks, total) = stats(id)
          assert(nSpans == spans.size && total == toks(id).size &&
            dupToks == spans.map { case (s, e) => e - s + 1 }.sum,
            s"seed $seed doc $id stats disagree with model spans")
        }

        val scrubVariants = Seq(
          (TextOps.scrubDuplicatedSpans(df, n), expect, "remove-all"),
          (TextOps.scrubKeepOne(df, n), modelSpans(docs, keepOne = true), "keep-one"))
        for ((scrubDf, spansModel, label) <- scrubVariants) {
          val scrub = scrubDf.collect()
            .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
          docs.foreach { case (id, text) =>
            val covered = spansModel.getOrElse(id, Nil)
              .flatMap { case (s, e) => s to e }.toSet
            val keptToks = toks(id).zipWithIndex.collect {
              case (t, i) if !covered(i) => t
            }
            if (keptToks.isEmpty)
              assert(!scrub.contains(id), s"seed $seed doc $id fully-dup must vanish ($label)")
            else {
              assert(scrub(id) == ((keptToks.size.toLong, keptToks.mkString(" "))),
                s"seed $seed doc $id scrub mismatch ($label)")
              if (covered.nonEmpty) // flagged: kept + dup == total
                assert(keptToks.size + covered.size == toks(id).size)
              else // unflagged: survives verbatim
                assert(scrub(id)._2 == text)
            }
          }
        }
        // keep-one must never remove MORE than remove-all anywhere
        val keepModel = modelSpans(docs, keepOne = true)
        keepModel.foreach { case (id, spans) =>
          val all = expect.getOrElse(id, Nil).flatMap { case (s, e) => s to e }.toSet
          val kept1 = spans.flatMap { case (s, e) => s to e }.toSet
          assert(kept1.subsetOf(all), s"seed $seed doc $id keep-one exceeded remove-all")
        }

        // incremental screen vs model: corpus = even doc_ids, batch = odd;
        // flagged = gram in corpus OR in ≥2 distinct batch docs
        val (corpusDocs, batchDocs) = docs.partition(_._1 % 2 == 0)
        val corpusGrams = corpusDocs.flatMap { case (_, t) =>
          val ts = t.split(" ", -1).toSeq
          if (ts.size < n) Nil
          else (0 to ts.size - n).map(i => ts.slice(i, i + n).mkString(" "))
        }.toSet
        val batchGrams = batchDocs.flatMap { case (id, t) =>
          val ts = t.split(" ", -1).toSeq
          if (ts.size < n) Nil
          else (0 to ts.size - n).map(i => (id, i, ts.slice(i, i + n).mkString(" ")))
        }
        val batchDup = batchGrams.groupBy(_._3)
          .collect { case (g, occ) if occ.map(_._1).distinct.size >= 2 => g }.toSet
        val incSpans = batchGrams
          .filter(g => corpusGrams(g._3) || batchDup(g._3))
          .groupBy(_._1).view.mapValues { hs =>
            hs.map(h => (h._2, h._2 + n - 1)).sortBy(_._1)
              .foldLeft(List.empty[(Int, Int)]) {
                case ((ps, pe) :: rest, (s, e)) if s <= pe => (ps, math.max(pe, e)) :: rest
                case (acc, span) => span :: acc
              }.reverse
          }.toMap
        val incGot = TextOps.incrementalDuplicatedSpanStats(
            corpusDocs.toDF("doc_id", "text").repartition(parts),
            batchDocs.toDF("doc_id", "text").repartition(parts), n)
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        assert(incGot.keySet == batchDocs.map(_._1).toSet,
          s"seed $seed parts $parts: one screen row per batch doc")
        batchDocs.foreach { case (id, _) =>
          val spans = incSpans.getOrElse(id, Nil)
          assert(incGot(id) == ((spans.size.toLong,
            spans.map { case (s, e) => e - s + 1 }.sum.toLong)),
            s"seed $seed parts $parts doc $id incremental stats mismatch")
        }
      }
    }
  }
}
