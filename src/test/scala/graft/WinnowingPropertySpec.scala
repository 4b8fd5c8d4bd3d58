package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Randomized differential test of winnowing selection
  * ([[TextOps.winnowingSelect]]): seeded corpora are replayed against a
  * driver-side reference model of the exact Schleimer-et-al. semantics —
  * md5-hex fingerprints of token n-grams, every w-window's minimum
  * (fp, pos) selected, the sketch = the distinct selected set — and the
  * Spark result must agree with the model ROW FOR ROW (not just satisfy
  * the guarantee, which OperatorSpec pins separately), under BOTH the
  * default partitioning and a hostile repartition(3). Docs shorter than
  * w grams (single truncated window) and exact-duplicate docs (identical
  * sketches) are planted in every corpus.
  *
  * A deterministic generator loop stands in for ScalaCheck, as in
  * [[DupSpanPropertySpec]] — same coverage, reproducible seeds.
  */
class WinnowingPropertySpec extends SparkSpec {
  import spark.implicits._

  private val n = 3
  private val w = 4

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Driver-side reference: the paper's selection over one doc. */
  private def modelSelect(text: String): Set[(String, Long)] = {
    val toks = text.split(" ")
    if (toks.length < n) return Set.empty
    val grams = (0 to toks.length - n)
      .map(i => (md5hex(toks.slice(i, i + n).mkString(" ")), i.toLong))
    val starts = 0 to math.max(grams.length - w, 0)
    starts.map { s =>
      grams.slice(s, s + w).min // (fp, pos) lexicographic = earliest min fp
    }.toSet
  }

  private def corpus(rnd: scala.util.Random): Seq[(Long, String)] = {
    val base = (0 until 20).map { id =>
      (id.toLong,
        Seq.fill(3 + rnd.nextInt(60))(s"w${rnd.nextInt(500)}").mkString(" "))
    }
    // planted edge cases: a doc with exactly n tokens (one gram, one
    // truncated window), an exact duplicate pair, a doc of one repeated
    // token (all grams identical — min re-selected, sketch collapses)
    base ++ Seq(
      (100L, Seq.fill(n)("edge").mkString(" ")),
      (101L, base(3)._2),
      (102L, Seq.fill(30)("rep").mkString(" ")))
  }

  test("winnowing selection ≡ reference model, partition-invariant (5 seeds)") {
    (1 to 5).foreach { seed =>
      val docs = corpus(new scala.util.Random(seed))
      val model: Map[Long, Set[(String, Long)]] =
        docs.map { case (id, t) => id -> modelSelect(t) }
          .filter(_._2.nonEmpty).toMap
      Seq(docs.toDF("doc_id", "text"),
        docs.toDF("doc_id", "text").repartition(3)).foreach { df =>
        val got = TextOps.winnowingSelect(df, n, w)
          .select($"doc_id", $"fp", $"pos").collect()
          .groupBy(_.getLong(0))
          .map { case (d, rs) =>
            d -> rs.map(r => (r.getString(1), r.getLong(2))).toSet
          }
        assert(got == model, s"seed $seed: selection diverged from model")
      }
      // the duplicate pair must produce identical fp sketches (positions
      // equal too, since the docs are verbatim copies)
      assert(model(101L) == model(3L), s"seed $seed: dup sketches differ")
    }
  }
}
