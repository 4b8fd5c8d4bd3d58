package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (Sennrich et al. 2016), staged
  * for corpus scale.
  *
  * The scale decomposition mirrors every production BPE trainer: the
  * corpus-sized work happens ONCE, in `wordFreq` (tokenize + one hash
  * shuffle down to a word-frequency table — at 100 TB of text the distinct
  * word count is millions, not billions, so the result is many orders of
  * magnitude smaller than the corpus). The merge loop then iterates over
  * the word-frequency table only: each round is one flatMap (adjacent
  * symbol pairs weighted by word frequency), one partial-aggregated
  * shuffle on the pair key, and one `limit(1)` argmax pulled to the
  * driver (O(1) rows). The per-word symbol rewrite is a pure typed map —
  * per-element compute over the already-small table, not the corpus.
  *
  * Everything is deterministic: the argmax tiebreak is (count desc, left
  * asc, right asc), so training is reproducible across partitionings and
  * reruns — the property q130's split assignment and q77's sampling also
  * guarantee, and for the same reason: pipelines must replay identically.
  *
  * q135 exercises the pair-counting kernel against a DuckDB oracle; the
  * iterative loop itself is pinned by BpeSpec against the classic
  * low/lower/newest/widest hand-traced example.
  */
object BpeOps {

  /** End-of-word marker keeping merges from crossing word boundaries. */
  val EndOfWord = "</w>"

  /** Canonical symbol form: the engine's string encoding round-trip.
    * Identity on all well-formed text — the symbol split below is by
    * CODE POINT, so supplementary characters (emoji, CJK ext-B) stay
    * intact as single symbols and are untouched here. Only genuinely
    * ill-formed UTF-16 in the input (a lone surrogate in the source
    * text itself) degrades to '?' — IMMEDIATELY, at the split, on both
    * training tiers and in encode. Without that the distributed loop is
    * self-inconsistent on such symbols: the argmax collects ENCODED
    * strings while the lazy rewrite closures compare PRE-encode raw
    * symbols, so a recorded merge silently never applies until a
    * checkpoint materializes the encoding (observed: five no-op
    * (?,?) merges in a row). Canonical-at-split makes every layer see
    * one symbol alphabet. */
  def canonSym(s: String): String =
    org.apache.spark.unsafe.types.UTF8String.fromString(s).toString

  /** Split a word into code-point symbols (+ the end marker). Splitting
    * by code point — not by UTF-16 char — keeps astral characters whole:
    * two distinct emoji are distinct symbols, never the shared '??' a
    * per-char split would collapse them to, so training can't conflate
    * unrelated text and encode() is lossless on well-formed input. */
  private def splitSyms(w: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += canonSym(new String(Character.toChars(cp)))
      i += Character.charCount(cp)
    }
    out += EndOfWord
    out.result()
  }

  final case class BpeModel(merges: Seq[(String, String)]) {
    /** Apply the learned merges, in order, to one word (same canonical
      * symbol split as training — see [[BpeOps.canonSym]]). */
    def encodeWord(word: String): Seq[String] = {
      var syms: Seq[String] = BpeOps.splitSyms(word)
      merges.foreach { case (a, b) => syms = BpeOps.mergePair(syms, a, b) }
      syms
    }
  }

  /** Corpus → word-frequency table (the one corpus-sized pass). */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Single left-to-right merge pass of (a, b) → a+b over a symbol seq. */
  def mergePair(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    val n = syms.length
    while (i < n) {
      if (i < n - 1 && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn `nMerges` merges from a (word, freq) table.
    *
    * Two-tier execution, chosen by the table's measured size (the
    * trainPqCodebooks pattern — VectorOps bounds its sample the same
    * way): after the one corpus-sized aggregation the word-frequency
    * table is VOCABULARY-sized (millions of rows at 100 TB of text,
    * each a short string + a long), so when it fits the driver bound
    * (`localizeBelow` rows) the whole merge loop runs DRIVER-LOCAL with
    * incremental pair-count maintenance — zero Spark jobs per round; a
    * 50k-merge production schedule is one collect, not 50k sequential
    * jobs. Above the bound the distributed loop below keeps correctness
    * at any vocabulary size. Both tiers produce the byte-identical merge
    * sequence (BpeSpec pins local ≡ distributed on random corpora): the
    * argmax tiebreak compares strings by UTF-8 byte order — what Spark's
    * `orderBy` does — not JVM UTF-16 order, so exotic code points cannot
    * reorder the tie.
    *
    * Distributed tier: driver-sequenced job count is the scale limiter,
    * not data size — each round costs exactly ONE job (the pair-count
    * argmax) and the per-round symbol rewrite stays a LAZY map stacked
    * on the plan. Every `ckptEvery` rounds one extra checkpoint job
    * truncates the accumulated lineage, so amortized jobs/round =
    * 1 + 1/ckptEvery. The merge sequence is byte-identical either way:
    * argmax ordering never depends on checkpoint placement. */
  def train(spark: SparkSession, wordFreq: DataFrame, nMerges: Int,
      ckptEvery: Int = 4, localizeBelow: Long = 4L * 1000 * 1000): BpeModel = {
    if (localizeBelow > 0 && wordFreq.count() <= localizeBelow) {
      import spark.implicits._
      val vocab = wordFreq
        .select(col("word").cast("string"), col("freq").cast("long"))
        .as[(String, Long)].collect()
      trainLocal(vocab, nMerges)
    } else trainDistributed(spark, wordFreq, nMerges, ckptEvery)
  }

  /** Spark's own string order — UTF8String's unsigned byte comparison,
    * NOT String.compareTo (UTF-16 code-unit order sorts supplementary
    * characters below U+E000..U+FFFF, and lone surrogates — which BPE's
    * per-char symbol split produces from any supplementary character —
    * encode engine-specifically). Delegating to the engine's comparator
    * makes the local argmax tiebreak equal to `orderBy` by
    * construction, encoding corners included. */
  private[graft] def utf8Compare(x: String, y: String): Int =
    org.apache.spark.unsafe.types.UTF8String.fromString(x)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y))

  /** Driver-local merge loop with incremental pair-count maintenance:
    * per round, only the words CONTAINING the merged pair are rewritten
    * and only their pair deltas touch the count map (the classic
    * subword-nmt bookkeeping). Argmax semantics identical to the
    * distributed round: max count, ties to the UTF-8-least (left,
    * right). */
  private[graft] def trainLocal(vocab: Array[(String, Long)],
      nMerges: Int): BpeModel = {
    import scala.collection.mutable
    // the shared canonical split ([[canonSym]]) keeps the symbol
    // alphabet identical to the distributed tier's
    val words: Array[mutable.ArrayBuffer[String]] =
      vocab.map(w => mutable.ArrayBuffer(splitSyms(w._1): _*))
    val freqs: Array[Long] = vocab.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    // occurrence sets are sparse HashSets, NOT BitSets: a BitSet is dense
    // up to the pair's max word index, so at a 4M-row vocabulary a pair
    // occurring only in a late word would cost ~500KB — across millions
    // of distinct pairs that blows up the driver at exactly the scale
    // this tier advertises. HashSet cost is O(#occurrences) instead.
    val occurs = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def pairsOf(s: mutable.ArrayBuffer[String]): Iterator[(String, String)] =
      if (s.length < 2) Iterator.empty
      else (0 until s.length - 1).iterator.map(i => (s(i), s(i + 1)))
    words.indices.foreach { wi =>
      val f = freqs(wi)
      pairsOf(words(wi)).foreach { p =>
        counts(p) = counts.getOrElse(p, 0L) + f
        occurs.getOrElseUpdate(p, mutable.HashSet.empty[Int]) += wi
      }
    }
    def pairLt(a: (String, String), b: (String, String)): Boolean = {
      val c = utf8Compare(a._1, b._1)
      if (c != 0) c < 0 else utf8Compare(a._2, b._2) < 0
    }
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      if (counts.isEmpty) done = true
      else {
        // argmax (count desc, left asc, right asc) — one map scan
        var best: ((String, String), Long) = null
        counts.foreach { kv =>
          if (best == null || kv._2 > best._2 ||
              (kv._2 == best._2 && pairLt(kv._1, best._1))) best = kv
        }
        val pair = best._1
        merges += pair
        // rewrite ONLY the words holding the pair; maintain deltas
        // (sorted snapshot: HashSet iteration order is arbitrary; the
        // deltas are commutative Long arithmetic so the result doesn't
        // depend on order, but a fixed order keeps traces reproducible)
        occurs.get(pair).map(_.toArray.sorted.toSeq).getOrElse(Seq.empty).foreach { wi =>
          val w = words(wi); val f = freqs(wi)
          pairsOf(w).foreach { p =>
            val nv = counts(p) - f
            if (nv == 0L) counts.remove(p) else counts(p) = nv
            occurs.get(p).foreach { s =>
              s -= wi; if (s.isEmpty) occurs.remove(p)
            }
          }
          val merged = mergePair(w.toSeq, pair._1, pair._2)
          w.clear(); w ++= merged
          pairsOf(w).foreach { p =>
            counts(p) = counts.getOrElse(p, 0L) + f
            occurs.getOrElseUpdate(p, mutable.HashSet.empty[Int]) += wi
          }
        }
      }
      round += 1
    }
    BpeModel(merges.result())
  }

  /** The distributed merge loop (any vocabulary size; one Spark job per
    * round — see [[train]]'s scaladoc for the job accounting). */
  private[graft] def trainDistributed(spark: SparkSession,
      wordFreq: DataFrame, nMerges: Int, ckptEvery: Int = 4): BpeModel = {
    import spark.implicits._
    var ds: Dataset[(Seq[String], Long)] = wordFreq
      .select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)]
      .map { case (w, f) => (BpeOps.splitSyms(w), f) }
    val merges = Seq.newBuilder[(String, String)]
    var lastCkpt: Dataset[(Seq[String], Long)] = null
    var sinceCkpt = 0
    var done = false
    var round = 0
    while (round < nMerges && !done) {
      val best = ds.flatMap { case (s, f) =>
        if (s.length < 2) Iterator.empty
        else s.iterator.zip(s.iterator.drop(1)).map { case (a, b) => (a, b, f) }
      }.toDF("a", "b", "f")
        .groupBy(col("a"), col("b")).agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (ma, mb) = (best(0).getString(0), best(0).getString(1))
        merges += ((ma, mb))
        ds = ds.map { case (s, f) => (mergePair(s, ma, mb), f) }
        sinceCkpt += 1
        if (sinceCkpt >= ckptEvery) {
          // eager localCheckpoint: one job, after which the previous
          // checkpoint's blocks can be dropped — the loop pins one copy of
          // the (small) word table, never the whole merge history
          val ck = ds.localCheckpoint(true)
          if (lastCkpt != null) lastCkpt.unpersist()
          lastCkpt = ck
          ds = ck
          sinceCkpt = 0
        }
      }
      round += 1
    }
    if (lastCkpt != null) lastCkpt.unpersist()
    BpeModel(merges.result())
  }

  /** The learned merge table as a DataFrame (rank-ordered). */
  def mergeTable(spark: SparkSession, model: BpeModel): DataFrame = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), i) => (i + 1, a, b) }
      .toDF("rank", "left", "right")
  }

  /** Tokenize a corpus column with a trained model (typed map over rows;
    * the merge list rides along as a broadcast-sized closure constant). */
  def encode(docs: DataFrame, textCol: String, model: BpeModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val merges = model.merges
    docs.select(col("doc_id").cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.split(" ").iterator.filter(_.nonEmpty).flatMap { w =>
          var syms: Seq[String] = splitSyms(w)
          merges.foreach { case (a, b) => syms = mergePair(syms, a, b) }
          syms
        }.toSeq
        (id, toks)
      }.toDF("doc_id", "bpe_tokens")
  }
}
