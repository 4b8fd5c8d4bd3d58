package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.tables.Tables

/** Corpus-planning and LM-scoring depth: interpolated Kneser-Ney bigram
  * scoring (the standard n-gram smoothing, next to q171's CCNet stupid-
  * backoff), and UniMax waterfilling epoch allocation (Chung et al. 2023:
  * cap every language at E epochs, waterfill the remaining budget into
  * the languages that can absorb it).
  *
  * Both follow the repo's exactness protocols: q201 reuses q171's
  * micro-nat quantization (each distinct term's log-prob floors ONCE to
  * an integer; per-doc sums are exact BIGINTs in any order), q203 is
  * pure integer arithmetic end to end.
  */
object PlanningQueries {

  // q201 — interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995;
  // the Chen & Goodman 1998 interpolated form with fixed discount
  // D = 0.75): trains on the `en` slice like q171, but smooths with
  // CONTINUATION counts instead of raw frequency — p(w2|w1) =
  // max(c12−D,0)/c1• + D·N1+(w1,•)/c1• · Pcont(w2), where Pcont(w2) =
  // (N1+(•,w2)+1)/(btypes+V) is the Laplace-floored type-frequency of
  // w2 as a novel continuation (the "Francisco problem" fix: frequent-
  // but-predictable words score low as continuations). Unseen contexts
  // and document-initial tokens back off to Pcont alone — the whole
  // model is continuation-smoothed, no raw-unigram leg at all.
  // INTEGER-exact cross-engine by q171's protocol: every count is an
  // exact integer; each distinct (w1,w2) term's probability is one
  // fixed-shape double expression over those integers (bit-identical in
  // both engines), quantized ONCE to micro-nats (floor(ln·1e6)); per-doc
  // sums are exact BIGINTs; the per-lang tertile ordering breaks ties by
  // doc_id.
  // Scale shape: identical to q171 — KN's extra tables (context totals,
  // continuation counts) are two more partial aggs over the ≤ vocab²
  // bigram-type table, not over the corpus; doc scoring stays explode +
  // broadcast term join + one per-doc partial agg, and the corpus never
  // shuffles whole rows. At 100 TB the per-lang tertile cutoffs would
  // come from a broadcast score histogram, same swap q171 documents.
  def q201KneserNey(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("t"))
    val train = toks.filter(col("lang") === "en")
    def pairsOf(df: DataFrame): DataFrame = df
      .withColumn("a", slice(col("t"), lit(1), size(col("t")) - 1))
      .withColumn("b", slice(col("t"), lit(2), size(col("t")) - 1))
      .select(col("doc_id"), explode(arrays_zip(col("a"), col("b"))).as("p"))
      .select(col("doc_id"), col("p.a").as("w1"), col("p.b").as("w2"))
    val big = pairsOf(train).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    // context table: c1s = Σ_w2 c(w1,w2) (bigram-token total for the
    // context), n1f = N1+(w1,•) (distinct continuations of w1)
    val ctx = big.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1s"), count(lit(1)).as("n1f"))
    // continuation table: n1c = N1+(•,w2) (distinct contexts w2 follows)
    val cont = big.groupBy(col("w2")).agg(count(lit(1)).as("n1c"))
    // bt = total bigram types = N1+(•,•); v = full-corpus vocab so OOV
    // continuations have a defined Laplace floor
    val consts = big.agg(count(lit(1)).as("bt")).crossJoin(
      toks.select(explode(col("t")).as("tok"))
        .agg(countDistinct(col("tok")).as("v")))
    val docPairs = pairsOf(toks)
    val pc = (coalesce(col("n1c"), lit(0L)) + lit(1L)).cast("double") /
      (col("bt") + col("v")).cast("double")
    val pairTerms = docPairs.select(col("w1"), col("w2")).distinct()
      .join(big, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(consts)
      .withColumn("pc", pc)
      .withColumn("p",
        when(col("c1s").isNotNull,
          greatest(coalesce(col("c12"), lit(0L)).cast("double") - lit(0.75),
            lit(0.0)) / col("c1s").cast("double")
            + lit(0.75) * col("n1f").cast("double")
              / col("c1s").cast("double") * col("pc"))
          .otherwise(col("pc")))
      .withColumn("lp_micro",
        floor(log(col("p")) * lit(1000000.0)).cast("long"))
      .select(col("w1"), col("w2"), col("lp_micro"))
    // document-initial tokens score by the continuation distribution
    val firstTerms = toks.select(col("t").getItem(0).as("w")).distinct()
      .join(cont.select(col("w2").as("w"), col("n1c")), Seq("w"), "left")
      .crossJoin(consts)
      .withColumn("lp_first", floor(log(pc) * lit(1000000.0)).cast("long"))
      .select(col("w"), col("lp_first"))
    val pairScore = docPairs
      .join(broadcast(pairTerms), Seq("w1", "w2"))
      .groupBy(col("doc_id")).agg(sum(col("lp_micro")).as("s_pairs"))
    toks.select(col("doc_id"), col("lang"),
        size(col("t")).cast("long").as("n_tokens"), col("t").getItem(0).as("w"))
      .join(broadcast(firstTerms), Seq("w"))
      .join(pairScore, Seq("doc_id"), "left")
      .withColumn("score_micro",
        col("lp_first") + coalesce(col("s_pairs"), lit(0L)))
      .withColumn("avg_logprob",
        col("score_micro").cast("double") / col("n_tokens") / lit(1000000.0))
      .withColumn("tert", ntile(3).over(Window.partitionBy(col("lang"))
        .orderBy(col("avg_logprob").desc, col("doc_id").asc)))
      .withColumn("bucket",
        when(col("tert") === 1, "head")
          .when(col("tert") === 2, "middle").otherwise("tail"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("score_micro"), col("avg_logprob"), col("bucket"))
      .orderBy(col("doc_id").asc)
  }
  val q201Oracle: String = """
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
    train_pairs AS (
      SELECT unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
      FROM toks WHERE lang = 'en' AND len(t) >= 2),
    big AS (SELECT w1, w2, COUNT(*) AS c12 FROM train_pairs GROUP BY w1, w2),
    ctx AS (SELECT w1, SUM(c12) AS c1s, COUNT(*) AS n1f FROM big GROUP BY w1),
    cont AS (SELECT w2, COUNT(*) AS n1c FROM big GROUP BY w2),
    consts AS (
      SELECT (SELECT COUNT(*) FROM big) AS bt,
             (SELECT COUNT(DISTINCT tok)
              FROM (SELECT unnest(t) AS tok FROM toks)) AS v),
    doc_pairs AS (
      SELECT doc_id, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
      FROM toks WHERE len(t) >= 2),
    pair_terms AS (
      SELECT p.w1, p.w2,
        CAST(FLOOR(LN(CASE WHEN x.c1s IS NOT NULL
          THEN greatest(CAST(COALESCE(b.c12, 0) AS DOUBLE) - 0.75, 0.0)
                 / CAST(x.c1s AS DOUBLE)
               + 0.75 * CAST(x.n1f AS DOUBLE) / CAST(x.c1s AS DOUBLE)
                 * (CAST(COALESCE(n.n1c, 0) + 1 AS DOUBLE)
                    / CAST(k.bt + k.v AS DOUBLE))
          ELSE CAST(COALESCE(n.n1c, 0) + 1 AS DOUBLE)
               / CAST(k.bt + k.v AS DOUBLE)
          END) * 1000000.0) AS BIGINT) AS lp_micro
      FROM (SELECT DISTINCT w1, w2 FROM doc_pairs) p
      LEFT JOIN big b ON b.w1 = p.w1 AND b.w2 = p.w2
      LEFT JOIN ctx x ON x.w1 = p.w1
      LEFT JOIN cont n ON n.w2 = p.w2
      CROSS JOIN consts k),
    first_terms AS (
      SELECT fk.w,
        CAST(FLOOR(LN(CAST(COALESCE(n.n1c, 0) + 1 AS DOUBLE)
                       / CAST(k.bt + k.v AS DOUBLE))
          * 1000000.0) AS BIGINT) AS lp_first
      FROM (SELECT DISTINCT t[1] AS w FROM toks) fk
      LEFT JOIN cont n ON n.w2 = fk.w
      CROSS JOIN consts k),
    pair_score AS (
      SELECT doc_id, SUM(lp_micro) AS s_pairs
      FROM doc_pairs JOIN pair_terms USING (w1, w2) GROUP BY doc_id),
    scored AS (
      SELECT fi.doc_id, fi.lang, CAST(len(fi.t) AS BIGINT) AS n_tokens,
             CAST(ft.lp_first + COALESCE(ps.s_pairs, 0) AS BIGINT)
               AS score_micro
      FROM toks fi
      JOIN first_terms ft ON ft.w = fi.t[1]
      LEFT JOIN pair_score ps ON ps.doc_id = fi.doc_id),
    bucketed AS (
      SELECT doc_id, lang, n_tokens, score_micro,
             CAST(score_micro AS DOUBLE) / n_tokens / 1000000.0
               AS avg_logprob,
             ntile(3) OVER (PARTITION BY lang
               ORDER BY CAST(score_micro AS DOUBLE) / n_tokens / 1000000.0
                 DESC, doc_id ASC) AS tert
      FROM scored)
    SELECT doc_id, lang, n_tokens, score_micro, avg_logprob,
           CASE tert WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
             ELSE 'tail' END AS bucket
    FROM bucketed ORDER BY doc_id ASC"""

  // q203 — UniMax waterfilling epoch allocation (Chung et al. 2023):
  // given a token budget B (= 3.2× the corpus here) and a per-language
  // repeat cap of E = 4 epochs, walk languages smallest-first; each
  // takes min(its cap, an equal share of what remains). Low-resource
  // languages hit the epoch cap (no over-repetition), the high-resource
  // language soaks the leftover budget — the standard fix for
  // temperature-sampling's tail over-repetition. Closed form, no loop:
  // with caps ascending, the capped set is a prefix, and position i is
  // capped iff cap_i·(langs remaining) ≤ budget remaining — a prefix-AND
  // over a cumulative-sum window. Output: per-language allocation, the
  // capped flag, and achieved epochs in basis points. All integers.
  // Scale shape: the per-language token counts are ONE partial agg over
  // the corpus (5 rows out); the waterfill itself runs on that 5-row
  // frame (the unpartitioned windows are over 5 rows, not the corpus)
  // and its output is the broadcast-size plan q200-style fills consume.
  def q203UnimaxAlloc(spark: SparkSession, dir: String): DataFrame = {
    val epochCap = 4
    val counts = Tables.documents(spark, dir)
      .select(col("lang"), size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .groupBy(col("lang")).agg(sum(col("n")).as("lang_tokens"))
    val consts = counts.agg(
      expr("sum(lang_tokens) * 32 DIV 10").as("budget"),
      count(lit(1)).as("nlang"))
    val ordw = Window.orderBy(col("cap").asc, col("lang").asc)
    val flags = counts
      .withColumn("cap", col("lang_tokens") * lit(epochCap.toLong))
      .crossJoin(broadcast(consts))
      .withColumn("i", row_number().over(ordw))
      .withColumn("cprev", coalesce(
        sum(col("cap")).over(ordw.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("cond",
        (col("cap") * (col("nlang") - col("i") + 1) <=
          col("budget") - col("cprev")).cast("int"))
      .withColumn("capped", min(col("cond")).over(
        ordw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val kk = flags.agg(sum(col("capped")).as("k"),
      sum(col("cap") * col("capped")).as("ck"))
    flags.crossJoin(broadcast(kk))
      .withColumn("alloc", when(col("capped") === 1, col("cap"))
        .otherwise(expr("(budget - ck) DIV (nlang - k)")))
      .withColumn("epochs_bp", expr("alloc * 10000 DIV lang_tokens"))
      .select(col("lang"), col("lang_tokens"), col("cap"),
        col("capped"), col("alloc"), col("epochs_bp"))
      .orderBy(col("lang").asc)
  }
  val q203Oracle: String = """
    WITH c AS (
      SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
               AS lang_tokens
      FROM documents GROUP BY lang),
    k AS (SELECT CAST(SUM(lang_tokens) AS BIGINT) * 32 // 10 AS budget,
                 COUNT(*) AS nlang
          FROM c),
    f AS (SELECT lang, lang_tokens, lang_tokens * 4 AS cap, budget, nlang
          FROM c CROSS JOIN k),
    w AS (SELECT *,
            row_number() OVER (ORDER BY cap ASC, lang ASC) AS i,
            COALESCE(SUM(cap) OVER (ORDER BY cap ASC, lang ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cprev
          FROM f),
    g AS (SELECT *, CASE WHEN cap * (nlang - i + 1) <= budget - cprev
                    THEN 1 ELSE 0 END AS cond
          FROM w),
    h AS (SELECT *, MIN(cond) OVER (ORDER BY cap ASC, lang ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS capped
          FROM g),
    t AS (SELECT CAST(SUM(capped) AS BIGINT) AS kk,
                 CAST(SUM(cap * capped) AS BIGINT) AS ck
          FROM h)
    SELECT lang, lang_tokens, CAST(cap AS BIGINT) AS cap,
           CAST(capped AS INT) AS capped,
           CAST(CASE WHEN capped = 1 THEN cap
                ELSE (budget - ck) // (nlang - kk) END AS BIGINT) AS alloc,
           CAST((CASE WHEN capped = 1 THEN cap
                 ELSE (budget - ck) // (nlang - kk) END) * 10000
                // lang_tokens AS BIGINT) AS epochs_bp
    FROM h CROSS JOIN t ORDER BY lang ASC"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q201_kneser_ney" -> (q201KneserNey _),
    "q203_unimax_alloc" -> (q203UnimaxAlloc _))

  val oracles: Map[String, String] = Map(
    "q201_kneser_ney" -> q201Oracle,
    "q203_unimax_alloc" -> q203Oracle)
}
