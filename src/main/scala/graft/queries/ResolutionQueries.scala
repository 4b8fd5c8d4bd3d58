package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.TextOps
import graft.tables.Tables

/** Entity-resolution and corpus-assembly operators: blocked record linkage
  * (normalize → block → edit-distance verify → argmin resolve), the
  * sorted-neighborhood near-dup blocking method (the classic alternative to
  * LSH banding: sort by a locality-sensitive key, compare only a sliding
  * window of neighbors), and mixture-weighted token-budget corpus fill
  * (greedy quality fill of a per-language token allocation).
  *
  * All three stay integer-exact so the DuckDB oracle hash-matches:
  * levenshtein/bit_count/row_number/integer-division only — no floats.
  */
object ResolutionQueries {

  // q198 — blocked entity resolution. Mentions are deterministic dirty
  // variants of customer names (even custkey: the first digit is OCR-style
  // confused to 'O'; odd custkey: trailing junk 'X' is appended). The
  // resolver never sees the source key — it normalizes the confusions away
  // (translate O→0, strip X), blocks on the last-3-digit suffix of the
  // normalized form, verifies candidates with levenshtein ≤ 2 against the
  // clean entity table, and resolves each mention to the argmin-(dist,
  // custkey) candidate. n_cand is the verified candidate-set size — the
  // blocking-efficiency number a linkage pipeline watches.
  //
  // 100 TB shape: the mention→entity candidate join is a plain equi-join
  // on the block key (one shuffle, no all-pairs); per-block candidate
  // counts are bounded by the key's selectivity (here ≤ |entities|/1000),
  // and the argmin is a per-mention window over that bounded set. For a
  // skewed block histogram, salt the hot blocks (JoinOps.saltedEquiJoin).
  def q198EntityResolution(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val mentions = cust.filter(pmod(col("c_custkey"), lit(7L)) < 3)
      .select(col("c_custkey").as("mention_id"),
        when(pmod(col("c_custkey"), lit(2L)) === 0,
          concat(substring(col("c_name"), 1, 9), lit("O"),
            substring(col("c_name"), 11, 30)))
          .otherwise(concat(col("c_name"), lit("X"))).as("mention"))
      .withColumn("block", right(translate(col("mention"), "OX", "0"), lit(3)))
    val entities = cust
      .select(col("c_custkey"), col("c_name"),
        right(col("c_name"), lit(3)).as("block"))
    val verified = mentions.join(entities, "block")
      .withColumn("dist", levenshtein(col("mention"), col("c_name")))
      .filter(col("dist") <= 2)
    val w = Window.partitionBy(col("mention_id"))
      .orderBy(col("dist").asc, col("c_custkey").asc)
    val wc = Window.partitionBy(col("mention_id"))
    verified
      .withColumn("n_cand", count(lit(1)).over(wc))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("mention_id"), col("c_custkey").as("resolved_id"),
        col("dist").cast("int").as("dist"), col("n_cand"))
      .orderBy(col("mention_id").asc)
  }
  val q198Oracle: String = """
    WITH mentions AS (
      SELECT c_custkey AS mention_id,
             CASE WHEN c_custkey % 2 = 0
                  THEN substr(c_name, 1, 9) || 'O' || substr(c_name, 11, 30)
                  ELSE c_name || 'X' END AS mention
      FROM customer WHERE c_custkey % 7 < 3),
    m AS (SELECT mention_id, mention,
                 right(translate(mention, 'OX', '0'), 3) AS block
          FROM mentions),
    e AS (SELECT c_custkey, c_name, right(c_name, 3) AS block FROM customer),
    verified AS (
      SELECT m.mention_id, e.c_custkey,
             levenshtein(m.mention, e.c_name) AS dist
      FROM m JOIN e USING (block)
      WHERE levenshtein(m.mention, e.c_name) <= 2),
    ranked AS (
      SELECT mention_id, c_custkey, dist,
             COUNT(*) OVER (PARTITION BY mention_id) AS n_cand,
             row_number() OVER
               (PARTITION BY mention_id ORDER BY dist ASC, c_custkey ASC) AS rn
      FROM verified)
    SELECT mention_id, c_custkey AS resolved_id, CAST(dist AS INT) AS dist,
           n_cand
    FROM ranked WHERE rn = 1 ORDER BY mention_id ASC"""

  // q199 — sorted-neighborhood near-dup blocking (Hernández & Stolfo's
  // merge/purge method): sort documents by their 60-bit SimHash, then
  // compare each doc only against the next `w`=3 docs in the sorted order
  // inside its 16-way top-bits block — near-identical documents have
  // near-identical SimHashes, so they land adjacent in the sort and one
  // linear pass finds them. Pairs are verified exactly (Hamming ≤ 8, same
  // gate as q37's band-bucket method, which this complements: banding has
  // per-band collision buckets, SNM has a single sort + bounded window —
  // no bucket-skew blowup by construction).
  //
  // 100 TB shape: one projection computes the codegen'd SimHash, one
  // shuffle sorts within the 16 hash-prefix blocks, and the window emits
  // ≤ w rows per doc — candidate volume is w·N, independent of duplicate
  // cluster sizes (banding's hot-bucket quadratic risk). The block count
  // is a knob: more prefix bits → more parallelism, narrower neighborhoods.
  def q199SortedNeighborhood(spark: SparkSession, dir: String): DataFrame = {
    val w = 3
    val docs = Tables.documents(spark, dir).repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        GraftFunctions.simhash(TextOps.tokens(col("text"))).as("sh"))
      .withColumn("blk", shiftright(col("sh"), 56))
    val ord = Window.partitionBy(col("blk"))
      .orderBy(col("sh").asc, col("doc_id").asc)
    // lead() first (windows can't live inside a generator), explode after
    val leadCols = (1 to w).flatMap { k =>
      Seq(lead(col("doc_id"), k).over(ord).as(s"nid$k"),
        lead(col("sh"), k).over(ord).as(s"nsh$k"))
    }
    val neighbors = (1 to w).map { k =>
      struct(col(s"nid$k").as("nid"), col(s"nsh$k").as("nsh"))
    }
    docs
      .select(col("doc_id") +: col("sh") +: leadCols: _*)
      .select(col("doc_id"), col("sh"),
        explode(array(neighbors: _*)).as("nb"))
      .filter(col("nb.nid").isNotNull)
      .select(
        least(col("doc_id"), col("nb.nid")).as("doc_a"),
        greatest(col("doc_id"), col("nb.nid")).as("doc_b"),
        expr("bit_count(sh ^ nb.nsh)").as("hamming"))
      .filter(col("hamming") <= 8)
      .orderBy(col("doc_a").asc, col("doc_b").asc)
  }
  val q199Oracle: String = """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    th AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
    votes AS (
      SELECT doc_id, bit,
             SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM th CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS bit)
      GROUP BY doc_id, bit),
    sh AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS sh
      FROM votes GROUP BY doc_id),
    ranked AS (
      SELECT doc_id, sh, sh >> 56 AS blk,
             row_number() OVER (PARTITION BY sh >> 56
                                ORDER BY sh ASC, doc_id ASC) AS rk
      FROM sh),
    pairs AS (
      SELECT least(a.doc_id, b.doc_id) AS doc_a,
             greatest(a.doc_id, b.doc_id) AS doc_b,
             bit_count(xor(a.sh, b.sh)) AS hamming
      FROM ranked a JOIN ranked b
        ON a.blk = b.blk AND b.rk > a.rk AND b.rk <= a.rk + 3)
    SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming FROM pairs
    WHERE hamming <= 8 ORDER BY doc_a ASC, doc_b ASC"""

  // q200 — mixture-weighted token-budget fill: the corpus-assembly step
  // that turns "target mixture: 40% en, 15% each de/es/fr/zh" plus a total
  // token budget (60% of the corpus here) into an actual document
  // selection. Per language, documents are ranked by a type-token-ratio
  // quality score (integer millis — exact) and greedily admitted while the
  // language's running token total stays within its allocation. Output is
  // the per-language fill report: allocation, docs/tokens admitted, and
  // utilization in basis points — all integer arithmetic.
  //
  // 100 TB shape: one scan computes token counts, one global agg (5 rows)
  // broadcasts the allocations back, and the greedy fill is a per-language
  // cumulative-sum window — each language sorts independently. If one
  // stratum dominates, swap the window for the histogram-cutoff
  // equivalent: histogram score, pick the cutoff score whose prefix sum
  // fits the budget, then filter — two scans, no global sort (same swap
  // documented for the tertile/decile ops).
  def q200BudgetFill(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
      .withColumn("score", expr("n_distinct * 1000 DIV n_tokens"))
    // total is a 1-row agg joined back by cross — broadcast by construction
    val total = docs.agg(sum(col("n_tokens")).as("corpus_tokens"))
    val alloc = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("lang_tokens"))
      .crossJoin(broadcast(total))
      .withColumn("budget", expr("corpus_tokens * 60 DIV 100 * " +
        "(CASE WHEN lang = 'en' THEN 40 ELSE 15 END) DIV 100"))
      .select(col("lang"), col("n_docs"), col("lang_tokens"), col("budget"))
    val wfill = Window.partitionBy(col("lang"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = docs.join(broadcast(alloc), "lang")
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wfill))
      .withColumn("kept", (col("cum_tokens") <= col("budget")).cast("long"))
    filled.groupBy(col("lang"))
      .agg(min(col("budget")).as("budget"),
        min(col("n_docs")).as("n_total"),
        sum(col("kept")).as("n_kept"),
        sum(col("kept") * col("n_tokens")).as("kept_tokens"))
      .withColumn("util_bp", expr("kept_tokens * 10000 DIV budget"))
      .orderBy(col("lang").asc)
  }
  val q200Oracle: String = """
    WITH d AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_distinct
      FROM documents),
    scored AS (
      SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(n_distinct AS BIGINT) * 1000 // CAST(n_tokens AS BIGINT) AS score
      FROM d),
    total AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS corpus_tokens FROM scored),
    alloc AS (
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS lang_tokens,
             (SELECT corpus_tokens FROM total) * 60 // 100 *
               (CASE WHEN lang = 'en' THEN 40 ELSE 15 END) // 100 AS budget
      FROM scored GROUP BY lang),
    filled AS (
      SELECT s.lang, s.n_tokens, a.budget, a.n_docs,
             SUM(s.n_tokens) OVER (PARTITION BY s.lang
               ORDER BY s.score DESC, s.doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      FROM scored s JOIN alloc a USING (lang)),
    kept AS (
      SELECT lang, budget, n_docs,
             CASE WHEN cum_tokens <= budget THEN 1 ELSE 0 END AS kept,
             n_tokens
      FROM filled)
    SELECT lang, CAST(MIN(budget) AS BIGINT) AS budget,
           CAST(MIN(n_docs) AS BIGINT) AS n_total,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           CAST(SUM(kept * n_tokens) AS BIGINT) AS kept_tokens,
           CAST(SUM(kept * n_tokens) * 10000 // MIN(budget) AS BIGINT) AS util_bp
    FROM kept GROUP BY lang ORDER BY lang ASC"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q198_entity_resolution" -> (q198EntityResolution _),
    "q199_sorted_neighborhood" -> (q199SortedNeighborhood _),
    "q200_budget_fill" -> (q200BudgetFill _))

  val oracles: Map[String, String] = Map(
    "q198_entity_resolution" -> q198Oracle,
    "q199_sorted_neighborhood" -> q199Oracle,
    "q200_budget_fill" -> q200Oracle)
}
