package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Corpus-curation operators: TF-IDF term scoring, text normalization,
  * and deterministic stratified sampling — the selection/cleaning passes a
  * training-data pipeline runs between dedup and tokenization. All three
  * stay integer-exact (or single-IEEE-op-from-exact-ints) so the DuckDB
  * oracle hash-matches.
  */
object CurationQueries {

  // q75 — TF-IDF top terms per document. idf is kept as the exact rational
  // N/df (score = tf·N/df as one multiply + one divide of exact integers —
  // both correctly-rounded IEEE ops, so identical on both engines; no log()
  // whose libm could differ). Top-3 terms per doc, ties broken by term.
  def q75TfIdf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 200)
    val terms = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df")) // tf rows are distinct (doc, term) pairs
    val n = docs.count()
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(df_, "term")
      .withColumn("score", (col("tf") * lit(n)).cast("double") / col("df").cast("double"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id").asc, col("rank").asc)
  }
  val q75Oracle: String = """
    WITH d AS (SELECT * FROM documents WHERE doc_id < 200),
    terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM d),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM d),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST(tf.tf * n.n AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n),
    ranked AS (
      SELECT *, row_number() OVER
        (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
      FROM scored)
    SELECT doc_id, rank, term, tf, df, score FROM ranked WHERE rank <= 3
    ORDER BY doc_id ASC, rank ASC"""

  // q76 — normalization pipeline: lowercase → strip non-alphanumerics →
  // collapse runs of spaces → trim. The normalized-form hash is what a
  // normalize-then-exact-dedup pass groups on (a cheap near-dup catcher
  // before the MinHash tier).
  def q76Normalize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("norm", trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
        " +", " ")))
      .select(col("doc_id"), length(col("norm")).as("norm_len"),
        md5(col("norm").cast("binary")).as("norm_hash"))
      .orderBy(col("doc_id").asc)
  val q76Oracle: String = """
    SELECT doc_id, length(norm) AS norm_len, md5(norm) AS norm_hash
    FROM (SELECT doc_id, trim(regexp_replace(
            regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
            ' +', ' ', 'g')) AS norm
          FROM documents)
    ORDER BY doc_id ASC"""

  // q77 — deterministic stratified sampling: per-language keep rates
  // applied via a multiplicative integer hash of doc_id (not rand() — the
  // sample is replayable, shardable, and oracle-checkable). The curation
  // move: downsample the dominant stratum, keep the tails.
  def q77StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val rate = when(col("lang") === "en", lit(20)).otherwise(lit(80))
    Tables.documents(spark, dir)
      .withColumn("bucket", pmod(col("doc_id") * lit(2654435761L), lit(100L)))
      .withColumn("kept", (col("bucket") < rate).cast("int"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"), sum(col("kept")).as("n_kept"),
        sum(when(col("kept") === 1, col("n_chars")).otherwise(lit(0L))).as("kept_chars"))
      .orderBy(col("lang").asc)
  }
  val q77Oracle: String = """
    SELECT lang, COUNT(*) AS n_total,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN kept = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
    FROM (SELECT lang, n_chars,
            CASE WHEN (doc_id * 2654435761) % 100 <
                      (CASE WHEN lang = 'en' THEN 20 ELSE 80 END)
                 THEN 1 ELSE 0 END AS kept
          FROM documents)
    GROUP BY lang ORDER BY lang ASC"""

  // q89 — the composed curation pipeline, end-to-end in one plan:
  // quality-filter (token count + type/token ratio) → prefix-hash dedup
  // (boilerplate/URL-style: md5 of the first 40 chars, keep min doc_id)
  // → deterministic stratified downsample (en at 50%) → per-source corpus
  // stats. Each stage is one narrow projection or one hash shuffle; the
  // whole pipeline is 3 shuffles (dedup agg, semi join, final agg) —
  // Catalyst fuses the filters into the scan. corpus_ttr divides two
  // exact integer sums once, so the oracle hash-matches.
  def q89CurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextOps
    val toks = TextOps.tokens(col("text"))
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
    val quality = base.filter(col("n_tokens") >= 20 &&
      col("n_distinct").cast("double") / col("n_tokens").cast("double") >= 0.35)
    val keep = quality
      .groupBy(md5(substring(col("text"), 1, 40).cast("binary")).as("k"))
      .agg(min(col("doc_id")).as("doc_id"))
    val deduped = quality.join(keep.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val sampled = deduped.filter(
      pmod(col("doc_id") * lit(2654435761L), lit(100L)) <
        when(col("lang") === "en", lit(50)).otherwise(lit(100)))
    sampled.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        (sum(col("n_distinct")).cast("double") /
          sum(col("n_tokens")).cast("double")).as("corpus_ttr"))
      .orderBy(col("source").asc)
  }
  val q89Oracle: String = """
    WITH base AS (
      SELECT doc_id, lang, source, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
      FROM documents),
    quality AS (
      SELECT * FROM base
      WHERE n_tokens >= 20
        AND CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 0.35),
    keep AS (
      SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY md5(substr(text, 1, 40))),
    deduped AS (
      SELECT * FROM quality WHERE doc_id IN (SELECT doc_id FROM keep)),
    sampled AS (
      SELECT * FROM deduped
      WHERE (doc_id * 2654435761) % 100 <
            (CASE WHEN lang = 'en' THEN 50 ELSE 100 END))
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_distinct) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE)
             AS corpus_ttr
    FROM sampled GROUP BY source ORDER BY source ASC"""

  // q123 — keep-BEST dedup (canonical selection): q89's dedup keeps
  // min-doc_id arbitrarily; real curation keeps the best duplicate.
  // Groups share an md5 prefix key; the survivor is the longest document
  // (n_chars desc), tiebreak doc_id asc. One window over one hash
  // shuffle on the dup key — same physical shape as latest-per-key (q07),
  // different ranking. Survivor count == distinct dup keys by construction.
  def q123KeepBestDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("k"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(substring(col("text"), 1, 40).cast("binary")).as("k"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy(col("doc_id").asc)
  }
  val q123Oracle: String = """
    SELECT doc_id, lang, source, n_chars, k FROM (
      SELECT doc_id, lang, source, n_chars,
             md5(substr(text, 1, 40)) AS k,
             row_number() OVER (PARTITION BY md5(substr(text, 1, 40))
               ORDER BY n_chars DESC, doc_id ASC) AS rn
      FROM documents)
    WHERE rn = 1 ORDER BY doc_id ASC"""

  // q124 — per-source caps: bound any one source's share of the corpus
  // (the anti-domination rule every pretraining mix applies). Keep the
  // top 40 docs per source by length (doc_id tiebreak); output the
  // capped corpus profile. The grouped top-k shape — at 100 TB the
  // TopKAgg aggregator or TopKPerKeyExec replace the window when k is
  // small relative to group size (both are in the library); the window
  // form is kept here because the oracle must rank identically.
  def q124SourceCap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 40)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"),
        max(col("n_chars")).as("longest"))
      .orderBy(col("source").asc)
  }
  val q124Oracle: String = """
    SELECT source, COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
           MAX(n_chars) AS longest
    FROM (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
               ORDER BY n_chars DESC, doc_id ASC) AS rk
      FROM documents)
    WHERE rk <= 40
    GROUP BY source ORDER BY source ASC"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q123_keep_best_dedup" -> (q123KeepBestDedup _),
    "q124_source_cap" -> (q124SourceCap _),
    "q75_tfidf" -> (q75TfIdf _),
    "q76_normalize" -> (q76Normalize _),
    "q77_stratified_sample" -> (q77StratifiedSample _),
    "q89_curation_pipeline" -> (q89CurationPipeline _))

  val oracles: Map[String, String] = Map(
    "q123_keep_best_dedup" -> q123Oracle,
    "q124_source_cap" -> q124Oracle,
    "q75_tfidf" -> q75Oracle,
    "q76_normalize" -> q76Oracle,
    "q77_stratified_sample" -> q77Oracle,
    "q89_curation_pipeline" -> q89Oracle)
}
