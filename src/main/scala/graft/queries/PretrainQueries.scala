package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.tables.Tables

/** Pretraining-corpus assembly operators: the passes that run AFTER
  * curation (q75-q128) and turn a cleaned corpus into training input —
  * deterministic split assignment, PII redaction, cross-document segment
  * dedup, source-mixture resampling, shard dispatch, and the pair
  * statistics under BPE vocabulary induction. Everything is hash- or
  * integer-deterministic so the DuckDB oracle hash-matches, and nothing
  * materializes driver-side state larger than O(groups).
  */
object PretrainQueries {

  // ---------------------------------------------------------------------
  // q130 — deterministic train/val/test split: each document's fate is a
  // pure function of its id (md5 of "id|salt", first two hex chars
  // compared lexicographically against fixed thresholds ≈ 90/5/5). No
  // rand(): the split is reproducible across reruns, shards, and engines,
  // and a join against yesterday's split assigns identically — the
  // property leakage audits depend on. Narrow projection, zero shuffles
  // until the output sort.
  def q130SplitAssign(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(col("doc_id").cast("string"), lit("|split")).cast("binary"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), substring(h, 1, 2).as("hb"))
      .withColumn("split",
        when(col("hb") < "e6", "train")       // 230/256 ≈ 89.8%
          .when(col("hb") < "f3", "val")      //  13/256 ≈  5.1%
          .otherwise("test"))
      .select(col("doc_id"), col("split"))
      .orderBy(col("doc_id").asc)
  }
  val q130Oracle: String = """
    SELECT doc_id,
           CASE WHEN hb < 'e6' THEN 'train'
                WHEN hb < 'f3' THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id,
            substr(md5(CAST(doc_id AS VARCHAR) || '|split'), 1, 2) AS hb
          FROM documents)
    ORDER BY doc_id ASC"""

  // ---------------------------------------------------------------------
  // q131 — PII redaction: emails and phone-shaped tokens scrubbed with
  // anchored character-class regexes (the subset whose semantics are
  // identical in Java regex and RE2, so the oracle can replay it). The
  // scan is one codegen'd projection — regexp_replace/regexp_count never
  // leave whole-stage codegen, and nothing shuffles. The contact blob is
  // derived deterministically from the row so the fixture needs no
  // synthetic input table.
  def q131PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val email = "[a-z0-9.-]+@[a-z0-9.-]+"
    val phone = "555-[0-9]{4}"
    val blob = concat(
      lit("doc "), col("doc_id"), lit(" contact user"), col("doc_id"),
      lit("@mail-"), col("lang"), lit(".example.com or call 555-"),
      lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"),
      lit(" "), substring(col("text"), 1, 20))
    Tables.documents(spark, dir)
      .select(col("doc_id"), blob.as("blob"))
      .select(col("doc_id"),
        regexp_replace(regexp_replace(col("blob"), email, "<EMAIL>"),
          phone, "<PHONE>").as("redacted"),
        regexp_count(col("blob"), lit(email)).as("n_emails"),
        regexp_count(col("blob"), lit(phone)).as("n_phones"))
      .orderBy(col("doc_id").asc)
  }
  val q131Oracle: String = """
    SELECT doc_id,
           regexp_replace(regexp_replace(blob,
             '[a-z0-9.-]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
             '555-[0-9]{4}', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(blob, '[a-z0-9.-]+@[a-z0-9.-]+')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(blob, '555-[0-9]{4}')) AS INT) AS n_phones
    FROM (SELECT doc_id,
            'doc ' || CAST(doc_id AS VARCHAR) || ' contact user' ||
            CAST(doc_id AS VARCHAR) || '@mail-' || lang ||
            '.example.com or call 555-' ||
            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' ||
            substr(text, 1, 20) AS blob
          FROM documents)
    ORDER BY doc_id ASC"""

  // ---------------------------------------------------------------------
  // q132 — cross-document segment dedup (the CCNet/RefinedWeb paragraph
  // pass, on 3-token segments): segments whose corpus-wide frequency ≥ 3
  // are boilerplate and removed from EVERY document; survivors reassemble
  // in original order. Plan shape: explode segments (narrow) → one hash
  // shuffle to count frequencies → join freq back on the segment key →
  // re-group by doc. At 100 TB the frequency table is the only
  // all-to-all; documents re-group by doc_id, which the store's
  // bucketing already co-locates. Reassembly is collect_list + array_sort
  // inside one aggregate — no window, no per-row subquery.
  def q132SegmentDedup(spark: SparkSession, dir: String): DataFrame = {
    val segLen = 3
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
    val segs = docs
      .select(col("doc_id"),
        explode(sequence(lit(0),
          ceil(size(col("t")).cast("double") / segLen).cast("int") - 1)).as("i"),
        col("t"))
      .select(col("doc_id"), col("i"),
        concat_ws(" ", slice(col("t"), col("i") * segLen + 1, lit(segLen))).as("seg"))
    val freq = segs.groupBy(col("seg")).agg(count(lit(1)).as("f"))
    segs.join(freq, "seg")
      .withColumn("kept", (col("f") < 3).cast("int"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"), sum(col("kept")).as("n_kept"),
        md5(coalesce(array_join(transform(
          array_sort(collect_list(when(col("kept") === 1,
            struct(col("i"), col("seg"))))),
          x => x.getField("seg")), " "), lit("")).cast("binary")).as("rebuilt_hash"))
      .orderBy(col("doc_id").asc)
  }
  val q132Oracle: String = """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    segs AS (
      SELECT doc_id, i,
             array_to_string(toks[i*3+1 : i*3+3], ' ') AS seg
      FROM t, LATERAL unnest(generate_series(0,
        CAST(ceil(len(toks) / 3.0) AS INT) - 1)) AS u(i)),
    f AS (SELECT seg, COUNT(*) AS f FROM segs GROUP BY seg)
    SELECT s.doc_id, COUNT(*) AS n_segs,
           CAST(SUM(CASE WHEN f.f < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(COALESCE(string_agg(CASE WHEN f.f < 3 THEN s.seg END, ' '
             ORDER BY s.i), '')) AS rebuilt_hash
    FROM segs s JOIN f USING (seg)
    GROUP BY s.doc_id ORDER BY s.doc_id ASC"""

  // ---------------------------------------------------------------------
  // q133 — source-mixture resampling: each source gets an integer epoch
  // count (the up/down-weighting every pretraining mix applies; fractional
  // rates compose with q77's hash sampling). Replication is
  // explode(sequence(1, epochs)) — a narrow generator, no shuffle, no
  // rand() — and the output row count is exactly Σ source_n × epochs.
  // The checksum pins that every (doc, epoch) replica materialized once.
  def q133MixtureResample(spark: SparkSession, dir: String): DataFrame = {
    val epochs = when(col("source") === "src0", lit(3))
      .when(col("source") === "src1", lit(2)).otherwise(lit(1))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), epochs.as("epochs"))
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1), col("epochs"))).as("epoch"))
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_rows"),
        sum(col("doc_id") * col("epoch")).as("checksum"))
      .orderBy(col("source").asc)
  }
  val q133Oracle: String = """
    SELECT source, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_rows,
           CAST(SUM(doc_id * epoch) AS BIGINT) AS checksum
    FROM (SELECT doc_id, source,
            unnest(generate_series(1,
              CASE WHEN source = 'src0' THEN 3
                   WHEN source = 'src1' THEN 2 ELSE 1 END)) AS epoch
          FROM documents)
    GROUP BY source ORDER BY source ASC"""

  // ---------------------------------------------------------------------
  // q134 — deterministic corpus shuffle + shard dispatch: shard =
  // hash(id|salt) mod nShards, read order within a shard = ascending
  // hash — a reproducible global permutation with NO global sort and NO
  // coordination (cf. q88's prefix-scan, which this composes with when
  // explicit positions are needed). Each shard's profile carries
  // arg-min/arg-max by hash so the oracle pins the exact read order
  // endpoints, not just membership.
  def q134ShardDispatch(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(col("doc_id").cast("string"), lit("|shuf")).cast("binary"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        conv(substring(h, 1, 12), 16, 10).cast("long").as("hnum"))
      .withColumn("shard", pmod(col("hnum"), lit(8L)).cast("int"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        expr("min_by(doc_id, hnum)").as("first_doc"),
        expr("max_by(doc_id, hnum)").as("last_doc"))
      .orderBy(col("shard").asc)
  }
  val q134Oracle: String = """
    SELECT shard, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           arg_min(doc_id, hnum) AS first_doc,
           arg_max(doc_id, hnum) AS last_doc
    FROM (SELECT doc_id, n_chars, hnum,
            CAST(hnum % 8 AS INT) AS shard
          FROM (SELECT doc_id, n_chars,
                  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '|shuf'),
                    1, 12)) AS BIGINT) AS hnum
                FROM documents))
    GROUP BY shard ORDER BY shard ASC"""

  // ---------------------------------------------------------------------
  // q157 — shard integrity manifest: the validation artifact a corpus
  // build ships with its output so downstream training jobs can verify
  // transfer and retry integrity without re-reading the data. Per shard
  // (q134's deterministic routing): row count, byte count, an XOR of
  // content hashes and an XOR of doc ids — XOR is order- and
  // partition-invariant, so the checksum is identical however Spark
  // schedules or retries the tasks that produced it, and a single
  // flipped/missing/duplicated document changes it. One scan, partial
  // aggregation before the one 8-row shuffle; at 100 TB the manifest is
  // 8 rows describing the corpus.
  def q157ShardManifest(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(col("doc_id").cast("string"), lit("|shuf")).cast("binary"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        conv(substring(h, 1, 12), 16, 10).cast("long").as("hnum"),
        conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("chash"))
      .withColumn("shard", pmod(col("hnum"), lit(8L)).cast("int"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        expr("bit_xor(chash)").as("content_checksum"),
        expr("bit_xor(doc_id)").as("id_checksum"))
      .orderBy(col("shard").asc)
  }
  val q157Oracle: String = """
    SELECT shard, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           bit_xor(chash) AS content_checksum,
           bit_xor(doc_id) AS id_checksum
    FROM (SELECT doc_id, n_chars,
            ('0x' || substr(md5(text), 1, 15))::BIGINT AS chash,
            CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '|shuf'),
              1, 12)) AS BIGINT) % 8 AS INT) AS shard
          FROM documents)
    GROUP BY shard ORDER BY shard ASC"""

  // ---------------------------------------------------------------------
  // q135 — corpus-wide adjacent-pair statistics (the counting kernel
  // inside BPE vocabulary induction — TextOps.bpeTrain iterates exactly
  // this shape): explode bigrams via sequence+element_at (stays in
  // whole-stage codegen; the array-HOF spelling is CodegenFallback),
  // partial-aggregate per task, one shuffle on the pair key, global
  // top-20 via TakeOrderedAndProject. Deterministic ties: (count desc,
  // pair asc) is a total order.
  def q135PairCounts(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("t"), explode(sequence(lit(1), size(col("t")) - 1)).as("i"))
      .select(concat_ws(" ", element_at(col("t"), col("i")),
        element_at(col("t"), col("i") + 1)).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(20)
  }
  val q135Oracle: String = """
    WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
    b AS (SELECT unnest([toks[i] || ' ' || toks[i+1]
                         FOR i IN range(1, len(toks))]) AS pair
          FROM t WHERE len(toks) >= 2)
    SELECT pair, COUNT(*) AS cnt FROM b GROUP BY pair
    ORDER BY cnt DESC, pair ASC LIMIT 20"""

  // ---------------------------------------------------------------------
  // q137 — SCD Type-2 dimension build from the event stream: per user,
  // collapse consecutive equal event_types and emit validity intervals
  // [valid_from, valid_to) with an is_current flag — the
  // dimension-history shape the reference's member/quest tables would
  // take under a track-history mandate (reference stores latest-only;
  // SURVEY §2.8e). Two windows over ONE hash shuffle on user_id (both
  // windows share the partitioning); ties broken by event_id so the
  // interval chain is total-ordered and engine-independent.
  def q137Scd2Build(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val changes = Tables.events(spark, dir)
      .filter(col("user_id") < 30)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    changes
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type"), col("ts").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.cast("int").as("is_current"))
      .orderBy(col("user_id").asc, col("valid_from").asc, col("event_type").asc)
  }
  val q137Oracle: String = """
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts ASC, event_id ASC) AS prev
      FROM events WHERE user_id < 30),
    changes AS (
      SELECT user_id, event_id, ts, event_type FROM ordered
      WHERE prev IS NULL OR prev <> event_type)
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id
             ORDER BY ts ASC, event_id ASC) AS valid_to,
           CAST(lead(ts) OVER (PARTITION BY user_id
             ORDER BY ts ASC, event_id ASC) IS NULL AS INT) AS is_current
    FROM changes
    ORDER BY user_id ASC, valid_from ASC, event_type ASC"""

  // ---------------------------------------------------------------------
  // q136 — BPE vocabulary induction. One corpus pass builds the
  // word-frequency table; 8 merge rounds iterate over that table only.
  // Output is the rank-ordered merge table — the model artifact a
  // tokenizer ships. The oracle replays the full argmax-then-rewrite
  // loop: each round is a CTE triple (pair counts → argmax with the
  // (cnt DESC, a, b) tiebreak → symbol rewrite), and the left-to-right
  // non-overlapping mergePair is a list fold — folding is safe because a
  // freshly merged symbol a||b can never equal the left symbol a, so the
  // fold never re-merges into a just-created token. BpeSpec additionally
  // pins the algorithm against the hand-traced Sennrich example.
  def q136BpeVocab(spark: SparkSession, dir: String): DataFrame = {
    val wf = graft.operators.BpeOps.wordFreq(
      Tables.documents(spark, dir), "text")
    val model = graft.operators.BpeOps.train(spark, wf, nMerges = 8)
    graft.operators.BpeOps.mergeTable(spark, model).orderBy(col("rank").asc)
  }
  val q136Oracle: String = {
    val w0 = """w0 AS (
      SELECT list_append(list_transform(generate_series(1, len(word)), i -> word[i]), '</w>') AS s,
             freq
      FROM (SELECT word, COUNT(*) AS freq
            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE len(word) > 0 GROUP BY word))"""
    val rounds = (0 until 8).flatMap { r =>
      Seq(
        s"""p$r AS (
      SELECT p.a AS a, p.b AS b, SUM(p.f) AS cnt FROM (
        SELECT unnest(list_transform(generate_series(1, len(s)-1),
          i -> {'a': s[i], 'b': s[i+1], 'f': freq})) AS p
        FROM w$r) GROUP BY p.a, p.b)""",
        s"""b$r AS (SELECT a, b FROM p$r ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)""",
        s"""w${r + 1} AS (
      SELECT list_reduce(list_transform(w.s, x -> [x]),
        (acc, x) -> CASE WHEN acc[len(acc)] = br.a AND x[1] = br.b
                    THEN acc[1:len(acc)-1] || [br.a || br.b]
                    ELSE acc || x END) AS s, w.freq AS freq
      FROM w$r w CROSS JOIN b$r br)""")
    }
    val unions = (0 until 8)
      .map(r => s"""SELECT ${r + 1} AS rank, a AS "left", b AS "right" FROM b$r""")
      .mkString("\n    UNION ALL ")
    "WITH " + (w0 +: rounds).mkString(",\n") + "\n" + unions + "\nORDER BY rank ASC"
  }

  // ---------------------------------------------------------------------
  // q139 — the composed corpus→training-shards pipeline, end-to-end in
  // one plan (the packing counterpart of q89's curation composition):
  // tokenize → global token offsets (q88's distributed prefix-scan: one
  // data shuffle + O(buckets) driver metadata) → 2048-token chunk spans →
  // explode each doc's chunk range → hash-mod shard routing (q134's
  // coordination-free dispatch) → per-shard profile. The only corpus
  // shuffles are the prefix-scan's bucket pass and the final O(shards)
  // aggregation; chunk explosion is a narrow generator.
  def q139PackPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
    TextOps.withGlobalOffset(docs, "doc_id", "n_tok", "off")
      .select(col("doc_id"), col("n_tok"),
        expr("off DIV 2048").as("first_chunk"),
        expr("(off + n_tok - 1) DIV 2048").as("last_chunk"))
      .select(col("doc_id"), col("n_tok"),
        explode(sequence(col("first_chunk"), col("last_chunk"))).as("chunk"))
      .withColumn("shard", pmod(col("chunk"), lit(8L)).cast("int"))
      .groupBy(col("shard"))
      .agg(countDistinct(col("chunk")).as("n_chunks"),
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_doc_chunks"))
      .orderBy(col("shard").asc)
  }
  val q139Oracle: String = """
    WITH t AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents),
    o AS (
      SELECT doc_id, n_tok,
             CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
      FROM t),
    ch AS (
      SELECT doc_id, n_tok,
             unnest(generate_series(off // 2048, (off + n_tok - 1) // 2048)) AS chunk
      FROM o)
    SELECT CAST(chunk % 8 AS INT) AS shard,
           COUNT(DISTINCT chunk) AS n_chunks,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_doc_chunks
    FROM ch GROUP BY shard ORDER BY shard ASC"""

  // ---------------------------------------------------------------------
  // q142 — deterministic negative sampling (the word2vec/recsys
  // contrastive-pair prep): each positive (user, item) interaction draws
  // 4 negatives via a multiplicative integer hash — no rand(), so the
  // draw replays identically across engines/shards (q77/q130's rule).
  // Collisions with the user's true positive set are flagged by one
  // left join against the distinct positives (at scale: broadcast if the
  // catalog is small, else both sides hash on user+item — never a
  // per-row rejection loop, which would be a driver round-trip per draw).
  // Explode is a narrow generator; the join is the only corpus shuffle.
  def q142NegativeSampling(spark: SparkSession, dir: String): DataFrame = {
    val pos = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        pmod(col("event_id"), lit(1000L)).as("item"))
    val posSet = pos.select(col("user_id"), col("item")).distinct()
    val negs = pos
      .select(col("user_id"), col("event_id"),
        explode(sequence(lit(1), lit(4))).as("j"))
      .select(col("user_id"), col("event_id"), col("j"),
        // inner mod bounds the multiplicand (< 1000003 × 2654435761 ≪
        // 2^63) so the draw can't overflow at any id scale — a wrapped
        // product would silently diverge from the oracle's checked
        // BIGINT arithmetic
        pmod(pmod(pmod(col("user_id"), lit(1000003L)) * 10000L
            + pmod(col("event_id"), lit(1000003L)) * 4L + col("j"),
          lit(1000003L)) * lit(2654435761L), lit(1000L)).as("item"))
    negs.join(posSet.withColumn("hit", lit(1)), Seq("user_id", "item"), "left")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_negs"),
        sum(coalesce(col("hit"), lit(0))).as("n_collisions"),
        sum(col("item") * col("j")).as("checksum"))
      .orderBy(col("user_id").asc)
  }
  val q142Oracle: String = """
    WITH pos AS (
      SELECT user_id, event_id, event_id % 1000 AS item
      FROM events WHERE event_type = 'purchase'),
    ps AS (SELECT DISTINCT user_id, item FROM pos),
    negs AS (
      SELECT user_id, event_id, j,
             ((((user_id % 1000003) * 10000 + (event_id % 1000003) * 4 + j)
                % 1000003) * 2654435761) % 1000 AS item
      FROM pos, LATERAL unnest(generate_series(1, 4)) AS u(j))
    SELECT n.user_id, COUNT(*) AS n_negs,
           CAST(SUM(CASE WHEN ps.item IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_collisions,
           CAST(SUM(n.item * n.j) AS BIGINT) AS checksum
    FROM negs n LEFT JOIN ps ON n.user_id = ps.user_id AND n.item = ps.item
    GROUP BY n.user_id ORDER BY n.user_id ASC"""

  // ---------------------------------------------------------------------
  // q145 — dictionary (categorical) encoding: dense integer ids by
  // (frequency desc, term asc), rare terms (count < 2) mapped to OOV -1 —
  // the StringIndexer/vocab-file step before any embedding table. Scale
  // decomposition: the corpus-sized pass is the term-count aggregation
  // (one partial-aggregated shuffle); the id assignment then ranks the
  // VOCAB table, orders of magnitude smaller than the corpus. The
  // unpartitioned window funnels the vocab through one task — fine to
  // ~10M terms (seconds of sort), same regime where Spark ML's
  // StringIndexer collects the vocab to the driver; a vocab beyond that
  // would rank via the distributed prefix-scan (q88's primitive) keyed
  // on a count-bucket. The encode join broadcasts the id table (~100 MB
  // at 10M terms) and hash-partitions cleanly when vocab outgrows it.
  def q145VocabEncode(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
      .select(col("doc_id"), col("pos"), col("col").as("term"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("term").asc)
    val ids = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .withColumn("id", row_number().over(w).cast("long") - 1)
      .select(col("term"), col("id"))
    toks.join(broadcast(ids), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(col("id").isNull.cast("long")).as("n_oov"),
        sum(coalesce(col("id"), lit(-1L)) * (col("pos") + 1)).as("id_checksum"))
      .orderBy(col("doc_id").asc)
  }
  val q145Oracle: String = """
    WITH t AS (
      SELECT doc_id, pos, toks[pos + 1] AS term
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           LATERAL unnest(generate_series(0, len(toks) - 1)) AS u(pos)),
    ids AS (
      SELECT term, row_number() OVER (ORDER BY COUNT(*) DESC, term ASC) - 1 AS id
      FROM t GROUP BY term HAVING COUNT(*) >= 2)
    SELECT t.doc_id, COUNT(*) AS n_tok,
           CAST(SUM(CASE WHEN ids.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(SUM(COALESCE(ids.id, -1) * (t.pos + 1)) AS BIGINT) AS id_checksum
    FROM t LEFT JOIN ids USING (term)
    GROUP BY t.doc_id ORDER BY t.doc_id ASC"""

  // ---------------------------------------------------------------------
  // q146 — content-defined chunking (the FastCDC/rsync storage-dedup
  // primitive, on token windows): a position is a chunk boundary when the
  // hash of its 4-token window lands under a threshold (here 2/256 hex
  // prefixes ≈ 1/128 rate), so boundaries move WITH content — an insert
  // shifts chunk edges locally instead of re-chunking the whole document,
  // which is what makes delta storage of a 100 TB corpus incremental.
  // Pure narrow projection: explode windows inside codegen, hash, flag,
  // one per-doc aggregation.
  def q146ContentChunking(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 4)
    docs
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("t")) - 3)).as("i"),
        col("t"))
      .select(col("doc_id"), col("i"),
        substring(md5(concat_ws(" ",
          (0 until 4).map(o => element_at(col("t"), col("i") + o)): _*)
          .cast("binary")), 1, 2).as("hb"))
      .withColumn("boundary", (col("hb") < "02").cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(col("boundary")).as("n_boundaries"),
        (sum(col("boundary")) + 1).as("n_chunks"),
        sum(when(col("boundary") === 1, col("i")).otherwise(0L)).as("boundary_checksum"))
      .orderBy(col("doc_id").asc)
  }
  val q146Oracle: String = """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE len(string_split(text, ' ')) >= 4),
    w AS (
      SELECT doc_id, i,
             substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
               || ' ' || toks[i+3]), 1, 2) AS hb
      FROM t, LATERAL unnest(generate_series(1, len(toks) - 3)) AS u(i))
    SELECT doc_id, COUNT(*) AS n_windows,
           CAST(SUM(CASE WHEN hb < '02' THEN 1 ELSE 0 END) AS BIGINT) AS n_boundaries,
           CAST(SUM(CASE WHEN hb < '02' THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN hb < '02' THEN i ELSE 0 END) AS BIGINT) AS boundary_checksum
    FROM w GROUP BY doc_id ORDER BY doc_id ASC"""

  // ---------------------------------------------------------------------
  // q159 — span-corruption mask (the T5/UL2 denoising-objective
  // preprocessing step): deterministically mark ~15% of each document's
  // tokens as contiguous corruption spans and report the per-doc mask
  // stats a span-corruption dataloader needs (token count, masked count,
  // span count, masked permille). Span STARTS are a pure function of
  // (doc_id, position) — md5-derived, ~5% of positions — and each start
  // masks 3 tokens, overlaps merging, so the mask is reproducible across
  // reruns, shards, and engines (same property as q130's split): no
  // rand(), ever. Plan shape: explode positions → two window passes and
  // the per-doc aggregation all SHARE ONE hash shuffle on doc_id
  // (PlanSpec pins the single exchange); at 100 TB the cost is one
  // corpus-wide window scan, the same envelope as q88's packing.
  def q159SpanCorruption(spark: SparkSession, dir: String): DataFrame = {
    val pos = Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tok"),
        explode(sequence(lit(1), size(col("t")))).as("i"))
    val started = pos.withColumn("start",
      (conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
        col("i").cast("string")).cast("binary")), 1, 15), 16, 10)
        .cast("long") % 100L < 5L).cast("int"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val masked = started
      .withColumn("m", max(col("start")).over(w.rowsBetween(-2, 0)))
      .withColumn("bgn", (col("m") === 1 &&
        coalesce(lag(col("m"), 1).over(w), lit(0)) === 0).cast("int"))
    masked.groupBy(col("doc_id"), col("n_tok"))
      .agg(sum(col("m")).as("n_masked"), sum(col("bgn")).as("n_spans"))
      .withColumn("masked_ppt", expr("n_masked * 1000 div n_tok"))
      .select(col("doc_id"), col("n_tok"), col("n_masked"), col("n_spans"),
        col("masked_ppt"))
      .orderBy(col("doc_id").asc)
  }
  val q159Oracle: String = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    p AS (SELECT doc_id, len(toks) AS n_tok,
            unnest(generate_series(1, len(toks))) AS i
          FROM t WHERE len(toks) >= 1),
    s AS (SELECT doc_id, n_tok, i,
            CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                         CAST(i AS VARCHAR)), 1, 15))::BIGINT % 100 < 5
                 THEN 1 ELSE 0 END AS strt
          FROM p),
    m AS (SELECT doc_id, n_tok, i,
            MAX(strt) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS m
          FROM s),
    b AS (SELECT doc_id, n_tok, i, m,
            CASE WHEN m = 1 AND COALESCE(LAG(m) OVER
                   (PARTITION BY doc_id ORDER BY i), 0) = 0
                 THEN 1 ELSE 0 END AS bgn
          FROM m)
    SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(SUM(m) AS BIGINT) AS n_masked,
           CAST(SUM(bgn) AS BIGINT) AS n_spans,
           CAST(SUM(m) AS BIGINT) * 1000 // CAST(n_tok AS BIGINT) AS masked_ppt
    FROM b GROUP BY doc_id, n_tok ORDER BY doc_id ASC"""

  // ---------------------------------------------------------------------
  // q147 — the flagship end-to-end corpus build, five library stages in
  // ONE plan: quality filter (q31/q89) → exact dedup keep-min (q30) →
  // deterministic split, train only (q130) → global token offsets via the
  // distributed prefix-scan (q88) → 512-token chunks routed to shards
  // (q139/q134) → per-shard profile. Everything before the prefix-scan
  // is narrow or one hash shuffle (dedup agg + semi-join); the scan adds
  // its one data shuffle; chunk explosion is a generator. A user running
  // "corpus in, training shards out" touches exactly this composition —
  // the DuckDB oracle replays all five stages and must hash-match.
  def q147CorpusBuild(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        size(toks).cast("long").as("n_tok"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
    val quality = base.filter(col("n_tok") >= 20 &&
      col("n_distinct").cast("double") / col("n_tok").cast("double") >= 0.35)
    val keep = quality.groupBy(md5(col("text").cast("binary")).as("k"))
      .agg(min(col("doc_id")).as("doc_id"))
    val deduped = quality.join(keep.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val train = deduped.filter(
      substring(md5(concat(col("doc_id").cast("string"), lit("|split"))
        .cast("binary")), 1, 2) < "e6")
      .select(col("doc_id"), col("n_tok"))
    TextOps.withGlobalOffset(train, "doc_id", "n_tok", "off")
      .select(col("doc_id"), col("n_tok"),
        explode(sequence(expr("off DIV 512"),
          expr("(off + n_tok - 1) DIV 512"))).as("chunk"))
      .withColumn("shard", pmod(col("chunk"), lit(4L)).cast("int"))
      .groupBy(col("shard"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        countDistinct(col("chunk")).as("n_chunks"),
        sum(col("n_tok")).as("doc_chunk_tokens"))
      .orderBy(col("shard").asc)
  }
  val q147Oracle: String = """
    WITH base AS (
      SELECT doc_id, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
      FROM documents),
    quality AS (
      SELECT * FROM base
      WHERE n_tok >= 20
        AND CAST(n_distinct AS DOUBLE) / CAST(n_tok AS DOUBLE) >= 0.35),
    keep AS (SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
    train AS (
      SELECT doc_id, n_tok FROM quality
      WHERE doc_id IN (SELECT doc_id FROM keep)
        AND substr(md5(CAST(doc_id AS VARCHAR) || '|split'), 1, 2) < 'e6'),
    o AS (
      SELECT doc_id, n_tok,
             CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
      FROM train),
    ch AS (
      SELECT doc_id, n_tok,
             unnest(generate_series(off // 512, (off + n_tok - 1) // 512)) AS chunk
      FROM o)
    SELECT CAST(chunk % 4 AS INT) AS shard,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(DISTINCT chunk) AS n_chunks,
           CAST(SUM(n_tok) AS BIGINT) AS doc_chunk_tokens
    FROM ch GROUP BY shard ORDER BY shard ASC"""

  // q186 — packing-efficiency planner: for each candidate sequence
  // length L, the padding waste of the two packing policies a
  // pretraining run chooses between — pad-per-doc (each doc split into
  // ceil(n_tok/L) sequences, every tail padded) versus concat-then-chunk
  // (q88's policy: one virtual token stream, only the corpus tail pads).
  // This is the report a run reads to pick seq_len and policy BEFORE
  // committing GPU-hours: padded-policy waste falls as L shrinks while
  // sequence count (and attention-window truncation) rises, and the
  // crossover is a property of THIS corpus's length distribution, not a
  // universal constant. All-integer: sequence counts and padded tokens
  // are exact sums, waste is parts-per-thousand via one integer
  // division. Scale shape: ONE corpus scan; the candidate-L multiply is
  // a 5-row broadcast cross join; one partial agg → 5 result rows — at
  // 100 TB this costs exactly one token-count pass, which is why the
  // planner can run per corpus release.
  def q186PackingPlanner(spark: SparkSession, dir: String): DataFrame = {
    val lens = spark.createDataFrame(
      Seq(128L, 256L, 512L, 1024L, 2048L).map(Tuple1(_))).toDF("seq_len")
    Tables.documents(spark, dir)
      .select(size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      .crossJoin(broadcast(lens))
      .groupBy(col("seq_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        sum(expr("(n_tok + seq_len - 1) DIV seq_len")).as("padded_sequences"))
      .withColumn("padded_waste_permille", expr(
        "((padded_sequences * seq_len - total_tokens) * 1000)" +
          " DIV (padded_sequences * seq_len)"))
      .withColumn("packed_sequences",
        expr("(total_tokens + seq_len - 1) DIV seq_len"))
      .withColumn("packed_waste_permille", expr(
        "((packed_sequences * seq_len - total_tokens) * 1000)" +
          " DIV (packed_sequences * seq_len)"))
      .select(col("seq_len"), col("n_docs"), col("total_tokens"),
        col("padded_sequences"), col("padded_waste_permille"),
        col("packed_sequences"), col("packed_waste_permille"))
      .orderBy(col("seq_len").asc)
  }
  val q186Oracle: String = """
    WITH t AS (
      SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents),
    l AS (SELECT CAST(unnest([128, 256, 512, 1024, 2048]) AS BIGINT) AS seq_len),
    agg AS (
      SELECT seq_len, COUNT(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
             CAST(SUM((n_tok + seq_len - 1) // seq_len) AS BIGINT)
               AS padded_sequences
      FROM t CROSS JOIN l GROUP BY seq_len),
    p AS (
      SELECT *, (total_tokens + seq_len - 1) // seq_len AS packed_sequences
      FROM agg)
    SELECT seq_len, n_docs, total_tokens, padded_sequences,
      CAST(((padded_sequences * seq_len - total_tokens) * 1000)
        // (padded_sequences * seq_len) AS BIGINT) AS padded_waste_permille,
      CAST(packed_sequences AS BIGINT) AS packed_sequences,
      CAST(((packed_sequences * seq_len - total_tokens) * 1000)
        // (packed_sequences * seq_len) AS BIGINT) AS packed_waste_permille
    FROM p ORDER BY seq_len ASC"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q186_packing_planner" -> (q186PackingPlanner _),
    "q147_corpus_build" -> (q147CorpusBuild _),
    "q136_bpe_vocab" -> (q136BpeVocab _),
    "q139_pack_pipeline" -> (q139PackPipeline _),
    "q142_negative_sampling" -> (q142NegativeSampling _),
    "q145_vocab_encode" -> (q145VocabEncode _),
    "q146_content_chunking" -> (q146ContentChunking _),
    "q130_split_assign" -> (q130SplitAssign _),
    "q131_pii_redact" -> (q131PiiRedact _),
    "q132_segment_dedup" -> (q132SegmentDedup _),
    "q133_mixture_resample" -> (q133MixtureResample _),
    "q134_shard_dispatch" -> (q134ShardDispatch _),
    "q157_shard_manifest" -> (q157ShardManifest _),
    "q135_pair_counts" -> (q135PairCounts _),
    "q159_span_corruption" -> (q159SpanCorruption _),
    "q137_scd2_build" -> (q137Scd2Build _))

  val oracles: Map[String, String] = Map(
    "q186_packing_planner" -> q186Oracle,
    "q136_bpe_vocab" -> q136Oracle,
    "q139_pack_pipeline" -> q139Oracle,
    "q142_negative_sampling" -> q142Oracle,
    "q145_vocab_encode" -> q145Oracle,
    "q146_content_chunking" -> q146Oracle,
    "q147_corpus_build" -> q147Oracle,
    "q130_split_assign" -> q130Oracle,
    "q131_pii_redact" -> q131Oracle,
    "q132_segment_dedup" -> q132Oracle,
    "q133_mixture_resample" -> q133Oracle,
    "q134_shard_dispatch" -> q134Oracle,
    "q157_shard_manifest" -> q157Oracle,
    "q135_pair_counts" -> q135Oracle,
    "q159_span_corruption" -> q159Oracle,
    "q137_scd2_build" -> q137Oracle)
}
