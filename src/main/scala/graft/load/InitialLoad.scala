package graft.load

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.CdcSchemas
import graft.sync.Merge.stripPrefix

/** COPY micro-option parity (ref initial_load_from_export.sh:168):
  * `COPY … ACCEPTINVCHARS ' ' TRUNCATECOLUMNS TRIMBLANKS`. Post-read
  * equivalents over the export's string attributes, behind an explicit
  * opt-in — the DEFAULT path applies none of them, because a valid
  * export needs none and each option REWRITES data:
  *   - ACCEPTINVCHARS c — Redshift replaces each invalid-UTF-8 byte
  *     with c at load. Spark's JSON reader has already decoded the
  *     bytes by the time we see a string, turning each invalid SEQUENCE
  *     into U+FFFD — so the post-read equivalent maps U+FFFD → c.
  *     (Byte-level parity caveat, documented not hidden: one 3-byte
  *     invalid sequence is ONE U+FFFD here but THREE replacement chars
  *     in Redshift.)
  *   - TRIMBLANKS — strip trailing spaces (Redshift trims trailing
  *     blanks from VARCHAR at load): `rtrim`.
  *   - TRUNCATECOLUMNS — cap at the target's VARCHAR width. On the
  *     reference's load this is a NO-OP: the COPY target is the
  *     one-SUPER-column dump_table (create_dynamo_export_table.sql:3),
  *     which has no width; real truncation in the reference happens at
  *     the MV's `::varchar(n)` casts, covered by q11. The knob exists
  *     here for VARCHAR-target parity and is off in [[CopyOptions.reference]].
  */
final case class CopyOptions(
    acceptInvChars: Option[String] = None,
    trimBlanks: Boolean = false,
    truncateColumns: Option[Int] = None) {
  /** Apply the enabled options to one string column, in COPY's order:
    * invalid-char replacement (load-time byte fix) → trailing-blank
    * trim → width truncation. */
  def apply(c: Column): Column = {
    val inv = acceptInvChars.fold(c)(r =>
      regexp_replace(c, lit("\uFFFD"), lit(r)))
    val trimmed = if (trimBlanks) rtrim(inv) else inv
    truncateColumns.fold(trimmed)(n => substring(trimmed, 1, n))
  }
}

object CopyOptions {
  /** No rewriting — the default load path. */
  val none: CopyOptions = CopyOptions()
  /** The reference COPY's exact effective option set
    * (initial_load_from_export.sh:168): ACCEPTINVCHARS ' ', TRIMBLANKS;
    * TRUNCATECOLUMNS is present in the command but a no-op against the
    * SUPER dump column (see class doc), so it stays None. */
  val reference: CopyOptions =
    CopyOptions(acceptInvChars = Some(" "), trimBlanks = true)
}

/** Batch initial load from a DynamoDB PITR export
  * (ref scripts/initial_load_from_export.sh:150-205, sql/initial_load_*.sql).
  *
  * The reference COPYs gzipped DYNAMODB_JSON into a one-column SUPER
  * `dump_table` and routes rows into the three targets by pk prefix with
  * three INSERT..SELECTs. Spark: one `spark.read.json` (gzip transparent),
  * three prefix-filtered projections — a single scan per entity, with the
  * pk-prefix filter pushed into the reader.
  *
  * Every loaded row is stamped `eventName='INITIAL_LOAD'` and
  * `approximateUpdateTimestamp = loadTime` (load wall-clock, NOT item
  * creation time — deliberate reference semantics, SURVEY.md §2.8g,
  * ref sql/initial_load_members.sql:5-7): the post-load watermark is the
  * load time, and incremental sync only applies strictly newer changes.
  */
object InitialLoad {

  /** Read export JSON-lines (`{"Item": {...}}` per line; .gz transparent). */
  def readExport(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(CdcSchemas.exportLine).json(path)

  private def attr(name: String, field: String) = col("Item")(name)(field)

  /** Route + transform, one entity (ref sql/initial_load_members.sql:1-11). */
  def members(dump: DataFrame, loadTime: Timestamp): DataFrame =
    members(dump, loadTime, CopyOptions.none)

  /** COPY applies its options BEFORE routing, so the parity path filters
    * on the rewritten pk (prefix semantics of `LIKE 'M^_%' ESCAPE '^'`);
    * the default path keeps the LIKE-with-escape expression so the
    * pushed-down filter shape (P7) is unchanged. */
  def members(dump: DataFrame, loadTime: Timestamp, opts: CopyOptions)
      : DataFrame = {
    val pk = opts(attr("pk", "S"))
    val routed =
      if (opts == CopyOptions.none)
        dump.filter(expr("Item['pk']['S'] LIKE 'M^_%' ESCAPE '^'"))
      else dump.filter(pk.startsWith("M_"))
    routed.select(
      stripPrefix(pk, "M_").as("memberId"),
      opts(attr("sk", "S")).as("memberName"),
      lit(loadTime).as("approximateUpdateTimestamp"),
      lit(loadTime).as("syncTimestamp"))
  }

  def quests(dump: DataFrame, loadTime: Timestamp): DataFrame =
    quests(dump, loadTime, CopyOptions.none)

  def quests(dump: DataFrame, loadTime: Timestamp, opts: CopyOptions)
      : DataFrame = {
    val pk = opts(attr("pk", "S"))
    val routed =
      if (opts == CopyOptions.none)
        dump.filter(expr("Item['pk']['S'] LIKE 'Q^_%' ESCAPE '^'"))
      else dump.filter(pk.startsWith("Q_"))
    routed.select(
      stripPrefix(pk, "Q_").as("questId"),
      opts(attr("sk", "S")).as("questName"),
      lit(loadTime).as("approximateUpdateTimestamp"),
      lit(loadTime).as("syncTimestamp"))
  }

  /** ref sql/initial_load_member_quests.sql:1-13; `dollarsEarned` arrives
    * as `{"N": "55.25"}` → explicit double cast (`::float` in the ref).
    * COPY options touch only string attributes — the N value is numeric
    * either way (a trailing blank is cast-benign on both engines). */
  def memberQuests(dump: DataFrame, loadTime: Timestamp): DataFrame =
    memberQuests(dump, loadTime, CopyOptions.none)

  def memberQuests(dump: DataFrame, loadTime: Timestamp, opts: CopyOptions)
      : DataFrame = {
    val pk = opts(attr("pk", "S"))
    val routed =
      if (opts == CopyOptions.none)
        dump.filter(col("Item")("pk")("S").like("MQ#%"))
      else dump.filter(pk.startsWith("MQ#"))
    routed.select(
      stripPrefix(opts(attr("sk", "S")), "MQ_").as("memberQuestId"),
      stripPrefix(pk, "MQ#M_").as("memberId"),
      opts(attr("questId", "S")).as("questId"),
      attr("dollarsEarned", "N").cast("double").as("dollarsEarned"),
      lit(loadTime).as("approximateUpdateTimestamp"),
      lit(loadTime).as("syncTimestamp"))
  }

  /** All three targets from one export read. */
  def loadAll(spark: SparkSession, path: String, loadTime: Timestamp,
      opts: CopyOptions = CopyOptions.none): Map[String, DataFrame] = {
    val dump = readExport(spark, path)
    Map(
      "member" -> members(dump, loadTime, opts),
      "quest" -> quests(dump, loadTime, opts),
      "member_quest" -> memberQuests(dump, loadTime, opts))
  }
}
