package graft.load

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.CdcSchemas
import graft.sync.Merge.stripPrefix

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
    dump.filter(expr("Item['pk']['S'] LIKE 'M^_%' ESCAPE '^'"))
      .select(
        stripPrefix(attr("pk", "S"), "M_").as("memberId"),
        attr("sk", "S").as("memberName"),
        lit(loadTime).as("approximateUpdateTimestamp"),
        lit(loadTime).as("syncTimestamp"))

  def quests(dump: DataFrame, loadTime: Timestamp): DataFrame =
    dump.filter(expr("Item['pk']['S'] LIKE 'Q^_%' ESCAPE '^'"))
      .select(
        stripPrefix(attr("pk", "S"), "Q_").as("questId"),
        attr("sk", "S").as("questName"),
        lit(loadTime).as("approximateUpdateTimestamp"),
        lit(loadTime).as("syncTimestamp"))

  /** ref sql/initial_load_member_quests.sql:1-13; `dollarsEarned` arrives
    * as `{"N": "55.25"}` → explicit double cast (`::float` in the ref). */
  def memberQuests(dump: DataFrame, loadTime: Timestamp): DataFrame =
    dump.filter(col("Item")("pk")("S").like("MQ#%"))
      .select(
        stripPrefix(attr("sk", "S"), "MQ_").as("memberQuestId"),
        stripPrefix(attr("pk", "S"), "MQ#M_").as("memberId"),
        attr("questId", "S").as("questId"),
        attr("dollarsEarned", "N").cast("double").as("dollarsEarned"),
        lit(loadTime).as("approximateUpdateTimestamp"),
        lit(loadTime).as("syncTimestamp"))

  /** All three targets from one export read. */
  def loadAll(spark: SparkSession, path: String, loadTime: Timestamp)
      : Map[String, DataFrame] = {
    val dump = readExport(spark, path)
    Map(
      "member" -> members(dump, loadTime),
      "quest" -> quests(dump, loadTime),
      "member_quest" -> memberQuests(dump, loadTime))
  }
}
