package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.CdcSchemas

/** The extraction view — Spark equivalent of the reference's materialized
  * view over the Kinesis stream (ref scripts/setup_redshift.sh:89-106).
  *
  * The reference decodes the raw record (`from_varbyte(kinesis_data,
  * 'utf-8')`), pulls eight typed columns with `json_extract_path_text`,
  * and keeps the `dynamodb` body as a SUPER `eventData`. Here the stream
  * arrives as JSON lines already matching [[CdcSchemas.envelope]]; a typed
  * struct replaces SUPER (schema known, Catalyst prunes it), and the same
  * projection works identically on a batch or streaming DataFrame — each
  * micro-batch ≈ one `REFRESH MATERIALIZED VIEW`.
  */
object Extraction {

  /** Parse raw JSON-line records (one string column `value`) into the
    * envelope. Used when the source is a raw text stream; `spark.read
    * .schema(envelope).json(dir)` skips this. */
  def parseRaw(raw: DataFrame): DataFrame = {
    val parsed = raw.select(from_json(col("value"), CdcSchemas.envelope).as("r"))
    parsed.select(col("r.*"))
  }

  /** Envelope → member_quest_data_extract columns
    * (ref scripts/setup_redshift.sh:91-104, column-for-column). */
  def extract(envelope: DataFrame): DataFrame = {
    envelope.select(
      col("approximate_arrival_timestamp").as("approximatearrivaltimestamp"),
      col("partition_key").as("partitionkey"),
      col("shard_id").as("shardid"),
      col("sequence_number").as("sequencenumber"),
      // varchar(30/20/50) truncation is load-protocol noise in the
      // reference (TRUNCATECOLUMNS); lengths never exceed the limits for
      // real envelopes, so plain strings here (SURVEY.md §1.2).
      col("eventID"),
      col("awsRegion"),
      col("eventName"),
      col("userIdentity"),
      col("tableName"),
      col("eventSource"),
      col("dynamodb.Keys.pk.S").as("pk"),
      col("dynamodb.Keys.sk.S").as("sk"),
      col("dynamodb").as("eventData"))
  }

  /** AttributeValue string field at `name` inside eventData.NewImage. */
  def imgS(name: String): Column = col("eventData.NewImage")(name)("S")

  /** AttributeValue numeric field (arrives as string → cast double,
    * mirroring `."N"::float`). */
  def imgN(name: String): Column = col("eventData.NewImage")(name)("N").cast("double")

  /** Epoch-ms event time → whole-second timestamp, reproducing the
    * reference's integer-division truncation
    * `TIMESTAMP 'epoch' + (ms::BIGINT/1000) * INTERVAL '1 second'`
    * (ref sql/incremental_sync_members.sql:28). */
  def eventTime: Column =
    timestamp_seconds(expr("eventData.ApproximateCreationDateTime DIV 1000"))
}
