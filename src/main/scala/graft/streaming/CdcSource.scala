package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, from_json, when}
import org.apache.spark.sql.types.StringType

import graft.model.CdcSchemas

/** Pluggable CDC transport: anything that can surface a STREAMING
  * DataFrame of change-record envelopes.
  *
  * Contract (what [[CdcStream]] relies on, nothing more):
  *   - `load` returns a streaming frame with [[CdcSchemas.envelope]]'s
  *     columns plus a nullable `_corrupt_record` string column;
  *   - a record whose payload failed to parse carries its raw payload in
  *     `_corrupt_record` (envelope columns null) — the stream quarantines
  *     it; clean records have `_corrupt_record` null;
  *   - replay/exactly-once bookkeeping is the SOURCE's concern (file
  *     offsets, Kinesis sequence numbers…); the merge is additionally
  *     idempotent under replays via the target watermark (§2.8c), so an
  *     at-least-once source is sufficient.
  *
  * The reference binds this seam to Kinesis (ref scripts/setup_redshift.sh
  * :79-104 — the external-schema + MV binding); this repo ships two
  * transports and a production Kinesis connector is a third implementation
  * of the same trait: wrap the connector's streaming frame (payload bytes →
  * string) in [[PayloadCdcSource.parse]] and done — the merge, quarantine,
  * and watermark machinery never change.
  */
trait CdcSource {
  def load(spark: SparkSession): DataFrame
}

object CdcSource {
  /** Column carrying the raw payload of unparseable records. */
  val CorruptCol = "_corrupt_record"

  private[streaming] def envelopeWithCorrupt =
    CdcSchemas.envelope.add(CorruptCol, StringType)
}

/** Envelope-JSON files in a directory — the sandbox stand-in for the
  * Kinesis stream (same envelope, file-offset bookkeeping instead of
  * shard iterators).
  *
  * `maxFilesPerTrigger` rate-limits backfill: an unbounded file source
  * would deliver a whole outage's backlog as ONE micro-batch (see
  * [[CdcStream.start]]'s ordering caveat for when capping is safe).
  */
final case class FileCdcSource(inputDir: String,
    maxFilesPerTrigger: Option[Int] = None) extends CdcSource {
  def load(spark: SparkSession): DataFrame = {
    val reader = spark.readStream
      .schema(CdcSource.envelopeWithCorrupt)
      .option("columnNameOfCorruptRecord", CdcSource.CorruptCol)
    maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .json(inputDir)
  }
}

/** Raw-payload stream source: any streaming Dataset[String] of JSON
  * payloads, parsed in the plan. This is the structural shape of a real
  * Kinesis/Kafka connector — records arrive as opaque payloads
  * (`data: binary` → cast string) and the envelope parse is a projection,
  * not a file-reader option. Backed by a MemoryStream in tests, which is
  * what proves the [[CdcSource]] seam is pluggable rather than rhetorical.
  */
final case class PayloadCdcSource(payloads: Dataset[String]) extends CdcSource {
  def load(spark: SparkSession): DataFrame =
    PayloadCdcSource.parse(payloads.toDF("payload"), "payload")
}

/** The literal wire shape of the reference's Kinesis binding — an opaque
  * `data: binary` column decoded to UTF-8 before the envelope parse
  * (`from_varbyte(kinesis_data, 'utf-8')`, ref scripts/setup_redshift.sh
  * :95). Spark's binary→string cast IS the UTF-8 decode, so the decode is
  * one codegen'd projection in the plan; everything after it is
  * [[PayloadCdcSource.parse]] verbatim. This is P3's streaming leg: a real
  * Kinesis/Kafka connector's record frame plugs in here unchanged.
  */
final case class BinaryPayloadCdcSource(payloads: Dataset[Array[Byte]])
    extends CdcSource {
  def load(spark: SparkSession): DataFrame =
    PayloadCdcSource.parse(
      payloads.toDF("data")
        .select(col("data").cast(StringType).as("payload")),
      "payload")
}

/** The WHOLE connector record of the reference's Kinesis binding — not
  * just the payload wire shape ([[BinaryPayloadCdcSource]]) but the
  * record frame an actual connector (spark-sql-kinesis, a Kafka source)
  * hands over: transport metadata as COLUMNS
  * (`approximate_arrival_timestamp`, `partition_key`, `shard_id`,
  * `sequence_number` — ref scripts/setup_redshift.sh:91-94 reads these
  * from the stream itself) beside the opaque `kinesis_data` binary blob,
  * whose JSON carries ONLY the DynamoDB stream fields (:95-103 parses
  * exactly those out of the blob). The metadata columns pass through
  * verbatim into the envelope; the blob is UTF-8-decoded (one codegen'd
  * cast ≈ `from_varbyte(kinesis_data,'utf-8')`) and parsed with the same
  * three-shape corrupt normalization as [[PayloadCdcSource.parse]]. A
  * poison blob quarantines with its raw text; its metadata columns stay
  * populated (the connector synthesized them — they are never poison),
  * so the quarantine row is still attributable to a shard + sequence.
  *
  * `records` may be a MemoryStream frame (tests), a rate-source mapping,
  * or a real connector's output — the downstream merge never knows.
  */
final case class KinesisRecordCdcSource(records: DataFrame) extends CdcSource {
  def load(spark: SparkSession): DataFrame = {
    val corrupt = CdcSource.CorruptCol
    val payloadWithCorrupt = CdcSchemas.streamPayload.add(corrupt, StringType)
    val parsed = records.select(
      col("approximate_arrival_timestamp"), col("partition_key"),
      col("shard_id"), col("sequence_number"),
      col("kinesis_data").cast(StringType).as("_raw"))
      .select(col("*"),
        from_json(col("_raw"), payloadWithCorrupt,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> corrupt)).as("e"))
    val pCols = CdcSchemas.streamPayload.fieldNames.toSeq.map(f => col(s"e.$f"))
    val allPayloadNull = pCols.map(_.isNull).reduce(_ && _)
    parsed.select(
      Seq(col("approximate_arrival_timestamp"), col("partition_key"),
        col("shard_id"), col("sequence_number")) ++ pCols :+
        coalesce(col(s"e.$corrupt"),
          when(col("e").isNull || allPayloadNull, col("_raw")))
          .as(corrupt): _*)
  }
}

object PayloadCdcSource {
  /** Parse a payload-string column into the envelope-plus-corrupt contract.
    * `from_json` in PERMISSIVE mode signals malformed input in one of
    * THREE version-dependent shapes (SPARK-25243 lineage): a null struct,
    * a struct with the corrupt field populated, or — the trap — a
    * non-null struct with every field null and the corrupt field EMPTY.
    * All three are normalized to "envelope columns null, raw payload in
    * `_corrupt_record`": a payload that produced no envelope data at all
    * is quarantined rather than silently dropped by the merge, regardless
    * of which shape this Spark version emits. A production connector
    * reuses this verbatim on its own frame. */
  def parse(df: DataFrame, payloadCol: String): DataFrame =
    parseKeeping(df, payloadCol, Nil)

  /** [[parse]], carrying `keep` columns through unchanged — the shape
    * [[graft.pipeline.Pipeline.replayQuarantine]] needs: a replayed line
    * that STILL fails to parse must return to the quarantine with its
    * ORIGINAL raw text and capture metadata, which the envelope-only
    * projection would drop. */
  def parseKeeping(df: DataFrame, payloadCol: String,
      keep: Seq[String]): DataFrame = {
    val parsed = df.select(
      from_json(col(payloadCol), CdcSource.envelopeWithCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CdcSource.CorruptCol)).as("e") +:
      col(payloadCol).as("_raw") +:
      keep.map(col): _*)
    val envCols = CdcSchemas.envelope.fieldNames.toSeq.map(f => col(s"e.$f"))
    val allEnvNull = envCols.map(_.isNull).reduce(_ && _)
    parsed.select((envCols :+
      coalesce(col(s"e.${CdcSource.CorruptCol}"),
        when(col("e").isNull || allEnvNull, col("_raw")))
        .as(CdcSource.CorruptCol)) ++ keep.map(col): _*)
  }
}
