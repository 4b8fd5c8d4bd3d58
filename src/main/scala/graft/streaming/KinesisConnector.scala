package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{BinaryType, StringType, TimestampType}

/** The LIVE Kinesis binding: the reference's production transport
  * (ref scripts/setup_redshift.sh:79-104 binds a Kinesis stream through
  * an external schema + MV; here the same stream arrives through a
  * Spark structured-streaming Kinesis connector) adapted onto the
  * [[KinesisRecordCdcSource]] record contract, which the whole
  * merge/quarantine/watermark pipeline is already parity-tested
  * against.
  *
  * Two public connectors serve Spark structured streaming, both
  * emitting the same record shape (an opaque `data: binary` payload
  * beside transport metadata columns):
  *
  *   - `aws-kinesis` — awslabs/spark-sql-kinesis-connector
  *     (`spark-streaming-sql-kinesis-connector`): columns `data`,
  *     `streamName`, `partitionKey`, `sequenceNumber`,
  *     `approximateArrivalTimestamp`;
  *   - `kinesis` — the qubole/spark-sql-kinesis lineage (maintained
  *     forks publish for Scala 2.13): same columns plus `shardId`.
  *
  * Neither artifact ships in this environment (zero egress), and none
  * is needed to COMPILE this file: `format("aws-kinesis")` resolves the
  * connector by name at RUNTIME from the application classpath — the
  * deployment adds the connector jar (`--packages`/cluster libs); this
  * sandbox never calls [[KinesisLiveCdcSource.load]]. Everything that
  * CAN run without the jar — the column adaptation and the downstream
  * envelope parse, merge, and quarantine — is exercised against the
  * shared connector-record fixtures (KinesisConnectorSpec,
  * PipelineSpec's Kinesis-record seam tests).
  */
object KinesisConnectorAdapter {

  /** Adapt a connector-emitted record frame (either connector's column
    * names) to [[KinesisRecordCdcSource]]'s contract columns:
    * `kinesis_data`, `approximate_arrival_timestamp`, `partition_key`,
    * `shard_id`, `sequence_number`. Matching is by presence: `shardId`
    * passes through when the connector provides it (qubole lineage) and
    * is a typed null otherwise (the awslabs connector does not expose
    * the shard — the envelope keeps the column so downstream SQL never
    * forks on transport). Unknown extra columns are dropped; missing
    * REQUIRED columns fail fast with the column name. */
  def adapt(records: DataFrame): DataFrame = {
    val have = records.columns.toSet
    def need(c: String) = {
      require(have(c), s"connector record frame is missing column '$c' " +
        s"(have: ${records.columns.sorted.mkString(", ")})")
      col(c)
    }
    val shard =
      if (have("shardId")) col("shardId").cast(StringType)
      else lit(null).cast(StringType)
    records.select(
      need("data").cast(BinaryType).as("kinesis_data"),
      need("approximateArrivalTimestamp").cast(TimestampType)
        .as("approximate_arrival_timestamp"),
      need("partitionKey").cast(StringType).as("partition_key"),
      shard.as("shard_id"),
      need("sequenceNumber").cast(StringType).as("sequence_number"))
  }
}

/** [[CdcSource]] over a live Kinesis stream through a structured-
  * streaming connector. `format` is the connector's registered source
  * name (`"aws-kinesis"` for the awslabs connector, `"kinesis"` for the
  * qubole lineage); `options` carry the connector's own configuration
  * (stream name/ARN, region, endpoint, starting position, credentials
  * provider — each connector documents its keys). The returned frame is
  * the adapted record stream through the same envelope parse as every
  * other transport, so merge semantics, quarantine, and watermark
  * replay-safety are the ones the fixtures already pin. */
final case class KinesisLiveCdcSource(format: String,
    options: Map[String, String]) extends CdcSource {
  def load(spark: SparkSession): DataFrame =
    KinesisRecordCdcSource(
      KinesisConnectorAdapter.adapt(
        spark.readStream.format(format).options(options).load()))
      .load(spark)
}
