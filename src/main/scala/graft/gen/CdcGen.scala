package graft.gen

import scala.util.Random

/** Deterministic re-implementation of the reference's data-generator Lambda
  * (ref lib/lambda/index.ts:15-126) — the fixture factory for all pipeline
  * tests. Seeded `Random` replaces Math.random/uuidv4; shapes and value
  * distributions mirror the Lambda exactly.
  */
object CdcGen {

  /** The connector record shape (ref scripts/setup_redshift.sh:91-104):
    * the stream's transport metadata as columns beside the opaque
    * `kinesis_data` payload blob. Field names match the external
    * schema's column names verbatim. */
  final case class KinesisRecord(
      kinesis_data: Array[Byte],
      approximate_arrival_timestamp: java.sql.Timestamp,
      partition_key: String,
      shard_id: String,
      sequence_number: String)

  val memberNames: Seq[String] = Seq( // ref lib/lambda/index.ts:41-50
    "Liam", "Olivia", "Noah", "Emma", "Oliver", "Charlotte", "Elijah", "Amelia")
  val questNames: Seq[String] = Seq( // ref lib/lambda/index.ts:71-75
    "30 minutes of exercise", "Walk 10,000 steps", "Walk 100,000 steps")

  final case class Item(pk: String, sk: String, attrs: Map[String, Either[String, Double]]) {
    def attrJson: String = {
      val base = Seq(s""""pk": {"S": "$pk"}""", s""""sk": {"S": "$sk"}""")
      val extra = attrs.toSeq.sortBy(_._1).map {
        case (k, Left(s))  => s""""$k": {"S": "$s"}"""
        case (k, Right(n)) => s""""$k": {"N": "$n"}"""
      }
      (base ++ extra).mkString("{", ", ", "}")
    }
  }

  final class Gen(seed: Long) {
    private val rnd = new Random(seed)
    private var eventCounter = 0L

    /** Lowercase uuid-v4-shaped id (ref lambda uuidv4(); deterministic). */
    def uuid(): String = {
      val bytes = Array.fill(16)(rnd.nextInt(256))
      bytes(6) = (bytes(6) & 0x0f) | 0x40
      bytes(8) = (bytes(8) & 0x3f) | 0x80
      val h = bytes.map(b => f"$b%02x").mkString
      s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-${h.substring(16, 20)}-${h.substring(20)}"
    }

    /** Uppercase variant (scripts use `uuidgen`, ref scripts/create_member.sh:21)
      * — exercises the LTRIM edge of SURVEY.md §2.8a. */
    def uuidUpper(): String = uuid().toUpperCase

    /** dollarsEarned: uniform [1,100) floored to 2 decimals
      * (ref lib/lambda/index.ts:60-68). */
    def dollars(): Double = math.floor((1 + rnd.nextDouble() * 99) * 100) / 100

    def member(upper: Boolean = false): Item = {
      val id = if (upper) uuidUpper() else uuid()
      Item(s"M_$id", memberNames(rnd.nextInt(memberNames.size)),
        Map("memberId" -> Left(id)))
    }

    def quest(): Item = {
      val id = uuid()
      Item(s"Q_$id", questNames(rnd.nextInt(questNames.size)), Map("questId" -> Left(id)))
    }

    def memberQuest(memberId: String, questId: String): Item = {
      val id = uuid()
      Item(s"MQ#M_$memberId", s"MQ_$id",
        Map("questId" -> Left(questId), "dollarsEarned" -> Right(dollars())))
    }

    /** One CDC change-record JSON line (FIXTURES.md §2 envelope; transport
      * metadata as sibling fields). `tsMs` is ApproximateCreationDateTime. */
    def envelope(eventName: String, item: Item, tsMs: Long,
        arrivalMs: Long = -1): String = {
      eventCounter += 1
      val arrival = if (arrivalMs >= 0) arrivalMs else tsMs + 120
      val arrivalTs = java.time.Instant.ofEpochMilli(arrival).toString
      s"""{"approximate_arrival_timestamp": "$arrivalTs", "partition_key": "${item.pk}", "shard_id": "shardId-000000000000", "sequence_number": "${f"$eventCounter%020d"}", ${payloadBody(eventName, item, tsMs)}}"""
    }

    /** The DynamoDB-stream fields alone — what actually travels INSIDE a
      * Kinesis record's data blob (ref scripts/setup_redshift.sh:95-103
      * parses these out of `kinesis_data`; :91-94's metadata is the
      * connector's, never the payload's). */
    private def payloadBody(eventName: String, item: Item, tsMs: Long): String = {
      val newImage =
        if (eventName == "REMOVE") "" else s""", "NewImage": ${item.attrJson}"""
      val oldImage =
        if (eventName == "INSERT") "" else s""", "OldImage": ${item.attrJson}"""
      s""""eventID": "${uuid().replace("-", "").substring(0, 24)}", "awsRegion": "us-east-1", "eventName": "$eventName", "userIdentity": null, "tableName": "activity-tracking", "eventSource": "aws:dynamodb", "dynamodb": {"ApproximateCreationDateTime": $tsMs, "Keys": {"pk": {"S": "${item.pk}"}, "sk": {"S": "${item.sk}"}}$newImage$oldImage}"""
    }

    /** One connector-shaped record: metadata as FIELDS next to the opaque
      * UTF-8 payload — the frame a real Kinesis connector hands over
      * ([[graft.streaming.KinesisRecordCdcSource]]'s input shape). */
    def kinesisRecord(eventName: String, item: Item, tsMs: Long,
        arrivalMs: Long = -1): CdcGen.KinesisRecord = {
      eventCounter += 1
      val arrival = if (arrivalMs >= 0) arrivalMs else tsMs + 120
      CdcGen.KinesisRecord(
        s"{${payloadBody(eventName, item, tsMs)}}"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8),
        new java.sql.Timestamp(arrival),
        item.pk, "shardId-000000000000", f"$eventCounter%020d")
    }

    /** Export file line (FIXTURES.md §3). */
    def exportLine(item: Item): String = s"""{"Item": ${item.attrJson}}"""

    /** One Lambda tick: member + quest + memberQuest referencing them
      * (ref lib/lambda/index.ts:15-38). Returns the three items. */
    def tick(): (Item, Item, Item) = {
      val m = member()
      val q = quest()
      val mq = memberQuest(m.attrs("memberId").swap.getOrElse(""), q.attrs("questId").swap.getOrElse(""))
      (m, q, mq)
    }
  }
}
