package graft

import graft.streaming.EcommerceStreamJob
import graft.streaming.EcommerceStreamJob.JobConfig

/** S1 (Kafka source) — as far as an offline sandbox allows, in BOTH
  * environments (round-4 verdict task #3):
  *
  *  - connector jar PRESENT (any standard Spark distribution with Kafka
  *    support): `kafkaSource` must actually resolve through the
  *    connector and expose the documented Kafka record schema. No
  *    broker is needed for this — source resolution and schema are
  *    connector-side; broker I/O begins at query start.
  *  - connector jar ABSENT (this build environment): the failure mode
  *    must be the standard "failed to find data source" guidance, and
  *    the test documents the gap loudly instead of silently skipping.
  *
  * Independent of the jar, every option we pass is cross-checked
  * against the connector's documented reader-option surface (Structured
  * Streaming + Kafka Integration Guide for Spark 4.x), so a typo'd or
  * renamed option can never hide behind the option-map indirection.
  * Deployment runbook for a real broker: README.md §"Running against
  * Kafka".
  */
class KafkaIntegrationSpec extends SparkSpec {

  private def connectorPresent: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  private val cfg = JobConfig(checkpointRoot = "/tmp/graft-kafka-it",
    kafkaServers = "k1:9092,k2:9092", topic = "financial_transactions")

  /** Reader options documented by the spark-sql-kafka-0-10 integration
    * guide (source side). `kafka.`-prefixed keys are passed through to
    * the Kafka consumer config, which the guide documents as the
    * supported escape hatch — validated separately below. */
  private val documentedSourceKeys = Set(
    "assign", "subscribe", "subscribePattern",
    "startingOffsets", "endingOffsets",
    "startingOffsetsByTimestamp", "endingOffsetsByTimestamp",
    "startingTimestamp", "endingTimestamp",
    "startingOffsetsByTimestampStrategy",
    "maxOffsetsPerTrigger", "minOffsetsPerTrigger", "maxTriggerDelay",
    "failOnDataLoss", "kafkaConsumer.pollTimeoutMs",
    "fetchOffset.numRetries", "fetchOffset.retryIntervalMs",
    "maxPartitionFetchBytes", "minPartitionsPerTrigger", "minPartitions",
    "groupIdPrefix", "includeHeaders")

  /** Kafka consumer configs we pass through the `kafka.` prefix — these
    * are ConsumerConfig names, documented in Kafka itself. */
  private val documentedConsumerKeys = Set("bootstrap.servers", "group.id")

  test("every option kafkaSource passes is a documented connector/consumer option") {
    val opts = EcommerceStreamJob.kafkaSourceOptions(cfg.copy(groupId = "acl-group"))
    val (passthrough, native) = opts.keySet.partition(_.startsWith("kafka."))
    val unknownNative = native.diff(documentedSourceKeys)
    assert(unknownNative.isEmpty,
      s"undocumented source options: $unknownNative")
    val unknownConsumer = passthrough.map(_.stripPrefix("kafka."))
      .diff(documentedConsumerKeys)
    assert(unknownConsumer.isEmpty,
      s"undocumented kafka.* consumer passthroughs: $unknownConsumer")
    // exactly one subscription strategy — assign/subscribe/subscribePattern
    // are mutually exclusive per the guide
    assert(opts.keySet.intersect(Set("assign", "subscribe", "subscribePattern"))
      .size === 1)
  }

  test("startingOffsets value is a documented literal") {
    // the guide allows "earliest", "latest" (streaming default), or a
    // per-partition JSON object; we only ever emit the two literals
    val allowed = Set("earliest", "latest")
    assert(allowed(EcommerceStreamJob.kafkaSourceOptions(cfg)("startingOffsets")))
    assert(allowed(EcommerceStreamJob
      .kafkaSourceOptions(cfg.copy(startingOffsets = "earliest"))("startingOffsets")))
  }

  if (connectorPresent) {
    test("connector PRESENT: kafkaSource resolves and exposes the documented Kafka schema") {
      val df = EcommerceStreamJob.kafkaSource(spark, cfg)
      assert(df.isStreaming)
      // the fixed source schema from the integration guide
      assert(df.schema.fieldNames.toSet === Set(
        "key", "value", "topic", "partition", "offset",
        "timestamp", "timestampType"))
      assert(df.schema("value").dataType ===
        org.apache.spark.sql.types.BinaryType)
      // the whole job topology must also plan over the real source
      // (parse = cast value + JSON bind happens before any broker I/O)
      val parsed = EcommerceStreamJob.parse(
        df.selectExpr("CAST(value AS STRING) AS value"))
      assert(parsed.isStreaming)
      assert(parsed.schema.fieldNames.contains("transactionId"))
    }
  } else {
    test("connector ABSENT (this sandbox): kafka format fails with the standard guidance") {
      val e = intercept[Exception] {
        EcommerceStreamJob.kafkaSource(spark, cfg)
      }
      // Spark's error for a missing source names the format and points
      // at the deployment section — the failure a real user must see,
      // not a silent pass. The Kafka EXECUTION path is untested here by
      // environment necessity; README §"Running against Kafka" is the
      // runbook, and this branch flips to the resolution test above on
      // any classpath that carries the connector.
      val msg = e.getMessage.toLowerCase
      assert(msg.contains("kafka"))
      assert(msg.contains("find") || msg.contains("failed") ||
        msg.contains("provider"))
    }
  }
}
