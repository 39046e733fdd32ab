package graft

import org.apache.spark.sql.functions._

import graft.ingest.Sources
import graft.sink.Sinks

/** S6/S7 activation gate: no Kafka connector jar ships in this environment,
  * so the broker-facing paths are modeled wire-exactly over files/memory
  * (`Sinks.kafkaEnvelope` / `avroEnvelope` / `Sources.fromAvroEnvelope`).
  * This spec makes the stand-in claim — "the same frame feeds
  * `.format("kafka")` unchanged" — CHECKED rather than asserted in prose:
  *
  *  - the first test runs everywhere and pins the frames to the Kafka
  *    sink/source column contract (`key`, `value: binary`);
  *  - the second is gated on the connector class and CANCELS (not passes)
  *    while the jar is absent. The day `spark-sql-kafka-0-10` (and its
  *    kafka-clients dependency) lands on the classpath it runs as-is: real
  *    `.format("kafka")` reader wiring into the same decode path — no code
  *    changes, just the jar. */
class KafkaReadinessSpec extends SparkSpec {

  private val connectorPresent =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  test("envelope frames satisfy the Kafka sink/source column contract") {
    val ev = Sources.events(spark, sf("sf0.001"))
    // sink side: the Kafka writer requires `key`/`value` of string|binary
    val json = Sinks.kafkaEnvelope(ev)
      .select(col("kafka_key").cast("string").as("key"),
        col("kafka_value").cast("binary").as("value"))
    assert(json.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("key", "string"), ("value", "binary")))
    val avro = Sinks.avroEnvelope(ev)
      .select(col("kafka_key").cast("string").as("key"),
        col("kafka_value").as("value"))
    assert(avro.schema("value").dataType.typeName == "binary")
    // source side: a Kafka scan surfaces `value: binary`; the decode path
    // consumes exactly that shape and round-trips the typed fields
    val decoded = Sources.fromAvroEnvelope(
      avro.select(col("value").as("kafka_value")))
    assert(decoded.columns.toSeq ==
      Seq("event_id", "ts_us", "user_id", "event_type", "price"))
  }

  test("real .format(\"kafka\") wiring (activates when the connector jar appears)") {
    assume(connectorPresent,
      "spark-sql-kafka-0-10 is not on the classpath (this environment ships " +
        "no Kafka connector jar). To activate: add the spark-sql-kafka-0-10 " +
        "and kafka-clients jars — this test then exercises the real source.")
    // the Kafka source's fixed schema carries binary key/value; no broker
    // connection happens until a stream starts, so wiring is checkable here
    val reader = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", "localhost:9092")
      .option("subscribe", "events")
      .load()
    assert(reader.schema("key").dataType.typeName == "binary")
    assert(reader.schema("value").dataType.typeName == "binary")
    val decoded = Sources.fromAvroEnvelope(
      reader.select(col("value").as("kafka_value")))
    assert(decoded.columns.contains("event_id"))
  }
}
