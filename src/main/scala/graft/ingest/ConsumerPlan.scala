package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** The reference consumer's streaming transform plan (SURVEY.md §2.3/§2.4,
  * P1–P4 + J1), as a pure `DataFrame => DataFrame` so the identical plan runs
  * on a Kafka stream, a MemoryStream, or a batch frame in tests.
  *
  * Input contract = the Kafka envelope (`spark/consumer.py:132-135`):
  * `key: binary, value: binary, timestamp: timestamp`.
  */
object ConsumerPlan {

  /** P1/P2/J1: cast envelope, decode JSON value with the explicit document
    * schema (malformed JSON → null struct, PERMISSIVE — reference
    * `spark/consumer.py:134`).
    */
  def decodeEnvelope(df: DataFrame): DataFrame =
    df.select(
      col("key").cast("string").as("kafka_key"),
      from_json(col("value").cast("string"), Schemas.document).as("data"),
      col("timestamp").as("kafka_timestamp")
    )

  /** P3: flatten `data.*`; P4: conjunctive null-rejection (drops rows whose
    * JSON failed to parse). Reference `spark/consumer.py:136-146`.
    */
  def flattenAndFilter(df: DataFrame): DataFrame =
    df.select(
        col("kafka_key"),
        col("data.domain").as("domain"),
        col("data.filename").as("filename"),
        col("data.content").as("content"),
        col("data.file_path").as("file_path"),
        col("kafka_timestamp")
      )
      .filter(col("domain").isNotNull && col("filename").isNotNull && col("content").isNotNull)

  /** The full consumer plan: envelope → documents. */
  def apply(envelope: DataFrame): DataFrame = flattenAndFilter(decodeEnvelope(envelope))

  /** Producer-side encoding (J2/K1): documents → Kafka-shaped key/value.
    * Key is `"{domain}_{filename}"` (reference `push_data_to_kafka.py:32`).
    */
  def encodeEnvelope(docs: DataFrame): DataFrame =
    docs.select(
      concat_ws("_", col("domain"), col("filename")).as("key"),
      to_json(struct(col("domain"), col("filename"), col("content"), col("file_path"))).as("value")
    )

  /** Kafka source builder (S1) — same options as the reference
    * (`spark/consumer.py:119-126`). Not exercised in tests (no broker in the
    * environment); the MemoryStream path feeds [[apply]] instead.
    */
  def kafkaSource(spark: org.apache.spark.sql.SparkSession,
                  bootstrap: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("failOnDataLoss", "false")
      .option("maxOffsetsPerTrigger", 1000L) // working form of the reference's no-op rate cap
      .load()

  /** Kafka producer sink (K1): documents → encoded envelope → topic, with
    * the reference's durability knobs (`push_data_to_kafka.py:44-46`:
    * acks=all, bounded retries, in-flight=1 for strict per-key ordering).
    * Batch form; the streaming form is `encodeEnvelope(df).writeStream
    * .format("kafka")` with the same options. Untested here (no broker);
    * the encode half is covered by the round-trip test.
    */
  def kafkaSink(docs: DataFrame, bootstrap: String, topic: String): Unit =
    encodeEnvelope(docs)
      .write
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("kafka.acks", "all")
      .option("kafka.retries", "3")
      .option("kafka.max.in.flight.requests.per.connection", "1")
      .save()
}
