package graft.streaming

import org.apache.avro.Schema
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.pipeline.{ConfluentAvro, TransactionalJdbcSink}

/** Streaming wrap of the pipeline layer (SURVEY §7 M7): source → Avro
  * decode → exactly-once JDBC sink, re-expressing the reference consumer
  * end-to-end on Structured Streaming.
  *
  * Reference ↦ Spark mapping (SURVEY §2.3.9):
  *  - per-partition consumer threads + assign/seek (AvroConsumer.java:80-93,
  *    03-consumer/Main.java:42-64) ↦ source partition-parallelism + the
  *    checkpoint offset log — restart resumes exactly where it stopped;
  *  - poll loop every 100 ms (AvroConsumer.java:116-118) ↦
  *    Trigger.ProcessingTime;
  *  - max.poll.records=10 rate cap + bounded-queue backpressure
  *    (config.properties(03):7-9, AvroConsumer.java:142-155) ↦
  *    maxFilesPerTrigger / maxOffsetsPerTrigger admission control — no
  *    hand-rolled queue, the scheduler only admits what the trigger allows;
  *  - per-record MySQL txn (row + offset) (AvroConsumer.java:157-194) ↦
  *    foreachBatch + TransactionalJdbcSink: per-(batch, partition) txn with
  *    ledger-row idempotence. Batch replay after a kill is a no-op — the
  *    README kill-drill (README.md:242-276) as a property, not a procedure.
  *
  * Kafka note: this environment ships no spark-kafka connector jar, so the
  * bundled sources are file and memory; on a cluster with the connector the
  * same code takes `spark.readStream.format("kafka")` + maxOffsetsPerTrigger
  * — everything downstream of `source` is format-agnostic.
  */
object StreamingPipeline {

  /** Rate-capped file stream source — the Kafka-less stand-in for R9+R11.
    * maxFilesPerTrigger ≙ max.poll.records: bounds per-micro-batch intake. */
  def fileSource(spark: SparkSession, dir: String, schema: StructType,
                 maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Decode a stream of Confluent-framed Avro `value` binaries to typed
    * columns (R10). Works unchanged on streaming DataFrames because the
    * decode is a mapPartitions projection. */
  def decode(framed: DataFrame, avroSchema: Schema, expectedId: Option[Int] = None): DataFrame =
    ConfluentAvro.decode(framed, "value", avroSchema, expectedId)

  /** Run a stream into the exactly-once JDBC sink. The checkpoint supplies
    * replay (the reference's seek-to-stored-offset), the ledger supplies
    * idempotence (the reference's offset-in-same-txn). */
  def toJdbc(df: DataFrame, sink: TransactionalJdbcSink, checkpointDir: String,
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: DataFrame, batchId: Long) => sink.writeBatch(batch, batchId))
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
