package graft.pipeline

import org.apache.spark.sql.SparkSession
import graft.schema.{SchemaBridge, SimpleSchema}

/** Catalog bootstrap — the Spark analogue of the reference's 01-infra entry
  * point (SURVEY §3.1): simple-JSON schemas → catalog tables + batch ledger.
  * The reference creates Kafka topics + MySQL tables (DataPipeline.java:
  * 80-209); here one parquet-backed catalog table per schema plus the
  * batch-id ledger that replaces `kafka_offsets`. */
object Bootstrap {
  def apply(spark: SparkSession, schemas: Seq[SimpleSchema],
            database: String = "graft"): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")
    schemas.foreach(ss => spark.sql(SchemaBridge.createTableDdl(ss, database)))
    // ledger analogue of kafka_offsets (DataPipeline.java:150-159)
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $database.batch_ledger (
         |  query_id STRING, batch_id BIGINT, partition_id INT, row_count BIGINT)
         |USING parquet""".stripMargin)
  }

  /** End-to-end schema bootstrap from a JSON document (reference
    * 01-infra/Main.java:26-44 flow: parse → transform → DDL). */
  def fromJson(spark: SparkSession, json: String, database: String = "graft"): Seq[SimpleSchema] = {
    val schemas = SchemaBridge.parseSimple(json)
    apply(spark, schemas, database)
    schemas
  }
}
