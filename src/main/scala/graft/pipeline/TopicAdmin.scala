package graft.pipeline

import org.apache.spark.sql.SparkSession

/** R4's topic-lifecycle seam (r9 verdict #3) — the last §2.1 row.
  *
  * The reference's infra step recreates every topic before a run
  * (`01-infra/.../DataPipeline.java:80-126`): for each schema name it
  * checks `listTopics()`, DELETES an existing topic and POLLS every 3 s
  * until the name is really gone (:95-105 — deletion is async in Kafka and
  * a create racing a half-deleted topic fails), then CREATES it with the
  * configured partition count × replication factor and verifies it exists
  * (:108-116). That delete-poll-create CONTRACT is transport-independent,
  * so it lives here behind a trait exactly like `StreamingPipeline.
  * kafkaSource` carries R9's reader-option contract: the sandbox has no
  * broker, but the sequence, the 3 s poll cadence, and the n×r create are
  * pinned by PipelineSpec against a scripted fake, and the same
  * `recreate` loop drives the in-catalog implementation below for an
  * executable in-sandbox leg.
  */
trait TopicAdmin {
  def listTopics(): Set[String]
  def deleteTopic(name: String): Unit
  def createTopic(name: String, numPartitions: Int, replicationFactor: Short): Unit
}

object TopicAdmin {

  /** The reference's delete-poll-create lifecycle (DataPipeline.java:80-126)
    * over any [[TopicAdmin]] transport. `sleeper` is injected so the
    * contract test pins the 3 s cadence without sleeping; `maxPolls` bounds
    * the reference's unbounded poll loop (an operational hang there is a
    * stuck broker — better surfaced as an error than waited out forever).
    * Returns the topics created, in input order. */
  def recreate(admin: TopicAdmin, topics: Seq[String],
               numPartitions: Int, replicationFactor: Short,
               pollMillis: Long = 3000L,
               sleeper: Long => Unit = Thread.sleep,
               maxPolls: Int = 100): Seq[String] = {
    topics.foreach { name =>
      if (admin.listTopics().contains(name)) {
        admin.deleteTopic(name)
        sleeper(pollMillis) // reference sleeps once unconditionally (:98)
        var polls = 0
        while (admin.listTopics().contains(name)) { // poll-until-gone (:101-105)
          polls += 1
          require(polls <= maxPolls,
            s"topic '$name' still present after $maxPolls deletion polls")
          sleeper(pollMillis)
        }
      }
      admin.createTopic(name, numPartitions, replicationFactor) // :108-110
      sleeper(pollMillis) // reference waits before verifying (:112)
      require(admin.listTopics().contains(name), // creation check (:114-116)
        s"topic '$name' missing after create")
    }
    topics
  }

  /** Convenience: lifecycle parameters straight from a reference-keyed
    * [[PipelineConfig]] (kafka.topic.partition.count /
    * kafka.topic.replica-factor.count — 01-infra config.properties:7-8). */
  def recreateFromConfig(admin: TopicAdmin, topics: Seq[String],
                         cfg: PipelineConfig): Seq[String] =
    recreate(admin, topics, cfg.topicPartitionCount, cfg.topicReplicaFactor)
}

/** In-sandbox [[TopicAdmin]]: topics as tables of a Spark catalog database
  * — the engine's R4 mapping (topic ↦ catalog table, Bootstrap.scala). The
  * partition/replication counts are recorded as table properties: Spark's
  * analogue of a topic's partition count is the sink table's bucketing/
  * file layout, decided at write time, so the properties document intent
  * rather than pre-allocating anything. Catalog DDL is synchronous, which
  * makes this implementation converge in zero polls — the scripted fake in
  * PipelineSpec is what exercises the poll loop. */
final class CatalogTopicAdmin(spark: SparkSession, database: String = "graft")
    extends TopicAdmin {
  spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")

  // isTemporary filter (r10 ADVICE): SHOW TABLES also lists session-local
  // temp views; a temp view sharing a topic name would read as a phantom
  // topic that DROP TABLE can't remove, spinning the recreate() poll loop
  // to its maxPolls failure. Only persistent catalog tables are topics.
  override def listTopics(): Set[String] =
    spark.sql(s"SHOW TABLES IN $database").collect()
      .filter(!_.getAs[Boolean]("isTemporary"))
      .map(_.getAs[String]("tableName")).toSet

  override def deleteTopic(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $database.$name"); ()
  }

  override def createTopic(name: String, numPartitions: Int,
                           replicationFactor: Short): Unit = {
    spark.sql(
      s"""CREATE TABLE $database.$name (key STRING, value BINARY)
         |USING parquet
         |TBLPROPERTIES ('graft.partitions' = '$numPartitions',
         |               'graft.replication' = '$replicationFactor')""".stripMargin)
    ()
  }
}
