package graft.pipeline

import org.apache.avro.{Schema, SchemaNormalization}
import scala.collection.concurrent.TrieMap

/** In-process stand-in for Confluent Schema Registry — the reference
  * registers/fetches schemas over HTTP (AvroProducer.java:50,
  * AvroConsumer.java:69); with zero egress in CI we fix schema ids
  * deterministically instead (SURVEY §7 "mock by fixing schema ids").
  *
  * Ids are derived from Avro's canonical parsing fingerprint, so the same
  * schema always gets the same id across processes/runs — no registry state
  * to replicate to executors. */
object SchemaRegistry extends SchemaRegistryClient {
  private val byId = new TrieMap[Int, Schema]()
  private val bySubject = new TrieMap[String, Int]()

  /** Deterministic id: low 31 bits of the canonical-form fingerprint. */
  def idFor(schema: Schema): Int =
    (SchemaNormalization.parsingFingerprint64(schema) & 0x7fffffff).toInt

  override def register(subject: String, schema: Schema): Int = {
    val id = idFor(schema)
    byId.put(id, schema)
    bySubject.put(subject, id)
    id
  }

  override def schemaById(id: Int): Option[Schema] = byId.get(id)
  override def latestIdFor(subject: String): Option[Int] = bySubject.get(subject)

  /** Serializable snapshot (id -> schema JSON) for shipping to executors:
    * this object is per-JVM, so on a real cluster executors start with an
    * EMPTY registry — plan-time snapshots travel with the closure instead
    * of assuming shared driver state (local-mode would hide that bug). */
  override def snapshot(): Map[Int, String] = byId.readOnlySnapshot().toMap.map {
    case (id, s) => id -> s.toString
  }
}
