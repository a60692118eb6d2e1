package graft.pipeline

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import org.apache.avro.Schema

/** Client view of a schema registry — the seam between the pipeline and the
  * schema store. [[SchemaRegistry]] is the in-process implementation (zero
  * egress CI); [[HttpSchemaRegistryClient]] speaks the Confluent REST
  * protocol the reference's serializer/deserializer use
  * (AvroProducer.java:50, AvroConsumer.java:69). */
trait SchemaRegistryClient {
  def register(subject: String, schema: Schema): Int
  def schemaById(id: Int): Option[Schema]
  def latestIdFor(subject: String): Option[Int]

  /** Serializable (id -> schema JSON) snapshot for shipping to executors.
    * Registry I/O happens HERE, at plan time, on the driver — executors
    * never open a connection (a 1000-executor cluster hammering the
    * registry per task is the classic self-inflicted DDoS). */
  def snapshot(): Map[Int, String]
}

/** Confluent Schema Registry REST client on bare `HttpURLConnection` — the
  * wire protocol is three tiny JSON endpoints, not worth a dependency:
  *
  *  - `POST /subjects/{subject}/versions` body `{"schema":"<escaped>"}`
  *    → `{"id":N}` (register; idempotent for an already-known schema)
  *  - `GET /schemas/ids/{id}` → `{"schema":"<escaped>"}`
  *  - `GET /subjects/{subject}/versions/latest` → `{...,"id":N,...}`
  *  - `GET /subjects` / `GET /subjects/{s}/versions` (snapshot walk)
  *
  * All methods are driver-side; [[snapshot]] materializes the full id→schema
  * map so [[ConfluentAvro.decodeAuto]] can ship it in the task closure. */
class HttpSchemaRegistryClient(baseUrl: String) extends SchemaRegistryClient {
  private val base = baseUrl.stripSuffix("/")

  override def register(subject: String, schema: Schema): Int = {
    val body = s"""{"schema":${JsonMini.quote(schema.toString)}}"""
    val resp = http("POST", s"$base/subjects/$subject/versions", Some(body))
    JsonMini.intField(resp, "id")
      .getOrElse(sys.error(s"registry register returned no id: $resp"))
  }

  override def schemaById(id: Int): Option[Schema] =
    httpOpt("GET", s"$base/schemas/ids/$id", None)
      .flatMap(JsonMini.stringField(_, "schema"))
      .map(new Schema.Parser().parse(_))

  override def latestIdFor(subject: String): Option[Int] =
    httpOpt("GET", s"$base/subjects/$subject/versions/latest", None)
      .flatMap(JsonMini.intField(_, "id"))

  override def snapshot(): Map[Int, String] = {
    val subjects = httpOpt("GET", s"$base/subjects", None)
      .map(JsonMini.stringArray).getOrElse(Seq.empty)
    subjects.flatMap { subj =>
      val versions = httpOpt("GET", s"$base/subjects/$subj/versions", None)
        .map(JsonMini.intArray).getOrElse(Seq.empty)
      versions.flatMap { v =>
        httpOpt("GET", s"$base/subjects/$subj/versions/$v", None).flatMap { resp =>
          for {
            id <- JsonMini.intField(resp, "id")
            schema <- JsonMini.stringField(resp, "schema")
          } yield id -> schema
        }
      }
    }.toMap
  }

  private def http(method: String, url: String, body: Option[String]): String =
    httpOpt(method, url, body).getOrElse(sys.error(s"$method $url failed"))

  private def httpOpt(method: String, url: String, body: Option[String]): Option[String] = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(5000)
      body.foreach { b =>
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", "application/vnd.schemaregistry.v1+json")
        val out = conn.getOutputStream
        try out.write(b.getBytes(StandardCharsets.UTF_8)) finally out.close()
      }
      val code = conn.getResponseCode
      if (code == 404) None
      else if (code >= 200 && code < 300) {
        val in = conn.getInputStream
        try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8)) finally in.close()
      } else sys.error(s"$method $url -> HTTP $code")
    } finally conn.disconnect()
  }
}

/** Minimal JSON helpers for the registry protocol's flat payloads — string
  * escape/unescape is the only non-trivial part (schema JSON rides INSIDE a
  * JSON string). Not a general parser; the protocol's values are a quoted
  * string or an int per field, and arrays of same. */
private[graft] object JsonMini {
  def quote(s: String): String = {
    val b = new StringBuilder(s.length + 16).append('"')
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  def unquote(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => b.append('"'); i += 2
          case '\\' => b.append('\\'); i += 2
          case '/'  => b.append('/'); i += 2
          case 'n'  => b.append('\n'); i += 2
          case 'r'  => b.append('\r'); i += 2
          case 't'  => b.append('\t'); i += 2
          case 'b'  => b.append('\b'); i += 2
          case 'f'  => b.append('\f'); i += 2
          case 'u'  => b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case other => b.append(other); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Value of `"field": <int>` in a flat JSON object. */
  def intField(json: String, field: String): Option[Int] =
    ("\"" + java.util.regex.Pattern.quote(field) + "\"\\s*:\\s*(\\d+)").r
      .findFirstMatchIn(json).map(_.group(1).toInt)

  /** Value of `"field": "<string>"` in a flat JSON object, unescaped. The
    * regex stops at the first unescaped quote: `[^"\\]|\\.` consumes either
    * a plain char or a backslash-escape pair atomically. */
  def stringField(json: String, field: String): Option[String] =
    ("\"" + java.util.regex.Pattern.quote(field) + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      .findFirstMatchIn(json).map(m => unquote(m.group(1)))

  /** `["a","b",...]` → Seq(a, b, ...) */
  def stringArray(json: String): Seq[String] =
    "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(json).map(m => unquote(m.group(1))).toSeq

  /** `[1,2,...]` → Seq(1, 2, ...) */
  def intArray(json: String): Seq[Int] =
    "\\d+".r.findAllIn(json).map(_.toInt).toSeq
}
