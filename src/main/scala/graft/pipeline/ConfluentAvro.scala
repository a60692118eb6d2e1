package graft.pipeline

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

import graft.schema.SchemaBridge

/** Confluent wire-format Avro serde: `[0x00][4-byte schema id BE][avro body]`
  * — the framing the reference's KafkaAvroSerializer writes
  * (AvroProducer.java:48-50) and its consumer strips via the registry
  * (AvroConsumer.java:67-69). SURVEY §4.3.1 identifies this as genuine
  * engine code: Spark has no spark-avro module in this environment, so both
  * the framing AND the Avro body serde are implemented here on
  * org.apache.avro directly.
  *
  * Execution shape: mapPartitions with per-partition reused
  * DatumWriter/Encoder (never per-row allocation of the serde machinery) —
  * rows stream through executor-local, nothing but the encoded bytes moves.
  */
object ConfluentAvro {
  val MagicByte: Byte = 0x00
  val HeaderLen = 5

  def frame(schemaId: Int, body: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(HeaderLen + body.length)
    out.put(MagicByte).putInt(schemaId).put(body)
    out.array()
  }

  /** @return (schemaId, avro body) */
  def unframe(bytes: Array[Byte]): (Int, Array[Byte]) = {
    require(bytes.length >= HeaderLen && bytes(0) == MagicByte,
      s"not Confluent-framed: len=${bytes.length}")
    val bb = ByteBuffer.wrap(bytes, 1, 4)
    (bb.getInt, java.util.Arrays.copyOfRange(bytes, HeaderLen, bytes.length))
  }

  // ---- Row <-> GenericRecord over the reference's 6-primitive universe ----

  private def rowToRecord(row: Row, schema: Schema, st: StructType): GenericRecord = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < st.length) {
      rec.put(i, row.get(i))
      i += 1
    }
    rec
  }

  private def recordToRow(rec: GenericRecord, st: StructType): Row = {
    val vals = new Array[Any](st.length)
    var i = 0
    while (i < st.length) {
      vals(i) = st(i).dataType match {
        case StringType => rec.get(i).toString // avro Utf8 -> String
        case _          => rec.get(i)
      }
      i += 1
    }
    Row.fromSeq(vals.toIndexedSeq)
  }

  /** Encode rows to Confluent-framed Avro. Output schema:
    * (key string, partition int, value binary) — the producer record shape
    * (AvroProducer.java:83: ProducerRecord(topic, partitionId, key, message)).
    * Key = field 0 BY POSITION and partition = |key.hashCode % n|, exactly
    * the reference semantics (AvroProducer.java:79-83). */
  def encode(df: DataFrame, avroSchema: Schema, schemaId: Int, numPartitions: Int): DataFrame = {
    val st = df.schema
    val schemaJson = avroSchema.toString // Schema isn't serializable-friendly; ship JSON
    val outSchema = StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("partition", IntegerType, nullable = false),
      StructField("value", BinaryType, nullable = false)))
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val baos = new ByteArrayOutputStream()
      var encoder = EncoderFactory.get().binaryEncoder(baos, null)
      rows.map { row =>
        baos.reset()
        encoder = EncoderFactory.get().binaryEncoder(baos, encoder)
        writer.write(rowToRecord(row, schema, st), encoder)
        encoder.flush()
        val key = String.valueOf(row.get(0)) // key = schema position 0
        val pid = math.abs(key.hashCode % numPartitions)
        Row(key, pid, frame(schemaId, baos.toByteArray))
      }
    }(Encoders.row(outSchema))
  }

  /** Decode with registry-resolved WRITER schemas (the reference's actual
    * consumer behavior: KafkaAvroDeserializer fetches the schema by the
    * frame's embedded id, AvroConsumer.java:67-69) reconciled to a fixed
    * READER schema via Avro schema resolution — so a stream carrying
    * multiple schema versions (field added with default, field dropped)
    * decodes to one uniform output schema. The registry snapshot is taken
    * at PLAN time and shipped in the closure: executors on a real cluster
    * have no driver registry state (and never open registry connections —
    * see [[SchemaRegistryClient.snapshot]]). Pass an
    * [[HttpSchemaRegistryClient]] to resolve against a live Confluent
    * registry; the default is the in-process one. */
  def decodeAuto(df: DataFrame, valueCol: String, readerSchema: Schema,
                 registry: SchemaRegistryClient = SchemaRegistry): DataFrame = {
    val st = SchemaBridge.avroToStruct(readerSchema)
    val readerJson = readerSchema.toString
    val writers: Map[Int, String] = registry.snapshot()
    val idx = df.schema.fieldIndex(valueCol)
    df.mapPartitions { rows =>
      val reader = new Schema.Parser().parse(readerJson)
      val parsed = scala.collection.mutable.Map[Int, GenericDatumReader[GenericRecord]]()
      def readerFor(id: Int): GenericDatumReader[GenericRecord] =
        parsed.getOrElseUpdate(id, {
          val writerJson = writers.getOrElse(id,
            throw new IllegalStateException(s"schema id $id not in registry snapshot"))
          new GenericDatumReader[GenericRecord](
            new Schema.Parser().parse(writerJson), reader)
        })
      var decoder: org.apache.avro.io.BinaryDecoder = null
      rows.map { row =>
        val (id, body) = unframe(row.getAs[Array[Byte]](idx))
        decoder = DecoderFactory.get().binaryDecoder(body, decoder)
        recordToRow(readerFor(id).read(null, decoder), st)
      }
    }(Encoders.row(st))
  }

  /** Decode Confluent-framed Avro binaries back to typed columns. The
    * expected schema id is validated per record — the single-schema
    * stand-in for a registry lookup (SURVEY §4.3.1; live-registry multi-
    * version resolution swaps `require` for the id-keyed lookup that
    * [[decodeAuto]] implements). */
  def decode(df: DataFrame, valueCol: String, avroSchema: Schema,
             expectedSchemaId: Option[Int] = None): DataFrame = {
    val st = SchemaBridge.avroToStruct(avroSchema)
    val schemaJson = avroSchema.toString
    val idx = df.schema.fieldIndex(valueCol)
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      var record: GenericRecord = null
      var decoder: org.apache.avro.io.BinaryDecoder = null
      rows.map { row =>
        val (id, body) = unframe(row.getAs[Array[Byte]](idx))
        expectedSchemaId.foreach(e => require(id == e, s"schema id $id != expected $e"))
        decoder = DecoderFactory.get().binaryDecoder(body, decoder)
        record = reader.read(record, decoder)
        recordToRow(record, st)
      }
    }(Encoders.row(st))
  }

  /** PERMISSIVE decode (the Spark `_corrupt_record` pattern applied to the
    * framed-Avro source): a malformed frame — wrong magic byte, truncated
    * header, wrong schema id, or an Avro body that doesn't parse — becomes
    * a row of NULL fields with the failure reason in `_corrupt`, instead of
    * killing the job. At 100 TB one poisoned record MUST NOT fail a
    * multi-hour pipeline run; callers route `_corrupt IS NOT NULL` rows to
    * a dead-letter sink and keep going. [[decode]] stays the strict
    * (fail-fast, reference-faithful) variant. */
  def decodePermissive(df: DataFrame, valueCol: String, avroSchema: Schema,
                       expectedSchemaId: Option[Int] = None,
                       corruptCol: String = "_corrupt"): DataFrame = {
    val base = SchemaBridge.avroToStruct(avroSchema)
    require(!base.fieldNames.contains(corruptCol),
      s"decoded schema already has a '$corruptCol' column — pass a different corruptCol")
    val st = StructType(base.fields.map(_.copy(nullable = true)) :+
      StructField(corruptCol, StringType, nullable = true))
    val schemaJson = avroSchema.toString
    val idx = df.schema.fieldIndex(valueCol)
    val n = base.length
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      // decoder reuse is safe across corrupt rows: binaryDecoder(body, reuse)
      // fully re-binds the buffer. The RECORD is not reused — a corrupt row's
      // partially-populated fields must not leak into the next decode.
      var decoder: org.apache.avro.io.BinaryDecoder = null
      rows.map { row =>
        try {
          val (id, body) = unframe(row.getAs[Array[Byte]](idx))
          expectedSchemaId.foreach(e => require(id == e, s"schema id $id != expected $e"))
          decoder = DecoderFactory.get().binaryDecoder(body, decoder)
          Row.fromSeq(recordToRow(reader.read(null, decoder), base).toSeq :+ null)
        } catch {
          case e: Exception =>
            Row.fromSeq(Seq.fill[Any](n)(null) :+
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    }(Encoders.row(st))
  }
}
