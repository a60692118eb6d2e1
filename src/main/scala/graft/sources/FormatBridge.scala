package graft.sources

import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit, sum, when}
import org.apache.spark.sql.types.{StringType, StructType}

/** Multi-format ingest/egress bridge: the engine's native layout is parquet
  * ([[ParquetLayout]]), but a 100 TB corpus ARRIVES in whatever its
  * producers emit — ORC from legacy Hive estates, CSV/JSONL from exports
  * and API dumps. One bridge holds the per-format spellings so every
  * ingest lands in the same `Tables`-shaped DataFrames and the rest of the
  * engine never knows the wire format.
  *
  * Schema-fidelity rules (FormatBridgeSpec pins them on real fixture
  * tables):
  *  - parquet / orc: self-describing columnar — lossless round-trip, no
  *    options needed; both splittable and predicate-pushdown-capable, so
  *    they are the only formats fit for the 100 TB FACT path.
  *  - csv / jsonl: text interchange — read takes the EXPLICIT schema
  *    (inference is a full extra pass over the data and silently drifts
  *    types: an all-digit string column becomes long); TIMESTAMP_NTZ rides
  *    `timestampNTZFormat` with micros precision (the default format drops
  *    sub-second digits in CSV); CSV additionally needs a null SENTINEL
  *    because its default writes null and empty string identically —
  *    round-tripping a nullable text column without one corrupts empties
  *    to nulls. The sentinel is necessarily IN-BAND (the parser matches it
  *    AFTER unescaping, so quoting cannot protect colliding data — probed:
  *    a quoted field equal to the sentinel reads back null), which rules
  *    out MySQL's conventional `\N` for a corpus bridge — dumps of MySQL
  *    provenance plausibly CONTAIN `\N`. The token below is chosen for
  *    vanishing collision odds instead; data that could contain it must
  *    ride parquet/orc. CSV reads run `multiLine=true` so quoted embedded
  *    newlines survive — which makes each file single-split: text formats
  *    are an EDGE format, re-encode to parquet at ingest and never query
  *    them in place at scale.
  */
object FormatBridge {
  val Formats: Seq[String] = Seq("parquet", "orc", "csv", "json")

  private val NtzFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
  private val NullSentinel = "__graft_null_7f3a__"

  def write(df: DataFrame, path: String, format: String): Unit = format match {
    case "csv" =>
      // In-band sentinel collision guard (r9 ADVICE): a data value equal to
      // the sentinel would read back as NULL with no trace — quoting cannot
      // protect it (scaladoc above). Spark's nullValue match is WHOLE-FIELD
      // (only a cell exactly equal to the sentinel reads back null; cells
      // merely containing it round-trip fine), so the guard tests equality,
      // not containment. It rides the write job itself as an observe()
      // metric (zero extra passes); on a collision the written output is
      // DELETED before throwing, so no corrupt artifact survives for a
      // directory-watching consumer to pick up.
      val strCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
      val obs = if (strCols.isEmpty) None else Some(Observation("graft_csv_sentinel_guard"))
      val guarded = obs.fold(df)(o => df.observe(o,
        sum(when(strCols.map(c => col(c) === NullSentinel).reduce(_ || _), 1L)
          .otherwise(0L)).as("collisions")))
      guarded.write.mode(SaveMode.Overwrite)
        .option("header", "true")
        .option("timestampNTZFormat", NtzFormat)
        .option("nullValue", NullSentinel)
        .csv(path)
      obs.foreach { o =>
        val collisions = Option(o.get("collisions")).map(_.asInstanceOf[Long]).getOrElse(0L)
        if (collisions > 0L) {
          val out = new org.apache.hadoop.fs.Path(path)
          val fs = out.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
          fs.delete(out, true)
          throw new IllegalArgumentException(
            s"CSV write to $path aborted (output deleted): $collisions string cell(s) " +
              s"equal the in-band null sentinel '$NullSentinel' and would read back as " +
              "NULL — route this data through parquet/orc instead (FormatBridge scaladoc)")
        }
      }
    case "json" =>
      df.write.mode(SaveMode.Overwrite)
        .option("timestampNTZFormat", NtzFormat)
        .json(path)
    case f =>
      df.write.mode(SaveMode.Overwrite).format(f).save(path)
  }

  def read(s: SparkSession, path: String, format: String,
           schema: StructType): DataFrame = format match {
    case "csv" =>
      s.read.schema(schema)
        .option("header", "true")
        .option("timestampNTZFormat", NtzFormat)
        .option("nullValue", NullSentinel)
        // quoted embedded newlines parse as one record, not split mid-field
        // (cost: one split per file — see the edge-format scaladoc note)
        .option("multiLine", "true")
        .csv(path)
    case "json" =>
      s.read.schema(schema)
        .option("timestampNTZFormat", NtzFormat)
        .json(path)
    case f =>
      s.read.schema(schema).format(f).load(path)
  }
}
