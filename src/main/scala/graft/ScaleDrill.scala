package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic ≥10× scale drill (VERDICT r4 directive #4): testdata stops at
  * sf0.1, so the only way to SEE a hidden quadratic or a 2 GB task is to
  * manufacture the next decade of scale and measure. [[materialize]] writes
  * a `factor`× copy of the drill tables; Bench runs the most expensive
  * queries on both and records per-query runtime ratios — a plan that is
  * linear in the data should scale well UNDER `factor` (fixed overhead
  * amortizes), and a ratio far above `factor` is a scale bug, caught here
  * instead of on a cluster.
  *
  * Replication must not distort the algorithmic structure:
  *  - `documents`: ids shift by copy; every copy beyond the first gets a
  *    copy-specific token spliced after every 4th word, which breaks ALL
  *    cross-copy 5-shingles — near-dup cluster sizes stay scale-INVARIANT
  *    (the within-copy dup structure is preserved verbatim). Naive
  *    replication would make every doc a near-dup of its 9 siblings and
  *    quadratically inflate candidate pairs: a drill artifact, not a
  *    finding.
  *  - `embeddings`: ids shift; each copy's vectors get a deterministic
  *    per-(copy, dim) perturbation so no two copies are cosine-identical
  *    (exact duplicates would tie the ANN truth ranking).
  *  - `lineitem` / `orders` / `events`: keys shift by copy; measure columns
  *    are kept verbatim, so group cardinalities grow linearly and value
  *    distributions are unchanged.
  */
object ScaleDrill {

  /** The five most expensive suite queries (r4 bench) + one events query —
    * every drill table is exercised. */
  val drillQueries: Seq[String] = Seq(
    "q50_neardup_confirmed", // documents: LSH near-dup pipeline
    "q56_window_dist",       // orders: sharded distribution windows
    "q87_ann_recall",        // embeddings: ANN truth + IVF + LSH
    "q92_cdc_passages",      // documents: content-defined passage dedup
    "q97_rolling_range",     // events: RANGE-frame rolling window
    "q99_winsorized")        // lineitem: sharded two-sided percentile

  /** Write a `factor`× scale copy of the drill tables under `outDir`. */
  def materialize(s: SparkSession, sfDir: String, outDir: String, factor: Int): Unit = {
    require(factor >= 2, s"factor $factor is not a scale-up")
    val copies = broadcast(s.range(0, factor).select(col("id").as("copy")))

    def scaled(table: String)(f: DataFrame => DataFrame): Unit = {
      val base = Tables(s, sfDir, table)
      f(base.crossJoin(copies)).drop("copy")
        .select(base.columns.map(col).toIndexedSeq: _*)
        .write.mode("overwrite").parquet(s"$outDir/$table.parquet")
    }

    val maxDoc = Tables(s, sfDir, "documents").agg(max("doc_id")).first().getLong(0) + 1
    scaled("documents") { d =>
      d.withColumn("doc_id", col("doc_id") + col("copy") * maxDoc)
        .withColumn("text",
          when(col("copy") === 0 || col("text").isNull, col("text"))
            .otherwise(concat_ws(" ",
              transform(split(trim(col("text")), "\\s+"),
                (w, i) => when(i % 4 === 3,
                  concat(w, lit(" zc"), col("copy"))).otherwise(w)))))
    }

    val maxVec = Tables(s, sfDir, "embeddings").agg(max("vec_id")).first().getLong(0) + 1
    scaled("embeddings") { d =>
      d.withColumn("vec_id", col("vec_id") + col("copy") * maxVec)
        .withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            (x + pmod(xxhash64(col("copy"), i), lit(997)).cast("double") / 100000.0)
              .cast("float")))
    }

    val maxOrder = Tables(s, sfDir, "orders").agg(max("o_orderkey")).first().getLong(0) + 1
    scaled("orders")(d => d.withColumn("o_orderkey", col("o_orderkey") + col("copy") * maxOrder))
    scaled("lineitem")(d => d.withColumn("l_orderkey", col("l_orderkey") + col("copy") * maxOrder))

    val maxUser = Tables(s, sfDir, "events").agg(max("user_id")).first().getLong(0) + 1
    scaled("events")(d => d.withColumn("user_id", col("user_id") + col("copy") * maxUser))
  }

  /** Run the drill: time each query on the base dir and on a freshly
    * materialized `factor`× dir. Returns (name, baseSec, scaledSec) rows.
    * Each side is BEST-OF-TWO (the main bench's policy): a single-shot
    * timing right after the factor-× materialization write is exposed to
    * page-cache/GC weather, and one contention burst would record a
    * permanently wrong ratio (observed 9 s ↔ 67 s for the same query
    * across runs). Persisted state is swept between executions exactly
    * like the bench passes, so one query's working set never pollutes
    * another's ratio.
    *
    * @param baseTimes known base-dir timings to reuse (Bench passes its
    *                  per-query best-of-two from the main passes — same
    *                  session, same policy, zero extra wall-clock); queries
    *                  absent from the map are timed here. */
  def run(s: SparkSession, sfDir: String, outDir: String, factor: Int,
          baseTimes: Map[String, Double] = Map.empty): Seq[(String, Double, Double)] = {
    materialize(s, sfDir, outDir, factor)
    def time(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(s, dir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        GraftSession.releasePersisted(s)
        sec
      }
      math.min(once(), once())
    }
    val qs = drillQueries.map { name =>
      val fn = SparkEntry.baseQueries(name)
      (name, baseTimes.getOrElse(name, time(fn, sfDir)), time(fn, outDir))
    }
    // the composed curation flow (dedup → decontaminate → quota → shuffle):
    // the end-to-end path a training-data run takes
    def curateOn(dir: String): Double = time((sp, d) => {
      val docs = Tables(sp, d, "documents")
      val benchmark = docs.filter(col("doc_id") % 100 === 0).select("doc_id", "text")
      graft.operators.Curation.curate(docs, benchmark, quotaPerSource = 1000000)._1
    }, dir)
    qs :+ (("curation_flow", curateOn(sfDir), curateOn(outDir)))
  }
}
