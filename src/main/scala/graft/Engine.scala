package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory for the graft engine.
  *
  * Config rationale (SURVEY.md §7, FIXTURES.md §B):
  *  - `spark.sql.shuffle.partitions=32` matches local[32]; on a real cluster
  *    this is overridden (or AQE coalesces) — never the 200 default.
  *  - AQE on: runtime join-strategy switching + skew-join splitting + shuffle
  *    partition coalescing are the 100 TB safety net.
  *  - `spark.sql.legacy.parquet.nanosAsLong=true`: driver test data has
  *    shipped `events.ts` as physical INT64 TIMESTAMP(NANOS), which Spark
  *    otherwise refuses to read; with the flag it reads as bigint
  *    epoch-nanos. Micros-physical regens of the same column are folded to
  *    the identical bigint spelling at load ([[Tables.normalizeTs]]).
  *  - UTC session timezone so timestamp_ntz literals compare identically with
  *    the DuckDB oracle.
  *  - `spark.sql.codegen.cache.maxEntries` = [[GraftSession.codegenCacheEntries]]
  *    (r15 mechanism; hand-resized r16/r17 as the registry grew, DERIVED
  *    from the registry size since r18 — the verdict's #2(b): the size
  *    must track the surface automatically instead of re-saturating every
  *    time lanes are added): the default 100-entry generated-class cache
  *    thrashes under this
  *    engine's ~150-query surface (~1500 codegen stages per full pass), so
  *    on a long-lived session every re-run of a query recompiles and
  *    re-JITs all its stages — measured on q118 (the most
  *    codegen-stage-heavy lane): 5.0 s when re-run after 149 other lanes vs
  *    3.0 s re-run immediately, and 3.5 s after the same 149 lanes with
  *    the cache sized to hold the surface (r15 set 4096). r16's surface
  *    growth (157 lanes + three native kernels) re-saturated 4096 by the
  *    time the post-suite scale drill ran: q114's drill x10 wall went
  *    BIMODAL (1.0–2.3 s vs two near-identical ~5.15 s readings in one
  *    day, isolated Prof always ~2 s), and doubling to 8192 restored 1.4 s
  *    and took the whole recording to its round best (76.2 → 67.9 s).
  *    Worst-case memory is ~8192 × ~30 KB of class metadata — noise
  *    against executor heaps. The rule of thumb: size this to
  *    ~2× the surface's total codegen stages, and re-check whenever the
  *    registry grows. The conf is read ONCE when Spark's CodeGenerator
  *    cache initializes, so it must sit in the session builder, not be
  *    tuned post-hoc.
  */
object GraftSession {
  /** Generated-class cache size, derived from the lane registry: the last
    * hand-tuned point that stopped the bimodal eviction modes was 12288 at
    * 158 lanes (r17) ≈ 78 entries/lane across the suite + drill/text-gate
    * plan variants (a lane's ×N drill plan AQE-differs from its suite
    * plan, so it caches separately). 80/lane keeps that measured headroom
    * and grows with the registry, so adding lanes can never silently
    * re-saturate the cache again (the r16/r17 failure mode — three rounds
    * of drill-fence flaps traced to exactly this). Floor at 12288 so the
    * size never shrinks below the proven point. Lazy: evaluated at first
    * session build, after the registry object initializes. */
  lazy val codegenCacheEntries: Int =
    math.max(12288, 80 * SparkEntry.baseQueries.size)

  def builder(master: String = "local[32]"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions) // graft_cosine/java_string_hash SQL fns + HOF-cosine fusion rule
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", codegenCacheEntries.toString)
      .config("spark.sql.analyzer.maxIterations", "400") // s168's linear CTE chain (see tune())
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Apply graft-required runtime confs to an externally built session
    * (Verify/Bench build their own; the driver may too). All of these are
    * dynamic SQLConfs, safe to set post-construction. */
  def tune(s: SparkSession): SparkSession = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    // the s168 BPE twin is a deliberately LINEAR ~90-CTE chain (the
    // anti-2^N spelling of an iterative algorithm as one statement);
    // resolving it takes more analyzer fixpoint rounds than the default
    // 100 — a pure iteration CAP, not a cost knob (every other plan still
    // converges in the same handful of rounds it always did)
    s.conf.set("spark.sql.analyzer.maxIterations", "400")
    s
  }

  /** Deterministically release every persisted block in the session.
    *
    * Operators that persist intermediates (Dedup's LSH band/candidate/token
    * tables, connectedComponents' label generations) hand back lazy plans
    * that reference pinned storage; a harness that runs MANY plans through
    * one long-lived session (Bench, Verify) must call this after
    * materializing each result so one query's working set never bleeds into
    * the next query's measurement. Relying on ContextCleaner GC is not
    * deterministic — blocks stay pinned until a driver GC happens to run
    * (r02 bench: a contiguous run of slowed queries right after q50/q79 in
    * both passes). blocking=true so the release completes before the next
    * query is timed.
    *
    * Dataset.persist registers the plan with the session's CacheManager as
    * well as pinning RDD blocks; unpersisting only the RDDs (the r03 shape)
    * leaves the CacheManager entry behind, so the NEXT construction of the
    * same plan logs "Asked to cache already cached data" on every warm pass
    * (r03 verdict, cosmetic finding 3) and silently re-caches through the
    * stale entry. Clear the catalog cache FIRST (removes CacheManager
    * entries and unpersists their RDDs), then sweep any remaining raw-RDD
    * persists (connectedComponents pins bare RDDs that never touch the
    * CacheManager). */
  def releasePersisted(s: SparkSession): Unit = {
    s.catalog.clearCache()
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  }
}

/** Loader for the driver-generated test tables (TESTDATA.md). One parquet
  * file per table; schemas in FIXTURES.md §B. */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoize the analyzed relation per (session, dir, table): every
  // `read.parquet` re-lists the path and re-reads a footer for schema
  // inference — pure fixed overhead when 60 queries × 2 bench passes touch
  // the same ten immutable tables hundreds of times (measured ~14 s off the
  // sf0.1 suite). NOT a WeakHashMap: a DataFrame strongly references its
  // SparkSession, so session-keyed weak entries could never be collected
  // (the value→key caveat in the WeakHashMap javadoc). Instead entries of
  // STOPPED sessions are purged on access — test suites that stop/rebuild
  // sessions reclaim their plans on the next lookup.
  private val relCache =
    scala.collection.concurrent.TrieMap
      .empty[SparkSession, scala.collection.concurrent.TrieMap[(String, String), DataFrame]]

  def apply(s: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.tune(s)
    relCache.keySet.foreach(k => if (k.sparkContext.isStopped) relCache.remove(k))
    val perSession = relCache.getOrElseUpdate(s,
      scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame])
    perSession.getOrElseUpdate((dir, name), {
      val df = s.read.parquet(s"$dir/$name.parquet")
      // `ts` normalization is scoped to the one table that carries the
      // contract: a future fixture with a legitimately timestamp-typed `ts`
      // column must NOT be silently retyped to bigint (r8 ADVICE #2)
      if (name == "events") normalizeTs(df) else df
    })
  }

  /** Engine-wide `ts` contract: epoch-NANOS bigint, whatever the file's
    * physical type. The driver has shipped `events.ts` as both INT64
    * TIMESTAMP(NANOS) (readable as bigint only under
    * `spark.sql.legacy.parquet.nanosAsLong=true` — a no-op load here) and,
    * since the round-7 regen, INT64 TIMESTAMP(MICROS) with
    * `isAdjustedToUTC=false` (Spark reads TIMESTAMP_NTZ — every ts-integer
    * query then fails analysis; 13 queries + twins in CORRECTNESS_r07).
    * Normalizing AT LOAD, before memoization, keeps the whole query surface
    * and the SQL-text lane (via [[registerAll]]) on one spelling, and the
    * DuckDB oracle's `epoch_ns(ts)` agrees on both physical types.
    *
    * The cast NTZ→LTZ is wall-clock-preserving under the UTC session
    * timezone ([[GraftSession.tune]] pins it), so `unix_micros * 1000`
    * yields the same epoch-nanos the NANOS file carried (sub-microsecond
    * digits were already zero in driver data; q41's contract truncates to
    * micros regardless). Cost at 100 TB: one codegen'd projection on the
    * scan — but `ts` predicates no longer push to parquet row-group stats.
    * Acceptable: the suite's ts filters are on derived windows/sessions
    * (never pruning raw scans), and correctness across physical types
    * outranks a stats prune the driver's single-file layout can't use. */
  private def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        // Range note: `micros * 1000` overflows Long past 2262-04-11 — the
        // inherent ceiling of the epoch-NANOS contract itself (a nanos file
        // cannot carry such values either; only a micros/NTZ file could,
        // and driver data tops out in the 2020s). If the fixture generation
        // ever changes, TsPhysicalTypeSpec's cross-spelling equality pin is
        // the tripwire.
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df
    }
  }

  /** Register every table as a temp view (for SQL-path tests). */
  def registerAll(s: SparkSession, dir: String): Unit =
    names.foreach(n => apply(s, dir, n).createOrReplaceTempView(n))
}
