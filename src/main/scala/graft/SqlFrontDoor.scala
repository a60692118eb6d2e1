package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-text front door.
  *
  * Users of the reference drive it with SQL strings (reference `README.md:204`
  * — queries are typed at a SQL prompt against the sink database); an engine
  * whose only tested entry point is the Scala DataFrame API leaves that whole
  * user surface unproven. Every oracle-gated query is therefore registered a
  * SECOND time under an `sNN_` name whose implementation is nothing but
  * `spark.sql(<text>)` over the registered temp views ([[Tables.registerAll]]),
  * hash-compared by the driver against the SAME DuckDB oracle as its `qNN_`
  * sibling. Green here proves the engine's SQL dialect end-to-end: parser →
  * analyzer (view resolution) → the same optimized plans the DataFrame lane
  * produces.
  *
  * Where the DuckDB and Spark dialects agree, the oracle SQL itself IS the
  * Spark text; where they split (regex flags, `string_split_regex`→`split`,
  * `unnest`→`explode`, `//`→`div`, `epoch_ns(ts)`→raw bigint under
  * nanosAsLong, …) [[sparkDialect]] carries the Spark twin.
  * RelationalConformanceSpec asserts twin ≡ DataFrame plan row-for-row, so
  * the two lanes cannot drift apart silently.
  */
object SqlFrontDoor {

  /** Spark-dialect twins for oracle SQL that is DuckDB-specific. */
  val sparkDialect: Map[String, String] = Map(
    "q08_agg_tpch_q1" -> // TIMESTAMP literal vs timestamp_ntz column
      "SELECT l_returnflag, l_linestatus, CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty, CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base, CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_disc, ROUND(AVG(l_quantity), 4) AS avg_qty, COUNT(*) AS cnt FROM lineitem WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "q23_json_extract" -> // json_extract_string -> get_json_object
      "SELECT event_type, CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS s FROM events GROUP BY event_type ORDER BY event_type",
    "q140_tpch_q8" -> // TIMESTAMP literal vs timestamp_ntz column (q08 pattern)
      "SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year, CAST(SUM(CASE WHEN ns.n_name = 'NATION_3' THEN vc ELSE 0 END) AS BIGINT) AS nation_cents, CAST(SUM(vc) AS BIGINT) AS total_cents, ROUND(CAST(SUM(CASE WHEN ns.n_name = 'NATION_3' THEN vc ELSE 0 END) AS DOUBLE) / SUM(vc), 4) AS share FROM (SELECT l_orderkey, l_suppkey, l_partkey, CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * 100, 0) AS BIGINT) AS vc FROM lineitem) l JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO' JOIN orders ON o_orderkey = l_orderkey JOIN customer ON c_custkey = o_custkey JOIN nation nc ON nc.n_nationkey = c_nationkey JOIN region ON r_regionkey = nc.n_regionkey AND r_name = 'ASIA' JOIN supplier ON s_suppkey = l_suppkey JOIN nation ns ON ns.n_nationkey = s_nationkey WHERE o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP_NTZ '1998-01-01 00:00:00' GROUP BY 1 ORDER BY 1",
    "q142_tpch_q12" -> // TIMESTAMP literal vs timestamp_ntz column (q08 pattern)
      "SELECT l_returnflag, CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count FROM lineitem JOIN orders ON o_orderkey = l_orderkey WHERE l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP_NTZ '1997-01-01 00:00:00' GROUP BY 1 ORDER BY 1",
    "q143_tpch_q4" -> // TIMESTAMP literal vs timestamp_ntz column (q08 pattern)
      "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders o WHERE o_orderdate >= TIMESTAMP_NTZ '1996-07-01 00:00:00' AND o_orderdate < TIMESTAMP_NTZ '1996-10-01 00:00:00' AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY) GROUP BY 1 ORDER BY 1",
    "q144_tpch_q6" -> // TIMESTAMP literal vs timestamp_ntz column (q08 pattern)
      "SELECT CAST(SUM(CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2)) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents, COUNT(*) AS n FROM lineitem WHERE l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP_NTZ '1997-01-01 00:00:00' AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24",
    "q145_tpch_q14" -> // TIMESTAMP literal vs timestamp_ntz column (q08 pattern)
      "SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vc ELSE 0 END) AS BIGINT) AS promo_cents, CAST(SUM(vc) AS BIGINT) AS total_cents, ROUND(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vc ELSE 0 END) AS DOUBLE) * 100 / SUM(vc), 4) AS promo_pct FROM (SELECT l_partkey, CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * 100, 0) AS BIGINT) AS vc FROM lineitem WHERE l_shipdate >= TIMESTAMP_NTZ '1996-09-01 00:00:00' AND l_shipdate < TIMESTAMP_NTZ '1996-10-01 00:00:00') l JOIN part ON p_partkey = l_partkey",
    "q24_event_tumbling" -> // ts already bigint epoch-nanos under nanosAsLong
      "SELECT (ts - (ts % 3600000000000)) AS hour_bucket, event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sv FROM events GROUP BY 1, 2 ORDER BY 1, 2",
    // DuckDB string_split_regex/len(regexp_extract_all) -> Spark split/regexp_count
    "q29_token_count" ->
      "SELECT lang, SUM(ws) AS total_ws, SUM(bpe) AS total_bpe, MAX(ws) AS max_ws, MIN(ws) AS min_ws FROM (SELECT lang, CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) AS ws, CAST(regexp_count(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]') AS BIGINT) AS bpe FROM documents) t GROUP BY lang ORDER BY lang",
    "q30_text_quality" ->
      "SELECT lang, ROUND(AVG(ar), 4) AS alpha_ratio, ROUND(AVG(sr), 4) AS stopword_ratio, ROUND(AVG(len), 2) AS avg_len FROM (SELECT lang, CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '')) AS DOUBLE) / LENGTH(text) AS ar, CAST(regexp_count(text, '\\\\b(the|a|of|and|to)\\\\b') AS DOUBLE) / size(split(trim(text), '\\\\s+')) AS sr, CAST(LENGTH(text) AS BIGINT) AS len FROM documents) t GROUP BY lang ORDER BY lang",
    "q31_lang_id" ->
      "SELECT CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en' WHEN s_de >= s_es AND s_de >= s_fr THEN 'de' WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS pred_lang, COUNT(*) AS n FROM (SELECT CAST(regexp_count(text, '\\\\b(the|of|and|to|in)\\\\b') AS BIGINT) AS s_en, CAST(regexp_count(text, '\\\\b(der|die|das|und|ist)\\\\b') AS BIGINT) AS s_de, CAST(regexp_count(text, '\\\\b(el|la|los|que|a)\\\\b') AS BIGINT) AS s_es, CAST(regexp_count(text, '\\\\b(le|les|et|des|du)\\\\b') AS BIGINT) AS s_fr FROM documents) t GROUP BY 1 ORDER BY 1",
    "q32_fingerprint_md5" ->
      "SELECT doc_id, md5(lower(regexp_replace(text, '\\\\s+', ' '))) AS fp FROM documents ORDER BY doc_id",
    "q33_jaccard_pairs" ->
      "WITH w AS (SELECT doc_id, explode(split(trim(text), '\\\\s+')) AS word FROM documents WHERE doc_id < 40), d AS (SELECT DISTINCT doc_id, word FROM w), s AS (SELECT doc_id, COUNT(*) AS sz FROM d GROUP BY doc_id), c AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter FROM d a JOIN d b ON a.word = b.word AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT id1, id2, ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) AS jaccard FROM c JOIN s sa ON sa.doc_id = id1 JOIN s sb ON sb.doc_id = id2 ORDER BY id1, id2",
    "q36_cosine_topk" ->
      "WITH f AS (SELECT vec_id, i, CAST(v AS DOUBLE) AS v FROM embeddings LATERAL VIEW posexplode(embedding) t AS i, v), d AS (SELECT q.vec_id AS qid, c.vec_id AS cid, SUM(q.v * c.v) AS dot, SUM(q.v * q.v) AS qq, SUM(c.v * c.v) AS cc FROM f q JOIN f c ON q.i = c.i AND q.vec_id < 5 AND q.vec_id <> c.vec_id GROUP BY 1, 2), r AS (SELECT qid, cid, ROUND(dot / (SQRT(qq) * SQRT(cc)), 4) AS sim FROM d), rk AS (SELECT qid, cid, sim, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk FROM r) SELECT qid, cid, sim, rnk FROM rk WHERE rnk <= 5 ORDER BY qid, rnk",
    "q37_neardup_embedding" ->
      "WITH f AS (SELECT vec_id, i, CAST(v AS DOUBLE) AS v FROM embeddings LATERAL VIEW posexplode(embedding) t AS i, v WHERE vec_id < 300), d AS (SELECT a.vec_id AS id1, b.vec_id AS id2, SUM(a.v * b.v) AS dot, SUM(a.v * a.v) AS qq, SUM(b.v * b.v) AS cc FROM f a JOIN f b ON a.i = b.i AND a.vec_id < b.vec_id GROUP BY 1, 2) SELECT id1, id2, ROUND(dot / (SQRT(qq) * SQRT(cc)), 4) AS sim FROM d ORDER BY sim DESC, id1, id2 LIMIT 20",
    "q38_multimodal_bytes" ->
      "SELECT doc_id, CAST(octet_length(CAST(text AS BINARY)) AS BIGINT) AS n_bytes FROM documents ORDER BY doc_id",
    // q146–q148 (r13): encode() -> CAST(text AS BINARY); Spark's md5/
    // substring operate on the binary payload directly; `//` -> div;
    // list literal indexing -> element_at(array(...))
    "q146_payload_dedup" ->
      "WITH fp AS (SELECT source, doc_id, md5(CAST(text AS BINARY)) AS fp, octet_length(CAST(text AS BINARY)) AS nb FROM documents WHERE text IS NOT NULL), g AS (SELECT source, fp, MIN(doc_id) AS keeper, COUNT(*) AS copies, MIN(nb) AS nb FROM fp GROUP BY 1, 2) SELECT source, COUNT(*) AS n_unique, CAST(SUM(copies) AS BIGINT) AS n_total, CAST(SUM(copies) - COUNT(*) AS BIGINT) AS n_dupes, CAST(SUM(nb) AS BIGINT) AS bytes_unique, CAST(SUM(keeper) AS BIGINT) AS keeper_sum FROM g GROUP BY source ORDER BY source",
    "q147_frame_fingerprints" ->
      "WITH d AS (SELECT doc_id, CAST(text AS BINARY) AS payload, octet_length(CAST(text AS BINARY)) AS total FROM documents WHERE text IS NOT NULL), f AS (SELECT doc_id, i, substring(payload, CAST(i * GREATEST((total - 32) div 3, 1) + 1 AS INT), 32) AS frame FROM d LATERAL VIEW explode(sequence(0, 3)) t AS i) SELECT doc_id, CAST(i AS BIGINT) AS frame_idx, md5(frame) AS frame_md5, CAST(octet_length(frame) AS BIGINT) AS frame_len FROM f ORDER BY doc_id, frame_idx",
    "q148_modality_mix" -> // ppm numerators in DECIMAL(38,0) like the
      // operator — BIGINT bytes*10⁶ wraps past ~9.2 TB/source (ANSI off)
      "WITH p AS (SELECT source, doc_id, octet_length(CAST(text AS BINARY)) AS nb, element_at(array('image/png','audio/wav','video/mp4','text/plain'), CAST(doc_id % 4 AS INT) + 1) AS mime FROM documents WHERE text IS NOT NULL), g AS (SELECT source, mime, COUNT(*) AS n_docs, SUM(nb) AS bytes FROM p GROUP BY 1, 2), t AS (SELECT source, SUM(bytes) AS src_bytes FROM g GROUP BY 1), a AS (SELECT SUM(bytes) AS all_bytes FROM g) SELECT g.source, mime, n_docs, CAST(bytes AS BIGINT) AS total_bytes, CAST(CAST(bytes AS DECIMAL(38,0)) * 1000000 div src_bytes AS BIGINT) AS share_ppm, CAST(CAST(src_bytes AS DECIMAL(38,0)) * 1000000 div all_bytes AS BIGINT) AS src_weight_ppm FROM g JOIN t USING (source) CROSS JOIN a ORDER BY source, mime",
    "q149_decode_features" -> // ordered `aggregate` HOF = the stub codec's
      // left fold; ascii() of the 1-byte binary slice = the byte (ASCII)
      "WITH d AS (SELECT doc_id, CAST(text AS BINARY) AS payload FROM documents WHERE text IS NOT NULL AND length(text) > 0), f AS (SELECT doc_id, j, aggregate(filter(sequence(1, octet_length(payload)), i -> (i - 1) % 8 = j), CAST(0.0 AS DOUBLE), (a, i) -> a + CAST(ascii(CAST(substring(payload, i, 1) AS STRING)) AS DOUBLE) / 255.0) AS v FROM d LATERAL VIEW explode(sequence(0, 7)) t AS j) SELECT doc_id, CAST(j AS BIGINT) AS dim, ROUND(v, 4) AS v FROM f ORDER BY doc_id, dim",
    "q150_frame_neardup" -> // head-anchored frame banding + capped window
      // + min-label; unnest(range) -> explode(sequence)
      s"WITH d AS (SELECT doc_id, CAST(text AS BINARY) AS payload FROM documents WHERE text IS NOT NULL AND octet_length(CAST(text AS BINARY)) >= 128), f AS (SELECT doc_id, i, md5(substring(payload, CAST(i * 32 + 1 AS INT), 32)) AS fp FROM d LATERAL VIEW explode(sequence(0, 3)) t AS i), c AS (SELECT doc_id, i, fp FROM (SELECT doc_id, i, fp, COUNT(*) OVER (PARTITION BY i, fp) AS bn FROM f) t WHERE bn <= ${graft.operators.Multimodal.FrameBucketCap}), p AS (SELECT a.doc_id AS id1, b.doc_id AS id2 FROM c a JOIN c b ON a.i = b.i AND a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2 HAVING COUNT(*) >= 2), u AS (SELECT id1 AS doc_id, id2 AS nb FROM p UNION ALL SELECT id2 AS doc_id, id1 AS nb FROM p), m AS (SELECT doc_id, LEAST(doc_id, MIN(nb)) AS cluster FROM u GROUP BY doc_id) SELECT cluster, COUNT(*) AS n_members, CAST(SUM(doc_id) AS BIGINT) AS id_sum FROM m GROUP BY 1 ORDER BY 1",
    "q151_decode_ivf" -> // the q149 fold builds features; graft_cosine (the
      // extension kernel's exact accumulation) + rank = BestCentroid replay
      "WITH d AS (SELECT doc_id, CAST(text AS BINARY) AS payload FROM documents WHERE text IS NOT NULL AND length(text) > 0), st AS (SELECT GREATEST((MAX(doc_id) + 1) div 64, 1) AS stride FROM d), fv AS (SELECT doc_id, j, aggregate(filter(sequence(1, octet_length(payload)), i -> (i - 1) % 8 = j), CAST(0.0 AS DOUBLE), (a, i) -> a + CAST(ascii(CAST(substring(payload, i, 1) AS STRING)) AS DOUBLE) / 255.0) AS x FROM d LATERAL VIEW explode(sequence(0, 7)) t AS j), f AS (SELECT doc_id, transform(array_sort(collect_list(struct(j, x))), s -> s.x) AS v FROM fv GROUP BY doc_id), c AS (SELECT doc_id AS cent_id, v AS cv FROM f CROSS JOIN st WHERE doc_id % stride = 0), a AS (SELECT f.doc_id, c.cent_id, graft_cosine(f.v, c.cv) AS sim FROM f CROSS JOIN c) SELECT doc_id, cent_id AS cluster FROM (SELECT doc_id, cent_id, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sim DESC, cent_id) AS rnk FROM a) r WHERE rnk = 1 ORDER BY doc_id",
    "q88_range_join_binned" -> // epoch_ns(ts) -> raw ts (bigint under nanosAsLong)
      "WITH hrs AS (SELECT ts - (ts % 3600000000000) AS hb, COUNT(*) AS c FROM events GROUP BY 1), st AS (SELECT SUM(c) AS total, COUNT(*) AS n_hours FROM hrs), busy AS (SELECT hb FROM hrs, st WHERE 10 * c * n_hours > 11 * total), isl AS (SELECT MIN(hb) AS start_ns, MAX(hb) + 3600000000000 AS end_ns, COUNT(*) AS island_hours FROM (SELECT hb, hb - ROW_NUMBER() OVER (ORDER BY hb) * 3600000000000 AS grp FROM busy) g GROUP BY grp) SELECT i.start_ns AS island_start, CAST(i.island_hours AS BIGINT) AS island_hours, COUNT(*) AS n_events, COUNT(DISTINCT e.user_id) AS n_users, CAST(ROUND(SUM(CAST(e.value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value FROM events e JOIN isl i ON e.ts >= i.start_ns AND e.ts < i.end_ns GROUP BY 1, 2 ORDER BY 1",
    "q89_tfidf_top_terms" -> // string_split_regex -> split, unnest -> explode, // -> div
      "WITH d AS (SELECT doc_id, lang, lower(text) AS text FROM documents WHERE text IS NOT NULL), tok AS (SELECT doc_id, lang, explode(split(trim(text), '\\\\s+')) AS term FROM d), ft AS (SELECT doc_id, lang, term FROM tok WHERE length(term) >= 3), tf AS (SELECT lang, doc_id, term, COUNT(*) AS tf FROM ft GROUP BY 1, 2, 3), st AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), n AS (SELECT COUNT(*) AS n_docs FROM d), sc AS (SELECT lang, term, SUM(tf) AS ttf FROM tf GROUP BY 1, 2), w AS (SELECT sc.lang, sc.term, CAST(sc.ttf * ((n.n_docs * 1000) div st.df) AS BIGINT) AS score FROM sc JOIN st USING (term) CROSS JOIN n), r AS (SELECT lang, term, score, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, term) AS rnk FROM w) SELECT lang, term, score, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 10 ORDER BY lang, rnk",
    "q90_quota_cap" -> // VARCHAR -> STRING cast spelling
      "WITH r AS (SELECT source, doc_id, ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(concat('q90|', CAST(doc_id AS STRING))), doc_id) AS rnk FROM documents WHERE doc_id IS NOT NULL) SELECT source, COUNT(*) AS n_total, CAST(SUM(CASE WHEN rnk <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, CAST(SUM(CASE WHEN rnk <= 15 THEN doc_id END) AS BIGINT) AS kept_sum FROM r GROUP BY source ORDER BY source",
    "q41_asof_join" -> // ts is bigint epoch-nanos in Spark; div 1000 ≡ the
      // oracle's epoch_us (micro resolution contract, see q41AsofJoin doc)
      "WITH u AS (SELECT user_id, ts div 1000 AS ts, 1 AS is_click FROM events WHERE event_type = 'click' UNION ALL SELECT user_id, ts div 1000 AS ts, 0 AS is_click FROM events WHERE event_type = 'purchase') SELECT user_id, ts, COALESCE(last_purchase_ts, -1) AS last_purchase_ts FROM (SELECT user_id, ts, is_click, MAX(CASE WHEN is_click = 0 THEN ts END) OVER (PARTITION BY user_id ORDER BY ts, is_click ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_ts FROM u) w WHERE is_click = 1 ORDER BY user_id, ts",
    "q42_percentiles" -> // quantile_cont -> percentile (both exact interpolated)
      "SELECT l_returnflag, ROUND(percentile(l_quantity, 0.25), 2) AS p25, ROUND(percentile(l_quantity, 0.5), 2) AS p50, ROUND(percentile(l_quantity, 0.75), 2) AS p75, ROUND(percentile(l_quantity, 0.99), 2) AS p99 FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q49_approx_sketches" -> // the Spark text replays the SKETCH half the
      // oracle can't (approx_count_distinct rsd / percentile_approx) and
      // derives the same in-band booleans the oracle asserts as TRUE;
      // exact distinct spelled as its own two-level collapse, NOT a
      // COUNT(DISTINCT) beside the buffer aggs (see the operator note);
      // NULL custkeys filtered like the operator — a two-level GROUP BY
      // would count a NULL group that COUNT(DISTINCT) ignores
      "WITH sk AS (SELECT o_orderpriority, approx_count_distinct(o_custkey, 0.01) AS est_nd, percentile_approx(o_totalprice, 0.5, 10000) AS est_p50, ROUND(percentile(o_totalprice, 0.5), 2) AS exact_p50, COUNT(*) AS n FROM orders GROUP BY o_orderpriority), nd AS (SELECT o_orderpriority, COUNT(*) AS exact_nd FROM (SELECT o_orderpriority, o_custkey FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1, 2) t GROUP BY 1) SELECT sk.o_orderpriority, exact_nd, exact_p50, n, CAST(500 AS BIGINT) AS nd_band_bp, (abs(est_nd - exact_nd) * 10000 <= exact_nd * 500) AS nd_ok, CAST(500 AS BIGINT) AS p50_band_bp, (abs(est_p50 - exact_p50) * 10000 <= exact_p50 * 500) AS p50_ok FROM sk JOIN nd ON sk.o_orderpriority = nd.o_orderpriority ORDER BY sk.o_orderpriority",
    "q129_hll_rollup" -> // full DataSketches statement on the Spark side;
      // the oracle recomputes the exact half and asserts within_band
      "WITH leaf AS (SELECT o_orderstatus, o_orderpriority, hll_sketch_agg(o_custkey, 12) AS sk FROM orders GROUP BY 1, 2), est AS (SELECT o_orderstatus, COUNT(*) AS n_leaves, hll_sketch_estimate(hll_union_agg(sk, false)) AS est_nd FROM leaf GROUP BY 1), exact AS (SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS exact_nd FROM orders GROUP BY 1) SELECT est.o_orderstatus, n_leaves, exact_nd, CAST(500 AS BIGINT) AS band_bp, (abs(est_nd - exact_nd) * 10000 <= exact_nd * 500) AS within_band FROM est JOIN exact ON est.o_orderstatus = exact.o_orderstatus ORDER BY o_orderstatus",
    "q44_explode_tokens" -> // unnest/string_split_regex -> explode/split
      "SELECT doc_id, word, COUNT(*) AS n FROM (SELECT doc_id, explode(split(trim(text), '\\\\s+')) AS word FROM documents WHERE doc_id < 10) t GROUP BY doc_id, word ORDER BY doc_id, word",
    "q46_string_more" -> // VARCHAR -> STRING cast spelling
      "SELECT p_partkey, LPAD(CAST(p_partkey AS STRING), 8, '0') AS pk8, REPLACE(p_type, ' ', '_') AS ty, SPLIT_PART(p_name, ' ', 1) AS w1, REGEXP_EXTRACT(p_name, '([aeiou]+)', 1) AS vow FROM part ORDER BY p_partkey",
    "q47_date_trunc" -> // strftime -> date_format
      "SELECT date_format(date_trunc('month', o_orderdate), 'yyyy-MM') AS m, COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY 1",
    "q54_tpch_q3" -> // TIMESTAMP literal vs timestamp_ntz column
      "SELECT l_orderkey, CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey WHERE o_orderdate < TIMESTAMP_NTZ '1996-01-01 00:00:00' AND l_shipdate > TIMESTAMP_NTZ '1996-01-01 00:00:00' GROUP BY l_orderkey, o_orderdate ORDER BY revenue DESC, l_orderkey LIMIT 10",
    "q61_string_agg" -> // string_agg(ORDER BY) -> concat_ws/sort_array/collect_list
      "WITH d AS (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders), s AS (SELECT o_orderstatus, concat_ws(',', sort_array(collect_list(o_orderpriority))) AS prios FROM d GROUP BY o_orderstatus), c AS (SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus) SELECT s.o_orderstatus, prios, n FROM s JOIN c USING (o_orderstatus) ORDER BY o_orderstatus",
    "q66_chunk" -> // generate_series/unnest -> sequence/explode; // -> div
      "SELECT doc_id, CAST((i - 1) div 80 AS BIGINT) AS chunk_id, CAST(length(substring(text, i, 100)) AS BIGINT) AS chunk_len, md5(substring(text, i, 100)) AS chunk_md5 FROM (SELECT doc_id, text, explode(sequence(1, length(text), 80)) AS i FROM documents WHERE length(text) >= 1) t ORDER BY doc_id, chunk_id",
    "q67_pii_redact" -> // regexp_count / no 'g' flag in Spark regexp_replace
      "WITH dirty AS (SELECT lang, concat(coalesce(text, ''), ' contact user', doc_id, '@example.com or call 55512340', doc_id) AS d FROM documents), r AS (SELECT lang, regexp_replace(regexp_replace(d, '[A-Za-z0-9_.]+@[A-Za-z0-9.]+', '<EMAIL>'), '[0-9]{7,}', '<NUM>') AS clean, CAST(regexp_count(d, '[A-Za-z0-9_.]+@[A-Za-z0-9.]+') AS BIGINT) AS n_email FROM dirty) SELECT lang, COUNT(*) AS n, SUM(n_email) AS emails_masked, SUM(CAST(regexp_count(clean, '<EMAIL>') AS BIGINT)) AS email_tags, SUM(CAST(regexp_count(clean, '<NUM>') AS BIGINT)) AS num_tags FROM r GROUP BY lang ORDER BY lang",
    "q68_sessionize" -> // ts already bigint epoch-nanos in Spark (no epoch_ns)
      "WITH e AS (SELECT user_id, ts FROM events), m AS (SELECT user_id, ts, CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) > 1800000000000 THEN 1 ELSE 0 END AS brk FROM e), s AS (SELECT user_id, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m), g AS (SELECT user_id, sid, COUNT(*) AS n FROM s GROUP BY 1, 2) SELECT user_id, COUNT(*) AS n_sessions, SUM(n) AS n_events, MAX(n) AS max_session FROM g GROUP BY user_id ORDER BY user_id",
    "q74_top_bigrams" -> // string_split_regex/list index -> split/element_at
      "WITH w AS (SELECT split(trim(text), '\\\\s+') AS words FROM documents), e AS (SELECT concat(element_at(words, CAST(i AS INT)), ' ', element_at(words, CAST(i AS INT) + 1)) AS bigram FROM (SELECT words, explode(sequence(1, size(words) - 1)) AS i FROM w WHERE size(words) >= 2) t) SELECT bigram, COUNT(*) AS n FROM e GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20",
    "q75_repetition" -> // list_distinct/len -> array_distinct/size
      "SELECT lang, ROUND(AVG(rep), 4) AS rep_ratio, ROUND(MAX(rep), 4) AS max_rep, COUNT(*) AS n FROM (SELECT lang, CAST(size(words) - size(array_distinct(words)) AS DOUBLE) / size(words) AS rep FROM (SELECT lang, split(trim(text), '\\\\s+') AS words FROM documents) w) t GROUP BY lang ORDER BY lang",
    "q76_decontaminate" -> // list_slice/array_to_string -> slice/concat_ws
      s"WITH base AS (SELECT doc_id, lang, concat(coalesce(text, ''), CASE WHEN doc_id % 7 = 0 OR doc_id % 100 = 0 THEN ' ${graft.operators.Dedup.Canary}' ELSE '' END) AS text FROM documents), w AS (SELECT doc_id, lang, split(trim(text), '\\\\s+') AS words FROM base), shg AS (SELECT doc_id, lang, concat_ws(' ', slice(words, CAST(i AS INT), 5)) AS sh FROM (SELECT doc_id, lang, words, explode(sequence(1, size(words) - 4)) AS i FROM w WHERE size(words) >= 5) t), b AS (SELECT DISTINCT sh FROM shg WHERE doc_id % 100 = 0), c AS (SELECT DISTINCT s.doc_id, s.lang FROM shg s JOIN b ON s.sh = b.sh WHERE s.doc_id % 100 <> 0) SELECT lang, COUNT(*) AS n_contaminated FROM c GROUP BY lang ORDER BY lang",
    "q77_embedding_norms" -> // list_sum/list_transform -> aggregate HOF
      "SELECT label, ROUND(AVG(nrm), 4) AS avg_norm, ROUND(MIN(nrm), 4) AS min_norm, ROUND(MAX(nrm), 4) AS max_norm, COUNT(*) AS n FROM (SELECT label, SQRT(aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm FROM embeddings) t GROUP BY label ORDER BY label",
    "q80_pack_bins" -> // string_split_regex/len/'//' -> split/size/div
      "WITH t AS (SELECT source, doc_id % 8 AS shard, doc_id, CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) AS tokens FROM documents), p AS (SELECT source, shard, tokens, SUM(tokens) OVER (PARTITION BY source, shard ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens AS prefix FROM t), b AS (SELECT source, shard, tokens, (prefix div 2048) AS bin FROM p) SELECT source, shard, CAST(MAX(bin) + 1 AS BIGINT) AS n_bins, COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS total_tokens FROM b GROUP BY source, shard ORDER BY source, shard",
    "q81_shuffle_order" -> // VARCHAR -> STRING cast spelling
      "SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY md5(concat('e1|', CAST(doc_id AS STRING))), doc_id) AS BIGINT) AS pos FROM documents WHERE doc_id IS NOT NULL ORDER BY doc_id",
    "q83_posexplode" -> // generate_subscripts/unnest -> LATERAL VIEW posexplode
      "SELECT doc_id, CAST(i AS BIGINT) AS i, word FROM documents LATERAL VIEW posexplode(split(trim(text), '\\\\s+')) t AS i, word WHERE doc_id < 5 ORDER BY doc_id, i",
    "q86_map_funcs" -> // json_extract_string -> get_json_object
      "SELECT event_type, 'k,u' AS keys, SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS sum_k, SUM(user_id) AS sum_u, CAST(2 * COUNT(*) AS BIGINT) AS n_entries, COUNT(*) AS n FROM events WHERE props IS NOT NULL GROUP BY event_type ORDER BY event_type, keys",
    "q84_length_buckets" -> // string_split_regex/len -> split/size
      "WITH t AS (SELECT lang, CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) AS tokens FROM documents WHERE text IS NOT NULL), b AS (SELECT lang, tokens, CASE WHEN tokens < 16 THEN 'a_lt16' WHEN tokens < 32 THEN 'b_16_31' WHEN tokens < 64 THEN 'c_32_63' WHEN tokens < 128 THEN 'd_64_127' ELSE 'e_128_plus' END AS bucket FROM t) SELECT lang, bucket, COUNT(*) AS n, CAST(SUM(tokens) AS BIGINT) AS total_tokens, ROUND(CAST(SUM(tokens) AS DOUBLE) / COUNT(*), 2) AS avg_tokens FROM b GROUP BY lang, bucket ORDER BY lang, bucket",
    "q85_quality_gate" -> // no 'g' flag in Spark regexp_replace (global is default)
      "WITH s AS (SELECT lang, CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '')) AS DOUBLE) / LENGTH(text) AS score FROM documents WHERE text IS NOT NULL AND LENGTH(text) > 0), g AS (SELECT lang, score, COUNT(*) AS cnt FROM s GROUP BY 1, 2), c AS (SELECT lang, score, SUM(cnt) OVER (PARTITION BY lang ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM g), t AS (SELECT lang, COUNT(*) AS n FROM s GROUP BY lang), thr AS (SELECT c.lang, MIN(score) AS thr FROM c JOIN t ON c.lang = t.lang WHERE cum * 4 >= n GROUP BY c.lang) SELECT s.lang, COUNT(*) AS n_kept, ROUND(AVG(score), 4) AS avg_kept_score, ROUND(MIN(score), 4) AS min_kept_score FROM s JOIN thr ON s.lang = thr.lang WHERE score >= thr GROUP BY s.lang ORDER BY s.lang",
    "q92_cdc_passages" -> // string_split_regex -> split; generate_subscripts/
      // unnest -> LATERAL VIEW posexplode (0- vs 1-based i: order-only, not
      // output); string_agg(ORDER BY) -> concat_ws/transform/array_sort
      "WITH base AS (SELECT doc_id, concat(text, CASE WHEN doc_id % 5 = 0 THEN ' the quick brown fox jumps over the lazy dog' ELSE '' END) AS t FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), tok AS (SELECT doc_id, i, word FROM base LATERAL VIEW posexplode(split(trim(t), '\\\\s+')) x AS i, word), m AS (SELECT doc_id, i, word, CASE WHEN substring(md5(word), 1, 1) IN ('0', '1') THEN 1 ELSE 0 END AS b FROM tok), pw AS (SELECT doc_id, i, word, SUM(b) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pid FROM m), pas AS (SELECT doc_id, pid, md5(concat_ws(' ', transform(array_sort(collect_list(struct(i, word))), s -> s.word))) AS pmd5 FROM pw GROUP BY doc_id, pid), g AS (SELECT pmd5, COUNT(*) AS copies, COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS keeper FROM pas GROUP BY pmd5) SELECT COUNT(*) AS n_unique_passages, CAST(SUM(copies) AS BIGINT) AS n_passages, CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS cross_doc_groups, CAST(SUM(CASE WHEN n_docs >= 2 THEN copies END) AS BIGINT) AS cross_doc_copies, CAST(SUM(CASE WHEN n_docs >= 2 THEN keeper END) AS BIGINT) AS keeper_sum FROM g",
    "q161_exact_substr_spans" -> // string_split_regex -> split; range lateral
      // -> posexplode over transform(sequence) (pos IS the window start both
      // ways); ws[i+1:i+8] -> slice(ws, i+1, 8); len-guard moves to a
      // subquery so slice never sees a sub-k doc
      "WITH base AS (SELECT doc_id, concat(CASE WHEN doc_id % 3 = 0 THEN 'shared license header text appears before many documents in the crawl corpus ' ELSE '' END, text, CASE WHEN doc_id % 5 = 0 THEN ' subscribe to our newsletter for updates and special offers' ELSE '' END) AS t FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), w AS (SELECT doc_id, ws FROM (SELECT doc_id, split(trim(t), '\\\\s+') AS ws FROM base) WHERE size(ws) >= 8), g AS (SELECT doc_id, pos, h FROM w LATERAL VIEW posexplode(transform(sequence(0, size(ws) - 8), i -> md5(concat_ws(' ', slice(ws, i + 1, 8))))) x AS pos, h), d AS (SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY h) AS copies FROM g), o AS (SELECT doc_id, pos FROM d WHERE copies >= 2), m AS (SELECT doc_id, pos, CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8 THEN 1 ELSE 0 END AS fresh FROM o), i2 AS (SELECT doc_id, pos, SUM(fresh) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id FROM m), sp AS (SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 8 AS span_end FROM i2 GROUP BY doc_id, span_id) SELECT doc_id, CAST(span_start AS BIGINT) AS span_start, CAST(span_end AS BIGINT) AS span_end, CAST(span_end - span_start AS BIGINT) AS span_tokens FROM sp ORDER BY doc_id, span_start",
    "q162_leakage_free_split" -> // CAST('0x…' AS BIGINT) -> conv(hex,16,10)
      // (Spark does not parse 0x-prefixed casts; same dyadic value)
      "WITH ne AS (SELECT doc_id, CASE WHEN doc_id % 100 = 7 THEN 'this exact passage appears verbatim in several crawl snapshots of the corpus' ELSE text END AS text FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), f AS (SELECT doc_id, text, md5(text) AS fp FROM ne), a AS (SELECT doc_id, text, fp, CAST(conv(substring(md5(concat('q162|', fp)), 1, 8), 16, 10) AS BIGINT) % 10 AS h FROM f), sp AS (SELECT doc_id, text, fp, CASE WHEN h < 8 THEN 'train' WHEN h = 8 THEN 'val' ELSE 'test' END AS split FROM a), ps AS (SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_clusters, CAST(SUM(length(text)) AS BIGINT) AS n_chars FROM sp GROUP BY split), bf AS (SELECT fp, COUNT(DISTINCT split) AS n_splits, COUNT(*) AS sz FROM sp GROUP BY fp), el AS (SELECT CAST(SUM(CASE WHEN n_splits >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS exact_leak_groups, CAST(MAX(sz) AS BIGINT) AS max_cluster FROM bf), pg AS (SELECT lower(substring(trim(text), 1, 24)) AS sig, COUNT(DISTINCT split) AS n_splits, COUNT(DISTINCT fp) AS n_fps FROM sp GROUP BY sig), pl AS (SELECT CAST(SUM(CASE WHEN n_splits >= 2 AND n_fps >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS prefix_leak_groups FROM pg) SELECT split, n_docs, n_clusters, n_chars, exact_leak_groups, max_cluster, prefix_leak_groups FROM ps, el, pl ORDER BY split",
    "q93_inverted_index" -> // string_agg(ORDER BY) -> concat_ws over sorted list
      "WITH tok AS (SELECT doc_id, explode(split(trim(lower(text)), '\\\\s+')) AS term FROM documents WHERE text IS NOT NULL), ft AS (SELECT doc_id, term FROM tok WHERE length(term) >= 3), td AS (SELECT term, doc_id, COUNT(*) AS tf_d FROM ft GROUP BY 1, 2), st AS (SELECT term, COUNT(*) AS df, CAST(SUM(tf_d) AS BIGINT) AS tf FROM td GROUP BY term), r AS (SELECT term, doc_id, ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn FROM td), p AS (SELECT term, concat_ws(',', transform(array_sort(collect_list(doc_id)), x -> CAST(x AS STRING))) AS posting FROM r WHERE rn <= 5 GROUP BY term) SELECT st.term, df, tf, posting FROM st JOIN p ON st.term = p.term ORDER BY df DESC, st.term LIMIT 50",
    "q94_hopping_windows" -> // epoch_ns -> raw bigint ts; unnest([0,1]) -> explode(array)
      "WITH e AS (SELECT ts AS tns, event_type, user_id, value FROM events), x AS (SELECT tns - (tns % 3600000000000) - k * 3600000000000 AS wstart, event_type, user_id, value FROM e LATERAL VIEW explode(array(0L, 1L)) kk AS k) SELECT wstart, event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users, CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sv FROM x GROUP BY 1, 2 ORDER BY 1, 2",
    "q95_mixture_resample" -> // '//' -> div, VARCHAR -> STRING
      "WITH d AS (SELECT source, doc_id FROM documents WHERE doc_id IS NOT NULL), c AS (SELECT source, COUNT(*) AS n_total FROM d GROUP BY source), w AS (SELECT source, n_total, CAST(FLOOR(SQRT(CAST(n_total AS DOUBLE)) * 1000) AS BIGINT) AS w FROM c), t AS (SELECT SUM(w) AS sum_w, SUM(n_total) AS n_all FROM w), q AS (SELECT source, n_total, ((n_all div 2) * w) div sum_w AS quota FROM w, t), r AS (SELECT source, doc_id, ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(concat('q95|', CAST(doc_id AS STRING))), doc_id) AS rnk FROM d) SELECT q.source, q.n_total, CAST(q.quota AS BIGINT) AS quota, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS kept_sum FROM r JOIN q ON r.source = q.source WHERE rnk <= quota GROUP BY 1, 2, 3 ORDER BY q.source",
    "q96_funnel" -> // epoch_us(ts) -> ts div 1000 (µs truncation contract)
      "WITH e AS (SELECT user_id, ts div 1000 AS t, event_type FROM events), v AS (SELECT user_id, MIN(t) AS vt FROM e WHERE event_type = 'view' GROUP BY user_id), c AS (SELECT e.user_id, MIN(t) AS ct FROM e JOIN v ON e.user_id = v.user_id WHERE event_type = 'click' AND t > vt GROUP BY e.user_id), p AS (SELECT e.user_id, MIN(t) AS pt FROM e JOIN c ON e.user_id = c.user_id WHERE event_type = 'purchase' AND t > ct GROUP BY e.user_id) SELECT v.user_id % 10 AS bucket, COUNT(*) AS n_view, COUNT(ct) AS n_click, COUNT(pt) AS n_purchase, CAST(SUM(ct - vt) AS BIGINT) AS total_lag_us FROM v LEFT JOIN c ON v.user_id = c.user_id LEFT JOIN p ON v.user_id = p.user_id GROUP BY 1 ORDER BY 1",
    "q97_rolling_range" -> // epoch_us(ts) -> ts div 1000
      "WITH e AS (SELECT user_id, ts div 1000 AS t, CAST(value AS DECIMAL(12,2)) AS v FROM events), r AS (SELECT user_id, COUNT(*) OVER win AS n_1h, SUM(v) OVER win AS v_1h FROM e WINDOW win AS (PARTITION BY user_id ORDER BY t RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)) SELECT user_id, MAX(n_1h) AS max_burst, CAST(MAX(v_1h) AS DOUBLE) AS max_value_1h FROM r GROUP BY user_id ORDER BY user_id",
    "q98_bigram_lm" -> // string_split_regex/unnest/words[i]/'//' -> split/explode/element_at/div
      "WITH w AS (SELECT split(trim(lower(text)), '\\\\s+') AS words FROM documents WHERE text IS NOT NULL), e AS (SELECT element_at(words, CAST(i AS INT)) AS w1, element_at(words, CAST(i AS INT) + 1) AS w2 FROM (SELECT words, explode(sequence(1, size(words) - 1)) AS i FROM w WHERE size(words) >= 2) t), c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM e GROUP BY 1, 2), c1 AS (SELECT w1, CAST(SUM(n2) AS BIGINT) AS n1 FROM c2 GROUP BY w1) SELECT c2.w1, c2.w2, c2.n2, c1.n1, CAST(c2.n2 * 1000000 div c1.n1 AS BIGINT) AS p_ppm FROM c2 JOIN c1 USING (w1) ORDER BY c2.n2 DESC, c2.w1, c2.w2 LIMIT 30",
    "q101_gap_fill" -> // epoch_ns -> raw ts; unnest(generate_series) -> explode(sequence)
      "WITH hrs AS (SELECT ts - (ts % 3600000000000) AS hb, COUNT(*) AS n FROM events GROUP BY 1), b AS (SELECT MIN(hb) AS lo, MAX(hb) AS hi FROM hrs), dense AS (SELECT explode(sequence(lo, hi, 3600000000000)) AS hb FROM b), f AS (SELECT d.hb, COALESCE(n, 0) AS n FROM dense d LEFT JOIN hrs ON d.hb = hrs.hb), g AS (SELECT hb FROM f WHERE n = 0), r AS (SELECT hb - ROW_NUMBER() OVER (ORDER BY hb) * 3600000000000 AS grp FROM g), runs AS (SELECT grp, COUNT(*) AS run FROM r GROUP BY grp), gs AS (SELECT COUNT(*) AS n_gap_runs, COALESCE(MAX(run), 0) AS max_gap_run FROM runs) SELECT (SELECT COUNT(*) FROM f) AS n_hours, (SELECT COUNT(*) FROM f WHERE n > 0) AS n_data_hours, (SELECT COUNT(*) FROM f WHERE n = 0) AS n_gap_hours, CAST(n_gap_runs AS BIGINT) AS n_gap_runs, CAST(max_gap_run AS BIGINT) AS max_gap_run FROM gs",
    "q105_session_window" -> // the SQL spelling of the NATIVE operator
      // (session_window in GROUP BY), vs the oracle's island algorithm
      "SELECT user_id, unix_micros(session_window.start) AS session_start_us, unix_micros(session_window.`end`) AS session_end_us, COUNT(*) AS n_events FROM events GROUP BY user_id, session_window(timestamp_micros(ts div 1000), '30 minutes') ORDER BY user_id, session_start_us",
    "q107_percentile_disc" -> // quantile_disc(x, p) -> SQL-standard
      // PERCENTILE_DISC(p) WITHIN GROUP (ORDER BY x)
      "SELECT l_returnflag, percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25, percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS p50, percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS p90, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q108_forward_fill" -> // IGNORE NULLS placement: inside the call in
      // DuckDB, after it in Spark; epoch_us -> ts div 1000
      "WITH e AS (SELECT user_id, ts div 1000 AS t, CAST(ROUND(value*100) AS BIGINT) AS cents FROM events), m AS (SELECT user_id, t, cents, CASE WHEN (user_id + cents) % 5 = 0 THEN NULL ELSE cents END AS v FROM e) SELECT user_id, t, COALESCE(last_value(v) IGNORE NULLS OVER (PARTITION BY user_id ORDER BY t, cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS filled_cents FROM m ORDER BY user_id, t, filled_cents",
    "q109_unpivot" -> // DuckDB UNPIVOT..INTO NAME..VALUE -> Spark UNPIVOT (v FOR k IN (...))
      "WITH wide AS (SELECT lang, CAST(SUM(CASE WHEN source='src0' THEN 1 ELSE 0 END) AS BIGINT) AS src0, CAST(SUM(CASE WHEN source='src1' THEN 1 ELSE 0 END) AS BIGINT) AS src1, CAST(SUM(CASE WHEN source='src2' THEN 1 ELSE 0 END) AS BIGINT) AS src2 FROM documents GROUP BY lang) SELECT lang, src, n FROM wide UNPIVOT (n FOR src IN (src0, src1, src2)) ORDER BY lang, src",
    "q110_explode_outer" -> // unnest-or-NULL union -> LATERAL VIEW OUTER explode
      "WITH w AS (SELECT doc_id, filter(split(trim(text), '\\\\s+'), x -> length(x) >= 7) AS ws FROM documents WHERE text IS NOT NULL) SELECT doc_id, tok FROM w LATERAL VIEW OUTER explode(ws) x AS tok ORDER BY doc_id, tok NULLS FIRST",
    "q111_curation_funnel" -> // string_split_regex/list_slice/array_to_string/
      // unnest(generate_series)/len/VARCHAR -> split/slice/concat_ws/
      // explode(sequence)/size/STRING; no 'g' flag
      "WITH ne AS (SELECT doc_id, source, text FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), q AS (SELECT * FROM ne WHERE CAST(length(regexp_replace(text, '[^A-Za-z]', '')) AS DOUBLE) / length(text) >= 0.45), k AS (SELECT md5(text) AS fp, MIN(doc_id) AS keep FROM q GROUP BY 1), d AS (SELECT q.* FROM q JOIN k ON md5(q.text) = fp AND q.doc_id = keep), qw AS (SELECT doc_id, split(trim(text), '\\\\s+') AS words FROM q), shc AS (SELECT doc_id, concat_ws(' ', slice(words, CAST(i AS INT), 5)) AS sh FROM (SELECT doc_id, words, explode(sequence(1, size(words) - 4)) AS i FROM qw WHERE size(words) >= 5) t), bw AS (SELECT split(trim(text), '\\\\s+') AS words FROM documents WHERE doc_id % 100 = 0), bsh AS (SELECT DISTINCT concat_ws(' ', slice(words, CAST(i AS INT), 5)) AS sh FROM (SELECT words, explode(sequence(1, size(words) - 4)) AS i FROM bw WHERE size(words) >= 5) t), contam AS (SELECT DISTINCT doc_id FROM shc JOIN bsh USING (sh)), c AS (SELECT * FROM d WHERE doc_id NOT IN (SELECT doc_id FROM contam)), r AS (SELECT doc_id, source, ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(concat('curate|', CAST(doc_id AS STRING))), doc_id) AS rnk FROM c), cap AS (SELECT doc_id FROM r WHERE rnk <= 15), p AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY md5(concat('curate|pos|', CAST(doc_id AS STRING))), doc_id) AS pos FROM cap) SELECT (SELECT COUNT(*) FROM ne) AS n_non_empty, (SELECT COUNT(*) FROM q) AS n_quality, (SELECT COUNT(*) FROM d) AS n_dedup, (SELECT COUNT(*) FROM c) AS n_clean, (SELECT COUNT(*) FROM cap) AS n_capped, CAST((SELECT SUM(doc_id) FROM cap) AS BIGINT) AS kept_id_sum, CAST((SELECT SUM(doc_id * pos) FROM p) AS BIGINT) AS pos_checksum",
    "q112_percentile_disc_sharded" -> // the sharded order-statistic
      // decomposition spelled as SQL text (quantile_disc has no Spark twin;
      // the built-in WITHIN GROUP spelling is s107's text — this lane covers
      // the 100 TB spelling's dialect surface)
      "WITH li AS (SELECT l_returnflag, l_extendedprice AS v, CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS c FROM lineitem), ls AS (SELECT *, c div 100000 AS sh FROM li), r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag, sh ORDER BY c) AS BIGINT) AS rn FROM ls), st AS (SELECT l_returnflag, sh, MAX(rn) AS shCnt FROM r GROUP BY 1, 2), st2 AS (SELECT l_returnflag, sh, COALESCE(SUM(shCnt) OVER (PARTITION BY l_returnflag ORDER BY sh ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS shPrefix, SUM(shCnt) OVER (PARTITION BY l_returnflag) AS n FROM st), j AS (SELECT r.l_returnflag, r.v, r.rn + st2.shPrefix AS cum, st2.n FROM r JOIN st2 ON r.l_returnflag = st2.l_returnflag AND r.sh = st2.sh) SELECT l_returnflag, MIN(CASE WHEN cum * 4 >= n THEN v END) AS p25, MIN(CASE WHEN cum * 2 >= n THEN v END) AS p50, MIN(CASE WHEN cum * 10 >= n * 9 THEN v END) AS p90, MAX(n) AS n FROM j GROUP BY l_returnflag ORDER BY l_returnflag",
    "q115_weighted_sample" -> // '0x' hex cast -> conv(,16,10); VARCHAR -> STRING
      "WITH d AS (SELECT doc_id, source, n_chars + 1 AS w FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL), u AS (SELECT doc_id, source, w, CAST(CAST(conv(substring(md5(concat('q115|', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) + 1 AS DOUBLE) / 4294967297.0 AS u FROM d), p AS (SELECT doc_id, source, w, -ln(u) / w AS pri FROM u), r AS (SELECT source, doc_id, w, ROW_NUMBER() OVER (PARTITION BY source ORDER BY pri, doc_id) AS rnk FROM p) SELECT source, CAST(rnk AS BIGINT) AS rnk, doc_id, CAST(w AS BIGINT) AS w FROM r WHERE rnk <= 20 ORDER BY source, rnk",
    "q116_bigram_rarity" -> // string_split_regex/list_slice/array_to_string/
      // unnest(generate_series)/len/'//'  ->  split/slice/concat_ws/
      // explode(sequence)/size/div
      "WITH w AS (SELECT doc_id, split(trim(lower(text)), '\\\\s+') AS words FROM documents WHERE text IS NOT NULL), db AS (SELECT doc_id, concat_ws(' ', slice(words, CAST(i AS INT), 2)) AS bg FROM (SELECT doc_id, words, explode(sequence(1, size(words) - 1)) AS i FROM w WHERE size(words) >= 2) t), c2 AS (SELECT bg, COUNT(*) AS c2 FROM db GROUP BY bg), pd AS (SELECT doc_id, COUNT(*) AS n_bigrams, MIN(c2) AS min_c2, SUM(c2) AS sum_c2 FROM db JOIN c2 USING (bg) GROUP BY doc_id) SELECT doc_id, n_bigrams, CAST(min_c2 AS BIGINT) AS min_c2, CAST(sum_c2 * 1000000 div n_bigrams AS BIGINT) AS mean_c2_ppm FROM pd ORDER BY mean_c2_ppm, doc_id LIMIT 20",
    "q117_scd2_intervals" -> // epoch_us(ts) -> ts div 1000 (µs contract)
      "WITH e AS (SELECT user_id, ts div 1000 AS t, event_id, event_type FROM events), m AS (SELECT user_id, t, event_id, event_type, CASE WHEN LAG(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL OR LAG(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id) <> event_type THEN 1 ELSE 0 END AS chg FROM e), s AS (SELECT user_id, t, event_type, SUM(chg) OVER (PARTITION BY user_id ORDER BY t, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS interval_seq FROM m), g AS (SELECT user_id, interval_seq, MIN(event_type) AS event_type, MIN(t) AS valid_from_us, COUNT(*) AS n_events FROM s GROUP BY 1, 2) SELECT user_id, CAST(interval_seq AS BIGINT) AS interval_seq, event_type, valid_from_us, COALESCE(LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY interval_seq), -1) AS valid_to_us, n_events FROM g ORDER BY user_id, interval_seq",
    "q118_mad_outliers" -> // quantile_disc(x, p) -> PERCENTILE_DISC(p)
      // WITHIN GROUP (ORDER BY x), CAST back to BIGINT (Spark returns the
      // ordering column's type only for numeric-widened inputs)
      "WITH li AS (SELECT l_returnflag AS f, CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS c FROM lineitem), med AS (SELECT f, CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c) AS BIGINT) AS med_cents FROM li GROUP BY f), dev AS (SELECT li.f, c, med_cents, abs(c - med_cents) AS d FROM li JOIN med USING (f)), mad AS (SELECT f, CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY d) AS BIGINT) AS mad_cents FROM dev GROUP BY f) SELECT f AS l_returnflag, MAX(med_cents) AS med_cents, MAX(mad_cents) AS mad_cents, COUNT(*) AS n, CAST(SUM(CASE WHEN d * 2 > 3 * mad_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers FROM dev JOIN mad USING (f) GROUP BY f ORDER BY f",
    "q121_fuzzy_pairs" -> // length(sig) // 8 -> div (Spark has no '//')
      s"WITH d AS (SELECT doc_id, lower(substring(trim(text), 1, 24)) AS sig FROM documents WHERE text IS NOT NULL), b0 AS (SELECT doc_id, sig, substring(sig, 1, 4) AS blk, CAST(length(sig) div 8 AS BIGINT) AS lb FROM d), b AS (SELECT doc_id, sig, blk, lb FROM (SELECT doc_id, sig, blk, lb, COUNT(*) OVER (PARTITION BY blk, lb) AS bn FROM b0) t WHERE bn <= ${graft.operators.Dedup.FuzzyBlockCap}) SELECT a.doc_id AS id1, c.doc_id AS id2, CAST(levenshtein(a.sig, c.sig) AS BIGINT) AS lev FROM b a JOIN b c ON a.blk = c.blk AND a.lb = c.lb AND a.doc_id < c.doc_id WHERE levenshtein(a.sig, c.sig) <= 6 ORDER BY id1, id2",
    "q130_source_mixing" -> // string_split_regex/len/'//' -> split/size/div
      "WITH per AS (SELECT source, COUNT(*) AS n_docs, CAST(SUM(size(split(trim(text), '\\\\s+'))) AS BIGINT) AS n_tokens FROM documents WHERE text IS NOT NULL GROUP BY source), z AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens, SUM(sqrt(CAST(n_tokens AS DOUBLE))) AS z FROM per) SELECT source, n_docs, n_tokens, CAST(n_tokens * 1000000 div tot_tokens AS BIGINT) AS prop_ppm, CAST(ROUND(sqrt(CAST(n_tokens AS DOUBLE)) / z * 10000, 0) AS BIGINT) AS temp_bp FROM per, z ORDER BY source",
    "q131_contamination_score" -> // list_slice/array_to_string/unnest(
      // generate_series)/len/'//' -> slice/concat_ws/explode(sequence)/size/div
      s"WITH base AS (SELECT doc_id, concat(coalesce(text, ''), CASE WHEN doc_id % 7 = 0 OR doc_id % 100 = 0 THEN ' ${graft.operators.Dedup.Canary}' ELSE '' END) AS text FROM documents), w AS (SELECT doc_id, split(trim(text), '\\\\s+') AS words FROM base), shg AS (SELECT doc_id, concat_ws(' ', slice(words, CAST(i AS INT), 5)) AS sh FROM (SELECT doc_id, words, explode(sequence(1, size(words) - 4)) AS i FROM w WHERE size(words) >= 5) t), b AS (SELECT DISTINCT sh FROM shg WHERE doc_id % 100 = 0), c AS (SELECT s.doc_id, COUNT(*) AS n_shingles, CAST(SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contam FROM (SELECT * FROM shg WHERE doc_id % 100 <> 0) s LEFT JOIN b ON s.sh = b.sh GROUP BY s.doc_id) SELECT doc_id, n_shingles, n_contam, CAST(n_contam * 1000000 div n_shingles AS BIGINT) AS contam_ppm FROM c WHERE n_contam > 0 ORDER BY doc_id",
    "q132_cross_source_dups" -> // '//'/VARCHAR -> div/STRING
      s"WITH base AS (SELECT source, CASE WHEN doc_id % ${graft.operators.Dedup.DupFixMod} = 0 THEN concat('${graft.operators.Dedup.DupFixPrefix}', CAST(doc_id div ${graft.operators.Dedup.DupFixWindow} AS STRING)) ELSE text END AS text FROM documents WHERE text IS NOT NULL), fp AS (SELECT DISTINCT md5(text) AS fp, source FROM base) SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared_fps FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source GROUP BY 1, 2 ORDER BY 1, 2",
    "q133_tpch_q5" -> // TIMESTAMP literal vs timestamp_ntz column
      "SELECT n_name, CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue FROM customer, orders, lineitem, supplier, nation, region WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'ASIA' AND o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP_NTZ '1997-01-01 00:00:00' GROUP BY n_name ORDER BY revenue DESC, n_name",
    "q134_tpch_q7" -> // TIMESTAMP literal vs timestamp_ntz column
      "SELECT r1.r_name AS supp_region, r2.r_name AS cust_region, CAST(year(l_shipdate) AS BIGINT) AS l_year, CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS volume FROM supplier, lineitem, orders, customer, nation n1, nation n2, region r1, region r2 WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey AND n1.n_regionkey = r1.r_regionkey AND n2.n_regionkey = r2.r_regionkey AND ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE') OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA')) AND l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP_NTZ '1998-01-01 00:00:00' GROUP BY 1, 2, 3 ORDER BY 1, 2, 3",
    "q122_retention_cohorts" -> // epoch_us(ts) // N -> ts div 1000 div N
      "WITH e AS (SELECT user_id, ts div 1000 div 86400000000 AS d FROM events), c AS (SELECT user_id, MIN(d) AS cohort_day FROM e GROUP BY user_id), a AS (SELECT DISTINCT user_id, d FROM e) SELECT cohort_day, d - cohort_day AS offset, COUNT(DISTINCT a.user_id) AS n_users FROM a JOIN c USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2",
    "q123_tpch_q15" -> // TIMESTAMP literal vs timestamp_ntz column
      "WITH revenue AS (SELECT l_suppkey AS supplier_no, CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS total_revenue FROM lineitem WHERE l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP_NTZ '1996-04-01 00:00:00' GROUP BY l_suppkey) SELECT supplier_no, total_revenue FROM revenue WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue) ORDER BY supplier_no",
    "q125_tpch_q22" -> // TIMESTAMP literal vs timestamp_ntz column
      "SELECT c_nationkey % 10 AS code, COUNT(*) AS numcust, CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal FROM customer c WHERE c_nationkey % 10 IN (0, 1, 2, 3, 4, 5, 6) AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0 AND c_nationkey % 10 IN (0, 1, 2, 3, 4, 5, 6)) AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP_NTZ '1999-01-01 00:00:00') GROUP BY c_nationkey % 10 ORDER BY code",
    "q128_latest_per_key" -> // epoch_us(ts) -> ts div 1000 (µs contract)
      "WITH e AS (SELECT user_id, ts div 1000 AS t, event_id, event_type FROM events), r AS (SELECT user_id, t, event_id, event_type, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t DESC, event_id DESC) AS rn FROM e) SELECT user_id, t AS last_t_us, event_id AS last_event_id, event_type AS last_event_type FROM r WHERE rn = 1 ORDER BY user_id",
    "q25_hash_bucket" -> // the oracle computes Java String#hashCode with a
      // DuckDB list_reduce fold; the Spark text calls the session-extension
      // java_string_hash (the R7 parity Expression) with the reference's
      // abs-after-mod partition rule (AvroProducer.java:82)
      "SELECT c_custkey, CAST(abs(java_string_hash(c_name) % 8) AS BIGINT) AS bucket FROM customer ORDER BY c_custkey",
    "q53_char_ngram_jaccard" -> // range() lateral -> explode(sequence)
      "WITH w AS (SELECT doc_id, substring(text, i, 3) AS word FROM (SELECT doc_id, text, explode(sequence(1, length(text) - 2)) AS i FROM documents WHERE doc_id < 20)), d AS (SELECT DISTINCT doc_id, word FROM w), s AS (SELECT doc_id, COUNT(*) AS sz FROM d GROUP BY doc_id), c AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter FROM d a JOIN d b ON a.word = b.word AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT id1, id2, ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) AS jaccard FROM c JOIN s sa ON sa.doc_id = id1 JOIN s sb ON sb.doc_id = id2 ORDER BY id1, id2",
  )

  // ---------------------------------------------------------------------
  // Spark-dialect twins for the engine-internal lanes (historically the
  // "rows-only" lane, r5 verdict #7 — since r10 every lane is oracle-gated:
  // these entries carry GOLDEN oracles where the output is genuinely
  // engine-internal (q49/q87/q129: sketches, Lloyd-refined recall) and
  // COMPUTED DuckDB replays since r11 for the rest (q39/q48/q113/q114 +
  // the q34/q35/q40/q50 hash family). The SQL dialect surface (hash
  // families, HOF lambdas, the graft_cosine extension function, window
  // group-limits) is exercised exactly where the plans are most custom.
  // Wide spellings are generated programmatically below; they mirror the
  // DataFrame operators' hash families bit-for-bit except where noted
  // (s87's Lloyd refinement is imperative driver logic with no
  // single-statement SQL form, so its IVF branch runs unrefined and its
  // LSH branch 2 tables — the recall METRIC shape is identical, the tuning
  // point differs and is labeled as such).

  /** The replayable-family base hash x(s) in Spark SQL text (r11: the
    * xxhash64 family left for the universal family — Dedup's scaladoc). */
  private[graft] def baseHashSql(s: String): String =
    s"(CAST(java_string_hash($s) AS BIGINT) & 4294967295) % ${graft.operators.Dedup.MinhashP}"

  /** 16 min-hash aggregates + 4 band signatures (Dedup.MinHashK/BandRows);
    * constants interpolated from the SAME tabulated arrays the DataFrame
    * lane uses. */
  private def minhashSigSql: String = {
    import graft.operators.Dedup.{minhashA, minhashB, MinhashP}
    val mins = (0 until 16)
      .map(i => s"MIN((${minhashA(i)} * h + ${minhashB(i)}) % $MinhashP) AS mh$i")
      .mkString(", ")
    s"SELECT doc_id, $mins FROM shh GROUP BY doc_id"
  }
  private def bandStructsSql: String =
    (0 until 4).map { b =>
      def mh(r: Int) = s"mh${b * 4 + r}"
      s"named_struct('band', $b, 'sig1', ${mh(0)} * 2147483648L + ${mh(1)}, " +
        s"'sig2', ${mh(2)} * 2147483648L + ${mh(3)})"
    }.mkString("array(", ", ", ")")

  /** Per-row random-hyperplane LSH bucket over `v` — the HOF spelling of
    * functions.LshBucket's family: h_b[i] = pmod(xxhash64(tbl·nBits+b, i),
    * 1000)/1000 − 0.5, bit set when the dot is positive. The index rides
    * transform's (x, i) lambda over `v` itself — total on a zero-length
    * vector (empty fold → dot 0.0 → bit clear → bucket 0, exactly the
    * LshBucket kernel's degenerate case), where the earlier
    * sequence(0, size(v)-1) spelling produced a DESCENDING [0,-1] index
    * array and crashed on element_at(v, 0) (r6 ADVICE #5). */
  private[graft] def lshBucketSql(nBits: Int, table: Int): String =
    (0 until nBits).map { b =>
      val seed = table * nBits + b
      s"(CASE WHEN aggregate(transform(v, (x, i) -> " +
        s"CAST(x AS DOUBLE) * ((CAST(pmod(xxhash64($seed, i), 1000) AS DOUBLE) / 1000.0) - 0.5)), " +
        s"CAST(0.0 AS DOUBLE), (acc, y) -> acc + y) > 0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", " + ", ")")

  private def simhashSql: String = {
    import graft.operators.Dedup.{simhashA, simhashB, MinhashP}
    val votes = (0 until 64).map(b =>
      s"SUM(CASE WHEN ((${simhashA(b)} * h + ${simhashB(b)}) % $MinhashP) % 2 = 1 " +
        s"THEN 1 ELSE -1 END) AS v$b").mkString(", ")
    def pack(bits: Range, base: Int) = bits.map(b =>
      s"(CASE WHEN v$b > 0 THEN CAST(${1L << (b - base)} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    "WITH w AS (SELECT doc_id, explode(split(trim(text), '\\\\s+')) AS wd FROM documents), " +
      s"h AS (SELECT doc_id, ${baseHashSql("wd")} AS h FROM w), " +
      s"v AS (SELECT doc_id, $votes FROM h GROUP BY doc_id) " +
      s"SELECT doc_id, ${pack(32 until 64, 32)} AS simhash_hi, " +
      s"${pack(0 until 32, 0)} AS simhash_lo FROM v ORDER BY doc_id"
  }

  /** PQ-ADC (q113) SQL twin — IDENTICAL math to the DataFrame lane, so the
    * conformance loop pins row-for-row parity (unlike s87, no labeled
    * divergence): the per-subspace argmax folds the SAME sorted codebook
    * with strict `>` and graft_cosine (the exact kernel BestCentroid fuses
    * per-element), and the ADC scorer folds the same flat LUTs in the same
    * index order. */
  private def pqArgmaxSql(m: Int): String = {
    val sv = s"slice(v, ${m * 8 + 1}, 8)"
    s"aggregate(cb$m, named_struct('b', CAST('-Infinity' AS DOUBLE), 'id', CAST(-1 AS BIGINT)), " +
      s"(acc, c) -> CASE WHEN graft_cosine($sv, c.centv) > acc.b " +
      s"THEN named_struct('b', graft_cosine($sv, c.centv), 'id', c.cent_id) ELSE acc END).id"
  }
  private def pqSql: String = {
    val M = 8; val K = 16
    val cbCols = (0 until M).map(m =>
      s"sort_array(collect_list(named_struct('cent_id', vec_id, 'centv', slice(v, ${m * 8 + 1}, 8)))) AS cb$m").mkString(", ")
    val nlut = (0 until M).map(m =>
      s"transform(cb$m, c -> aggregate(c.centv, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x))")
      .mkString("flatten(array(", ", ", "))")
    val qlut = (0 until M).map(m =>
      s"transform(cb$m, c -> aggregate(zip_with(slice(qv, ${m * 8 + 1}, 8), c.centv, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x))")
      .mkString("flatten(array(", ", ", "))")
    val codesArr = (0 until M).map(pqArgmaxSql).mkString("array(", ", ", ")")
    def fold(lut: String) =
      s"aggregate(transform(codes, (c, i) -> CASE WHEN c < 0 THEN CAST(0.0 AS DOUBLE) " +
        s"ELSE element_at($lut, CAST(i * $K + c + 1 AS INT)) END), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    "WITH e AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
      s"cbr AS (SELECT $cbCols FROM (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS vec_id, v FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $K) eb0) ebk), " +
      s"cb AS (SELECT *, $nlut AS nlut FROM cbr), " +
      s"codes AS (SELECT vec_id AS cid, $codesArr AS codes FROM e CROSS JOIN cb), " +
      "q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 20), " +
      s"qlut AS (SELECT qid, $qlut AS lut, nlut, sqrt(aggregate(qv, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x)) AS qn FROM q CROSS JOIN cb), " +
      s"scored AS (SELECT qid, cid, nanvl(${fold("lut")} / (qn * sqrt(${fold("nlut")})), CAST(-2.0 AS DOUBLE)) AS sim FROM qlut JOIN codes ON qid <> cid), " +
      "top AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk FROM scored) t WHERE rnk <= 10), " +
      "truth AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk FROM (SELECT qid, b.vec_id AS cid, round(graft_cosine(qv, b.v), 4) AS sim FROM q JOIN e b ON qid <> b.vec_id) raw) t WHERE rnk <= 10), " +
      "h AS (SELECT COUNT(*) AS hits FROM truth LEFT SEMI JOIN top ON truth.qid = top.qid AND truth.cid = top.cid), " +
      "d AS (SELECT COUNT(*) AS denom FROM truth) " +
      "SELECT 'pq_m8_k16_adc' AS method, round(CAST(hits AS DOUBLE) / denom, 4) AS recall, " +
      "CAST(hits AS BIGINT) AS hits, CAST(denom AS BIGINT) AS denom, " +
      "CAST(4 AS BIGINT) AS bytes_per_vec, CAST(64 AS BIGINT) AS compression_x, " +
      "CAST(1000 AS BIGINT) AS floor_bp, hits * 10000 >= denom * 1000 AS floor_ok " +
      "FROM h CROSS JOIN d"
  }

  /** IVF-PQ (q114) SQL twin — like s113, IDENTICAL math to the DataFrame
    * lane: the coarse assignment folds the sorted centroid array with
    * strict `>` and graft_cosine (BestCentroid's exact contract, including
    * the -1/NaN degenerate case), the probe ranks by (cosine DESC,
    * cent_id), and the codes/LUT/ADC pieces are the s113 spellings scoped
    * to probed clusters. */
  /** Shared IVF-PQ CTE prefix (s114/s153): everything through the ADC
    * `scored` relation plus the exact `truth`/`h`/`d`/`sc`/`nn`/`nq`
    * accounting tails both twins end on. */
  private def ivfPqCommonCtes: String = ivfPqCommonCtes("")
  private def ivfPqCommonCtes(candFilter: String): String =
    ivfPqCommonCtes(candFilter, None)

  /** `adaptive = Some((allowedSubquerySql, floor))` swaps the static
    * nprobe-4 probe CTE for the q171 prefix rule — probes expand in
    * centroid-similarity order until the probed clusters hold ≥ floor
    * allowed candidates (never fewer than the static 4) — and adds the
    * per-query `np` (n_probes) CTE for the final projection. */
  private def ivfPqCommonCtes(candFilter: String,
                              adaptive: Option[(String, Int)]): String =
    ivfPqCommonCtes(candFilter, adaptive, "")

  /** `embWhere` (s176) filters the corpus relation itself — quantizer
    * training, codes, and queries all re-derive over the filtered set
    * (the retrained-quantizer contract; every other serve twin keeps the
    * full-corpus frozen quantizers). */
  private def ivfPqCommonCtes(candFilter: String,
                              adaptive: Option[(String, Int)],
                              embWhere: String): String = {
    val M = 8; val K = 16
    val cbCols = (0 until M).map(m =>
      s"sort_array(collect_list(named_struct('cent_id', vec_id, 'centv', slice(v, ${m * 8 + 1}, 8)))) AS cb$m").mkString(", ")
    val nlut = (0 until M).map(m =>
      s"transform(cb$m, c -> aggregate(c.centv, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x))")
      .mkString("flatten(array(", ", ", "))")
    val qlut = (0 until M).map(m =>
      s"transform(cb$m, c -> aggregate(zip_with(slice(qv, ${m * 8 + 1}, 8), c.centv, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x))")
      .mkString("flatten(array(", ", ", "))")
    val codesArr = (0 until M).map(pqArgmaxSql).mkString("array(", ", ", ")")
    def fold(lut: String) =
      s"aggregate(transform(codes, (c, i) -> CASE WHEN c < 0 THEN CAST(0.0 AS DOUBLE) " +
        s"ELSE element_at($lut, CAST(i * $K + c + 1 AS INT)) END), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    val assignFold =
      "aggregate(cents, named_struct('b', CAST('-Infinity' AS DOUBLE), 'id', CAST(-1 AS BIGINT)), " +
        "(acc, c) -> CASE WHEN graft_cosine(v, c.centv) > acc.b " +
        "THEN named_struct('b', graft_cosine(v, c.centv), 'id', c.cent_id) ELSE acc END).id"
    s"WITH e AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings$embWhere), " +
      s"cbr AS (SELECT $cbCols FROM (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS vec_id, v FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $K) eb0) ebk), " +
      s"cb AS (SELECT *, $nlut AS nlut FROM cbr), " +
      "st AS (SELECT GREATEST(2, CAST(ROUND(SQRT(COUNT(*)), 0) AS INT)) AS stride FROM e), " +
      "cents0 AS (SELECT vec_id AS cent_id, v AS centv FROM e, st WHERE vec_id % stride = 0), " +
      "ca AS (SELECT sort_array(collect_list(named_struct('cent_id', cent_id, 'centv', centv))) AS cents FROM cents0), " +
      s"asgn AS (SELECT vec_id AS cid, v, $assignFold AS cluster FROM e CROSS JOIN ca), " +
      s"codes AS (SELECT cid, cluster, $codesArr AS codes FROM asgn CROSS JOIN cb), " +
      s"q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 20), " +
      (adaptive match {
        case None =>
          "pr AS (SELECT qid, cluster FROM (SELECT q.qid, c.cent_id AS cluster, ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY graft_cosine(q.qv, c.centv) DESC, c.cent_id) AS prnk FROM q CROSS JOIN cents0 c) z WHERE prnk <= 4), "
        case Some((allowedSql, floor)) =>
          s"acnt AS (SELECT cluster, CAST(COUNT(1) AS BIGINT) AS ac FROM codes WHERE cid IN ($allowedSql) GROUP BY cluster), " +
            "prr AS (SELECT q.qid, c.cent_id AS cluster, ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY graft_cosine(q.qv, c.centv) DESC, c.cent_id) AS rk FROM q CROSS JOIN cents0 c), " +
            "prc AS (SELECT prr.qid, prr.cluster, prr.rk, COALESCE(acnt.ac, CAST(0 AS BIGINT)) AS ac FROM prr LEFT JOIN acnt ON acnt.cluster = prr.cluster), " +
            "prw AS (SELECT qid, cluster, rk, ac, SUM(ac) OVER (PARTITION BY qid ORDER BY rk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM prc), " +
            s"pr AS (SELECT qid, cluster FROM prw WHERE rk <= 4 OR cum - ac < $floor), " +
            "np AS (SELECT qid, CAST(COUNT(1) AS BIGINT) AS n_probes FROM pr GROUP BY qid), "
      }) +
      s"qlut AS (SELECT qid, $qlut AS lut, nlut, sqrt(aggregate(qv, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x)) AS qn FROM q CROSS JOIN cb), " +
      s"scored AS (SELECT ql.qid, codes.cid, nanvl(${fold("lut")} / (qn * sqrt(${fold("nlut")})), CAST(-2.0 AS DOUBLE)) AS sim FROM qlut ql JOIN pr ON ql.qid = pr.qid JOIN codes ON codes.cluster = pr.cluster WHERE ql.qid <> codes.cid$candFilter), " +
      "top AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk FROM scored) t WHERE rnk <= 10), " +
      "truth AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk FROM (SELECT qid, b.vec_id AS cid, round(graft_cosine(qv, b.v), 4) AS sim FROM q JOIN e b ON qid <> b.vec_id) raw) t WHERE rnk <= 10), " +
      "h AS (SELECT COUNT(*) AS hits FROM truth LEFT SEMI JOIN top ON truth.qid = top.qid AND truth.cid = top.cid), " +
      "d AS (SELECT COUNT(*) AS denom FROM truth), " +
      "sc AS (SELECT COUNT(*) AS scanned_pairs FROM scored), " +
      "nn AS (SELECT COUNT(*) AS n_corpus FROM e), " +
      "nq AS (SELECT COUNT(*) AS n_q FROM q)"
  }

  private def ivfPqSql: String =
    ivfPqCommonCtes + " " +
      "SELECT 'ivfpq_m8_k16_nprobe4' AS method, round(CAST(hits AS DOUBLE) / denom, 4) AS recall, " +
      "CAST(hits AS BIGINT) AS hits, CAST(denom AS BIGINT) AS denom, " +
      "CAST(scanned_pairs AS BIGINT) AS scanned_pairs, CAST(n_q * (n_corpus - 1) AS BIGINT) AS full_scan_pairs, " +
      "CAST(1000 AS BIGINT) AS floor_bp, hits * 10000 >= denom * 1000 AS floor_ok, " +
      "scanned_pairs < n_q * (n_corpus - 1) AS prune_ok " +
      "FROM h CROSS JOIN d CROSS JOIN sc CROSS JOIN nn CROSS JOIN nq"

  /** IVF-PQ + exact rerank (q153) SQL twin: the s114 prefix, then the ADC
    * top-R shortlist, exact round(graft_cosine,4) rerank of only those
    * rows (truth's tie contract), and the rerank accounting. */
  private def ivfPqRerankSql: String = {
    val r = graft.operators.Similarity.RerankR
    ivfPqCommonCtes + ", " +
      s"short AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk FROM scored) t WHERE rnk <= $r), " +
      "rr AS (SELECT short.qid, short.cid, round(graft_cosine(q.qv, e2.v), 4) AS rsim FROM short JOIN q ON q.qid = short.qid JOIN e e2 ON e2.vec_id = short.cid), " +
      "rtop AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY rsim DESC, cid) AS rnk FROM rr) t WHERE rnk <= 10), " +
      "rh AS (SELECT COUNT(*) AS rhits FROM truth LEFT SEMI JOIN rtop ON truth.qid = rtop.qid AND truth.cid = rtop.cid), " +
      "rp AS (SELECT COUNT(*) AS reranked_pairs FROM rr) " +
      s"SELECT 'ivfpq_rerank_m8_k16_nprobe4_r$r' AS method, round(CAST(rhits AS DOUBLE) / denom, 4) AS recall, " +
      "CAST(rhits AS BIGINT) AS hits, CAST(denom AS BIGINT) AS denom, " +
      "round(CAST(hits AS DOUBLE) / denom, 4) AS adc_recall, CAST(hits AS BIGINT) AS adc_hits, " +
      "CAST(scanned_pairs AS BIGINT) AS scanned_pairs, CAST(reranked_pairs AS BIGINT) AS reranked_pairs, " +
      "CAST(1000 AS BIGINT) AS floor_bp, rhits * 10000 >= denom * 1000 AS floor_ok, " +
      "rhits >= hits AS rerank_ge_adc, scanned_pairs < n_q * (n_corpus - 1) AS prune_ok " +
      "FROM rh CROSS JOIN h CROSS JOIN d CROSS JOIN rp CROSS JOIN sc CROSS JOIN nn CROSS JOIN nq"
  }

  /** The q161 ExactSubstr span chain as Spark-dialect CTEs (split /
    * posexplode-over-transform(sequence) / slice — the s161 spellings),
    * parameterized by CTE-name prefix and a (doc_id, t) source so s163 can
    * run it twice (pre-trim discovery + post-trim fixpoint audit). */
  private def sparkSpanCtes(p: String, src: String): String =
    s"${p}w AS (SELECT doc_id, ws FROM (SELECT doc_id, split(trim(t), '\\\\s+') AS ws FROM $src) WHERE size(ws) >= 8), " +
      s"${p}g AS (SELECT doc_id, pos, h FROM ${p}w LATERAL VIEW posexplode(transform(sequence(0, size(ws) - 8), i -> md5(concat_ws(' ', slice(ws, i + 1, 8))))) x AS pos, h), " +
      s"${p}d AS (SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY h) AS copies FROM ${p}g), " +
      s"${p}o AS (SELECT doc_id, pos FROM ${p}d WHERE copies >= 2), " +
      s"${p}m AS (SELECT doc_id, pos, CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8 THEN 1 ELSE 0 END AS fresh FROM ${p}o), " +
      s"${p}i2 AS (SELECT doc_id, pos, SUM(fresh) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id FROM ${p}m), " +
      s"${p}sp AS (SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 8 AS span_end FROM ${p}i2 GROUP BY doc_id, span_id)"

  /** s163: discover → trim → re-discover as Spark text — the s161 chain, a
    * NOT EXISTS token cut over posexplode positions (0-based, matching the
    * chain's pos directly), the q92 collect_list/array_sort re-join, and
    * the chain again over the trimmed text for the fixpoint audit. */
  private def exactSubstrTrimSparkSql: String =
    "WITH base AS (SELECT doc_id, concat(CASE WHEN doc_id % 3 = 0 THEN 'shared license header text appears before many documents in the crawl corpus ' ELSE '' END, text, CASE WHEN doc_id % 5 = 0 THEN ' subscribe to our newsletter for updates and special offers' ELSE '' END) AS t FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), " +
      sparkSpanCtes("", "base") + ", " +
      "tok AS (SELECT doc_id, i, w FROM (SELECT doc_id, split(trim(t), '\\\\s+') AS ws FROM base) LATERAL VIEW posexplode(ws) x AS i, w), " +
      "kept AS (SELECT t.doc_id, t.i, t.w FROM tok t WHERE NOT EXISTS (SELECT 1 FROM sp WHERE sp.doc_id = t.doc_id AND t.i >= sp.span_start AND t.i < sp.span_end)), " +
      "trimmed AS (SELECT doc_id, concat_ws(' ', transform(array_sort(collect_list(struct(i, w))), s -> s.w)) AS t, COUNT(*) AS kept FROM kept GROUP BY doc_id), " +
      "acct AS (SELECT b.doc_id, CAST(COALESCE(tr.kept, 0) AS BIGINT) AS kept_tokens, CAST(size(split(trim(b.t), '\\\\s+')) - COALESCE(tr.kept, 0) AS BIGINT) AS trimmed_tokens FROM base b LEFT JOIN trimmed tr ON b.doc_id = tr.doc_id), " +
      sparkSpanCtes("r", "trimmed") + ", " +
      "res AS (SELECT CAST(COUNT(*) AS BIGINT) AS residual_spans, CAST(COALESCE(SUM(span_end - span_start), 0) AS BIGINT) AS residual_tokens FROM rsp) " +
      "SELECT a.doc_id, kept_tokens, trimmed_tokens, residual_spans, residual_tokens FROM acct a CROSS JOIN res ORDER BY a.doc_id"

  /** s164: the near-dup-aware split as Spark text. The s50 LSH→Jaccard
    * spelling over the canaried corpus, exact-group contraction, then
    * min-label connected components as a WALK-DOUBLED bounded closure
    * (Spark's recursive CTEs accept only UNION ALL, which cannot express
    * a cyclic closure). Plan-size discipline: Spark INLINES CTEs, so
    * every reference to a CTE re-expands the whole minhash chain under
    * it — the first spelling (unrolled gather+jump rounds, audits joining
    * a components CTE five ways) expanded the chain ~200× and spent 200 s
    * at sf0.001 in the analyzer alone. This spelling holds it to ~13
    * copies: self-looped edges squared twice (sp1→sp2→sp4 = all walks of
    * length ≤ 4, one chain ref per squaring), rep_fp as a WINDOW over the
    * component (windows don't duplicate their input the way a groupBy+
    * self-join does), and the three split/fp/component audits folded into
    * ONE pass via GROUPING SETS. Walk-≤4 min-label equals the true
    * component min for components of radius ≤ 4; measured rep-graph
    * diameter is 1 at sf0.01, 2 at sf0.1 (canary clusters are cliques by
    * construction), and the DuckDB oracle computes the TRUE recursive
    * fixpoint — a deeper component fails the gate loudly, never silently. */
  private def neardupAwareSplitSparkSql: String = {
    val g = "CAST(doc_id div 500 AS STRING)"
    val canary =
      s"concat('neardup canary cluster g', $g, ' alpha beta g', $g, ' gamma delta g', $g, " +
        s"' epsilon zeta g', $g, ' eta theta g', $g, ' iota kappa g', $g, ' lambda mu g', $g, " +
        s"' nu xi g', $g, ' omicron pi g', $g, ' rho sigma v', CAST(doc_id AS STRING))"
    def splitCase(src: String): String =
      s"CASE WHEN CAST(conv(substring(md5(concat('q164|', $src)), 1, 8), 16, 10) AS BIGINT) % 10 < 8 THEN 'train' " +
        s"WHEN CAST(conv(substring(md5(concat('q164|', $src)), 1, 8), 16, 10) AS BIGINT) % 10 = 8 THEN 'val' ELSE 'test' END"
    s"WITH d AS (SELECT doc_id, CASE WHEN doc_id % 50 = 3 THEN $canary ELSE text END AS text FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), " +
      "w AS (SELECT doc_id, split(trim(text), '\\\\s+') AS words FROM d), " +
      "f AS (SELECT doc_id, words FROM w WHERE size(words) >= 3), " +
      s"shh AS (SELECT doc_id, ${baseHashSql("sh")} AS h FROM (SELECT doc_id, explode(transform(sequence(0, size(words) - 3), i -> concat_ws(' ', slice(words, i + 1, 3)))) AS sh FROM f) t), " +
      s"sig AS ($minhashSigSql), " +
      s"b AS (SELECT doc_id, explode($bandStructsSql) AS bs FROM sig), " +
      "bb AS (SELECT doc_id, bs.band AS band, bs.sig1 AS sig1, bs.sig2 AS sig2 FROM b), " +
      "bc AS (SELECT doc_id, band, sig1, sig2, COUNT(*) OVER (PARTITION BY band, sig1, sig2) AS bn FROM bb), " +
      s"bands AS (SELECT doc_id, band, sig1, sig2 FROM bc WHERE bn <= ${graft.operators.Dedup.MinhashBucketCap}), " +
      "cand AS (SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2 FROM bands a JOIN bands b2 ON a.band = b2.band AND a.sig1 = b2.sig1 AND a.sig2 = b2.sig2 AND a.doc_id < b2.doc_id), " +
      "tok AS (SELECT DISTINCT doc_id, word FROM (SELECT doc_id, explode(split(trim(text), '\\\\s+')) AS word FROM d) x), " +
      "sz AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY 1), " +
      "inter AS (SELECT id1, id2, COUNT(*) AS inter FROM cand JOIN tok wa ON id1 = wa.doc_id JOIN tok wb ON id2 = wb.doc_id AND wa.word = wb.word GROUP BY 1, 2), " +
      "prs AS (SELECT id1, id2 FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) >= 0.6), " +
      "f2 AS (SELECT doc_id, md5(text) AS fp FROM d), " +
      "rep AS (SELECT doc_id, fp, MIN(doc_id) OVER (PARTITION BY fp) AS rep FROM f2), " +
      // both edge directions from ONE prs reference (explode, not a
      // self-union — a union would double the chain copies under it)
      "syme AS (SELECT DISTINCT e.src AS src, e.dst AS dst FROM (SELECT explode(array(named_struct('src', r1.rep, 'dst', r2.rep), named_struct('src', r2.rep, 'dst', r1.rep))) AS e FROM prs JOIN rep r1 ON prs.id1 = r1.doc_id JOIN rep r2 ON prs.id2 = r2.doc_id WHERE r1.rep <> r2.rep) t), " +
      "nds AS (SELECT DISTINCT rep AS id FROM rep), " +
      "sp1 AS (SELECT src, dst FROM syme UNION SELECT id AS src, id AS dst FROM nds), " +
      "sp2 AS (SELECT DISTINCT a.src, b.dst FROM sp1 a JOIN sp1 b ON a.dst = b.src), " +
      "sp4 AS (SELECT DISTINCT a.src, b.dst FROM sp2 a JOIN sp2 b ON a.dst = b.src), " +
      "cmp0 AS (SELECT src AS id, MIN(dst) AS lbl FROM sp4 GROUP BY src), " +
      s"spl AS (SELECT doc_id, fp, comp, ${splitCase("rep_fp")} AS split FROM (SELECT r.doc_id, r.fp, c.lbl AS comp, MIN(r.fp) OVER (PARTITION BY c.lbl) AS rep_fp FROM rep r JOIN cmp0 c ON c.id = r.rep) t), " +
      s"nspl AS (SELECT doc_id, ${splitCase("fp")} AS nsplit FROM f2), " +
      "gs AS (SELECT split, comp, fp, COUNT(*) AS n, grouping_id() AS gid FROM spl GROUP BY GROUPING SETS ((split, comp), (fp, split), (comp))), " +
      "ps AS (SELECT split, CAST(SUM(n) AS BIGINT) AS n_docs, CAST(COUNT(*) AS BIGINT) AS n_components FROM gs WHERE gid = 1 GROUP BY split), " +
      "lk AS (SELECT CAST(COALESCE(SUM(CASE WHEN a1.split <> a2.split THEN 1 ELSE 0 END), 0) AS BIGINT) AS neardup_leak_pairs, CAST(COALESCE(SUM(CASE WHEN n1.nsplit <> n2.nsplit THEN 1 ELSE 0 END), 0) AS BIGINT) AS naive_leak_pairs FROM prs JOIN spl a1 ON prs.id1 = a1.doc_id JOIN spl a2 ON prs.id2 = a2.doc_id JOIN nspl n1 ON prs.id1 = n1.doc_id JOIN nspl n2 ON prs.id2 = n2.doc_id), " +
      "el AS (SELECT CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS exact_leak_groups FROM (SELECT fp, COUNT(*) AS c FROM gs WHERE gid = 2 GROUP BY fp) z), " +
      "mc AS (SELECT CAST(MAX(n) AS BIGINT) AS max_component FROM gs WHERE gid = 5) " +
      "SELECT split, n_docs, n_components, neardup_leak_pairs, naive_leak_pairs, exact_leak_groups, max_component FROM ps CROSS JOIN lk CROSS JOIN el CROSS JOIN mc ORDER BY split"
  }

  /** s175: the curate→split composition as Spark text — the s167 trim/
    * funnel chain (with the q175 trim-proof canary on doc_id % 20 == 3
    * docs and header/footer on the rest, quota bound 1,000,000), then the
    * s164 LSH/walk-doubled-closure chain over the survivors (seed
    * "q175|"), funnel columns cross-joined onto the three split rows. */
  private def curatedSplitSparkSql: String = {
    val g = "CAST(doc_id div 200 AS STRING)"
    val dd = "CAST(doc_id AS STRING)"
    val canary = s"concat('trimsafe neardup canary g', $g, ' alpha beta g', $g, " +
      s"' u', $dd, 'a gamma delta g', $g, ' epsilon zeta g', $g, ' canary u', $dd, " +
      s"'b eta theta g', $g, ' alpha iota g', $g, ' beta u', $dd, 'c kappa g', $g, " +
      s"' gamma delta g', $g, ' eta theta v', $dd)"
    def splitCase(src: String): String =
      s"CASE WHEN CAST(conv(substring(md5(concat('q175|', $src)), 1, 8), 16, 10) AS BIGINT) % 10 < 8 THEN 'train' " +
        s"WHEN CAST(conv(substring(md5(concat('q175|', $src)), 1, 8), 16, 10) AS BIGINT) % 10 = 8 THEN 'val' ELSE 'test' END"
    s"WITH base AS (SELECT doc_id, source, CASE WHEN doc_id % 10 = 3 THEN $canary ELSE " +
      "concat(CASE WHEN doc_id % 3 = 0 THEN 'shared license header text appears before many documents in the crawl corpus ' ELSE '' END, text, CASE WHEN doc_id % 5 = 0 THEN ' subscribe to our newsletter for updates and special offers' ELSE '' END) END AS t " +
      "FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), " +
      sparkSpanCtes("z", "base") + ", " +
      "tok AS (SELECT doc_id, i, w FROM (SELECT doc_id, split(trim(t), '\\\\s+') AS ws FROM base) LATERAL VIEW posexplode(ws) x AS i, w), " +
      "kept AS (SELECT t.doc_id, t.i, t.w FROM tok t WHERE NOT EXISTS (SELECT 1 FROM zsp WHERE zsp.doc_id = t.doc_id AND t.i >= zsp.span_start AND t.i < zsp.span_end)), " +
      "trimmed AS (SELECT doc_id, concat_ws(' ', transform(array_sort(collect_list(struct(i, w))), s -> s.w)) AS t2, COUNT(*) AS kept FROM kept GROUP BY doc_id), " +
      "tc AS (SELECT b.doc_id, b.source, COALESCE(tr.t2, '') AS text, CAST(size(split(trim(b.t), '\\\\s+')) - COALESCE(tr.kept, 0) AS BIGINT) AS tt FROM base b LEFT JOIN trimmed tr ON b.doc_id = tr.doc_id), " +
      "ne AS (SELECT doc_id, source, text, tt FROM tc WHERE length(trim(text)) > 0), " +
      "ta AS (SELECT CAST(COALESCE(SUM(CASE WHEN tt > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS trim_docs, CAST(COALESCE(SUM(tt), 0) AS BIGINT) AS trim_tokens FROM ne), " +
      "q AS (SELECT * FROM ne WHERE CAST(length(regexp_replace(text, '[^A-Za-z]', '')) AS DOUBLE) / length(text) >= 0.45), " +
      "k AS (SELECT md5(text) AS fp, MIN(doc_id) AS keep FROM q GROUP BY 1), " +
      "d AS (SELECT q.* FROM q JOIN k ON md5(q.text) = fp AND q.doc_id = keep), " +
      "qw AS (SELECT doc_id, split(trim(text), '\\\\s+') AS words FROM q), " +
      "shc AS (SELECT doc_id, concat_ws(' ', slice(words, CAST(i AS INT), 5)) AS sh FROM (SELECT doc_id, words, explode(sequence(1, size(words) - 4)) AS i FROM qw WHERE size(words) >= 5) t), " +
      "bw AS (SELECT split(trim(t), '\\\\s+') AS words FROM base WHERE doc_id % 100 = 0), " +
      "bsh AS (SELECT DISTINCT concat_ws(' ', slice(words, CAST(i AS INT), 5)) AS sh FROM (SELECT words, explode(sequence(1, size(words) - 4)) AS i FROM bw WHERE size(words) >= 5) t), " +
      "contam AS (SELECT DISTINCT doc_id FROM shc JOIN bsh USING (sh)), " +
      "c0 AS (SELECT * FROM d WHERE doc_id NOT IN (SELECT doc_id FROM contam)), " +
      "rr AS (SELECT doc_id, text, ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(concat('curate|', CAST(doc_id AS STRING))), doc_id) AS rnk FROM c0), " +
      "c AS (SELECT doc_id, text FROM rr WHERE rnk <= 1000000), " +
      // ---- the s164 chain over the cleaned survivors
      "w3 AS (SELECT doc_id, split(trim(text), '\\\\s+') AS words FROM c), " +
      "f3 AS (SELECT doc_id, words FROM w3 WHERE size(words) >= 3), " +
      s"shh AS (SELECT doc_id, ${baseHashSql("sh")} AS h FROM (SELECT doc_id, explode(transform(sequence(0, size(words) - 3), i -> concat_ws(' ', slice(words, i + 1, 3)))) AS sh FROM f3) t), " +
      s"sig AS ($minhashSigSql), " +
      s"b AS (SELECT doc_id, explode($bandStructsSql) AS bs FROM sig), " +
      "bb AS (SELECT doc_id, bs.band AS band, bs.sig1 AS sig1, bs.sig2 AS sig2 FROM b), " +
      "bc AS (SELECT doc_id, band, sig1, sig2, COUNT(*) OVER (PARTITION BY band, sig1, sig2) AS bn FROM bb), " +
      s"bands AS (SELECT doc_id, band, sig1, sig2 FROM bc WHERE bn <= ${graft.operators.Dedup.MinhashBucketCap}), " +
      "cand AS (SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2 FROM bands a JOIN bands b2 ON a.band = b2.band AND a.sig1 = b2.sig1 AND a.sig2 = b2.sig2 AND a.doc_id < b2.doc_id), " +
      "tok3 AS (SELECT DISTINCT doc_id, word FROM (SELECT doc_id, explode(split(trim(text), '\\\\s+')) AS word FROM c) x), " +
      "sz AS (SELECT doc_id, COUNT(*) AS sz FROM tok3 GROUP BY 1), " +
      "inter AS (SELECT id1, id2, COUNT(*) AS inter FROM cand JOIN tok3 wa ON id1 = wa.doc_id JOIN tok3 wb ON id2 = wb.doc_id AND wa.word = wb.word GROUP BY 1, 2), " +
      "prs AS (SELECT id1, id2 FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2 WHERE ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) >= 0.6), " +
      "f2 AS (SELECT doc_id, md5(text) AS fp FROM c), " +
      "rep AS (SELECT doc_id, fp, MIN(doc_id) OVER (PARTITION BY fp) AS rep FROM f2), " +
      "syme AS (SELECT DISTINCT e.src AS src, e.dst AS dst FROM (SELECT explode(array(named_struct('src', r1.rep, 'dst', r2.rep), named_struct('src', r2.rep, 'dst', r1.rep))) AS e FROM prs JOIN rep r1 ON prs.id1 = r1.doc_id JOIN rep r2 ON prs.id2 = r2.doc_id WHERE r1.rep <> r2.rep) t), " +
      "nds AS (SELECT DISTINCT rep AS id FROM rep), " +
      "sp1 AS (SELECT src, dst FROM syme UNION SELECT id AS src, id AS dst FROM nds), " +
      "sp2 AS (SELECT DISTINCT a.src, b.dst FROM sp1 a JOIN sp1 b ON a.dst = b.src), " +
      "sp4 AS (SELECT DISTINCT a.src, b.dst FROM sp2 a JOIN sp2 b ON a.dst = b.src), " +
      "cmp0 AS (SELECT src AS id, MIN(dst) AS lbl FROM sp4 GROUP BY src), " +
      s"spl AS (SELECT doc_id, fp, comp, ${splitCase("rep_fp")} AS split FROM (SELECT r2.doc_id, r2.fp, c2.lbl AS comp, MIN(r2.fp) OVER (PARTITION BY c2.lbl) AS rep_fp FROM rep r2 JOIN cmp0 c2 ON c2.id = r2.rep) t), " +
      s"nspl AS (SELECT doc_id, ${splitCase("fp")} AS nsplit FROM f2), " +
      "gs AS (SELECT split, comp, fp, COUNT(*) AS n, grouping_id() AS gid FROM spl GROUP BY GROUPING SETS ((split, comp), (fp, split), (comp))), " +
      "ps AS (SELECT split, CAST(SUM(n) AS BIGINT) AS n_docs, CAST(COUNT(*) AS BIGINT) AS n_components FROM gs WHERE gid = 1 GROUP BY split), " +
      "lk AS (SELECT CAST(COALESCE(SUM(CASE WHEN a1.split <> a2.split THEN 1 ELSE 0 END), 0) AS BIGINT) AS neardup_leak_pairs, CAST(COALESCE(SUM(CASE WHEN n1.nsplit <> n2.nsplit THEN 1 ELSE 0 END), 0) AS BIGINT) AS naive_leak_pairs FROM prs JOIN spl a1 ON prs.id1 = a1.doc_id JOIN spl a2 ON prs.id2 = a2.doc_id JOIN nspl n1 ON prs.id1 = n1.doc_id JOIN nspl n2 ON prs.id2 = n2.doc_id), " +
      "el AS (SELECT CAST(SUM(CASE WHEN cg >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS exact_leak_groups FROM (SELECT fp, COUNT(*) AS cg FROM gs WHERE gid = 2 GROUP BY fp) z), " +
      "mc AS (SELECT CAST(MAX(n) AS BIGINT) AS max_component FROM gs WHERE gid = 5) " +
      "SELECT split, n_docs, n_components, neardup_leak_pairs, naive_leak_pairs, exact_leak_groups, max_component, " +
      "ta.trim_docs, ta.trim_tokens, (SELECT COUNT(*) FROM ne) AS n_non_empty, (SELECT COUNT(*) FROM q) AS n_quality, (SELECT COUNT(*) FROM d) AS n_dedup, (SELECT COUNT(*) FROM c0) AS n_clean, (SELECT COUNT(*) FROM c) AS n_capped " +
      "FROM ps CROSS JOIN lk CROSS JOIN el CROSS JOIN mc CROSS JOIN ta ORDER BY split"
  }

  /** s168: BPE training as ONE Spark SQL statement. The merge loop is
    * inherently sequential, and a naive unroll references each round's
    * vocab CTE twice (pair-count side + apply side) — Spark INLINES
    * multiply-referenced CTEs, so that spelling re-expands the base 2^N
    * times (the q164 lesson). This twin keeps the chain LINEAR — each
    * round references the previous exactly once — by computing the
    * round's best pair as analytic windows over the pair-exploded rows
    * (SUM per (pa,pb) partition, then FIRST_VALUE over the global
    * (cnt DESC, pa, pb) order), filtering back to one row per word, and
    * fusing with the same unit-separator string fold the lane uses. The
    * merge HISTORY threads through the chain as an array-of-structs
    * column (identical on every row), so the final extraction reads ONE
    * row's history instead of re-referencing 12 intermediate CTEs; a
    * rank-0 entry carries the initial symbol mass for rank 1's
    * merges_applied delta. Twin-only divergence: the global best-pair
    * window is a single-partition sort of the pair-exploded VOCAB table
    * (bounded by Σ word lengths over DISTINCT words — the Zipf bound),
    * where the DataFrame lane's driver loop keeps every round fully
    * distributed; the reachability statement is the point here, the lane
    * is the scale path. Fully-fused words (|syms| = 1) ride the OUTER
    * posexplode with NULL pair slots: their cnt is NULLed so DESC
    * NULLS LAST can never elect them, and `pos IS NULL` keeps them in
    * the vocabulary (their freq still counts toward symbols_after). */
  private def bpeTrainSparkSql: String = {
    import graft.operators.Tokenizer.NMerges
    bpeChainSparkCtes +
      s"fin AS (SELECT hist FROM w$NMerges ORDER BY word LIMIT 1), " +
      "m AS (SELECT inline(hist) FROM fin), " +
      "l AS (SELECT mr, ml, mrt, mc, aft, LAG(aft) OVER (ORDER BY mr) AS paft FROM m) " +
      "SELECT mr AS merge_rank, ml AS lhs, mrt AS rhs, concat(ml, mrt) AS merged, mc AS pair_count, CAST(paft - aft AS BIGINT) AS merges_applied, aft AS symbols_after FROM l WHERE mr >= 1 ORDER BY merge_rank"
  }

  /** s170: the s168 linear chain to w{NMerges}, then one corpus re-pass
    * left-joined to the final vocab (the q170 membership contract). */
  private def bpeTokenizeSparkSql: String = {
    import graft.operators.Tokenizer.NMerges
    bpeChainSparkCtes +
      "dt AS (SELECT doc_id, explode(split(trim(lower(text)), '\\\\s+')) AS word FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), " +
      s"vz AS (SELECT word, CAST(size(syms) AS BIGINT) AS nsym FROM w$NMerges) " +
      "SELECT dt.doc_id, CAST(COUNT(1) AS BIGINT) AS n_words, SUM(CASE WHEN vz.nsym IS NOT NULL THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS n_conforming, COALESCE(SUM(vz.nsym), CAST(0 AS BIGINT)) AS bpe_tokens " +
      "FROM dt LEFT JOIN vz ON dt.word = vz.word GROUP BY dt.doc_id ORDER BY dt.doc_id"
  }

  /** The shared s168/s170 LINEAR chain (see [[bpeTrainSparkSql]]'s design
    * scaladoc): WITH-prefix text up to w{NMerges} (word, freq, syms, hist). */
  private def bpeChainSparkCtes: String = {
    import graft.operators.Tokenizer.{MaxWordLen, NMerges}
    val sb = new StringBuilder
    sb ++= "WITH w0a AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq, concat(transform(sequence(1, length(word)), i -> substring(word, i, 1)), array('</w>')) AS syms " +
      "FROM (SELECT explode(split(trim(lower(text)), '\\\\s+')) AS word FROM documents WHERE text IS NOT NULL) t " +
      s"WHERE word RLIKE '^[a-z]+$$' AND length(word) <= $MaxWordLen GROUP BY word), "
    sb ++= "w0 AS (SELECT word, freq, syms, array(struct(CAST(0 AS BIGINT) AS mr, '' AS ml, '' AS mrt, CAST(0 AS BIGINT) AS mc, SUM(freq * size(syms)) OVER () AS aft)) AS hist FROM w0a), "
    for (i <- 1 to NMerges) {
      val p = i - 1
      sb ++= s"e$i AS (SELECT word, freq, syms, hist, pos, p.a AS pa, p.b AS pb FROM w$p LATERAL VIEW OUTER posexplode(CASE WHEN size(syms) >= 2 THEN transform(sequence(1, size(syms) - 1), j -> struct(element_at(syms, j) AS a, element_at(syms, CAST(j + 1 AS INT)) AS b)) ELSE CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>) END) t AS pos, p), "
      sb ++= s"c$i AS (SELECT *, CASE WHEN pa IS NULL THEN CAST(NULL AS BIGINT) ELSE SUM(freq) OVER (PARTITION BY pa, pb) END AS cnt FROM e$i), "
      sb ++= s"b$i AS (SELECT *, FIRST_VALUE(pa) OVER ww AS ba, FIRST_VALUE(pb) OVER ww AS bb, FIRST_VALUE(cnt) OVER ww AS bcnt FROM c$i WINDOW ww AS (ORDER BY cnt DESC, pa, pb ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)), "
      sb ++= s"g$i AS (SELECT word, freq, syms, hist, ba, bb, bcnt FROM b$i WHERE pos = 0 OR pos IS NULL), "
      sb ++= s"a$i AS (SELECT word, freq, hist, ba, bb, bcnt, split(aggregate(slice(syms, 2, size(syms) - 1), element_at(syms, 1), (acc, x) -> CASE WHEN x = bb AND (acc = ba OR endswith(acc, concat(chr(31), ba))) THEN concat(acc, x) ELSE concat(acc, chr(31), x) END), '\\\\x1F') AS syms FROM g$i), "
      sb ++= s"x$i AS (SELECT *, SUM(freq * size(syms)) OVER () AS aft FROM a$i), "
      sb ++= s"w$i AS (SELECT word, freq, syms, concat(hist, array(struct(CAST($i AS BIGINT) AS mr, ba AS ml, bb AS mrt, bcnt AS mc, aft AS aft))) AS hist FROM x$i), "
    }
    sb.toString
  }

  /** s173: merge-replay encode of UNSEEN text as one Spark-SQL statement.
    * Linear-chain discipline (the s168 design — every CTE referenced
    * exactly once, or Spark's CTE inlining re-expands the base 2^N
    * times): the held-out DISTINCT conforming words ride THROUGH the
    * training chain as freq-0 / is_train=false rows, so each round's fuse
    * applies to them for free; pair counts and the best-pair election
    * restrict to is_train rows (a held-out-only pair carries NULL cnt,
    * and DESC's NULLS-LAST default means it can never be elected — the
    * same guard the chain already uses for pairless fully-fused words).
    * A word present in BOTH halves rides twice and collapses in the final
    * GROUP BY word (identical folds → identical syms; MAX(is_train) is
    * the vocab-membership flag). */
  private def bpeEncodeUnseenSparkSql: String = {
    import graft.operators.Tokenizer.{MaxWordLen, NMerges}
    val sb = new StringBuilder
    sb ++= "WITH tr AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq, true AS is_train FROM (SELECT explode(split(trim(lower(text)), '\\\\s+')) AS word FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 0) t " +
      s"WHERE word RLIKE '^[a-z]+$$' AND length(word) <= $MaxWordLen GROUP BY word), "
    sb ++= "hc AS (SELECT doc_id, concat(text, ' oovcanaryz', substring('abcdefg', CAST(doc_id % 7 + 1 AS INT), 1)) AS text FROM documents WHERE doc_id % 2 <> 0), "
    sb ++= "hw AS (SELECT DISTINCT word, CAST(0 AS BIGINT) AS freq, false AS is_train FROM (SELECT explode(split(trim(lower(text)), '\\\\s+')) AS word FROM hc WHERE text IS NOT NULL AND length(trim(text)) > 0) t " +
      s"WHERE word RLIKE '^[a-z]+$$' AND length(word) <= $MaxWordLen), "
    sb ++= "w0 AS (SELECT word, freq, is_train, concat(transform(sequence(1, length(word)), i -> substring(word, i, 1)), array('</w>')) AS syms FROM (SELECT * FROM tr UNION ALL SELECT * FROM hw) u), "
    for (i <- 1 to NMerges) {
      val p = i - 1
      sb ++= s"e$i AS (SELECT word, freq, is_train, syms, pos, p.a AS pa, p.b AS pb FROM w$p LATERAL VIEW OUTER posexplode(CASE WHEN size(syms) >= 2 THEN transform(sequence(1, size(syms) - 1), j -> struct(element_at(syms, j) AS a, element_at(syms, CAST(j + 1 AS INT)) AS b)) ELSE CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>) END) t AS pos, p), "
      sb ++= s"c$i AS (SELECT *, CASE WHEN pa IS NULL THEN CAST(NULL AS BIGINT) ELSE SUM(CASE WHEN is_train THEN freq END) OVER (PARTITION BY pa, pb) END AS cnt FROM e$i), "
      sb ++= s"b$i AS (SELECT *, FIRST_VALUE(pa) OVER ww AS ba, FIRST_VALUE(pb) OVER ww AS bb FROM c$i WINDOW ww AS (ORDER BY cnt DESC, pa, pb ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)), "
      sb ++= s"g$i AS (SELECT word, freq, is_train, syms, ba, bb FROM b$i WHERE pos = 0 OR pos IS NULL), "
      sb ++= s"w$i AS (SELECT word, freq, is_train, split(aggregate(slice(syms, 2, size(syms) - 1), element_at(syms, 1), (acc, x) -> CASE WHEN x = bb AND (acc = ba OR endswith(acc, concat(chr(31), ba))) THEN concat(acc, x) ELSE concat(acc, chr(31), x) END), '\\\\x1F') AS syms FROM g$i), "
    }
    sb ++= "dt AS (SELECT doc_id, explode(split(trim(lower(text)), '\\\\s+')) AS word FROM hc WHERE text IS NOT NULL AND length(trim(text)) > 0), "
    sb ++= s"vz AS (SELECT word, MAX(CASE WHEN is_train THEN 1 ELSE 0 END) AS in_vocab, MIN(CAST(size(syms) AS BIGINT)) AS nsym FROM w$NMerges GROUP BY word) "
    sb ++= "SELECT dt.doc_id, CAST(COUNT(1) AS BIGINT) AS n_words, SUM(CASE WHEN vz.nsym IS NOT NULL THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS n_conforming, SUM(CASE WHEN vz.nsym IS NOT NULL AND vz.in_vocab = 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS n_oov, COALESCE(SUM(vz.nsym), CAST(0 AS BIGINT)) AS bpe_tokens FROM dt LEFT JOIN vz ON dt.word = vz.word GROUP BY dt.doc_id ORDER BY dt.doc_id"
    sb.toString
  }

  /** s169: the Naive-Bayes quality classifier as Spark text — the oracle's
    * train + score chain with the Spark dialect spellings (explode
    * tokenization, ln/round/cast). Same integer micro-nat arithmetic, so
    * lane equality is row-for-row exact. */
  private def qualityClassifierSparkSql: String = {
    import graft.operators.Classifier.{MinAlphaRatio, TrainKeep, TrainMod}
    "WITH base AS (SELECT doc_id, doc_id % " + TrainMod + " < " + TrainKeep + " AS is_train, " +
      s"CASE WHEN CAST(length(regexp_replace(text, '[^A-Za-z]', '')) AS DOUBLE) / length(text) >= $MinAlphaRatio THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS heur_label, text " +
      "FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), " +
      "toks AS (SELECT doc_id, is_train, heur_label, explode(split(trim(lower(text)), '\\\\s+')) AS tok FROM base), " +
      "counts AS (SELECT tok, SUM(CASE WHEN heur_label = 1 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS cp, SUM(CASE WHEN heur_label = 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS cn FROM toks WHERE is_train GROUP BY tok), " +
      "sc AS (SELECT SUM(cp) AS np, SUM(cn) AS nn, CAST(COUNT(1) AS BIGINT) AS v FROM counts), " +
      "pr AS (SELECT SUM(CASE WHEN heur_label = 1 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS dpos, SUM(CASE WHEN heur_label = 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS dneg FROM base WHERE is_train), " +
      "lo AS (SELECT tok, CAST(ROUND((ln(cp + 1.0D) - ln(cn + 1.0D) - ln(np + v) + ln(nn + v)) * 1000000) AS BIGINT) AS loq FROM counts CROSS JOIN sc), " +
      "oov AS (SELECT CAST(ROUND((ln(0 + 1.0D) - ln(0 + 1.0D) - ln(np + v) + ln(nn + v)) * 1000000) AS BIGINT) AS loq FROM sc), " +
      "scored AS (SELECT t.doc_id, CAST(COUNT(1) AS BIGINT) AS n_tokens, SUM(COALESCE(lo.loq, oov.loq)) AS tok_score FROM toks t LEFT JOIN lo ON t.tok = lo.tok CROSS JOIN oov GROUP BY t.doc_id) " +
      "SELECT b.doc_id, b.is_train, b.heur_label, s.n_tokens, " +
      "s.tok_score + CAST(ROUND((ln(dpos + 1.0D) - ln(dneg + 1.0D)) * 1000000) AS BIGINT) AS score_micronats, " +
      "CASE WHEN s.tok_score + CAST(ROUND((ln(dpos + 1.0D) - ln(dneg + 1.0D)) * 1000000) AS BIGINT) > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS pred " +
      "FROM base b JOIN scored s USING (doc_id) CROSS JOIN pr ORDER BY doc_id"
  }

  /** s167: the trim-first curation funnel as Spark text — the s163 span
    * chain (prefix z) over the source-carrying canaried corpus, the token
    * cut + collect_list re-join, then the s111 funnel tail over the
    * trimmed text with benchmark shingles from the RAW canaried docs. */
  private def curationTrimmedSparkSql: String =
    "WITH base AS (SELECT doc_id, source, concat(CASE WHEN doc_id % 3 = 0 THEN 'shared license header text appears before many documents in the crawl corpus ' ELSE '' END, text, CASE WHEN doc_id % 5 = 0 THEN ' subscribe to our newsletter for updates and special offers' ELSE '' END) AS t FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), " +
      sparkSpanCtes("z", "base") + ", " +
      "tok AS (SELECT doc_id, i, w FROM (SELECT doc_id, split(trim(t), '\\\\s+') AS ws FROM base) LATERAL VIEW posexplode(ws) x AS i, w), " +
      "kept AS (SELECT t.doc_id, t.i, t.w FROM tok t WHERE NOT EXISTS (SELECT 1 FROM zsp WHERE zsp.doc_id = t.doc_id AND t.i >= zsp.span_start AND t.i < zsp.span_end)), " +
      "trimmed AS (SELECT doc_id, concat_ws(' ', transform(array_sort(collect_list(struct(i, w))), s -> s.w)) AS t2, COUNT(*) AS kept FROM kept GROUP BY doc_id), " +
      "tc AS (SELECT b.doc_id, b.source, COALESCE(tr.t2, '') AS text, CAST(size(split(trim(b.t), '\\\\s+')) - COALESCE(tr.kept, 0) AS BIGINT) AS tt FROM base b LEFT JOIN trimmed tr ON b.doc_id = tr.doc_id), " +
      "ne AS (SELECT doc_id, source, text, tt FROM tc WHERE length(trim(text)) > 0), " +
      "ta AS (SELECT CAST(COALESCE(SUM(CASE WHEN tt > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS trim_docs, CAST(COALESCE(SUM(tt), 0) AS BIGINT) AS trim_tokens FROM ne), " +
      "q AS (SELECT * FROM ne WHERE CAST(length(regexp_replace(text, '[^A-Za-z]', '')) AS DOUBLE) / length(text) >= 0.45), " +
      "k AS (SELECT md5(text) AS fp, MIN(doc_id) AS keep FROM q GROUP BY 1), " +
      "d AS (SELECT q.* FROM q JOIN k ON md5(q.text) = fp AND q.doc_id = keep), " +
      "qw AS (SELECT doc_id, split(trim(text), '\\\\s+') AS words FROM q), " +
      "shc AS (SELECT doc_id, concat_ws(' ', slice(words, CAST(i AS INT), 5)) AS sh FROM (SELECT doc_id, words, explode(sequence(1, size(words) - 4)) AS i FROM qw WHERE size(words) >= 5) t), " +
      "bw AS (SELECT split(trim(t), '\\\\s+') AS words FROM base WHERE doc_id % 100 = 0), " +
      "bsh AS (SELECT DISTINCT concat_ws(' ', slice(words, CAST(i AS INT), 5)) AS sh FROM (SELECT words, explode(sequence(1, size(words) - 4)) AS i FROM bw WHERE size(words) >= 5) t), " +
      "contam AS (SELECT DISTINCT doc_id FROM shc JOIN bsh USING (sh)), " +
      "c AS (SELECT * FROM d WHERE doc_id NOT IN (SELECT doc_id FROM contam)), " +
      "r AS (SELECT doc_id, source, ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(concat('curate|', CAST(doc_id AS STRING))), doc_id) AS rnk FROM c), " +
      "cap AS (SELECT doc_id FROM r WHERE rnk <= 15), " +
      "p AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY md5(concat('curate|pos|', CAST(doc_id AS STRING))), doc_id) AS pos FROM cap) " +
      "SELECT ta.trim_docs, ta.trim_tokens, (SELECT COUNT(*) FROM ne) AS n_non_empty, (SELECT COUNT(*) FROM q) AS n_quality, (SELECT COUNT(*) FROM d) AS n_dedup, (SELECT COUNT(*) FROM c) AS n_clean, (SELECT COUNT(*) FROM cap) AS n_capped, CAST((SELECT SUM(doc_id) FROM cap) AS BIGINT) AS kept_id_sum, CAST((SELECT SUM(doc_id * pos) FROM p) AS BIGINT) AS pos_checksum FROM ta"

  /** Saved-index serve (q157) SQL twin: the INLINE replay of the index +
    * shortlist + rerank math (SQL text cannot run the save/load side
    * effect), emitting the reranked top-10 rows — so conformance of the
    * q157 lane (which searches the PERSISTED artifact) against this text
    * is precisely the saved ≡ inline identity. Unreferenced trailing CTEs
    * of the common prefix (truth/recall accounting) are pruned by the
    * analyzer. */
  private def annIndexServeSql: String = annIndexServeSqlWhere("")

  /** [[annIndexServeSql]] with an extra candidate predicate (s165 removes
    * the deleted ids, s166 pushes the metadata filter) — the SQL-text twin
    * of the lanes that serve a modified artifact; the text replays the
    * same inline math minus the same candidates. */
  private def annIndexServeSqlWhere(candFilter: String,
                                    embWhere: String = ""): String = {
    val r = graft.operators.Similarity.RerankR
    ivfPqCommonCtes(candFilter, None, embWhere) + ", " +
      s"short AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk FROM scored) t WHERE rnk <= $r), " +
      "rr AS (SELECT short.qid, short.cid, round(graft_cosine(q.qv, e2.v), 4) AS rsim FROM short JOIN q ON q.qid = short.qid JOIN e e2 ON e2.vec_id = short.cid) " +
      "SELECT qid, cid, CAST(rnk AS BIGINT) AS rnk, rsim FROM (SELECT qid, cid, rsim, row_number() OVER (PARTITION BY qid ORDER BY rsim DESC, cid) AS rnk FROM rr) t WHERE rnk <= 10 ORDER BY qid, rnk"
  }

  /** s171: the s166 filtered-serve twin with the adaptive probe prefix —
    * the same inline index/shortlist/rerank replay, probes chosen by the
    * q171 cumulative-floor rule, n_probes joined into the projection. */
  private def annAdaptiveServeSparkSql: String = {
    val r = graft.operators.Similarity.RerankR
    val allowedSql = "SELECT vec_id FROM embeddings WHERE label % 10 = 7"
    ivfPqCommonCtes(s" AND codes.cid IN ($allowedSql)", Some((allowedSql, r))) + ", " +
      s"short AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk FROM scored) t WHERE rnk <= $r), " +
      "rr AS (SELECT short.qid, short.cid, round(graft_cosine(q.qv, e2.v), 4) AS rsim FROM short JOIN q ON q.qid = short.qid JOIN e e2 ON e2.vec_id = short.cid) " +
      "SELECT t.qid, t.cid, CAST(t.rnk AS BIGINT) AS rnk, t.rsim, np.n_probes FROM (SELECT qid, cid, rsim, row_number() OVER (PARTITION BY qid ORDER BY rsim DESC, cid) AS rnk FROM rr) t JOIN np ON np.qid = t.qid WHERE t.rnk <= 10 ORDER BY t.qid, t.rnk"
  }

  /** Hybrid BM25 + IVF-PQ-rerank (q155) SQL twin: the s153 index/shortlist/
    * rerank spellings with the query set swapped to the 8 corpus docs, the
    * all-integer BM25 keyword channel (q89 IDF surrogate + integer-milli
    * k1/b — Similarity.bm25Ranks' exact math), and the s154 RRF fusion. */
  private def hybridBm25AnnSparkSql: String = {
    val M = 8; val K = 16
    val k = graft.operators.Similarity.RrfK
    val chan = graft.operators.Similarity.HybridChan
    val r = graft.operators.Similarity.RerankR
    val k1m = graft.operators.Similarity.Bm25K1m
    val bm = graft.operators.Similarity.Bm25Bm
    val cbCols = (0 until M).map(m =>
      s"sort_array(collect_list(named_struct('cent_id', vec_id, 'centv', slice(v, ${m * 8 + 1}, 8)))) AS cb$m").mkString(", ")
    val nlut = (0 until M).map(m =>
      s"transform(cb$m, c -> aggregate(c.centv, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x))")
      .mkString("flatten(array(", ", ", "))")
    val qlut = (0 until M).map(m =>
      s"transform(cb$m, c -> aggregate(zip_with(slice(qv, ${m * 8 + 1}, 8), c.centv, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x))")
      .mkString("flatten(array(", ", ", "))")
    val codesArr = (0 until M).map(pqArgmaxSql).mkString("array(", ", ", ")")
    def fold(lut: String) =
      s"aggregate(transform(codes, (c, i) -> CASE WHEN c < 0 THEN CAST(0.0 AS DOUBLE) " +
        s"ELSE element_at($lut, CAST(i * $K + c + 1 AS INT)) END), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    val assignFold =
      "aggregate(cents, named_struct('b', CAST('-Infinity' AS DOUBLE), 'id', CAST(-1 AS BIGINT)), " +
        "(acc, c) -> CASE WHEN graft_cosine(v, c.centv) > acc.b " +
        "THEN named_struct('b', graft_cosine(v, c.centv), 'id', c.cent_id) ELSE acc END).id"
    "WITH e AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
      "dd AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND length(text) > 0), " +
      "corp AS (SELECT dd.doc_id AS cid, dd.text, e.v FROM dd JOIN e ON e.vec_id = dd.doc_id), " +
      "tw AS (SELECT cid, CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) AS dl, explode(split(trim(text), '\\\\s+')) AS w FROM corp), " +
      "qt AS (SELECT DISTINCT cid AS qid, w FROM tw WHERE cid < 8), " +
      "qw AS (SELECT DISTINCT w FROM qt), " +
      "tf AS (SELECT cid, w, COUNT(*) AS tf, MIN(dl) AS dl FROM tw JOIN qw USING (w) GROUP BY cid, w), " +
      "dfs AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w), " +
      "bst AS (SELECT COUNT(*) AS n_docs, (SUM(CAST(size(split(trim(text), '\\\\s+')) AS BIGINT)) * 1000) div COUNT(*) AS avgdl_m FROM corp), " +
      s"con AS (SELECT qt.qid, tf.cid, ((bst.n_docs * 1000) div dfs.df) * ((tf.tf * ${1000 + k1m} * 1000) div (tf.tf * 1000 + ($k1m * ((1000 - $bm) + ($bm * tf.dl * 1000) div bst.avgdl_m)) div 1000)) AS contrib FROM tf JOIN dfs USING (w) JOIN qt USING (w) CROSS JOIN bst WHERE qt.qid <> tf.cid), " +
      "bm25 AS (SELECT qid, cid, SUM(contrib) AS bm25_s FROM con GROUP BY qid, cid), " +
      s"kw AS (SELECT qid, cid, kw_rank FROM (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY bm25_s DESC, cid) AS kw_rank FROM bm25) z WHERE kw_rank <= $chan), " +
      s"cbr AS (SELECT $cbCols FROM (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS vec_id, v FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $K) eb0) ebk), " +
      s"cb AS (SELECT *, $nlut AS nlut FROM cbr), " +
      "st AS (SELECT GREATEST(2, CAST(ROUND(SQRT(COUNT(*)), 0) AS INT)) AS stride FROM e), " +
      "cents0 AS (SELECT vec_id AS cent_id, v AS centv FROM e, st WHERE vec_id % stride = 0), " +
      "ca AS (SELECT sort_array(collect_list(named_struct('cent_id', cent_id, 'centv', centv))) AS cents FROM cents0), " +
      s"asgn AS (SELECT vec_id AS cid, v, $assignFold AS cluster FROM e CROSS JOIN ca), " +
      s"codes AS (SELECT cid, cluster, $codesArr AS codes FROM asgn CROSS JOIN cb), " +
      "q2 AS (SELECT cid AS qid, v AS qv FROM corp WHERE cid < 8), " +
      "pr AS (SELECT qid, cluster FROM (SELECT q2.qid, c.cent_id AS cluster, ROW_NUMBER() OVER (PARTITION BY q2.qid ORDER BY graft_cosine(q2.qv, c.centv) DESC, c.cent_id) AS prnk FROM q2 CROSS JOIN cents0 c) z WHERE prnk <= 4), " +
      s"qlut AS (SELECT qid, $qlut AS lut, nlut, sqrt(aggregate(qv, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x)) AS qn FROM q2 CROSS JOIN cb), " +
      s"scored AS (SELECT ql.qid, codes.cid, nanvl(${fold("lut")} / (qn * sqrt(${fold("nlut")})), CAST(-2.0 AS DOUBLE)) AS sim FROM qlut ql JOIN pr ON ql.qid = pr.qid JOIN codes ON codes.cluster = pr.cluster WHERE ql.qid <> codes.cid), " +
      s"short AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk FROM scored) t WHERE rnk <= $r), " +
      "rr AS (SELECT short.qid, short.cid, round(graft_cosine(q2.qv, e2.v), 4) AS rsim FROM short JOIN q2 ON q2.qid = short.qid JOIN e e2 ON e2.vec_id = short.cid), " +
      s"vec AS (SELECT qid, cid, vec_rank FROM (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rsim DESC, cid) AS vec_rank FROM rr) z WHERE vec_rank <= $chan), " +
      s"f AS (SELECT COALESCE(kw.qid, vec.qid) AS qid, COALESCE(kw.cid, vec.cid) AS cid, kw.kw_rank, vec.vec_rank, COALESCE(CAST(1.0 AS DOUBLE) / ($k + kw.kw_rank), CAST(0.0 AS DOUBLE)) + COALESCE(CAST(1.0 AS DOUBLE) / ($k + vec.vec_rank), CAST(0.0 AS DOUBLE)) AS score FROM kw FULL OUTER JOIN vec ON kw.qid = vec.qid AND kw.cid = vec.cid) " +
      "SELECT qid, cid, CAST(rrf_rank AS BIGINT) AS rrf_rank, ROUND(score, 6) AS score, CAST(COALESCE(kw_rank, -1) AS BIGINT) AS kw_rank, CAST(COALESCE(vec_rank, -1) AS BIGINT) AS vec_rank FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rrf_rank FROM f) z WHERE rrf_rank <= 10 ORDER BY qid, rrf_rank"
  }

  /** Composed curation + near-dup ladder (q156) SQL twin: the q111 twin's
    * stages with the s50 MinHash-victim and s152 SemDeDup-victim replays
    * anti-joined in between (Spark dialect: split/explode/slice/concat_ws/
    * div, graft_cosine/graft_dot extension kernels). */
  private def curationNearDupSparkSql: String =
    "WITH ne AS (SELECT doc_id, source, text FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), " +
      "q AS (SELECT * FROM ne WHERE CAST(length(regexp_replace(text, '[^A-Za-z]', '')) AS DOUBLE) / length(text) >= 0.45), " +
      "k AS (SELECT md5(text) AS fp, MIN(doc_id) AS keep FROM q GROUP BY 1), " +
      "d AS (SELECT q.* FROM q JOIN k ON md5(q.text) = fp AND q.doc_id = keep), " +
      "nw AS (SELECT doc_id, split(trim(text), '\\\\s+') AS words FROM q), " +
      "nf AS (SELECT doc_id, words FROM nw WHERE size(words) >= 3), " +
      s"shh AS (SELECT doc_id, ${baseHashSql("sh")} AS h FROM (SELECT doc_id, explode(transform(sequence(0, size(words) - 3), i -> concat_ws(' ', slice(words, i + 1, 3)))) AS sh FROM nf) t), " +
      s"sig AS ($minhashSigSql), " +
      s"nb AS (SELECT doc_id, explode($bandStructsSql) AS bs FROM sig), " +
      "nbb AS (SELECT doc_id, bs.band AS band, bs.sig1 AS sig1, bs.sig2 AS sig2 FROM nb), " +
      "nbc AS (SELECT doc_id, band, sig1, sig2, COUNT(*) OVER (PARTITION BY band, sig1, sig2) AS bn FROM nbb), " +
      s"nbands AS (SELECT doc_id, band, sig1, sig2 FROM nbc WHERE bn <= ${graft.operators.Dedup.MinhashBucketCap}), " +
      "ncand AS (SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2 FROM nbands a JOIN nbands b2 ON a.band = b2.band AND a.sig1 = b2.sig1 AND a.sig2 = b2.sig2 AND a.doc_id < b2.doc_id), " +
      "ntok AS (SELECT DISTINCT doc_id, word FROM (SELECT doc_id, explode(split(trim(text), '\\\\s+')) AS word FROM q) x), " +
      "nsz AS (SELECT doc_id, COUNT(*) AS sz FROM ntok GROUP BY 1), " +
      "ninter AS (SELECT id1, id2, COUNT(*) AS inter FROM ncand JOIN ntok wa ON id1 = wa.doc_id JOIN ntok wb ON id2 = wb.doc_id AND wa.word = wb.word GROUP BY 1, 2), " +
      "ndv AS (SELECT DISTINCT id2 AS doc_id FROM ninter JOIN nsz sa ON sa.doc_id = id1 JOIN nsz sb ON sb.doc_id = id2 WHERE ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) >= 0.6), " +
      "nd AS (SELECT * FROM d WHERE doc_id NOT IN (SELECT doc_id FROM ndv)), " +
      "e AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
      "n AS (SELECT GREATEST(2, CAST(ROUND(SQRT(COUNT(*)), 0) AS INT)) AS stride FROM e), " +
      "c AS (SELECT vec_id AS cent_id, v AS centv FROM e, n WHERE vec_id % stride = 0), " +
      "a AS (SELECT e.vec_id, c.cent_id, graft_cosine(e.v, c.centv) AS sim FROM e CROSS JOIN c), " +
      "asg AS (SELECT vec_id, cent_id AS cluster FROM (SELECT vec_id, cent_id, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cent_id) AS rnk FROM a) r WHERE rnk = 1), " +
      "mem AS (SELECT vec_id, cluster, ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY vec_id) AS mrk FROM asg), " +
      s"mv AS (SELECT vec_id, cluster, transform(v, x -> x / nrm) AS vn FROM (SELECT m.vec_id, m.cluster, e.v, SQRT(aggregate(e.v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)) AS nrm FROM mem m JOIN e ON e.vec_id = m.vec_id WHERE m.mrk <= ${graft.operators.Dedup.SemMemberCap}) t), " +
      s"sdv AS (SELECT DISTINCT y.vec_id AS doc_id FROM mv x JOIN mv y ON x.cluster = y.cluster AND x.vec_id < y.vec_id WHERE ROUND(graft_dot(x.vn, y.vn), 4) >= ${graft.operators.Dedup.SemDupTau}), " +
      "sd AS (SELECT * FROM nd WHERE doc_id NOT IN (SELECT doc_id FROM sdv)), " +
      "qw AS (SELECT doc_id, split(trim(text), '\\\\s+') AS words FROM q), " +
      "shc AS (SELECT doc_id, concat_ws(' ', slice(words, CAST(i AS INT), 5)) AS sh FROM (SELECT doc_id, words, explode(sequence(1, size(words) - 4)) AS i FROM qw WHERE size(words) >= 5) t), " +
      "bw AS (SELECT split(trim(text), '\\\\s+') AS words FROM documents WHERE doc_id % 100 = 0), " +
      "bsh AS (SELECT DISTINCT concat_ws(' ', slice(words, CAST(i AS INT), 5)) AS sh FROM (SELECT words, explode(sequence(1, size(words) - 4)) AS i FROM bw WHERE size(words) >= 5) t), " +
      "contam AS (SELECT DISTINCT doc_id FROM shc JOIN bsh USING (sh)), " +
      "cl AS (SELECT * FROM sd WHERE doc_id NOT IN (SELECT doc_id FROM contam)), " +
      "r AS (SELECT doc_id, source, ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(concat('curate|', CAST(doc_id AS STRING))), doc_id) AS rnk FROM cl), " +
      "cap AS (SELECT doc_id FROM r WHERE rnk <= 15), " +
      "pp AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY md5(concat('curate|pos|', CAST(doc_id AS STRING))), doc_id) AS pos FROM cap) " +
      "SELECT (SELECT COUNT(*) FROM ne) AS n_non_empty, (SELECT COUNT(*) FROM q) AS n_quality, (SELECT COUNT(*) FROM d) AS n_dedup, (SELECT COUNT(*) FROM nd) AS n_neardup, (SELECT COUNT(*) FROM sd) AS n_semdedup, (SELECT COUNT(*) FROM cl) AS n_clean, (SELECT COUNT(*) FROM cap) AS n_capped, CAST((SELECT SUM(doc_id) FROM cap) AS BIGINT) AS kept_id_sum, CAST((SELECT SUM(doc_id * pos) FROM pp) AS BIGINT) AS pos_checksum"

  val rowsOnlySql: Map[String, String] = Map(
    "q163_exact_substr_trim" -> exactSubstrTrimSparkSql,
    "q164_neardup_aware_split" -> neardupAwareSplitSparkSql,
    "q167_curation_trimmed" -> curationTrimmedSparkSql,
    "q175_curated_split" -> curatedSplitSparkSql,
    "q168_bpe_train" -> bpeTrainSparkSql,
    "q169_quality_classifier" -> qualityClassifierSparkSql,
    // s174: SQL text cannot run the model write/load side effect — the
    // twin replays the inline retrain+score chain (the s172 precedent)
    "q174_nb_model_artifact" -> qualityClassifierSparkSql,
    "q170_bpe_tokenize" -> bpeTokenizeSparkSql,
    // s172: SQL text cannot run the artifact write/load side effect — the
    // twin replays the inline chain (the s157 precedent); conformance of
    // the artifact-serving q-lane against this text IS the round-trip pin
    "q172_bpe_artifact" -> bpeTokenizeSparkSql,
    "q173_bpe_encode_unseen" -> bpeEncodeUnseenSparkSql,
    "q113_pq_recall" -> pqSql,
    "q114_ivfpq_recall" -> ivfPqSql,
    "q153_ivfpq_rerank" -> ivfPqRerankSql,
    "q157_ann_index_serve" -> annIndexServeSql,
    "q158_ann_index_merge" -> annIndexServeSql,
    // s159: SQL text cannot run the append side effect either — the twin is
    // the same inline index+shortlist+rerank replay (append ≡ rebuild)
    "q159_ann_index_append" -> annIndexServeSql,
    "q160_ann_index_compact" -> annIndexServeSql,
    // s165/s166: SQL text cannot run the delete/build side effects — the
    // twins replay the inline serve math minus the same candidate sets
    "q165_ann_index_delete" -> annIndexServeSqlWhere(" AND codes.cid % 10 <> 7"),
    "q166_ann_filtered_search" -> annIndexServeSqlWhere(
      " AND codes.cid IN (SELECT vec_id FROM embeddings WHERE label % 3 = 0)"),
    "q171_ann_adaptive_search" -> annAdaptiveServeSparkSql,
    // s176: the retrain twin re-derives the WHOLE pipeline — quantizer
    // training included — over the live rows (retrain ≡ fresh build on
    // the live set; SQL text cannot run the build/append/delete/retrain
    // side effects)
    "q176_ann_index_retrain" -> annIndexServeSqlWhere("",
      embWhere = " WHERE vec_id % 10 <> 3"),
    "q155_hybrid_bm25_ann" -> hybridBm25AnnSparkSql,
    "q156_curation_neardup" -> curationNearDupSparkSql,
    "q154_hybrid_rrf" -> { // hybrid RRF as text: split/explode tokenization,
      // graft_cosine vector ranks, full-outer rank fusion — the oracle's
      // math with the Spark dialect spellings
      val k = graft.operators.Similarity.RrfK
      val chan = graft.operators.Similarity.HybridChan
      "WITH e AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "dd AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND length(text) > 0), " +
        "corp AS (SELECT dd.doc_id AS cid, dd.text, e.v FROM dd JOIN e ON e.vec_id = dd.doc_id), " +
        "tok AS (SELECT cid, w FROM (SELECT cid, explode(array_distinct(split(trim(text), '\\\\s+'))) AS w FROM corp) t), " +
        "qt AS (SELECT cid AS qid, w FROM tok WHERE cid < 8), " +
        s"kw AS (SELECT qid, cid, kw_rank FROM (SELECT qt.qid, t.cid, ROW_NUMBER() OVER (PARTITION BY qt.qid ORDER BY COUNT(*) DESC, t.cid) AS kw_rank FROM tok t JOIN qt ON t.w = qt.w AND qt.qid <> t.cid GROUP BY qt.qid, t.cid) r WHERE kw_rank <= $chan), " +
        "qv AS (SELECT cid AS qid, v AS qv FROM corp WHERE cid < 8), " +
        s"vec AS (SELECT qid, cid, vec_rank FROM (SELECT qv.qid, c.cid, ROW_NUMBER() OVER (PARTITION BY qv.qid ORDER BY ROUND(graft_cosine(qv.qv, c.v), 4) DESC, c.cid) AS vec_rank FROM qv CROSS JOIN corp c WHERE qv.qid <> c.cid) r WHERE vec_rank <= $chan), " +
        s"f AS (SELECT COALESCE(kw.qid, vec.qid) AS qid, COALESCE(kw.cid, vec.cid) AS cid, kw.kw_rank, vec.vec_rank, COALESCE(CAST(1.0 AS DOUBLE) / ($k + kw.kw_rank), CAST(0.0 AS DOUBLE)) + COALESCE(CAST(1.0 AS DOUBLE) / ($k + vec.vec_rank), CAST(0.0 AS DOUBLE)) AS score FROM kw FULL OUTER JOIN vec ON kw.qid = vec.qid AND kw.cid = vec.cid) " +
        "SELECT qid, cid, CAST(rrf_rank AS BIGINT) AS rrf_rank, ROUND(score, 6) AS score, CAST(COALESCE(kw_rank, -1) AS BIGINT) AS kw_rank, CAST(COALESCE(vec_rank, -1) AS BIGINT) AS vec_rank FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rrf_rank FROM f) z WHERE rrf_rank <= 10 ORDER BY qid, rrf_rank"
    },
    "q34_minhash_bands" ->
      ("WITH w AS (SELECT doc_id, split(trim(text), '\\\\s+') AS words FROM documents), " +
        "f AS (SELECT doc_id, words FROM w WHERE size(words) >= 3), " +
        s"shh AS (SELECT doc_id, ${baseHashSql("sh")} AS h FROM (SELECT doc_id, explode(transform(sequence(0, size(words) - 3), i -> concat_ws(' ', slice(words, i + 1, 3)))) AS sh FROM f) t), " +
        s"sig AS ($minhashSigSql), " +
        s"b AS (SELECT doc_id, explode($bandStructsSql) AS bs FROM sig), " +
        "bb AS (SELECT doc_id, bs.band AS band, bs.sig1 AS sig1, bs.sig2 AS sig2 FROM b), " +
        "g AS (SELECT band, sig1, sig2, COUNT(*) AS bucket_n FROM bb GROUP BY 1, 2, 3) " +
        "SELECT band, COUNT(*) AS n_buckets, CAST(SUM(CASE WHEN bucket_n > 1 THEN bucket_n ELSE 0 END) AS BIGINT) AS docs_in_collisions, CAST(SUM(bucket_n * (bucket_n - 1) / 2) AS BIGINT) AS candidate_pairs FROM g GROUP BY band ORDER BY band"),
    "q35_simhash" -> simhashSql,
    "q39_lsh_buckets" ->
      ("WITH e AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        s"s AS (SELECT vec_id, ${lshBucketSql(8, 0)} AS lsh_bucket FROM e) " +
        "SELECT lsh_bucket, COUNT(*) AS n FROM s GROUP BY lsh_bucket ORDER BY lsh_bucket"),
    "q40_winnow_fingerprint" -> // k=4 gram hashes, window-4 minima, distinct
      ("WITH d AS (SELECT doc_id, split(trim(text), '\\\\s+') AS words FROM documents), " +
        "f AS (SELECT doc_id, words FROM d WHERE size(words) >= 7), " +
        s"g AS (SELECT doc_id, transform(sequence(0, greatest(size(words) - 4, 0)), i -> (${graft.operators.Dedup.WinnowA} * (${baseHashSql("concat_ws(' ', slice(words, i + 1, 4))")}) + ${graft.operators.Dedup.WinnowB}) % ${graft.operators.Dedup.MinhashP}) AS grams FROM f), " +
        "m AS (SELECT doc_id, array_distinct(transform(sequence(0, greatest(size(grams) - 4, 0)), i -> array_min(slice(grams, i + 1, 4)))) AS fps FROM g) " +
        "SELECT doc_id, CAST(size(fps) AS BIGINT) AS n_fp FROM m ORDER BY doc_id"),
    "q48_ivf_clusters" -> // graft_cosine extension fn; stride-seeded
      // centroids, deterministic argmax (sim DESC, cent_id)
      ("WITH e AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "n AS (SELECT GREATEST(2, CAST(ROUND(SQRT(COUNT(*)), 0) AS INT)) AS stride FROM e), " +
        "c AS (SELECT vec_id AS cent_id, v AS centv FROM e, n WHERE vec_id % stride = 0), " +
        "a AS (SELECT e.vec_id, c.cent_id, graft_cosine(e.v, c.centv) AS sim FROM e CROSS JOIN c), " +
        "r AS (SELECT vec_id, cent_id, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cent_id) AS rnk FROM a) " +
        "SELECT cent_id AS cluster, COUNT(*) AS n FROM r WHERE rnk = 1 GROUP BY 1 ORDER BY 1"),
    "q152_semdedup" -> // SemDeDup as text: the q48 assignment CTEs, then a
      // rank-capped member table of UNIT vectors (0.0-seeded index-order
      // norm fold = VectorOps.norm), within-cluster pairwise
      // ROUND(graft_dot,4) ≥ tau — cosine of unit vectors — min-id
      // survivor verdict (dup_of COALESCEd to -1)
      ("WITH e AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "n AS (SELECT GREATEST(2, CAST(ROUND(SQRT(COUNT(*)), 0) AS INT)) AS stride FROM e), " +
        "c AS (SELECT vec_id AS cent_id, v AS centv FROM e, n WHERE vec_id % stride = 0), " +
        "a AS (SELECT e.vec_id, c.cent_id, graft_cosine(e.v, c.centv) AS sim FROM e CROSS JOIN c), " +
        "asg AS (SELECT vec_id, cent_id AS cluster FROM (SELECT vec_id, cent_id, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cent_id) AS rnk FROM a) r WHERE rnk = 1), " +
        "mem AS (SELECT vec_id, cluster, ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY vec_id) AS mrk FROM asg), " +
        s"mv AS (SELECT vec_id, cluster, transform(v, x -> x / nrm) AS vn FROM (SELECT m.vec_id, m.cluster, e.v, SQRT(aggregate(e.v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)) AS nrm FROM mem m JOIN e ON e.vec_id = m.vec_id WHERE m.mrk <= ${graft.operators.Dedup.SemMemberCap}) t), " +
        "p AS (SELECT y.vec_id AS id2, x.vec_id AS id1, ROUND(graft_dot(x.vn, y.vn), 4) AS sim FROM mv x JOIN mv y ON x.cluster = y.cluster AND x.vec_id < y.vec_id), " +
        s"dup AS (SELECT id2 AS vec_id, MIN(id1) AS dup_of FROM p WHERE sim >= ${graft.operators.Dedup.SemDupTau} GROUP BY 1) " +
        "SELECT m.vec_id, m.cluster, COALESCE(d.dup_of, CAST(-1 AS BIGINT)) AS dup_of, d.vec_id IS NOT NULL AS is_dup " +
        "FROM mem m LEFT JOIN dup d ON d.vec_id = m.vec_id ORDER BY vec_id"),
    "q50_neardup_confirmed" -> // the full LSH→exact-Jaccard pipeline as text
      ("WITH d AS (SELECT doc_id, text FROM documents), " +
        "w AS (SELECT doc_id, split(trim(text), '\\\\s+') AS words FROM d), " +
        "f AS (SELECT doc_id, words FROM w WHERE size(words) >= 3), " +
        s"shh AS (SELECT doc_id, ${baseHashSql("sh")} AS h FROM (SELECT doc_id, explode(transform(sequence(0, size(words) - 3), i -> concat_ws(' ', slice(words, i + 1, 3)))) AS sh FROM f) t), " +
        s"sig AS ($minhashSigSql), " +
        s"b AS (SELECT doc_id, explode($bandStructsSql) AS bs FROM sig), " +
        "bb AS (SELECT doc_id, bs.band AS band, bs.sig1 AS sig1, bs.sig2 AS sig2 FROM b), " +
        "bc AS (SELECT doc_id, band, sig1, sig2, COUNT(*) OVER (PARTITION BY band, sig1, sig2) AS bn FROM bb), " +
        s"bands AS (SELECT doc_id, band, sig1, sig2 FROM bc WHERE bn <= ${graft.operators.Dedup.MinhashBucketCap}), " +
        "cand AS (SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2 FROM bands a JOIN bands b2 ON a.band = b2.band AND a.sig1 = b2.sig1 AND a.sig2 = b2.sig2 AND a.doc_id < b2.doc_id), " +
        "tok AS (SELECT DISTINCT doc_id, word FROM (SELECT doc_id, explode(split(trim(text), '\\\\s+')) AS word FROM d) x), " +
        "sz AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY 1), " +
        "inter AS (SELECT id1, id2, COUNT(*) AS inter FROM cand JOIN tok wa ON id1 = wa.doc_id JOIN tok wb ON id2 = wb.doc_id AND wa.word = wb.word GROUP BY 1, 2), " +
        "sc AS (SELECT id1, id2, ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) AS jaccard FROM inter JOIN sz sa ON sa.doc_id = id1 JOIN sz sb ON sb.doc_id = id2), " +
        "p AS (SELECT * FROM sc WHERE jaccard >= 0.6) " +
        "SELECT COUNT(*) AS n_pairs, COALESCE(ROUND(AVG(jaccard), 4), 0.0) AS avg_jaccard, COALESCE(ROUND(MAX(jaccard), 4), 0.0) AS max_jaccard FROM p"),
    "q87_ann_recall" -> // recall@10 of IVF (unrefined — Lloyd is imperative)
      // and LSH (2 tables) vs exact truth; labels name the SQL tuning point
      ("WITH e AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "t AS (SELECT qid, cid FROM (SELECT q.vec_id AS qid, c.vec_id AS cid, ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY ROUND(graft_cosine(q.v, c.v), 4) DESC, c.vec_id) AS rnk FROM e q CROSS JOIN e c WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id) x WHERE rnk <= 10), " +
        "tc AS (SELECT COUNT(*) AS denom FROM t), " +
        "n AS (SELECT GREATEST(2, CAST(ROUND(SQRT(COUNT(*)), 0) AS INT)) AS stride FROM e), " +
        "c AS (SELECT vec_id AS cent_id, v AS centv FROM e, n WHERE vec_id % stride = 0), " +
        "asg AS (SELECT vec_id, cent_id AS cluster FROM (SELECT e.vec_id, c.cent_id, ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY graft_cosine(e.v, c.centv) DESC, c.cent_id) AS rnk FROM e CROSS JOIN c) y WHERE rnk = 1), " +
        "pr AS (SELECT qid, cluster FROM (SELECT q.vec_id AS qid, c.cent_id AS cluster, ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY graft_cosine(q.v, c.centv) DESC, c.cent_id) AS prnk FROM e q CROSS JOIN c WHERE q.vec_id < 20) z WHERE prnk <= 4), " +
        "ivfc AS (SELECT qid, cid FROM (SELECT pr.qid, a.vec_id AS cid, ROW_NUMBER() OVER (PARTITION BY pr.qid ORDER BY ROUND(graft_cosine(qv.v, cv.v), 4) DESC, a.vec_id) AS rnk FROM pr JOIN asg a ON pr.cluster = a.cluster JOIN e qv ON qv.vec_id = pr.qid JOIN e cv ON cv.vec_id = a.vec_id WHERE pr.qid <> a.vec_id) u WHERE rnk <= 10), " +
        "lb0 AS (SELECT vec_id, " + lshBucketSql(5, 0) + " AS bkt FROM e), " +
        "lb1 AS (SELECT vec_id, " + lshBucketSql(5, 1) + " AS bkt FROM e), " +
        "lcand AS (SELECT DISTINCT qid, cid FROM (SELECT q.vec_id AS qid, c2.vec_id AS cid FROM lb0 q JOIN lb0 c2 ON q.bkt = c2.bkt AND q.vec_id < 20 AND q.vec_id <> c2.vec_id UNION ALL SELECT q.vec_id, c2.vec_id FROM lb1 q JOIN lb1 c2 ON q.bkt = c2.bkt AND q.vec_id < 20 AND q.vec_id <> c2.vec_id) lu), " +
        "lshc AS (SELECT qid, cid FROM (SELECT lcand.qid, lcand.cid, ROW_NUMBER() OVER (PARTITION BY lcand.qid ORDER BY ROUND(graft_cosine(qv.v, cv.v), 4) DESC, lcand.cid) AS rnk FROM lcand JOIN e qv ON qv.vec_id = lcand.qid JOIN e cv ON cv.vec_id = lcand.cid) v WHERE rnk <= 10) " +
        "SELECT 'ivf_sqrtn_nprobe4_r0' AS method, ROUND(CAST(hits AS DOUBLE) / denom, 4) AS recall, hits, CAST(denom AS BIGINT) AS denom, CAST(3700 AS BIGINT) AS floor_bp, hits * 10000 >= denom * 3700 AS floor_ok FROM (SELECT CAST(COUNT(*) AS BIGINT) AS hits FROM t LEFT SEMI JOIN ivfc ON t.qid = ivfc.qid AND t.cid = ivfc.cid) h1 CROSS JOIN tc " +
        "UNION ALL SELECT 'lsh_5bit_x2' AS method, ROUND(CAST(hits AS DOUBLE) / denom, 4) AS recall, hits, CAST(denom AS BIGINT) AS denom, CAST(700 AS BIGINT) AS floor_bp, hits * 10000 >= denom * 700 AS floor_ok FROM (SELECT CAST(COUNT(*) AS BIGINT) AS hits FROM t LEFT SEMI JOIN lshc ON t.qid = lshc.qid AND t.cid = lshc.cid) h2 CROSS JOIN tc " +
        "ORDER BY method"),
  )

  /** Spark-runnable SQL text for every oracle-gated query name (the oracle
    * SQL itself where the dialects agree, else the twin above). */
  def sqlText: Map[String, String] =
    SparkEntry.baseOracleSql.map { case (name, duck) =>
      name -> sparkDialect.getOrElse(name, duck)
    } ++ rowsOnlySql

  /** The front-door lane: `qNN_x` → `sNN_x`, each entry running the SQL text
    * through `spark.sql` over the registered views. */
  def laneQueries: Map[String, (SparkSession, String) => DataFrame] =
    sqlText.map { case (name, text) =>
      ("s" + name.drop(1)) -> { (s: SparkSession, dir: String) =>
        Tables.registerAll(s, dir)
        s.sql(text)
      }
    }

  /** Same DuckDB oracle keyed by the lane name — the SQL-text lane must hash
    * identically to its DataFrame sibling, EXCEPT where the text is a
    * labeled divergence (s87's tuning point), which carries its own
    * COMPUTED oracle since r12 (unrefined IVF + 2 LSH tables are fully
    * replayable — SparkEntry.s87AnnRecallOracle). */
  def laneOracle: Map[String, String] =
    SparkEntry.baseOracleSql.map { case (name, sql) => ("s" + name.drop(1)) -> sql } ++
      Map("s87_ann_recall" -> SparkEntry.s87AnnRecallOracle)
}
