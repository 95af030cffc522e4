package graft.oracles

/** DuckDB-dialect oracle SQL for the deduplication operators.
  *
  * Split out of SparkEntry (VERDICT r9 "Next round" #6) — the strings
  * are the driver-contract oracles; column names must match the Spark
  * plans exactly (the compare sorts columns by name before hashing).
  */
private[graft] object DedupOracles {
  val sql: Map[String, String] = Map(
    "dedup_incremental" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), d AS (SELECT doc_id, md5(norm) AS h, toks FROM t),
        |base AS (SELECT * FROM d WHERE doc_id < 400),
        |delta AS (SELECT * FROM d WHERE doc_id >= 400),
        |exact AS (
        |  SELECT delta.doc_id, min(base.doc_id) AS match_id
        |  FROM delta JOIN base ON delta.h = base.h GROUP BY 1
        |),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS shingle
        |  FROM d WHERE len(toks) >= 3
        |),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |restsh AS (SELECT * FROM sh WHERE doc_id >= 400
        |           AND doc_id NOT IN (SELECT doc_id FROM exact)),
        |basesh AS (SELECT * FROM sh WHERE doc_id < 400),
        |inter AS (
        |  SELECT r.doc_id AS d_id, b.doc_id AS b_id, count(*) AS i
        |  FROM restsh r JOIN basesh b ON r.shingle = b.shingle
        |  GROUP BY 1, 2
        |),
        |near AS (
        |  SELECT d_id AS doc_id, min(b_id) AS match_id
        |  FROM inter
        |  JOIN sizes sd ON d_id = sd.doc_id
        |  JOIN sizes sb ON b_id = sb.doc_id
        |  WHERE round(i / (sd.sz + sb.sz - i), 4) >= 0.5
        |  GROUP BY 1
        |),
        |dup AS (
        |  SELECT doc_id, 'exact_dup' AS verdict, match_id FROM exact
        |  UNION ALL SELECT doc_id, 'near_dup', match_id FROM near
        |)
        |SELECT delta.doc_id, coalesce(verdict, 'new') AS verdict, match_id
        |FROM delta LEFT JOIN dup ON delta.doc_id = dup.doc_id
        |ORDER BY delta.doc_id""".stripMargin,
    // the bloom is a prefilter only — exact verify makes the output
    // identical to plain hash membership, which is what the oracle runs
    "dedup_bloom_gate" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS h
        |  FROM documents
        |), base AS (SELECT * FROM d WHERE doc_id < 400),
        |delta AS (SELECT * FROM d WHERE doc_id >= 400
        |          UNION ALL
        |          SELECT -doc_id - 1, h FROM base WHERE doc_id % 50 = 0),
        |verified AS (
        |  SELECT delta.doc_id, min(base.doc_id) AS match_id
        |  FROM delta JOIN base ON delta.h = base.h GROUP BY 1
        |)
        |SELECT delta.doc_id,
        |  CASE WHEN match_id IS NOT NULL THEN 'dup' ELSE 'new' END AS verdict,
        |  match_id
        |FROM delta LEFT JOIN verified ON delta.doc_id = verified.doc_id
        |ORDER BY delta.doc_id""".stripMargin,
    "dedup_semantic" ->
      """WITH seeds AS (
        |  SELECT vec_id AS seed_id, embedding AS seed_emb FROM embeddings WHERE vec_id < 8
        |), sims AS (
        |  SELECT e.vec_id, s.seed_id,
        |    round(list_cosine_similarity(
        |      list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(s.seed_emb, x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM embeddings e CROSS JOIN seeds s
        |), a AS (
        |  SELECT vec_id, seed_id AS cluster_id, sim,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, seed_id) AS rk
        |  FROM sims
        |), asg AS (
        |  SELECT vec_id, cluster_id, sim FROM a WHERE rk = 1
        |), k AS (
        |  SELECT vec_id, cluster_id, sim,
        |    row_number() OVER (PARTITION BY cluster_id ORDER BY sim DESC, vec_id) AS krk
        |  FROM asg
        |)
        |SELECT cluster_id, cast(count(*) AS bigint) AS n_members,
        |  min(CASE WHEN krk = 1 THEN vec_id END) AS keep_id,
        |  min(CASE WHEN krk = 1 THEN sim END) AS keep_sim
        |FROM k GROUP BY 1 ORDER BY cluster_id""".stripMargin,
    // SemDeDup ε sweep: D9's assignment + keeper rehydration, micro
    // thresholds compared through bit-equal 4-dp doubles
    "dedup_semantic_sweep" ->
      """WITH seeds AS (
        |  SELECT vec_id AS seed_id, embedding AS seed_emb FROM embeddings WHERE vec_id < 8
        |), sims AS (
        |  SELECT e.vec_id, s.seed_id,
        |    round(list_cosine_similarity(
        |      list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(s.seed_emb, x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM embeddings e CROSS JOIN seeds s
        |), a AS (
        |  SELECT vec_id, seed_id AS cluster_id, sim,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, seed_id) AS rk
        |  FROM sims
        |), k2 AS (
        |  SELECT vec_id, cluster_id, sim,
        |    row_number() OVER (PARTITION BY cluster_id ORDER BY sim DESC, vec_id) AS krk
        |  FROM a WHERE rk = 1
        |), keep AS (
        |  SELECT cluster_id, vec_id AS keep_id FROM k2 WHERE krk = 1
        |), simk AS (
        |  SELECT m.vec_id, kp.keep_id,
        |    round(list_cosine_similarity(
        |      list_transform(em.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(ek.embedding, x -> CAST(x AS DOUBLE))), 4) AS sim_keep
        |  FROM k2 m JOIN keep kp USING (cluster_id)
        |  JOIN embeddings em ON em.vec_id = m.vec_id
        |  JOIN embeddings ek ON ek.vec_id = kp.keep_id
        |), sweep AS (
        |  SELECT eps, count(*) AS n_total,
        |    CAST(sum(CASE WHEN vec_id <> keep_id AND sim_keep * 1e6 >= 1000000 - eps
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        |  FROM simk CROSS JOIN (SELECT unnest([600000, 750000, 900000]) AS eps)
        |  GROUP BY eps
        |)
        |SELECT CAST(eps AS INT) AS eps_micro, n_total, n_dropped,
        |  n_total - n_dropped AS n_kept,
        |  (1000000 * n_dropped) // n_total AS drop_rate_micro
        |FROM sweep ORDER BY eps_micro""".stripMargin,
    "dedup_paragraph" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN text || '. Subscribe to our newsletter for the latest updates. All rights reserved'
        |      ELSE text END AS text
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, md5(trim(lower(sent))) AS sent_hash
        |  FROM (SELECT doc_id, unnest(string_split_regex(text, '\.\s+')) AS sent
        |        FROM docs)
        |  WHERE length(trim(sent)) > 0
        |)
        |SELECT sent_hash, count(*) AS n_occ,
        |  count(DISTINCT doc_id) AS n_docs, min(doc_id) AS keep_doc
        |FROM s GROUP BY sent_hash HAVING count(*) > 1
        |ORDER BY sent_hash""".stripMargin,
    "dedup_substring" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN text || '. Subscribe to our newsletter for the latest updates. All rights reserved'
        |      ELSE text END AS text
        |  FROM documents
        |), toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM docs
        |), spans AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, greatest(len(t) - 7, 0)),
        |      i -> md5(array_to_string(t[i:i+7], ' ')))) AS h
        |  FROM toks
        |), dup AS (
        |  SELECT h, count(DISTINCT doc_id) AS n_docs
        |  FROM spans GROUP BY h HAVING count(*) >= 2
        |)
        |SELECT s.doc_id,
        |  CAST(count(DISTINCT s.h) AS BIGINT) AS n_dup_spans,
        |  CAST(max(d.n_docs) AS BIGINT) AS max_span_docs
        |FROM spans s JOIN dup d USING (h)
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "dedup_substring_remove" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN text || '. Subscribe to our newsletter for the latest updates. All rights reserved'
        |      ELSE text END AS text
        |  FROM documents
        |), toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM docs
        |), spans AS (
        |  SELECT doc_id, i, md5(array_to_string(t[i:i+7], ' ')) AS h
        |  FROM toks, unnest(generate_series(1, greatest(len(t) - 7, 0))) AS u(i)
        |), flagged AS (
        |  SELECT h FROM spans GROUP BY h HAVING count(*) >= 2
        |), occ AS (
        |  SELECT s.doc_id, s.i,
        |    row_number() OVER (PARTITION BY s.h ORDER BY s.doc_id, s.i) AS rn
        |  FROM spans s JOIN flagged USING (h)
        |), covered AS (
        |  SELECT DISTINCT doc_id, i + d AS pos
        |  FROM occ, unnest(generate_series(0, 7)) AS g(d)
        |  WHERE rn > 1
        |), agg AS (
        |  SELECT doc_id, count(*) AS n_removed, list(pos) AS rm
        |  FROM covered GROUP BY doc_id
        |)
        |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
        |  md5(coalesce(array_to_string(list_filter(t.t, (x, i) ->
        |    NOT coalesce(list_contains(a.rm, i), false)), ' '), '')) AS cleaned_md5
        |FROM toks t LEFT JOIN agg a USING (doc_id) ORDER BY t.doc_id""".stripMargin,
    // Dedup — D1/D2/D5 deterministic with SQL oracles; D3/D4 are
    // sketch-based (xxhash64 seeds not replayable in DuckDB) → rows-only
    // driver check + exactness specs in ScalaTest.
    "dedup_exact" ->
      """SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS content_hash,
        |  count(*) AS n_docs, min(doc_id) AS keep_id
        |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin,
    // a vector that deletes a keeper or misses a duplicate breaks this
    "dedup_delete_vectors" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 9 = 0 THEN 'DUP_' || CAST((doc_id // 9) % 3 AS VARCHAR)
        |         ELSE text END AS text
        |  FROM documents
        |), k AS (
        |  SELECT md5(text) AS h, min(doc_id) AS keep FROM p GROUP BY 1
        |), s AS (
        |  SELECT p.text, md5(p.text) AS h FROM p
        |  JOIN k ON md5(p.text) = k.h AND p.doc_id = k.keep
        |)
        |SELECT cast(count(*) AS bigint) AS n_docs,
        |  cast(count(DISTINCT h) AS bigint) AS n_distinct,
        |  cast(sum(octet_length(encode(text))) AS bigint) AS total_bytes,
        |  (SELECT cast(count(*) AS bigint) FROM p) - count(*) AS n_deleted
        |FROM s""".stripMargin,
    // containment replays the SAME df cap the operator contracts
    // (candidates from capped shingles, exact verify from full sets)
    "dedup_containment" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS shingle
        |  FROM t WHERE len(toks) >= 3
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
        |), df AS (
        |  SELECT shingle, count(*) AS df FROM sh GROUP BY 1
        |), kept AS (
        |  SELECT sh.doc_id, sh.shingle FROM sh JOIN df USING (shingle) WHERE df <= 50
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS inner_id, b.doc_id AS outer_id
        |  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        |), inter AS (
        |  SELECT c.inner_id, c.outer_id, count(*) AS i
        |  FROM cand c
        |  JOIN sh x ON x.doc_id = c.inner_id
        |  JOIN sh y ON y.doc_id = c.outer_id AND y.shingle = x.shingle
        |  GROUP BY 1, 2
        |)
        |SELECT inner_id, outer_id, round(i / sa.sz, 4) AS containment
        |FROM inter JOIN sizes sa ON inner_id = sa.doc_id
        |WHERE round(i / sa.sz, 4) >= 0.8
        |ORDER BY inner_id, outer_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS shingle
        |  FROM t WHERE len(toks) >= 3
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b,
        |  round(i / (sa.sz + sb.sz - i), 4) AS jaccard
        |FROM inter
        |JOIN sizes sa ON doc_a = sa.doc_id
        |JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE round(i / (sa.sz + sb.sz - i), 4) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_clusters" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS shingle
        |  FROM t WHERE len(toks) >= 3
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON doc_a = sa.doc_id
        |  JOIN sizes sb ON doc_b = sb.doc_id
        |  WHERE round(i / (sa.sz + sb.sz - i), 4) >= 0.5
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs
        |), walk(src, reach) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, w.reach FROM edges e JOIN walk w ON e.dst = w.src
        |), lbl AS (
        |  SELECT src AS id, min(reach) AS cluster_id FROM walk GROUP BY 1
        |)
        |SELECT cluster_id, count(*) AS n_members
        |FROM lbl GROUP BY 1 ORDER BY 1""".stripMargin,
    // band planning: powers by left-fold multiplication (pow() differs
    // in the last ulp between JVM and libm), micro-round before sums
    "dedup_band_plan" ->
      """WITH cfg AS (
        |  SELECT * FROM (VALUES (128,1),(64,2),(32,4),(16,8),(8,16),(4,32),(2,64),(1,128))
        |    AS t(bands, rows_per_band)
        |), pts AS (
        |  SELECT (i + 0.5) / 1000 AS s FROM unnest(generate_series(0, 999)) AS u(i)
        |), curve AS (
        |  SELECT bands, rows_per_band, s,
        |    CAST(floor((1 - qb) * 1e6 + 0.5) AS BIGINT) AS p_micro
        |  FROM (
        |    SELECT bands, rows_per_band, s,
        |      list_reduce(list_prepend(1.0, list_transform(generate_series(1, bands), x -> q)),
        |        (a, b) -> a * b) AS qb
        |    FROM (
        |      SELECT bands, rows_per_band, s,
        |        1 - list_reduce(list_prepend(1.0, list_transform(generate_series(1, rows_per_band), x -> s)),
        |          (a, b) -> a * b) AS q
        |      FROM cfg CROSS JOIN pts))
        |), areas AS (
        |  SELECT bands, rows_per_band,
        |    CAST(floor(sum(CASE WHEN s < 0.5 THEN p_micro ELSE 0 END) / 1000) AS BIGINT) AS fp_area_micro,
        |    CAST(floor(sum(CASE WHEN s >= 0.5 THEN 1000000 - p_micro ELSE 0 END) / 1000) AS BIGINT) AS fn_area_micro
        |  FROM curve GROUP BY 1, 2
        |), wt AS (
        |  SELECT *, fp_area_micro + fn_area_micro AS total_err_micro FROM areas
        |), best AS (
        |  SELECT total_err_micro AS be, bands AS bb FROM wt
        |  ORDER BY total_err_micro, bands LIMIT 1
        |)
        |SELECT wt.bands, wt.rows_per_band, fp_area_micro, fn_area_micro, total_err_micro,
        |  (total_err_micro = be AND wt.bands = bb) AS is_chosen
        |FROM wt CROSS JOIN best ORDER BY wt.bands DESC""".stripMargin,
    // cross-source matrix: the dedup_clusters pair CTE + source labels
    "dedup_cross_source" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS shingle
        |  FROM t WHERE len(toks) >= 3
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON doc_a = sa.doc_id
        |  JOIN sizes sb ON doc_b = sb.doc_id
        |  WHERE round(i / (sa.sz + sb.sz - i), 4) >= 0.5
        |), lab AS (
        |  SELECT least(da.source, db.source) AS source_a,
        |    greatest(da.source, db.source) AS source_b, p.doc_a, p.doc_b
        |  FROM pairs p
        |  JOIN documents da ON da.doc_id = p.doc_a
        |  JOIN documents db ON db.doc_id = p.doc_b
        |), np AS (
        |  SELECT source_a, source_b, count(*) AS n_pairs FROM lab GROUP BY 1, 2
        |), nd AS (
        |  SELECT source_a, source_b, count(DISTINCT d) AS n_docs
        |  FROM (SELECT source_a, source_b, doc_a AS d FROM lab
        |        UNION ALL SELECT source_a, source_b, doc_b FROM lab)
        |  GROUP BY 1, 2
        |)
        |SELECT np.source_a, np.source_b, np.n_pairs, nd.n_docs
        |FROM np JOIN nd USING (source_a, source_b)
        |ORDER BY source_a, source_b""".stripMargin,
    // SNM: replay both sort passes + the window-offset adjacency and
    // exact-verify with string shingles (the D2 hash-vs-string contract)
    "dedup_snm" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    substr(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), 1, 32) AS k1,
        |    substr(regexp_replace(lower(reverse(text)), '[^a-z0-9]+', ' ', 'g'), 1, 32) AS k2,
        |    list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS sh
        |  FROM (SELECT doc_id, text,
        |          string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 3
        |), r1 AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY k1, doc_id) AS rn FROM t
        |), p1 AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM r1 a CROSS JOIN unnest(generate_series(1, 4)) AS u(d)
        |  JOIN r1 b ON b.rn = a.rn + u.d
        |), r2 AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY k2, doc_id) AS rn FROM t
        |), p2 AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM r2 a CROSS JOIN unnest(generate_series(1, 4)) AS u(d)
        |  JOIN r2 b ON b.rn = a.rn + u.d
        |), cand AS (
        |  SELECT DISTINCT least(id_a, id_b) AS doc_a, greatest(id_a, id_b) AS doc_b
        |  FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
        |), sel AS (
        |  SELECT c.doc_a, c.doc_b,
        |    len(list_filter(ta.sh, x -> list_contains(tb.sh, x))) AS i,
        |    len(ta.sh) AS sa, len(tb.sh) AS sb
        |  FROM cand c
        |  JOIN t ta ON ta.doc_id = c.doc_a
        |  JOIN t tb ON tb.doc_id = c.doc_b
        |)
        |SELECT doc_a, doc_b, round(i / (sa + sb - i), 4) AS jaccard
        |FROM sel WHERE round(i / (sa + sb - i), 4) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    // CDC: the identical polynomial fold ((acc·31+code) mod 2^20,
    // prepended-zero seed) finds the same content-defined boundaries
    "dedup_cdc" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN text || '. Subscribe to our newsletter for the latest updates. All rights reserved'
        |      ELSE text END AS text
        |  FROM documents
        |), ch AS (
        |  SELECT doc_id, text, string_split(text, '') AS cs, length(text) AS n FROM docs
        |), cut AS (
        |  SELECT doc_id, text, n,
        |    list_prepend(0, list_append(
        |      list_filter(
        |        list_filter(generate_series(16, n),
        |          i -> list_reduce(
        |                 list_prepend(CAST(0 AS BIGINT),
        |                   list_transform(generate_series(i - 15, i),
        |                     j -> CAST(ascii(cs[j]) AS BIGINT))),
        |                 (acc, c) -> (acc * 31 + c) % 1048576) % 64 = 0),
        |        x -> x < n),
        |      n)) AS b
        |  FROM ch
        |), chunks AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(b) - 1),
        |      j -> md5(substr(text, b[j] + 1, b[j + 1] - b[j])))) AS h,
        |    unnest(list_transform(generate_series(1, len(b) - 1),
        |      j -> b[j + 1] - b[j])) AS clen
        |  FROM cut
        |)
        |SELECT h AS chunk_hash, CAST(count(*) AS BIGINT) AS n_occ,
        |  count(DISTINCT doc_id) AS n_docs, min(doc_id) AS keep_doc,
        |  CAST(min(clen) AS BIGINT) AS chunk_len
        |FROM chunks GROUP BY h HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY chunk_hash""".stripMargin,
    // D15: the same recursive-CTE components as dedup_clusters, then
    // per-doc actions — min-id exemplar keeps, size >= 4 quarantines
    "dedup_quarantine" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS shingle
        |  FROM t WHERE len(toks) >= 3
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON doc_a = sa.doc_id
        |  JOIN sizes sb ON doc_b = sb.doc_id
        |  WHERE round(i / (sa.sz + sb.sz - i), 4) >= 0.5
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs
        |), walk(src, reach) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, w.reach FROM edges e JOIN walk w ON e.dst = w.src
        |), lbl AS (
        |  SELECT src AS id, min(reach) AS cluster_id FROM walk GROUP BY 1
        |), csize AS (
        |  SELECT cluster_id, count(*) AS sz FROM lbl GROUP BY 1
        |)
        |SELECT d.doc_id,
        |  coalesce(l.cluster_id, d.doc_id) AS cluster_id,
        |  CAST(coalesce(s.sz, 1) AS BIGINT) AS cluster_size,
        |  CASE WHEN l.cluster_id IS NULL THEN 'keep'
        |       WHEN s.sz >= 4 THEN 'quarantine'
        |       WHEN d.doc_id = l.cluster_id THEN 'keep'
        |       ELSE 'drop' END AS action
        |FROM documents d
        |LEFT JOIN lbl l ON l.id = d.doc_id
        |LEFT JOIN csize s ON s.cluster_id = l.cluster_id
        |ORDER BY d.doc_id""".stripMargin,
    "dedup_keep_best" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), q AS (
        |  SELECT doc_id, len(toks) AS n_tokens FROM t
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS shingle
        |  FROM t WHERE len(toks) >= 3
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
        |), pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), nd AS (
        |  SELECT doc_a, doc_b FROM pairs
        |  JOIN sizes sa ON doc_a = sa.doc_id
        |  JOIN sizes sb ON doc_b = sb.doc_id
        |  WHERE round(i / (sa.sz + sb.sz - i), 4) >= 0.5
        |), losers AS (
        |  SELECT DISTINCT CASE WHEN qa.n_tokens < qb.n_tokens THEN doc_a
        |                       WHEN qb.n_tokens < qa.n_tokens THEN doc_b
        |                       ELSE greatest(doc_a, doc_b) END AS doc_id
        |  FROM nd
        |  JOIN q qa ON doc_a = qa.doc_id
        |  JOIN q qb ON doc_b = qb.doc_id
        |)
        |SELECT doc_id, n_tokens FROM q
        |WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        |ORDER BY doc_id""".stripMargin
  )
}
