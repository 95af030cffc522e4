package graft.oracles

/** DuckDB-dialect oracle SQL for the similarity/ANN operators.
  *
  * Split out of SparkEntry (VERDICT r9 "Next round" #6) — the strings
  * are the driver-contract oracles; column names must match the Spark
  * plans exactly (the compare sorts columns by name before hashing).
  */
private[graft] object SimilarityOracles {
  val sql: Map[String, String] = Map(
    "emb_centroid" ->
      """WITH dims AS (
        |  SELECT unnest(range(0, (SELECT len(embedding) FROM embeddings
        |                          ORDER BY vec_id LIMIT 1))) AS dim
        |)
        |SELECT label, CAST(dim AS INT) AS dim, cast(count(*) AS bigint) AS n_vecs,
        |  CAST(round(sum(CAST(embedding[CAST(dim AS INT) + 1] AS DOUBLE))
        |             / count(*) * 1e6) AS BIGINT) AS mean_micro
        |FROM embeddings, dims
        |GROUP BY 1, 2 ORDER BY label, dim""".stripMargin,
    "ann_knn_join" ->
      """WITH p AS (
        |  SELECT a.vec_id AS src, b.vec_id AS nbr,
        |    round(list_cosine_similarity(
        |      list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
        |), r AS (
        |  SELECT src, nbr, sim,
        |    row_number() OVER (PARTITION BY src ORDER BY sim DESC, nbr) AS rk
        |  FROM p
        |)
        |SELECT src, rk, nbr, sim FROM r WHERE rk <= 3
        |ORDER BY src, rk""".stripMargin,
    "emb_matryoshka" ->
      """WITH p(dp) AS (VALUES (8), (16), (32), (64)),
        |sims AS (
        |  SELECT p.dp, q.vec_id AS q_id, c.vec_id AS vec_id,
        |    round(list_cosine_similarity(
        |      list_transform(q.embedding[1:p.dp], x -> CAST(x AS DOUBLE)),
        |      list_transform(c.embedding[1:p.dp], x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id < 10 AND c.vec_id <> q.vec_id, p
        |), top AS (
        |  SELECT dp, q_id, vec_id FROM (
        |    SELECT dp, q_id, vec_id,
        |      row_number() OVER (PARTITION BY dp, q_id ORDER BY sim DESC, vec_id) AS rnk
        |    FROM sims
        |  ) WHERE rnk <= 5
        |), fullset AS (
        |  SELECT q_id, vec_id FROM top WHERE dp = 64
        |)
        |SELECT t.dp AS dim_prefix,
        |  CAST(sum(CASE WHEN f.q_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_matched,
        |  CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(round(CAST(sum(CASE WHEN f.q_id IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
        |    * 1e6 / count(*)) AS BIGINT) AS recall_micro
        |FROM top t LEFT JOIN fullset f ON f.q_id = t.q_id AND f.vec_id = t.vec_id
        |GROUP BY t.dp ORDER BY dim_prefix""".stripMargin,
    // Hamming retrieval: identical sign-bit fold (acc·2+b over 32-bit
    // words) and XOR+popcount on both engines — integer-exact
    "ann_hamming" ->
      """WITH enc AS (
        |  SELECT vec_id,
        |    list_transform(generate_series(0, CAST(ceil(len(embedding) / 32.0) AS INT) - 1),
        |      w -> list_reduce(
        |        list_prepend(CAST(0 AS BIGINT),
        |          list_transform(embedding[w*32+1 : w*32+32],
        |            x -> CAST(CASE WHEN x > 0 THEN 1 ELSE 0 END AS BIGINT))),
        |        (acc, b) -> acc * 2 + b)) AS code
        |  FROM embeddings
        |), q AS (
        |  SELECT vec_id AS q_id, code AS qcode FROM enc WHERE vec_id < 10
        |), c AS (
        |  SELECT q_id, e.vec_id,
        |    list_sum(list_transform(generate_series(1, len(e.code)),
        |      i -> bit_count(xor(e.code[i], q.qcode[i])))) AS hamming
        |  FROM enc e CROSS JOIN q
        |  WHERE e.vec_id <> q.q_id
        |), r AS (
        |  SELECT q_id, vec_id, CAST(hamming AS BIGINT) AS hamming,
        |    row_number() OVER (PARTITION BY q_id ORDER BY hamming, vec_id) AS rnk
        |  FROM c
        |)
        |SELECT q_id, CAST(rnk AS INT) AS rnk, vec_id, hamming
        |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "emb_norm" ->
      """SELECT vec_id, label, len(embedding) AS dim,
        |  round(sqrt(list_aggregate(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4) AS l2_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "emb_rproj" ->
      """WITH p AS (
        |  SELECT vec_id,
        |    list_transform(range(0, 16), j ->
        |      list_sum(list_transform(range(0, CAST(len(embedding) AS BIGINT)), i ->
        |        (1 - 2 * ((((j * len(embedding) + i) * 2654435761) >> 13) & 1))
        |          * CAST(embedding[i + 1] AS DOUBLE))) / sqrt(16.0)) AS y
        |  FROM embeddings
        |)
        |SELECT vec_id, 16 AS out_dim,
        |  CAST(round(y[1] * 1000000) AS BIGINT) AS y1_micro,
        |  CAST(round(sqrt(list_sum(list_transform(y, v -> v * v))) * 1000000) AS BIGINT) AS norm_micro
        |FROM p ORDER BY vec_id""".stripMargin,
    "emb_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), s AS (
        |  SELECT vec_id, v,
        |    127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
        |  FROM e
        |)
        |SELECT vec_id, len(v) AS dim, round(scale, 4) AS scale_r,
        |  CAST(list_aggregate(list_transform(v, x -> round(x * scale)), 'sum') AS BIGINT) AS q_sum,
        |  round(list_aggregate(list_transform(v, x -> abs(x - round(x * scale) / scale)), 'max'), 6) AS max_err
        |FROM s ORDER BY vec_id""".stripMargin,
    // kNN label vote: A1's exact ranking + (cnt desc, label) argmax
    "ann_knn_eval" ->
      """WITH sims AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id, c.label,
        |    round(list_cosine_similarity(
        |      list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(c.embedding, x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 50 AND c.vec_id <> q.vec_id
        |), nn AS (
        |  SELECT q_id, label FROM (
        |    SELECT q_id, label,
        |      row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk
        |    FROM sims) WHERE rnk <= 5
        |), votes AS (
        |  SELECT q_id, label AS pred_label FROM (
        |    SELECT q_id, label,
        |      row_number() OVER (PARTITION BY q_id ORDER BY cnt DESC, label) AS r
        |    FROM (SELECT q_id, label, count(*) AS cnt FROM nn GROUP BY 1, 2))
        |  WHERE r = 1
        |)
        |SELECT e.label AS true_label, count(*) AS n_eval,
        |  CAST(sum(CASE WHEN v.pred_label = e.label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
        |  (1000000 * CAST(sum(CASE WHEN v.pred_label = e.label THEN 1 ELSE 0 END) AS BIGINT)) // count(*)
        |    AS acc_micro
        |FROM votes v JOIN embeddings e ON e.vec_id = v.q_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // embedding drift: micro-quantized component sums, cosine on the
    // summed integer vectors (scale-invariant — no centroid division)
    "emb_drift" ->
      """WITH e AS (
        |  SELECT label, CAST(vec_id % 2 = 0 AS INT) AS snapshot,
        |    i AS pos, CAST(round(embedding[i] * 1e6) AS BIGINT) AS q
        |  FROM embeddings
        |  CROSS JOIN unnest(generate_series(1, len(embedding))) AS u(i)
        |), s AS (
        |  SELECT label, snapshot, pos, CAST(sum(q) AS BIGINT) AS s
        |  FROM e GROUP BY 1, 2, 3
        |), n AS (
        |  SELECT label, CAST(vec_id % 2 = 0 AS INT) AS snapshot, count(*) AS n
        |  FROM embeddings GROUP BY 1, 2
        |), dots AS (
        |  SELECT a.label,
        |    sum(CAST(a.s AS HUGEINT) * b.s) AS dot,
        |    sum(CAST(a.s AS HUGEINT) * a.s) AS na,
        |    sum(CAST(b.s AS HUGEINT) * b.s) AS nb
        |  FROM (SELECT * FROM s WHERE snapshot = 0) a
        |  JOIN (SELECT * FROM s WHERE snapshot = 1) b
        |    ON a.label = b.label AND a.pos = b.pos
        |  GROUP BY a.label
        |)
        |SELECT d.label,
        |  (SELECT n FROM n WHERE n.label = d.label AND snapshot = 0) AS n_a,
        |  (SELECT n FROM n WHERE n.label = d.label AND snapshot = 1) AS n_b,
        |  CAST(round(CAST(dot AS DOUBLE) /
        |    (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) * 1e6) AS BIGINT)
        |    AS centroid_cos_micro
        |FROM dots d ORDER BY d.label""".stripMargin,
    "emb_decontaminate" ->
      """WITH b AS (
        |  SELECT vec_id AS bench_id, embedding FROM embeddings WHERE vec_id < 20
        |), c AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 20
        |), sims AS (
        |  SELECT c.vec_id, b.bench_id,
        |    round(list_cosine_similarity(
        |      list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM c CROSS JOIN b
        |), r AS (
        |  SELECT vec_id, sim, bench_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, bench_id) AS rk
        |  FROM sims
        |)
        |SELECT vec_id, sim AS max_sim, bench_id, sim >= 0.4 AS contaminated
        |FROM r WHERE rk = 1 ORDER BY vec_id""".stripMargin,
    // dedup_embedding has NO oracle: LSH band candidate generation is
    // probabilistic (rows-only check; recall spec in Round8Spec). The
    // old all-pairs SQL survives as the spec's oracle via
    // Dedup.embeddingCosineExact.
    // A1: exact top-5 neighbors for the 10 lowest vec_ids. A2/A3 are
    // probabilistic (seeded hyperplanes / k-means cells not replayable
    // in SQL) → rows-only + recall specs vs A1.
    // same fold order + float->double widening as the codegen'd kernel
    "ann_mips" ->
      """WITH sims AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
        |    round(list_inner_product(
        |      list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(c.embedding, x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
        |)
        |SELECT q_id, rnk, vec_id, sim FROM (
        |  SELECT q_id, vec_id, sim,
        |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk
        |  FROM sims
        |) WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    // A29: the filter restricts CANDIDATES before scoring — the true
    // top-k of the filtered corpus, not a truncation of unfiltered
    // neighbors
    "ann_filtered" ->
      """WITH sims AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
        |    round(list_cosine_similarity(
        |      list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(c.embedding, x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id < 10 AND c.vec_id <> q.vec_id AND c.label IN (3, 7)
        |)
        |SELECT q_id, rnk, vec_id, sim FROM (
        |  SELECT q_id, vec_id, sim,
        |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk
        |  FROM sims
        |) WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "ann_bruteforce" ->
      """WITH sims AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
        |    round(list_cosine_similarity(
        |      list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(c.embedding, x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
        |)
        |SELECT q_id, rnk, vec_id, sim FROM (
        |  SELECT q_id, vec_id, sim,
        |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk
        |  FROM sims
        |) WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    // A27: ball membership compares the 4dp-ROUNDED sim (A1's
    // contract), so the count and argmax replay exactly; empty balls
    // surface as (-1, -1.0) sentinels, never NULLs
    "ann_range" ->
      """WITH sims AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
        |    round(list_cosine_similarity(
        |      list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(c.embedding, x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id < 16 AND c.vec_id <> q.vec_id
        |), agg AS (
        |  SELECT q_id,
        |    CAST(sum(CASE WHEN sim >= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_within
        |  FROM sims GROUP BY 1
        |), best AS (
        |  SELECT q_id, vec_id AS best_vec_id, sim AS best_sim,
        |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
        |  FROM sims WHERE sim >= 0.2
        |)
        |SELECT a.q_id, a.n_within,
        |  coalesce(b.best_vec_id, -1) AS best_vec_id,
        |  coalesce(b.best_sim, -1.0) AS best_sim
        |FROM agg a LEFT JOIN best b ON b.q_id = a.q_id AND b.rn = 1
        |ORDER BY a.q_id""".stripMargin
  )
}
