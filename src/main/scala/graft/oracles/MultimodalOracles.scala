package graft.oracles

/** DuckDB-dialect oracle SQL for the multimodal operators.
  *
  * Split out of SparkEntry (VERDICT r9 "Next round" #6) — the strings
  * are the driver-contract oracles; column names must match the Spark
  * plans exactly (the compare sorts columns by name before hashing).
  */
private[graft] object MultimodalOracles {
  val sql: Map[String, String] = Map(
    // payload entropy: hex pairs ARE byte identities — no numeric
    // decode; X24's micro-rounded entropy terms over payload bytes
    "mm_entropy" ->
      """WITH m AS (
        |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS nb
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, CAST(nb AS BIGINT) AS n_bytes,
        |    list_transform(generate_series(1, nb), i -> substr(hx, i*2 - 1, 2)) AS bp
        |  FROM m
        |), u AS (SELECT doc_id, unnest(bp) AS b FROM p),
        |c AS (SELECT doc_id, b, count(*) AS cnt FROM u GROUP BY 1, 2),
        |e AS (
        |  SELECT c.doc_id,
        |    CAST(count(*) AS INT) AS n_distinct_bytes,
        |    CAST(sum(CAST(round(-(CAST(cnt AS DOUBLE) / n_bytes) *
        |      ln(CAST(cnt AS DOUBLE) / n_bytes) * 1e6) AS BIGINT)) AS BIGINT) AS entropy_micro
        |  FROM c JOIN p ON c.doc_id = p.doc_id GROUP BY 1
        |)
        |SELECT p.doc_id, p.n_bytes,
        |  coalesce(e.n_distinct_bytes, 0) AS n_distinct_bytes,
        |  coalesce(e.entropy_micro, 0) AS entropy_micro
        |FROM p LEFT JOIN e USING (doc_id) ORDER BY doc_id""".stripMargin,
    "mm_schema" ->
      """SELECT doc_id, 'utf8' AS format,
        |  octet_length(encode(text)) AS n_bytes,
        |  cast(n_chars % 640 AS int) AS width
        |FROM documents ORDER BY doc_id""".stripMargin,
    // every header field recomputed arithmetically — a hash match
    // proves the binary encode→parse round-trip is field-exact
    "mm_probe" ->
      """SELECT doc_id, true AS magic_ok,
        |  cast(64 + doc_id % 1856 AS bigint) AS width,
        |  cast(64 + (doc_id * 7) % 1024 AS bigint) AS height,
        |  cast(1 + doc_id % 4 AS bigint) AS channels,
        |  cast(octet_length(encode(text)) AS bigint) AS body_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    // M11: ASCII corpus ⇒ codepoint ops ≡ byte ops, so the oracle
    // replays the plant + block digests on text; NULL-on-absent
    // list_position matches the Spark side's mapped array_position
    "mm_integrity" ->
      """WITH m AS (
        |  SELECT doc_id, text AS p, length(text) AS len FROM documents
        |), c AS (
        |  SELECT doc_id, p, len, 1 + (doc_id % greatest(len, 1)) AS pos FROM m
        |), r AS (
        |  SELECT doc_id, p, len,
        |    CASE WHEN doc_id % 23 = 0 AND len > 0 THEN
        |      substr(p, 1, CAST(pos - 1 AS INT)) ||
        |      (CASE WHEN substr(p, CAST(pos AS INT), 1) = '#'
        |        THEN '@' ELSE '#' END) ||
        |      substr(p, CAST(pos + 1 AS INT), CAST(len - pos AS INT))
        |    ELSE p END AS recv
        |  FROM c
        |), h AS (
        |  SELECT doc_id,
        |    list_transform(range(0, (len + 63) // 64),
        |      i -> md5(substr(p, CAST(i * 64 + 1 AS INT), 64))) AS ho,
        |    list_transform(range(0, (len + 63) // 64),
        |      i -> md5(substr(recv, CAST(i * 64 + 1 AS INT), 64))) AS hr
        |  FROM r
        |)
        |SELECT doc_id, CAST(len(ho) AS BIGINT) AS n_blocks,
        |  md5(array_to_string(ho, '')) AS root_md5,
        |  (md5(array_to_string(ho, '')) <> md5(array_to_string(hr, '')))
        |    AS is_corrupted,
        |  CAST(coalesce(list_position(list_transform(range(1, len(ho) + 1),
        |    i -> ho[CAST(i AS INT)] <> hr[CAST(i AS INT)]), true), 0) AS BIGINT)
        |    AS first_bad_block
        |FROM h ORDER BY doc_id""".stripMargin,
    // block ids are md5 over the block's HEX rendering (injective →
    // byte-exact identity) because this engine has no BLOB md5; the
    // hex text slices at byte boundaries (2 chars/byte)
    "mm_block_dedup" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN
        |      substring(repeat('HDR' || CAST((doc_id // 7) % 2 AS VARCHAR) || 'abcdefghijk', 40), 1, 512)
        |        || 'tail_' || CAST(doc_id AS VARCHAR)
        |    ELSE text END AS p
        |  FROM documents
        |), hx AS (
        |  SELECT doc_id, hex(encode(p)) AS h, octet_length(encode(p)) AS nbytes FROM m
        |  WHERE octet_length(encode(p)) > 0
        |), b AS (
        |  SELECT md5(substring(h, i * 512 + 1, 512)) AS block_md5,
        |    least(256, nbytes - i * 256) AS block_bytes
        |  FROM hx, LATERAL unnest(generate_series(0,
        |    CAST(ceil(nbytes / 256.0) AS INT) - 1)) AS u(i)
        |)
        |SELECT block_md5, CAST(count(*) AS BIGINT) AS n_copies,
        |  CAST(max(block_bytes) AS BIGINT) AS block_bytes,
        |  CAST((count(*) - 1) * max(block_bytes) AS BIGINT) AS bytes_reclaimed
        |FROM b GROUP BY 1 HAVING count(*) > 1
        |ORDER BY block_md5""".stripMargin,
    "mm_dedup" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 9 = 0 THEN 'MEDIA_' || CAST((doc_id // 9) % 3 AS VARCHAR)
        |         ELSE text END AS p
        |  FROM documents
        |)
        |SELECT md5(p) AS payload_md5,
        |  cast(count(*) AS bigint) AS n_copies,
        |  min(doc_id) AS keep_id,
        |  cast(sum(octet_length(encode(p))) - min(octet_length(encode(p))) AS bigint)
        |    AS bytes_reclaimed
        |FROM m GROUP BY 1 HAVING count(*) > 1
        |ORDER BY payload_md5""".stripMargin,
    "mm_features" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  round(list_aggregate(list_transform(string_split(text, ' '),
        |    t -> length(t)), 'avg'), 4) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    // shard round-trip is byte-exact: every payload's md5 must match
    // the md5 of the source text's UTF-8 bytes
    "mm_shards" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // byte-exact sampling oracle: hex() the UTF-8 blob and decode each
    // sampled hex pair to its integer byte value (no charset round-trip)
    "mm_binary_files" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
        |  FROM documents WHERE doc_id < 50
        |)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
        |  cast(list_aggregate(list_transform(range(1, n + 1),
        |    i -> 16 * (strpos('0123456789ABCDEF', substring(h, CAST(2*i-1 AS INT), 1)) - 1)
        |       + (strpos('0123456789ABCDEF', substring(h, CAST(2*i AS INT), 1)) - 1)), 'sum') AS bigint) AS byte_sum
        |FROM b ORDER BY doc_id""".stripMargin,
    "mm_sample" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS h,
        |    octet_length(encode(text)) AS n
        |  FROM documents
        |)
        |SELECT doc_id,
        |  len(range(1, n + 1, 16)) AS n_sampled,
        |  cast(16 * (strpos('0123456789ABCDEF', substring(h, 1, 1)) - 1)
        |     + (strpos('0123456789ABCDEF', substring(h, 2, 1)) - 1) AS bigint) AS first_byte,
        |  cast(list_aggregate(list_transform(range(1, n + 1, 16),
        |    i -> 16 * (strpos('0123456789ABCDEF', substring(h, CAST(2*i-1 AS INT), 1)) - 1)
        |       + (strpos('0123456789ABCDEF', substring(h, CAST(2*i AS INT), 1)) - 1)), 'sum') AS bigint) AS checksum
        |FROM b ORDER BY doc_id""".stripMargin
  )
}
