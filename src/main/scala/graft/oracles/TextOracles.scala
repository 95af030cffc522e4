package graft.oracles

/** DuckDB-dialect oracle SQL for the text-analysis operators.
  *
  * Split out of SparkEntry (VERDICT r9 "Next round" #6) — the strings
  * are the driver-contract oracles; column names must match the Spark
  * plans exactly (the compare sorts columns by name before hashing).
  */
private[graft] object TextOracles {
  val sql: Map[String, String] = Map(
    "text_chunk" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, toks,
        |    unnest(range(0, CAST(floor((len(toks) - 1) / 48) AS BIGINT) + 1)) AS chunk_idx
        |  FROM t
        |)
        |SELECT doc_id, chunk_idx,
        |  CAST(len(toks[chunk_idx * 48 + 1 : chunk_idx * 48 + 64]) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(toks[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "text_topgrams" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks), 1)),
        |    i -> concat_ws(' ', toks[i], toks[i+1])))) AS gram
        |  FROM t WHERE len(toks) >= 2
        |)
        |SELECT gram, count(*) AS n_docs FROM g GROUP BY 1
        |ORDER BY n_docs DESC, gram LIMIT 20""".stripMargin,
    "text_zipf" ->
      """WITH terms AS (
        |  SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS term
        |  FROM documents
        |), f AS (
        |  SELECT term, count(*) AS freq FROM terms WHERE term <> '' GROUP BY 1
        |  ORDER BY freq DESC, term LIMIT 1000
        |), xy AS (
        |  SELECT
        |    CAST(floor(ln(CAST(row_number() OVER (ORDER BY freq DESC, term) AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS x,
        |    CAST(floor(ln(CAST(freq AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y
        |  FROM f
        |), g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM xy
        |)
        |SELECT n AS n_types,
        |  CAST(floor(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |    / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
        |    AS slope_micro,
        |  CAST(floor(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |    / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
        |    * (CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |    / CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
        |    AS r2_micro
        |FROM g""".stripMargin,
    "text_vocab" ->
      """WITH terms AS (
        |  SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS term
        |  FROM documents
        |), f AS (
        |  SELECT term, count(*) AS freq FROM terms WHERE term <> '' GROUP BY 1
        |  ORDER BY freq DESC, term LIMIT 100
        |)
        |SELECT term, freq,
        |  CAST(row_number() OVER (ORDER BY freq DESC, term) - 1 AS INT) AS token_id
        |FROM f ORDER BY token_id""".stripMargin,
    "text_pack" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS BIGINT) AS n_toks
        |  FROM documents
        |), c AS (
        |  SELECT source, doc_id, n_toks,
        |    coalesce(sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
        |  FROM t
        |)
        |SELECT source, CAST(floor(cum_excl / 256) AS BIGINT) AS seq_id,
        |  cast(count(*) AS bigint) AS n_docs, cast(sum(n_toks) AS bigint) AS n_tokens
        |FROM c GROUP BY 1, 2 ORDER BY source, seq_id""".stripMargin,
    "text_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 6, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
        |                        toks[i+4], toks[i+5], toks[i+6], toks[i+7])))) AS gram
        |  FROM t WHERE len(toks) >= 8
        |), bench AS (
        |  SELECT DISTINCT gram, doc_id AS bench_id FROM g WHERE doc_id < 20
        |)
        |SELECT c.doc_id,
        |  cast(count(DISTINCT c.gram) AS bigint) AS n_shared_grams,
        |  cast(count(DISTINCT bench_id) AS bigint) AS n_bench_docs
        |FROM g c JOIN bench b ON c.gram = b.gram
        |WHERE c.doc_id >= 20
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_mixture" ->
      """WITH s AS (
        |  SELECT source, cast(count(*) AS bigint) AS n_docs,
        |    cast(sum(len(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '))) AS bigint) AS n_tokens
        |  FROM documents GROUP BY 1
        |), w AS (
        |  SELECT *, sum(n_tokens) OVER () AS total, count(*) OVER () AS n_src FROM s
        |)
        |SELECT source, n_docs, n_tokens,
        |  CAST(round(n_tokens * 1000000 / total) AS BIGINT) AS share_micro,
        |  least(1000000, CAST(round(total * 1000000.0 / (n_src * n_tokens)) AS BIGINT)) AS keep_rate_micro
        |FROM w ORDER BY source""".stripMargin,
    // Text analysis — the oracle replays the identical scoring in SQL
    // (same normalization regex, same marker lists, same tie-break order).
    "text_langid" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','mit'))) AS s_de,
        |    len(list_filter(toks, x -> x IN ('the','a','and','of','to','in','is','it'))) AS s_en,
        |    len(list_filter(toks, x -> x IN ('el','la','los','las','que','y','por','como'))) AS s_es,
        |    len(list_filter(toks, x -> x IN ('le','les','des','et','une','est','dans','pour'))) AS s_fr,
        |    len(list_filter(toks, x -> x IN ('的','是','不','我','了','在'))) AS s_zh
        |  FROM scored
        |)
        |SELECT doc_id, lang,
        |  CASE WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |       WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
        |       WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |       WHEN s_fr >= s_zh THEN 'fr'
        |       ELSE 'zh' END AS pred_lang
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_surprisal" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS tok
        |  FROM documents
        |), tt AS (
        |  SELECT doc_id, tok FROM t WHERE length(tok) > 0
        |), c AS (
        |  SELECT tok, count(*) AS cnt FROM tt GROUP BY tok
        |), n AS (
        |  SELECT count(*) AS total FROM tt
        |), s AS (
        |  SELECT doc_id,
        |    CAST(round(ln(CAST(total AS DOUBLE) / cnt) * 1000000) AS BIGINT) AS m
        |  FROM tt JOIN c USING (tok) CROSS JOIN n
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
        |  CAST(sum(m) AS BIGINT) AS sum_surprisal_micro,
        |  CAST(sum(m) // count(*) AS BIGINT) AS mean_surprisal_micro
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_dsir" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS tok
        |  FROM documents
        |), tt AS (
        |  SELECT doc_id, lang, substr(md5(tok), 1, 2) AS bucket
        |  FROM t WHERE length(tok) > 0
        |), raw AS (
        |  SELECT bucket, count(*) AS r_cnt FROM tt GROUP BY bucket
        |), tgt AS (
        |  SELECT bucket, count(*) AS t_cnt FROM tt WHERE lang = 'en' GROUP BY bucket
        |), dists AS (
        |  SELECT raw.bucket, r_cnt, coalesce(t_cnt, 0) AS t_cnt
        |  FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket
        |), totals AS (
        |  SELECT sum(r_cnt) AS r_total, sum(t_cnt) AS t_total FROM dists
        |), scored AS (
        |  SELECT bucket,
        |    CAST(round((ln(CAST(t_cnt + 1 AS DOUBLE) / (t_total + 256))
        |              - ln(CAST(r_cnt + 1 AS DOUBLE) / (r_total + 256))) * 1000000) AS BIGINT) AS m
        |  FROM dists CROSS JOIN totals
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
        |  CAST(sum(m) AS BIGINT) AS sum_logratio_micro,
        |  CAST(sum(m) // count(*) AS BIGINT) AS mean_logratio_micro
        |FROM tt JOIN scored USING (bucket)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_drift" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS tok
        |  FROM documents
        |), tt AS (
        |  SELECT doc_id >= 400 AS is_delta, substr(md5(tok), 1, 2) AS bucket
        |  FROM t WHERE length(tok) > 0
        |), observed AS (
        |  SELECT bucket,
        |    cast(sum(CASE WHEN is_delta THEN 1 ELSE 0 END) AS bigint) AS d_cnt,
        |    cast(sum(CASE WHEN is_delta THEN 0 ELSE 1 END) AS bigint) AS b_cnt
        |  FROM tt GROUP BY bucket
        |), spine AS (
        |  SELECT printf('%02x', range) AS bucket FROM range(256)
        |), counts AS (
        |  SELECT s.bucket, coalesce(o.d_cnt, 0) AS d_cnt, coalesce(o.b_cnt, 0) AS b_cnt
        |  FROM spine s LEFT JOIN observed o USING (bucket)
        |), totals AS (
        |  SELECT sum(d_cnt) AS d_total, sum(b_cnt) AS b_total FROM counts
        |)
        |SELECT bucket, b_cnt, d_cnt,
        |  CAST(round((ln(CAST(d_cnt + 1 AS DOUBLE) / (d_total + 256))
        |            - ln(CAST(b_cnt + 1 AS DOUBLE) / (b_total + 256))) * 1000000) AS BIGINT)
        |    AS logratio_micro,
        |  CAST(round((CAST(d_cnt + 1 AS DOUBLE) / (d_total + 256)) *
        |             (ln(CAST(d_cnt + 1 AS DOUBLE) / (d_total + 256))
        |            - ln(CAST(b_cnt + 1 AS DOUBLE) / (b_total + 256))) * 1000000000) AS BIGINT)
        |    AS kl_term_nano
        |FROM counts CROSS JOIN totals
        |ORDER BY bucket""".stripMargin,
    "text_bigram_surprisal" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), dd AS (
        |  SELECT doc_id, toks FROM d WHERE len(toks) >= 2
        |), bg AS (
        |  SELECT doc_id, toks[i] AS l, toks[i+1] AS r
        |  FROM dd, unnest(range(1, len(toks))) AS u(i)
        |), pc AS (
        |  SELECT l, r, count(*) AS c_lr FROM bg GROUP BY l, r
        |), cc AS (
        |  SELECT l, count(*) AS c_l FROM bg GROUP BY l
        |), vv AS (
        |  SELECT count(DISTINCT tok) AS v FROM (
        |    SELECT unnest(toks) AS tok FROM d
        |  ) WHERE length(tok) > 0
        |), s AS (
        |  SELECT doc_id,
        |    CAST(round(ln(CAST(c_l + v AS DOUBLE) / (c_lr + 1)) * 1000000) AS BIGINT) AS m
        |  FROM bg JOIN pc USING (l, r) JOIN cc USING (l) CROSS JOIN vv
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(m) AS BIGINT) AS sum_surprisal_micro,
        |  CAST(sum(m) // count(*) AS BIGINT) AS mean_surprisal_micro
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_gopher_rules" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, text,
        |    len(toks) AS n_words,
        |    CAST(floor(length(array_to_string(toks, '')) * 1000000
        |         / greatest(len(toks), 1)) AS BIGINT) AS mean_wlen_micro,
        |    length(text) - length(regexp_replace(text, '[^a-z0-9\s]', '', 'g')) AS n_symbol,
        |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
        |    len(list_filter(toks, x -> x IN ('the','a','and','of','to','in','is','it'))) AS n_stop
        |  FROM t
        |)
        |SELECT doc_id, n_words, mean_wlen_micro, n_stop,
        |  (n_words BETWEEN 50 AND 100000) AS r_nwords,
        |  (mean_wlen_micro BETWEEN 3000000 AND 10000000) AS r_wlen,
        |  (n_symbol * 10 <= length(text)) AS r_symbol,
        |  (n_digit * 5 <= length(text)) AS r_digit,
        |  (n_stop >= 2) AS r_stop,
        |  ((n_words BETWEEN 50 AND 100000)
        |   AND (mean_wlen_micro BETWEEN 3000000 AND 10000000)
        |   AND n_symbol * 10 <= length(text)
        |   AND n_digit * 5 <= length(text)
        |   AND n_stop >= 2) AS keep
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |)
        |SELECT doc_id,
        |  length(text) AS n_chars,
        |  len(toks) AS n_tokens,
        |  round(len(list_filter(toks, x -> x IN ('the','a','and','of','to','in','is','it')))
        |        / greatest(len(toks), 1), 4) AS stopword_ratio,
        |  round((length(text) - length(regexp_replace(text, '[^a-z0-9\s]', '', 'g')))
        |        / greatest(length(text), 1), 4) AS punct_ratio,
        |  round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
        |        / greatest(length(text), 1), 4) AS digit_ratio,
        |  (len(toks) BETWEEN 20 AND 1000) AS keep
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  len(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS ws_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS bpeish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    // X37: the bigram LM is fitted on the train split only; unseen
    // test bigrams coalesce to the smoothing floor
    "text_heldout" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), dd AS (
        |  SELECT doc_id, source, toks FROM d WHERE len(toks) >= 2
        |), tr AS (
        |  SELECT * FROM dd WHERE doc_id % 5 <> 0
        |), trb AS (
        |  SELECT toks[i] AS l, toks[i+1] AS r
        |  FROM tr, unnest(range(1, len(toks))) AS u(i)
        |), pc AS (
        |  SELECT l, r, count(*) AS c_lr FROM trb GROUP BY l, r
        |), cc AS (
        |  SELECT l, count(*) AS c_l FROM trb GROUP BY l
        |), vv AS (
        |  SELECT count(DISTINCT tok) AS v FROM (
        |    SELECT unnest(toks) AS tok FROM tr
        |  ) WHERE length(tok) > 0
        |), teb AS (
        |  SELECT doc_id, source, toks[i] AS l, toks[i+1] AS r
        |  FROM dd, unnest(range(1, len(toks))) AS u(i)
        |  WHERE doc_id % 5 = 0
        |), s AS (
        |  SELECT source, doc_id,
        |    CAST(round(ln(CAST(coalesce(c_l, 0) + v AS DOUBLE) /
        |      (coalesce(c_lr, 0) + 1)) * 1000000) AS BIGINT) AS m
        |  FROM teb LEFT JOIN pc USING (l, r) LEFT JOIN cc USING (l) CROSS JOIN vv
        |)
        |SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(m) // count(*) AS BIGINT) AS mean_surprisal_micro
        |FROM s GROUP BY source ORDER BY source""".stripMargin,
    "text_fingerprint" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, norm, string_split(norm, ' ') AS toks FROM t
        |)
        |SELECT doc_id,
        |  substring(md5(norm), 1, 16) AS content_id,
        |  list_aggregate(
        |    list_transform(
        |      list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))),
        |      s -> substring(md5(s), 1, 16)), 'min') AS min_shingle_hash
        |FROM g ORDER BY doc_id""".stripMargin,
    "text_pii_redact" ->
      """WITH s AS (
        |  SELECT doc_id, text,
        |    regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g') AS no_url
        |  FROM documents
        |), s2 AS (
        |  SELECT doc_id, text, no_url,
        |    regexp_replace(no_url, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g') AS no_email
        |  FROM s
        |)
        |SELECT doc_id,
        |  len(regexp_extract_all(text, 'https?://[^\s]+')) AS n_urls,
        |  len(regexp_extract_all(no_url, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(no_email, '[0-9]{4,}')) AS n_nums,
        |  md5(regexp_replace(no_email, '[0-9]{4,}', '<NUM>', 'g')) AS redacted_md5
        |FROM s2 ORDER BY doc_id""".stripMargin,
    // X36: byte-identical artifact planting via chr(); detection by
    // replace-length-diff (fixed sequences) + one C0 regex class.
    // All planted chars are BMP so both engines' length() agree.
    "text_encoding" ->
      """WITH p AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 11 = 0 THEN ' caf' || chr(233) || ' isn' ||
        |      chr(226) || chr(8364) || chr(8482) || 't' ELSE '' END ||
        |    CASE WHEN doc_id % 13 = 0 THEN chr(65533) ELSE '' END ||
        |    CASE WHEN doc_id % 17 = 0 THEN chr(7) ELSE '' END AS t
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(length(t) - length(replace(t, chr(65533), '')) AS BIGINT) AS n_repl,
        |  CAST(length(t) - length(regexp_replace(t,
        |    '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g')) AS BIGINT) AS n_ctrl,
        |  CAST((length(t) - length(replace(t, chr(226) || chr(8364), ''))) // 2
        |    AS BIGINT) AS n_moji,
        |  1000000 * CAST(length(regexp_replace(t, '[\x00-\x7f]', '', 'g')) AS BIGINT)
        |    // length(t) AS nonascii_micro,
        |  (length(t) - length(replace(t, chr(65533), '')) > 0
        |   OR length(t) - length(regexp_replace(t,
        |        '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g')) > 0
        |   OR length(t) - length(replace(t, chr(226) || chr(8364), '')) > 0)
        |    AS is_suspect
        |FROM p ORDER BY doc_id""".stripMargin,
    // same tokenizer + 5-gram construction; df computed on the raw
    // gram (md5 on the Spark side only dedups bytes on the wire)
    "text_novelty" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), gd AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(len(toks) - 3, 1)),
        |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]))) AS grams
        |  FROM t
        |), e AS (
        |  SELECT doc_id, unnest(grams) AS g FROM gd
        |), df AS (
        |  SELECT g, count(*) AS df FROM e GROUP BY g
        |)
        |SELECT doc_id, cast(count(*) AS bigint) AS n_grams,
        |  cast(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS bigint) AS n_unique,
        |  CAST(round(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    * 1e6 / count(*)) AS BIGINT) AS novelty_micro
        |FROM e JOIN df USING (g)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    list_transform(range(1, greatest(len(toks), 1)),
        |      i -> concat_ws(' ', toks[i], toks[i+1])) AS g2,
        |    list_transform(range(1, greatest(len(toks) - 1, 1)),
        |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS g3
        |  FROM t
        |)
        |SELECT doc_id, len(g2) AS n_2grams,
        |  round((len(g2) - len(list_distinct(g2))) / greatest(len(g2), 1), 4) AS dup_2gram_frac,
        |  round((len(g3) - len(list_distinct(g3))) / greatest(len(g3), 1), 4) AS dup_3gram_frac
        |FROM g ORDER BY doc_id""".stripMargin,
    "text_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM terms WHERE term <> '' GROUP BY 1, 2
        |), dfreq AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY 1
        |), n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf, df,
        |    tf * CAST(round(ln((n_docs + 1) / (df + 1)) * 1e6) AS BIGINT) AS score_micro
        |  FROM tf JOIN dfreq USING (term), n
        |)
        |SELECT doc_id, rnk, term, tf, df, score_micro FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score_micro DESC, term) AS rnk
        |  FROM scored
        |) WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "text_bm25" ->
      """WITH q(q_id, term) AS (VALUES
        |  (0,'spark'),(0,'query'),(0,'join'),
        |  (1,'stream'),(1,'window'),(1,'batch'),
        |  (2,'hash'),(2,'merge'),(2,'sort'),
        |  (3,'customer'),(3,'data'),(3,'table')),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
        |    t -> t <> '') AS toks
        |  FROM documents
        |), dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toks),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
        |terms AS (SELECT doc_id, unnest(toks) AS term FROM toks),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM terms
        |  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1, 2
        |), dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |contrib AS (
        |  SELECT q.q_id, tf.doc_id,
        |    CAST(round(
        |      ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
        |      ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) * n_docs / sum_dl)))) *
        |      1e6) AS BIGINT) AS c_micro
        |  FROM tf JOIN q USING (term) JOIN dfreq USING (term) JOIN dl USING (doc_id), stats
        |), score AS (SELECT q_id, doc_id, CAST(sum(c_micro) AS BIGINT) AS score_micro FROM contrib GROUP BY 1, 2)
        |SELECT CAST(q_id AS BIGINT) AS q_id, rnk, doc_id, score_micro FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score_micro DESC, doc_id) AS rnk
        |  FROM score
        |) WHERE rnk <= 10 ORDER BY q_id, rnk""".stripMargin,
    "text_pmi" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), dd AS (SELECT doc_id, toks FROM d WHERE len(toks) >= 2),
        |bg AS (
        |  SELECT toks[i] AS w1, toks[i+1] AS w2
        |  FROM dd, unnest(range(1, len(toks))) AS u(i)
        |), uni AS (SELECT unnest(toks) AS w FROM dd),
        |uc AS (SELECT w, count(*) AS c_w FROM uni GROUP BY 1),
        |tot AS (SELECT (SELECT count(*) FROM bg) AS n_bi,
        |               (SELECT count(*) FROM uni) AS n_uni),
        |bc AS (SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
        |  CAST(round(ln((CAST(c_ab AS DOUBLE) * n_uni * n_uni) /
        |    (CAST(n_bi AS DOUBLE) * c_a * c_b)) * 1e6) AS BIGINT) AS pmi_micro
        |FROM bc
        |JOIN (SELECT w AS w1, c_w AS c_a FROM uc) USING (w1)
        |JOIN (SELECT w AS w2, c_w AS c_b FROM uc) USING (w2), tot
        |ORDER BY pmi_micro DESC, w1, w2 LIMIT 20""".stripMargin,
    "text_entropy" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ''), x -> x != '') AS chars
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, CAST(len(chars) AS BIGINT) AS n_chars,
        |    len(list_distinct(chars)) AS n_distinct
        |  FROM t
        |), u AS (SELECT doc_id, unnest(chars) AS ch FROM t),
        |c AS (SELECT doc_id, ch, count(*) AS cnt FROM u GROUP BY 1, 2),
        |e AS (
        |  SELECT c.doc_id,
        |    CAST(sum(CAST(round(-(CAST(cnt AS DOUBLE) / n_chars) *
        |      ln(CAST(cnt AS DOUBLE) / n_chars) * 1e6) AS BIGINT)) AS BIGINT) AS entropy_micro
        |  FROM c JOIN s ON c.doc_id = s.doc_id GROUP BY 1
        |)
        |SELECT s.doc_id, s.n_chars, s.n_distinct,
        |  coalesce(e.entropy_micro, 0) AS entropy_micro
        |FROM s LEFT JOIN e USING (doc_id) ORDER BY doc_id""".stripMargin,
    // The window form is the SEMANTIC spec of the domain cap; the Spark
    // plan computes the same keeper set with a bounded mergeable top-k
    // aggregate (skew-immune map-side capping, see textDomainCap).
    "text_domain_cap" ->
      """WITH h AS (
        |  SELECT source, doc_id,
        |    (CAST(doc_id AS BIGINT) * 2654435761) % 4294967296 AS h
        |  FROM documents
        |), r AS (
        |  SELECT source, doc_id, h,
        |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
        |      AS keep_rank,
        |    count(*) OVER (PARTITION BY source) AS n_source
        |  FROM h
        |)
        |SELECT source, doc_id, CAST(keep_rank AS BIGINT) AS keep_rank,
        |  CAST(n_source AS BIGINT) AS n_source
        |FROM r WHERE keep_rank <= 15
        |ORDER BY source, keep_rank""".stripMargin,
    // Same anchor-vote formulation as the Spark plan: a slot matches a
    // given (doc, anchor) at most once, so count(*) = plen ⇔ full match.
    "text_phrase" ->
      """WITH p AS (
        |  SELECT * FROM (VALUES (0, 'window batch'), (1, 'batch batch batch'),
        |    (2, 'spark table small'), (3, 'data row column')) AS t(phrase_id, phrase)
        |), ps AS (
        |  SELECT phrase_id, phrase, string_split(phrase, ' ') AS pt FROM p
        |), slots AS (
        |  SELECT phrase_id, phrase, pt[i] AS term, i - 1 AS slot, len(pt) AS plen
        |  FROM ps, unnest(range(1, len(pt) + 1)) AS u(i)
        |), d AS (
        |  SELECT doc_id, list_filter(
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
        |    x -> x != '') AS toks
        |  FROM documents
        |), post AS (
        |  SELECT doc_id, toks[i] AS term, i - 1 AS pos
        |  FROM d, unnest(range(1, len(toks) + 1)) AS u(i)
        |), m AS (
        |  SELECT s.phrase_id, s.phrase, s.plen, post.doc_id,
        |    post.pos - s.slot AS anchor
        |  FROM post JOIN slots s USING (term)
        |  WHERE post.pos - s.slot >= 0
        |), full_match AS (
        |  SELECT phrase_id, phrase, doc_id, anchor
        |  FROM m GROUP BY phrase_id, phrase, plen, doc_id, anchor
        |  HAVING count(*) = plen
        |)
        |SELECT CAST(phrase_id AS BIGINT) AS phrase_id, phrase, doc_id,
        |  CAST(count(*) AS BIGINT) AS n_occ
        |FROM full_match GROUP BY phrase_id, phrase, doc_id
        |ORDER BY phrase_id, doc_id""".stripMargin,
    // transfer matrix: X15's per-token micro-rounding with add-one
    // smoothing over the global vocab; identical tokenizer both sides
    "text_transfer" ->
      """WITH tt AS (
        |  SELECT source, tok FROM (
        |    SELECT source,
        |      unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS tok
        |    FROM documents) WHERE length(tok) > 0
        |), c AS (
        |  SELECT source AS m_source, tok, count(*) AS cnt FROM tt GROUP BY 1, 2
        |), t AS (
        |  SELECT m_source, CAST(sum(cnt) AS BIGINT) AS total FROM c GROUP BY 1
        |), v AS (
        |  SELECT count(DISTINCT tok) AS v FROM tt
        |), srcs AS (
        |  SELECT DISTINCT source AS m_source FROM tt
        |), s AS (
        |  SELECT srcs.m_source, tt.source AS target_source,
        |    CAST(round(ln(CAST(t.total + v.v AS DOUBLE) / (coalesce(c.cnt, 0) + 1)) * 1000000) AS BIGINT) AS m
        |  FROM tt CROSS JOIN srcs
        |  LEFT JOIN c ON c.m_source = srcs.m_source AND c.tok = tt.tok
        |  JOIN t ON t.m_source = srcs.m_source
        |  CROSS JOIN v
        |)
        |SELECT m_source, target_source, CAST(count(*) AS BIGINT) AS n_toks,
        |  CAST(sum(m) // count(*) AS BIGINT) AS mean_surprisal_micro
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // boilerplate removal: same injection + sentence split as D7, the
    // per-source 10% document-frequency threshold, and the cleaned
    // text fingerprinted after order-preserving reassembly
    "text_boilerplate" ->
      """WITH docs AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN text || '. Subscribe to our newsletter for the latest updates. All rights reserved'
        |      ELSE text END AS text
        |  FROM documents
        |), arr AS (
        |  SELECT doc_id, source, string_split_regex(text, '\.\s+') AS a FROM docs
        |), s AS (
        |  SELECT doc_id, source, i AS pos, trim(a[i]) AS sent, md5(trim(lower(a[i]))) AS h
        |  FROM arr, unnest(generate_series(1, len(a))) AS u(i)
        |  WHERE length(trim(a[i])) > 0
        |), nd AS (
        |  SELECT source, count(DISTINCT doc_id) AS n_src_docs FROM docs GROUP BY source
        |), bp AS (
        |  SELECT f.source, f.h
        |  FROM (SELECT source, h, count(DISTINCT doc_id) AS df FROM s GROUP BY 1, 2) f
        |  JOIN nd USING (source)
        |  WHERE df * 100 >= 10 * n_src_docs
        |)
        |SELECT doc_id, count(*) AS n_sents,
        |  CAST(count(*) FILTER (WHERE bp.h IS NOT NULL) AS BIGINT) AS n_dropped,
        |  md5(coalesce(string_agg(sent, '. ' ORDER BY pos) FILTER (WHERE bp.h IS NULL), '')) AS clean_md5
        |FROM s LEFT JOIN bp ON s.source = bp.source AND s.h = bp.h
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // key-sentence: per-doc sentence graph, 0-based positions both sides
    "text_summary" ->
      """WITH s AS (
        |  SELECT doc_id, i - 1 AS pos, trim(a[i]) AS sent
        |  FROM (SELECT doc_id, string_split_regex(text, '\.\s+') AS a FROM documents)
        |  CROSS JOIN unnest(generate_series(1, len(a))) AS u(i)
        |  WHERE length(trim(a[i])) > 0
        |), t AS (
        |  SELECT doc_id, pos, unnest(list_distinct(list_filter(
        |    string_split(trim(regexp_replace(lower(sent), '[^a-z0-9]+', ' ', 'g')), ' '),
        |    x -> length(x) > 0))) AS tok
        |  FROM s
        |), ov AS (
        |  SELECT a.doc_id, a.pos, count(*) AS score
        |  FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.tok = b.tok AND a.pos <> b.pos
        |  GROUP BY 1, 2
        |), sc AS (
        |  SELECT s.doc_id, s.pos, s.sent, coalesce(ov.score, 0) AS score
        |  FROM s LEFT JOIN ov ON s.doc_id = ov.doc_id AND s.pos = ov.pos
        |), best AS (
        |  SELECT doc_id, pos, sent, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, pos) AS r,
        |    count(*) OVER (PARTITION BY doc_id) AS n_sents
        |  FROM sc
        |)
        |SELECT doc_id, CAST(n_sents AS BIGINT) AS n_sents, CAST(pos AS INT) AS best_pos,
        |  CAST(score AS BIGINT) AS score, md5(sent) AS sent_md5
        |FROM best WHERE r = 1 ORDER BY doc_id""".stripMargin,
    // gram decay: contribution lands at each gram's FIRST occurrence
    "text_gram_decay" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), gd AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS g
        |  FROM t
        |), f AS (
        |  SELECT g, min(doc_id) AS fd FROM gd GROUP BY g
        |), b AS (
        |  SELECT fd // 50 AS bucket, count(*) AS new_grams FROM f GROUP BY 1
        |)
        |SELECT bucket, new_grams,
        |  CAST(sum(new_grams) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_grams
        |FROM b ORDER BY bucket""".stripMargin,
    // langid confusion: the X1 oracle's scoring grouped by
    // (truth, predicted)
    "text_langid_eval" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','mit'))) AS s_de,
        |    len(list_filter(toks, x -> x IN ('the','a','and','of','to','in','is','it'))) AS s_en,
        |    len(list_filter(toks, x -> x IN ('el','la','los','las','que','y','por','como'))) AS s_es,
        |    len(list_filter(toks, x -> x IN ('le','les','des','et','une','est','dans','pour'))) AS s_fr,
        |    len(list_filter(toks, x -> x IN ('的','是','不','我','了','在'))) AS s_zh
        |  FROM scored
        |), pred AS (
        |  SELECT lang,
        |    CASE WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |         WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
        |         WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |         WHEN s_fr >= s_zh THEN 'fr'
        |         ELSE 'zh' END AS pred_lang
        |  FROM s
        |)
        |SELECT lang, pred_lang, cast(count(*) AS bigint) AS n
        |FROM pred GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin,
    // RAKE: identical gaps-and-islands segmentation (pos − rank is
    // base-offset-invariant), word scores micro-rounded before sums
    "text_rake" ->
      """WITH toks AS (
        |  SELECT doc_id, i AS pos, t[i] AS tok
        |  FROM (SELECT doc_id,
        |          string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
        |        FROM documents)
        |  CROSS JOIN unnest(generate_series(1, len(t))) AS u(i)
        |  WHERE length(t[i]) > 0
        |), ns AS (
        |  SELECT doc_id, pos, tok,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS run
        |  FROM toks
        |  WHERE tok NOT IN ('the','a','and','of','to','in','is','it')
        |), ph AS (
        |  SELECT doc_id, run, string_agg(tok, ' ' ORDER BY pos) AS phrase,
        |    count(*) AS plen
        |  FROM ns GROUP BY doc_id, run HAVING count(*) <= 3
        |), wx AS (
        |  SELECT plen, unnest(string_split(phrase, ' ')) AS w FROM ph
        |), ws AS (
        |  SELECT w, (1000000 * CAST(sum(plen) AS BIGINT)) // count(*) AS wscore
        |  FROM wx GROUP BY w
        |), dp AS (
        |  SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ,
        |    CAST(max(plen) AS BIGINT) AS plen
        |  FROM ph GROUP BY phrase
        |), scored AS (
        |  SELECT dp.phrase, dp.plen, dp.n_occ,
        |    CAST(sum(ws.wscore) AS BIGINT) AS score_micro
        |  FROM dp CROSS JOIN unnest(string_split(dp.phrase, ' ')) AS t(tw)
        |  JOIN ws ON ws.w = t.tw
        |  GROUP BY dp.phrase, dp.plen, dp.n_occ
        |)
        |SELECT phrase, plen, n_occ, score_micro FROM scored
        |ORDER BY score_micro DESC, phrase LIMIT 20""".stripMargin
  )
}
