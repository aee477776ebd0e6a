"""DuckDB oracle SQL — one entry per SQL-expressible queries() key.

Every statement is semantically *identical* to its Ray implementation in
``queries.py`` (same regex dialect — RE2 in both pyarrow and DuckDB — same
tokenizer transform order, same integer-ization, same tie-breaks), so the
driver's row-count + schema + value-hash comparison holds exactly.

Keys intentionally absent (rows-only checks): dedup_minhash, dedup_simhash,
embedding_dupes, embedding_knn_lsh, fingerprint_rolling,
multimodal_features — sketch/LSH internals aren't SQL-expressible.
"""

from __future__ import annotations

# the code-aware tokenizer transform (tokenizer.py) as a SQL fragment
_CAMEL = (r"lower(regexp_replace(regexp_replace({col},"
          r" '([A-Z]+)([A-Z][a-z])', '\1 \2', 'g'),"
          r" '([a-z0-9])([A-Z])', '\1 \2', 'g'))")

_SEVERITY_CASE = """CASE event_type
    WHEN 'error' THEN 1 WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
    WHEN 'click' THEN 4 WHEN 'view' THEN 5 ELSE 999 END"""

_BM25_TERMS = "('error'), ('merge'), ('spark'), ('window')"


def _bm25_base(terms: str) -> str:
    """The shared BM25 CTE prefix, parameterized by the VALUES term list
    (used by the single-query oracles via ``_BM25_BASE`` and per-query by
    the ``msearch`` oracle)."""
    return _BM25_BASE_TEMPLATE.replace("__TERMS__", terms)


_BM25_BASE_TEMPLATE = f"""
WITH tr AS (
  SELECT doc_id, lang, {_CAMEL.format(col='text')} AS s FROM documents
), tok AS (
  SELECT doc_id, substr(t, 1, 64) AS term
  FROM (SELECT doc_id, unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
        FROM tr)
  WHERE t <> ''
), tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1
), stats AS (
  SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
         (SELECT count(*)::DOUBLE FROM tok) /
         (SELECT count(*)::DOUBLE FROM documents) AS avgdl
), q(term) AS (VALUES __TERMS__),
df AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN (SELECT term FROM q) GROUP BY 1
), scores AS (
  SELECT tf.doc_id,
         sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * (1.2 + 1)
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM tf
  JOIN q USING (term) JOIN df USING (term) JOIN dl USING (doc_id)
  CROSS JOIN stats
  GROUP BY tf.doc_id
)"""

_BM25_BASE = _bm25_base(_BM25_TERMS)

# one BM25 subquery per msearch request (see queries.MSEARCH_REQUESTS);
# terms are the tokenized query texts, k and tie-breaks as in bm25_topk
_MSEARCH_SPEC = [
    (0, "('error'), ('merge'), ('spark'), ('window')", 5),
    (1, "('authentication'), ('failure')", 5),
    (2, "('window'), ('function')", 5),
]

_MSEARCH_SQL = "\nUNION ALL\n".join(
    f"""SELECT * FROM (
        {_bm25_base(terms)}
        SELECT CAST({qid} AS BIGINT) AS query_id, doc_id,
               round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT {k})"""
    for qid, terms, k in _MSEARCH_SPEC)

# phrase oracle: reproduce the tokenizer exactly (camel transform, split,
# drop empties, truncate to 64), then count phrase starts with a position
# comprehension — overlapping-match semantics, same as the engine's
# positional verify (query/phrase.py).
_PHRASE_ARR = (
    "list_transform(list_filter(regexp_split_to_array("
    + _CAMEL.format(col="text")
    + ", '[^a-z0-9]+'), x -> x <> ''), x -> substr(x, 1, 64))"
)

_PHRASE_MATCH_BASE = f"""
WITH t AS (
  SELECT doc_id, {_PHRASE_ARR} AS arr FROM documents
), pm AS (
  SELECT doc_id,
         len([i FOR i IN generate_series(1, len(arr) - 1)
              IF arr[i] = 'sort' AND arr[i+1] = 'merge'])::BIGINT
             AS n_matches
  FROM t WHERE len(arr) >= 2
)"""

# path-field BM25 over the synthetic corpus path ("doc_<id>.md", exactly
# as the engine's corpus mapper derives it), each field under its own
# avgdl — shared by the multifield_search (sum) and dis_max (max +
# tie-breaker) oracles
_PATH_BM25_CTE = """
        , ptok AS (
          SELECT doc_id, t AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(
                           lower('doc_' || CAST(doc_id AS VARCHAR)
                                 || '.md'), '[^a-z0-9]+')) AS t
                FROM documents)
          WHERE t <> ''
        ), ptf AS (
          SELECT doc_id, term, count(*)::DOUBLE AS tf FROM ptok
          GROUP BY 1, 2
        ), pdl AS (
          SELECT doc_id, count(*)::DOUBLE AS dl FROM ptok GROUP BY 1
        ), pstats AS (
          SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                 (SELECT count(*)::DOUBLE FROM ptok) /
                 (SELECT count(*)::DOUBLE FROM documents) AS avgdl
        ), pq(term) AS (VALUES ('42'), ('md')),
        pdf AS (
          SELECT term, count(*)::DOUBLE AS df FROM ptf
          WHERE term IN (SELECT term FROM pq) GROUP BY 1
        ), pscores AS (
          SELECT ptf.doc_id,
                 sum(ln(1 + (pstats.n - pdf.df + 0.5) / (pdf.df + 0.5))
                     * ptf.tf * (1.2 + 1)
                     / (ptf.tf + 1.2 * (1 - 0.75
                                        + 0.75 * pdl.dl / pstats.avgdl))
                 ) AS score
          FROM ptf
          JOIN pq USING (term) JOIN pdf USING (term)
          JOIN pdl USING (doc_id)
          CROSS JOIN pstats
          GROUP BY ptf.doc_id
        )"""

ORACLE_SQL: dict[str, str] = {
    "severity_histogram": f"""
        SELECT event_type, {_SEVERITY_CASE} AS priority,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1, 2 ORDER BY priority
    """,
    "severity_alerts": f"""
        SELECT event_type, count(*)::BIGINT AS n,
               CAST(sum(CAST(round(value * 1e6, 0) AS BIGINT)) AS BIGINT)
                   AS sum_value_micro
        FROM events WHERE {_SEVERITY_CASE} <= 2
        GROUP BY 1 ORDER BY event_type
    """,
    "events_daily": """
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*)::BIGINT AS n,
               CAST(sum(CAST(round(value * 1e6, 0) AS BIGINT)) AS BIGINT)
                   AS sum_value_micro
        FROM events GROUP BY 1 ORDER BY day
    """,
    "top_users": """
        SELECT user_id, count(*)::BIGINT AS n_events
        FROM events GROUP BY 1
        ORDER BY n_events DESC, user_id ASC LIMIT 10
    """,
    "user_count_windows": """
        WITH r AS (
          SELECT user_id, event_id,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events
        )
        SELECT user_id, CAST((rn - 1) // 10 AS BIGINT) AS window_id,
               count(*)::BIGINT AS n, min_by(event_id, rn) AS first_event
        FROM r GROUP BY user_id, (rn - 1) // 10
        ORDER BY user_id, window_id
    """,
    "value_quantiles": """
        WITH m AS (
          SELECT event_type,
                 CAST(round(value * 1e6, 0) AS BIGINT) AS value_micro
          FROM events
        )
        SELECT event_type, count(*)::BIGINT AS n,
               quantile_disc(value_micro, 0.5)::BIGINT AS p50,
               quantile_disc(value_micro, 0.9)::BIGINT AS p90,
               quantile_disc(value_micro, 0.99)::BIGINT AS p99
        FROM m GROUP BY 1 ORDER BY 1
    """,
    # bucket bounds must match queries._RANGE_BOUNDS_MICRO / _RANGE_LABELS
    "histogram_agg": """
        WITH m AS (
          SELECT CAST(round(value * 1e6, 0) AS BIGINT) AS value_micro
          FROM events
        ), b AS (
          SELECT (value_micro // 25000000) * 25000000 AS lo_micro,
                 count(*)::BIGINT AS n,
                 CAST(sum(value_micro) AS BIGINT) AS sum_value_micro
          FROM m GROUP BY 1
        ), mm AS (
          SELECT min(lo_micro) AS lo, max(lo_micro) AS hi FROM b
        ), grid AS (
          SELECT unnest(generate_series(lo, hi, 25000000)) AS lo_micro
          FROM mm
        )
        SELECT g.lo_micro,
               coalesce(b.n, 0)::BIGINT AS n,
               CAST(coalesce(b.sum_value_micro, 0) AS BIGINT)
                 AS sum_value_micro
        FROM grid g LEFT JOIN b USING (lo_micro) ORDER BY g.lo_micro
    """,
    "multi_terms_agg": """
        SELECT event_type, (isodow(ts) - 1)::BIGINT AS dow,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
        ORDER BY n DESC, event_type ASC, dow ASC LIMIT 10
    """,
    "auto_date_histogram": """
        WITH us AS (
          SELECT epoch_us(ts) AS us FROM events
        ), mm AS (
          SELECT min(us) AS lo, max(us) AS hi FROM us
        ), ladder(v) AS (
          VALUES (3600000000), (10800000000), (43200000000),
                 (86400000000), (604800000000), (2592000000000)
        ), iv AS (
          SELECT coalesce(
                   (SELECT min(v) FROM ladder, mm
                    WHERE (hi // v) - (lo // v) + 1 <= 12),
                   2592000000000) AS iv
        )
        SELECT (us // iv) * iv AS bucket_us,
               (iv // 1000000)::BIGINT AS interval_s,
               count(*)::BIGINT AS n
        FROM us, iv GROUP BY 1, 2 ORDER BY bucket_us
    """,
    "runtime_field_agg": """
        WITH m AS (
          SELECT (CAST(regexp_extract(props, '"k": ([0-9]+)', 1)
                       AS BIGINT) // 10) * 10 AS k_bucket,
                 CAST(round(value * 1e6, 0) AS BIGINT) AS value_micro
          FROM events
        )
        SELECT k_bucket, count(*)::BIGINT AS n,
               CAST(sum(value_micro) AS BIGINT) AS sum_value_micro
        FROM m GROUP BY 1 ORDER BY k_bucket
    """,
    "mixture_weights": """
        WITH tk AS (
          SELECT lang,
                 sum(len(regexp_extract_all(lower(text),
                     '[a-z0-9]+')))::BIGINT AS tokens
          FROM documents GROUP BY 1
        ), tot AS (
          SELECT sum(tokens) AS total FROM tk
        ), tgt(lang, target_ppm) AS (
          VALUES ('de', 150000), ('en', 400000), ('es', 150000),
                 ('fr', 150000), ('zh', 150000)
        ), w AS (
          SELECT tk.lang, tk.tokens, tgt.target_ppm,
                 (tgt.target_ppm * (SELECT total FROM tot))
                   // tk.tokens AS weight
          FROM tk JOIN tgt USING (lang)
        )
        SELECT lang, tokens,
               CAST(target_ppm AS BIGINT) AS target_ppm,
               CAST(weight AS BIGINT) AS weight_ppm,
               CAST((weight + 999999) // 1000000 AS BIGINT) AS epochs
        FROM w ORDER BY lang
    """,
    "mixture_sample": """
        WITH tk AS (
          SELECT lang,
                 sum(len(regexp_extract_all(lower(text),
                     '[a-z0-9]+')))::BIGINT AS tokens
          FROM documents GROUP BY 1
        ), tot AS (
          SELECT sum(tokens) AS total FROM tk
        ), tgt(lang, target_ppm) AS (
          VALUES ('de', 150000), ('en', 400000), ('es', 150000),
                 ('fr', 150000), ('zh', 150000)
        ), rate AS (
          SELECT tk.lang,
                 least((tgt.target_ppm * (SELECT total FROM tot))
                         // tk.tokens,
                       1000000) AS keep_ppm
          FROM tk JOIN tgt USING (lang)
        ), d AS (
          SELECT doc_id, lang,
                 len(regexp_extract_all(lower(text),
                     '[a-z0-9]+'))::BIGINT AS n_tokens
          FROM documents
        )
        SELECT d.lang, count(*)::BIGINT AS n_kept,
               sum(d.n_tokens)::BIGINT AS tokens_kept
        FROM d JOIN rate ON rate.lang = d.lang
        WHERE d.doc_id % 1000000 < rate.keep_ppm
        GROUP BY d.lang ORDER BY d.lang
    """,
    "bucket_script": """
        WITH m AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day,
                 CAST(round(value * 1e6, 0) AS BIGINT) AS micro
          FROM events
        )
        SELECT day, count(*)::BIGINT AS n,
               CAST(sum(micro) AS BIGINT) AS sum_value_micro,
               CAST(sum(micro) // count(*) AS BIGINT) AS mean_micro
        FROM m GROUP BY 1 ORDER BY day
    """,
    "boxplot_agg": """
        WITH m AS (
          SELECT event_type,
                 CAST(round(value * 1e6, 0) AS BIGINT) AS micro
          FROM events
        )
        SELECT event_type,
               min(micro)::BIGINT AS vmin,
               quantile_disc(micro, 0.25)::BIGINT AS q1,
               quantile_disc(micro, 0.5)::BIGINT AS median,
               quantile_disc(micro, 0.75)::BIGINT AS q3,
               max(micro)::BIGINT AS vmax
        FROM m GROUP BY 1 ORDER BY event_type
    """,
    "percentile_ranks": """
        WITH m AS (
          SELECT CAST(round(value * 1e6, 0) AS BIGINT) AS micro
          FROM events
        ), thr(thr_micro) AS (
          VALUES (25000000), (100000000), (400000000)
        )
        SELECT thr.thr_micro,
               count(*) FILTER (WHERE m.micro <= thr.thr_micro)::BIGINT
                 AS n_le,
               CAST((count(*) FILTER (WHERE m.micro <= thr.thr_micro)
                     * 1000000) // count(*) AS BIGINT) AS rank_ppm
        FROM m CROSS JOIN thr
        GROUP BY thr.thr_micro ORDER BY thr.thr_micro
    """,
    "terms_shard_error": """
        WITH c AS (
          SELECT event_id % 4 AS shard, user_id, count(*)::BIGINT AS n
          FROM events GROUP BY 1, 2
        ), r AS (
          SELECT *, row_number() OVER (
                     PARTITION BY shard
                     ORDER BY n DESC, user_id ASC) AS rk
          FROM c
        ), top AS (
          SELECT * FROM r WHERE rk <= 8
        ), cut AS (
          SELECT shard,
                 CASE WHEN count(*) = 8 THEN min(n) ELSE 0 END AS cutoff
          FROM top GROUP BY shard
        ), tot AS (
          SELECT CAST(coalesce(sum(cutoff), 0) AS BIGINT) AS total_cutoff
          FROM cut
        )
        SELECT t.user_id,
               CAST(sum(t.n) AS BIGINT) AS n,
               CAST((SELECT total_cutoff FROM tot) - sum(cut.cutoff)
                    AS BIGINT) AS err_upper
        FROM top t JOIN cut ON cut.shard = t.shard
        GROUP BY t.user_id
        ORDER BY n DESC, user_id ASC LIMIT 5
    """,
    "sampler_agg": """
        WITH r AS (
          SELECT event_type,
                 row_number() OVER (PARTITION BY event_id % 4
                                    ORDER BY event_id ASC) AS rk
          FROM events
        )
        SELECT event_type, count(*)::BIGINT AS n
        FROM r WHERE rk <= 100 GROUP BY 1 ORDER BY 1
    """,
    "range_agg": """
        WITH m AS (
          SELECT CAST(round(value * 1e6, 0) AS BIGINT) AS value_micro
          FROM events
        ), b AS (
          SELECT CASE WHEN value_micro < 10000000 THEN 0
                      WHEN value_micro < 50000000 THEN 10000000
                      WHEN value_micro < 100000000 THEN 50000000
                      WHEN value_micro < 250000000 THEN 100000000
                      ELSE 250000000 END AS lo_micro,
                 CASE WHEN value_micro < 10000000 THEN 'lt_10'
                      WHEN value_micro < 50000000 THEN '10_50'
                      WHEN value_micro < 100000000 THEN '50_100'
                      WHEN value_micro < 250000000 THEN '100_250'
                      ELSE 'gte_250' END AS bucket,
                 value_micro
          FROM m
        )
        SELECT lo_micro, bucket, count(*)::BIGINT AS n,
               CAST(sum(value_micro) AS BIGINT) AS sum_value_micro
        FROM b GROUP BY 1, 2 ORDER BY lo_micro
    """,
    # integer milli-units; variance = floor((n*sumsq - sum^2)/n^2) in
    # HUGEINT (matches the Python-bignum driver step in queries.py);
    # all values non-negative so DuckDB's truncating // == floor
    "extended_stats": """
        WITH m AS (
          SELECT event_type,
                 CAST(round(value * 1e3, 0) AS BIGINT) AS v
          FROM events
        )
        SELECT event_type, count(*)::BIGINT AS n,
               min(v)::BIGINT AS min_milli, max(v)::BIGINT AS max_milli,
               CAST(sum(v) AS BIGINT) AS sum_milli,
               CAST(sum(v * v) AS BIGINT) AS sumsq_milli2,
               CAST(sum(v) // count(*) AS BIGINT) AS avg_milli,
               CAST((count(*) * sum(v * v) - sum(v) * sum(v))
                    // (count(*) * count(*)) AS BIGINT) AS var_milli2
        FROM m GROUP BY 1 ORDER BY 1
    """,
    # bucket predicates must match queries.q_filters_agg: isodow 6/7 ==
    # pyarrow day_of_week >= 5 (both Monday-based weeks)
    "filters_agg": """
        WITH m AS (
          SELECT ts, event_type,
                 CAST(round(value * 1e6, 0) AS BIGINT) AS value_micro
          FROM events
        )
        SELECT * FROM (
          SELECT 'errors' AS bucket, count(*)::BIGINT AS n,
                 CAST(sum(value_micro) AS BIGINT) AS sum_value_micro
          FROM m WHERE event_type = 'error' HAVING count(*) > 0
          UNION ALL
          SELECT 'high_value', count(*)::BIGINT,
                 CAST(sum(value_micro) AS BIGINT)
          FROM m WHERE value_micro >= 100000000 HAVING count(*) > 0
          UNION ALL
          SELECT 'weekend', count(*)::BIGINT,
                 CAST(sum(value_micro) AS BIGINT)
          FROM m WHERE isodow(ts) >= 6 HAVING count(*) > 0
        ) ORDER BY bucket
        -- HAVING: a bucket with no matching rows is omitted on both
        -- sides (the engine emits no partial rows for it)
    """,
    # after-key page 2 == offset pagination (the equivalence the entry
    # demonstrates); page size must match queries._COMPOSITE_PAGE_SIZE
    "composite_agg": """
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               count(*)::BIGINT AS n,
               CAST(sum(CAST(round(value * 1e6, 0) AS BIGINT)) AS BIGINT)
                   AS sum_value_micro
        FROM events GROUP BY 1, 2
        ORDER BY event_type, day LIMIT 20 OFFSET 20
    """,
    "top_hits_agg": """
        WITH m AS (
          SELECT event_id, event_type,
                 CAST(round(value * 1e6, 0) AS BIGINT) AS value_micro
          FROM events
        ), r AS (
          SELECT event_type, event_id, value_micro,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value_micro DESC,
                                             event_id ASC) AS rank
          FROM m
        )
        SELECT event_type, CAST(rank AS BIGINT) AS rank, event_id,
               value_micro
        FROM r WHERE rank <= 3 ORDER BY event_type, rank
    """,
    "bucket_stats": """
        WITH d AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day, count(*)::BIGINT AS n
          FROM events GROUP BY 1
        )
        SELECT count(*)::BIGINT AS n_days,
               CAST(sum(n) AS BIGINT) AS sum_n,
               CAST(sum(n) // count(*) AS BIGINT) AS avg_n,
               max(n)::BIGINT AS max_n,
               (SELECT min(day) FROM d WHERE n = (SELECT max(n) FROM d))
                   AS max_day,
               min(n)::BIGINT AS min_n,
               (SELECT min(day) FROM d WHERE n = (SELECT min(n) FROM d))
                   AS min_day
        FROM d
    """,
    "events_moving": """
        WITH d AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day, count(*)::BIGINT AS n
          FROM events GROUP BY 1
        )
        SELECT day, n,
               CAST(count(*) OVER w AS BIGINT) AS mov_n,
               CAST(sum(n) OVER w AS BIGINT) AS mov_sum3,
               CAST((sum(n) OVER w) // (count(*) OVER w) AS BIGINT)
                   AS mov_avg3
        FROM d
        WINDOW w AS (ORDER BY day ROWS BETWEEN 2 PRECEDING
                     AND CURRENT ROW)
        ORDER BY day
    """,
    # thresholds must match queries._STRATA_LANGS/_STRATA_THR
    "stratified_sample": """
        SELECT doc_id, lang FROM documents
        WHERE doc_id % 10 < CASE lang WHEN 'de' THEN 4 WHEN 'en' THEN 5
                                      WHEN 'es' THEN 3 WHEN 'fr' THEN 2
                                      WHEN 'zh' THEN 1 ELSE 0 END
        ORDER BY doc_id
    """,
    # chunk = exclusive prefix sum of n_chars // 10000 per lang in
    # doc_id order (fixed-order LM sequence packing)
    "sequence_pack": """
        WITH e AS (
          SELECT lang, doc_id, n_chars,
                 coalesce(sum(n_chars) OVER (
                     PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS excl
          FROM documents
        )
        SELECT lang, CAST(excl // 10000 AS BIGINT) AS chunk_id,
               count(*)::BIGINT AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM e GROUP BY 1, 2 ORDER BY lang, chunk_id
    """,
    "events_cumulative": """
        WITH d AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day, count(*)::BIGINT AS n
          FROM events GROUP BY 1
        )
        SELECT day, n,
               CAST(sum(n) OVER (ORDER BY day) AS BIGINT) AS cum_n,
               CAST(coalesce(n - lag(n) OVER (ORDER BY day), 0) AS BIGINT)
                   AS delta_n
        FROM d ORDER BY day
    """,
    # same binning spec as queries.q_value_percentile_sketch: bin width
    # 1e6 micro, 1024 bins (overflow clamps to bin 1023), estimate =
    # lower bound of the first bin whose cumulative count >= ceil(q*n)
    "value_percentile_sketch": """
        WITH m AS (
          SELECT least(greatest(
                   CAST(round(value * 1e6, 0) AS BIGINT) // 1000000,
                   0), 1023) AS bin
          FROM events
        ), b AS (
          SELECT bin, count(*)::BIGINT AS c FROM m GROUP BY 1
        ), cm AS (
          SELECT bin, sum(c) OVER (ORDER BY bin) AS cc FROM b
        ), t AS (
          SELECT count(*)::BIGINT AS n FROM m
        )
        SELECT t.n AS n,
               CAST((SELECT min(bin) FROM cm WHERE cc >= ceil(0.5 * t.n))
                    * 1000000 AS BIGINT) AS p50_micro,
               CAST((SELECT min(bin) FROM cm WHERE cc >= ceil(0.9 * t.n))
                    * 1000000 AS BIGINT) AS p90_micro,
               CAST((SELECT min(bin) FROM cm WHERE cc >= ceil(0.99 * t.n))
                    * 1000000 AS BIGINT) AS p99_micro
        FROM t
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
                   AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT))
                    AS BIGINT) AS sum_base_cents,
               CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                                   * 10000.0, 0) AS BIGINT))
                    AS BIGINT) AS sum_disc_e4,
               count(*)::BIGINT AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "top_customers": """
        SELECT o.o_custkey,
               CAST(sum(CAST(round(o.o_totalprice * 100.0, 0) AS BIGINT))
                    AS BIGINT) AS total_cents,
               count(*)::BIGINT AS n_orders,
               any_value(c.c_name) AS c_name
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1 ORDER BY total_cents DESC, o_custkey ASC LIMIT 10
    """,
    "metadata_stamp": """
        SELECT doc_id, 'documents' AS "@log_type",
               'batch' AS "@processing_mode",
               'success' AS "@processing_result",
               n_chars::BIGINT AS "@log_count"
        FROM documents ORDER BY doc_id
    """,
    "dead_letter": """
        SELECT CASE WHEN length(text) >= 200 THEN 'success'
                    ELSE 'failed' END AS "@processing_result",
               CASE WHEN length(text) >= 200 THEN NULL
                    ELSE 'ValidationError' END AS "@error_type",
               count(*)::BIGINT AS n
        FROM documents GROUP BY 1, 2 ORDER BY 1
    """,
    "term_match_counts": f"""
        SELECT lang, count(*)::BIGINT AS n_docs
        FROM documents
        WHERE regexp_matches({_CAMEL.format(col='text')},
                             '(^|[^a-z0-9])merge([^a-z0-9]|$)')
        GROUP BY 1 ORDER BY lang
    """,
    "df_top_terms": f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), tok AS (
          SELECT DISTINCT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        )
        SELECT term, count(*)::BIGINT AS df FROM tok
        GROUP BY 1 ORDER BY df DESC, term ASC LIMIT 20
    """,
    # JLH expression written with the identical operation tree as the
    # engine (queries.q_significant_terms) so doubles agree bit-for-bit;
    # BIGINT / BIGINT is float division in DuckDB, matching numpy float64
    "significant_terms": f"""
        WITH tr AS (
          SELECT doc_id, lang, {{camel}} AS s FROM documents
        ), tok AS (
          SELECT DISTINCT doc_id, lang, substr(t, 1, 64) AS term
          FROM (SELECT doc_id, lang,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        ), stats AS (
          SELECT term,
                 sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::BIGINT
                     AS fg_df,
                 count(*)::BIGINT AS df
          FROM tok GROUP BY 1
        ), sizes AS (
          SELECT count(*)::BIGINT AS n,
                 sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::BIGINT
                     AS fg_n
          FROM documents
        )
        SELECT term, fg_df, df,
               round((fg_df / fg_n - df / n)
                     * ((fg_df / fg_n) / (df / n)), 6) AS score
        FROM stats, sizes
        WHERE fg_df >= 3 AND fg_df / fg_n > df / n
        ORDER BY score DESC, term ASC LIMIT 15
    """.format(camel=_CAMEL.format(col='text')),
    # chi_square heuristic: 2x2 contingency statistic, positive
    # associations only; a/b/c/d and the num/den products are written
    # with the engine's exact IEEE op tree
    "significant_terms_chi2": f"""
        WITH tr AS (
          SELECT doc_id, lang, {{camel}} AS s FROM documents
        ), tok AS (
          SELECT DISTINCT doc_id, lang, substr(t, 1, 64) AS term
          FROM (SELECT doc_id, lang,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        ), stats AS (
          SELECT term,
                 sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::BIGINT
                     AS fg_df,
                 count(*)::BIGINT AS df
          FROM tok GROUP BY 1
        ), sizes AS (
          SELECT count(*)::BIGINT AS n,
                 sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::BIGINT
                     AS fg_n
          FROM documents
        ), cells AS (
          SELECT term, fg_df, df,
                 CAST(n AS DOUBLE) AS nn,
                 CAST(fg_n AS DOUBLE) AS fgn,
                 CAST(fg_df AS DOUBLE) AS a,
                 CAST(fg_n AS DOUBLE) - CAST(fg_df AS DOUBLE) AS b,
                 CAST(df AS DOUBLE) - CAST(fg_df AS DOUBLE) AS c,
                 (CAST(n AS DOUBLE) - CAST(fg_n AS DOUBLE))
                 - (CAST(df AS DOUBLE) - CAST(fg_df AS DOUBLE)) AS d
          FROM stats, sizes
        )
        SELECT term, fg_df, df,
               round((nn * ((a * d - b * c) * (a * d - b * c)))
                     / ((a + b) * (c + d) * (a + c) * (b + d)), 6)
                   AS chi2
        FROM cells
        WHERE fg_df >= 3 AND a / fgn > CAST(df AS DOUBLE) / nn
          AND (a + b) * (c + d) * (a + c) * (b + d) > 0
        ORDER BY chi2 DESC, term ASC
        LIMIT 15
    """.format(camel=_CAMEL.format(col='text')),
    # significant_text: foreground = QUERY matches (any standard query
    # term), exact-duplicate texts dropped first (filter_duplicate_text)
    "significant_text": """
        WITH tr AS (
          SELECT doc_id, {camel} AS s FROM documents
        ), kept AS (
          SELECT doc_id, s FROM (
            SELECT doc_id, s,
                   row_number() OVER (PARTITION BY s
                                      ORDER BY doc_id) AS rn
            FROM tr) WHERE rn = 1
        ), tok AS (
          SELECT DISTINCT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+'))
                           AS t
                FROM kept)
          WHERE t <> ''
        ), fg AS (
          SELECT DISTINCT doc_id FROM tok
          WHERE term IN ('error', 'merge', 'spark', 'window')
        ), stats AS (
          SELECT term,
                 sum(CASE WHEN doc_id IN (SELECT doc_id FROM fg)
                          THEN 1 ELSE 0 END)::BIGINT AS fg_df,
                 count(*)::BIGINT AS df
          FROM tok GROUP BY 1
        ), sizes AS (
          SELECT (SELECT count(*) FROM kept)::BIGINT AS n,
                 (SELECT count(*) FROM fg)::BIGINT AS fg_n
        )
        SELECT term, fg_df, df,
               round((fg_df / fg_n - df / n)
                     * ((fg_df / fg_n) / (df / n)), 6) AS score
        FROM stats, sizes
        WHERE fg_df >= 3 AND fg_df / fg_n > df / n
        ORDER BY score DESC, term ASC LIMIT 10
    """.format(camel=_CAMEL.format(col='text')),
    # ORDER BY the *unrounded* table column (scores.score) so tie-breaks
    # match the engine, which sorts by full-precision score before rounding
    # for output; round() stays in the projection only.
    "bm25_topk": _BM25_BASE + """
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
    """,
    # bounded-memory serving changes residency, never results —
    # identical oracle to bm25_topk
    "bm25_topk_bounded": _BM25_BASE + """
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
    """,
    # the async lifecycle returns the synchronous response verbatim —
    # identical oracle to bm25_topk
    "async_search": _BM25_BASE + """
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
    """,
    # forced block-max WAND is exact — identical oracle to bm25_topk
    "bm25_topk_wand": _BM25_BASE + """
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
    """,
    # forced federated WAND (global-threshold kernel) is bit-identical
    # to the merged index — identical oracle to bm25_topk
    "federated_search_wand": _BM25_BASE + """
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
    """,
    "msearch": _MSEARCH_SQL,
    # federated (two-index, global-stats) search is bit-identical to
    # the merged index — same SQL as bm25_topk
    "federated_search": _BM25_BASE + """
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
    """,
    # rollover alias search (generation indexes + federated global
    # stats) is bit-identical to the merged index — same SQL as
    # bm25_topk
    "rollover_search": _BM25_BASE + """
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
    """,
    # snapshot + restore must serve identical ranks — same SQL as
    # bm25_topk
    "snapshot_restore": _BM25_BASE + """
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
    """,
    # _shrink must serve identical ranks from half the partitions —
    # same SQL as bm25_topk
    "shrink_search": _BM25_BASE + """
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
    """,
    # _split must serve identical ranks from double the partitions
    "split_search": _BM25_BASE + """
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
    """,
    # ES _explain: per-term BM25 contribution of the top-1 doc; the
    # same contribution expression as the scores CTE, ungrouped
    "explain_score": _BM25_BASE + """
        , top1 AS (
          SELECT doc_id FROM scores
          ORDER BY scores.score DESC, doc_id ASC LIMIT 1
        )
        SELECT tf.term, CAST(df.df AS BIGINT) AS df,
               round(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * (1.2 + 1)
                     / (tf.tf + 1.2 * (1 - 0.75
                                       + 0.75 * dl.dl / stats.avgdl)),
                     6) AS contribution
        FROM tf
        JOIN q USING (term) JOIN df USING (term) JOIN dl USING (doc_id)
        CROSS JOIN stats
        WHERE tf.doc_id = (SELECT doc_id FROM top1)
        ORDER BY tf.term
    """,
    # the incremental build must equal full-corpus BM25 exactly — same
    # oracle as bm25_topk
    "bm25_topk_incremental": _BM25_BASE + """
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
    """,
    # CCR follower after bootstrap + catch-up must equal the full
    # corpus — same SQL as bm25_topk
    "ccr_follow": _BM25_BASE + """
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
    """,
    # ES field collapsing: best doc per lang, then top-k overall
    # collapse + inner_hits: top-5 groups by their best hit, top-2 docs
    # per group; window ranks run over the UNROUNDED score like bm25_topk
    "collapse_inner_hits": _BM25_BASE + """
        , g AS (
          SELECT d.lang, s.doc_id, s.score,
                 row_number() OVER (PARTITION BY d.lang
                                    ORDER BY s.score DESC,
                                             s.doc_id ASC) AS hit_rank
          FROM scores s JOIN documents d USING (doc_id)
        ), r1 AS (
          SELECT lang, doc_id AS best_doc, score AS best
          FROM g WHERE hit_rank = 1
        ), gr AS (
          SELECT lang, row_number() OVER (ORDER BY best DESC,
                                          best_doc ASC) AS grank
          FROM r1
        )
        SELECT g.lang, CAST(g.hit_rank AS BIGINT) AS hit_rank,
               g.doc_id, round(g.score, 6) AS score
        FROM g JOIN gr USING (lang)
        WHERE gr.grank <= 5 AND g.hit_rank <= 2
        ORDER BY gr.grank, g.hit_rank
    """,
    "collapse_by_lang": _BM25_BASE + """
        , best AS (
          SELECT s.doc_id, d.lang, s.score,
                 row_number() OVER (PARTITION BY d.lang
                                    ORDER BY s.score DESC,
                                             s.doc_id ASC) AS rn
          FROM scores s JOIN documents d USING (doc_id)
        )
        SELECT doc_id, lang, round(best.score, 6) AS score FROM best
        WHERE rn = 1
        ORDER BY best.score DESC, doc_id ASC LIMIT 10
    """,
    # ES terms query (multi-value keyword filter): lang IN (en, de)
    "bm25_topk_terms_filter": _BM25_BASE + """
        SELECT s.doc_id, round(s.score, 6) AS score
        FROM scores s JOIN documents d USING (doc_id)
        WHERE d.lang IN ('en', 'de')
        ORDER BY s.score DESC, s.doc_id ASC LIMIT 10
    """,
    "bm25_topk_filtered": _BM25_BASE + """
        SELECT s.doc_id, round(s.score, 6) AS score
        FROM scores s JOIN documents d USING (doc_id)
        WHERE d.lang = 'en'
        ORDER BY s.score DESC, s.doc_id ASC LIMIT 10
    """,
    # alias_search: the filtered-alias indirection adds nothing to the
    # math — BM25 over the full corpus stats, hits restricted to the
    # alias filter's lang (exactly the filtered-search shape)
    "alias_search": _BM25_BASE + """
        SELECT s.doc_id, round(s.score, 6) AS score
        FROM scores s JOIN documents d USING (doc_id)
        WHERE d.lang = 'fr'
        ORDER BY s.score DESC, s.doc_id ASC LIMIT 10
    """,
    # search_template: mustache rendering adds zero scoring surface —
    # the rendered body is a filtered match (lang from the template
    # param, size through the {{^size}} default block)
    "search_template": _BM25_BASE + """
        SELECT s.doc_id, round(s.score, 6) AS score
        FROM scores s JOIN documents d USING (doc_id)
        WHERE d.lang = 'es'
        ORDER BY s.score DESC, s.doc_id ASC LIMIT 10
    """,
    # ES _stats analog: the engine serves these from metadata; SQL
    # recounts from raw text. Field postings (lang:/repo:) add one term
    # per distinct lang + one per doc (repo keys are unique per doc in
    # the mapped corpus) and two postings per doc.
    "index_stats": f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), tok AS (
          SELECT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        ), ptok AS (
          SELECT doc_id, t AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(
                           lower('doc_' || CAST(doc_id AS VARCHAR)
                                 || '.md'), '[^a-z0-9]+')) AS t
                FROM documents)
          WHERE t <> ''
        )
        SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
               ((SELECT count(DISTINCT term) FROM tok)
                + (SELECT count(DISTINCT term) FROM ptok)
                + (SELECT count(DISTINCT lang) FROM documents)
                + (SELECT count(*) FROM documents))::BIGINT AS n_terms,
               ((SELECT count(*) FROM (SELECT DISTINCT doc_id, term
                                       FROM tok))
                + (SELECT count(*) FROM (SELECT DISTINCT doc_id, term
                                         FROM ptok))
                + 2 * (SELECT count(*) FROM documents))::BIGINT
                   AS n_postings,
               (SELECT count(*) FROM tok)::BIGINT AS total_tokens
    """,
    # delete tombstones: results exclude the top-3 docs; scores keep
    # pre-delete statistics (computed over the full corpus)
    "bm25_topk_deleted": _BM25_BASE + """
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        WHERE doc_id NOT IN (SELECT doc_id FROM scores
                             ORDER BY score DESC, doc_id ASC LIMIT 3)
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
    """,
    # force-merge: BM25 recomputed over the corpus minus the top-3 docs
    # (two full pipelines: the first picks the victims, the second
    # scores the compacted corpus with its own N/df/avgdl)
    "bm25_topk_rebuilt": _BM25_BASE + """
        , d2 AS (
          SELECT * FROM documents
          WHERE doc_id NOT IN (SELECT doc_id FROM scores
                               ORDER BY score DESC, doc_id ASC LIMIT 3)
        ), tok2 AS (
          SELECT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr JOIN d2 USING (doc_id))
          WHERE t <> ''
        ), tf2 AS (
          SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok2
          GROUP BY 1, 2
        ), dl2 AS (
          SELECT doc_id, count(*)::DOUBLE AS dl FROM tok2 GROUP BY 1
        ), stats2 AS (
          SELECT (SELECT count(*)::DOUBLE FROM d2) AS n,
                 (SELECT count(*)::DOUBLE FROM tok2) /
                 (SELECT count(*)::DOUBLE FROM d2) AS avgdl
        ), df2 AS (
          SELECT term, count(*)::DOUBLE AS df FROM tf2
          WHERE term IN (SELECT term FROM q) GROUP BY 1
        ), scores2 AS (
          SELECT tf2.doc_id,
                 sum(ln(1 + (stats2.n - df2.df + 0.5) / (df2.df + 0.5))
                     * tf2.tf * (1.2 + 1)
                     / (tf2.tf + 1.2 * (1 - 0.75
                                        + 0.75 * dl2.dl / stats2.avgdl))
                 ) AS score
          FROM tf2
          JOIN q USING (term) JOIN df2 USING (term)
          JOIN dl2 USING (doc_id)
          CROSS JOIN stats2
          GROUP BY tf2.doc_id
        )
        SELECT doc_id, round(scores2.score, 6) AS score FROM scores2
        ORDER BY scores2.score DESC, doc_id ASC LIMIT 10
    """,
    # ES regexp query: full-match term expansion (RE2 both sides)
    "regex_df": f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), tok AS (
          SELECT DISTINCT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        )
        SELECT term, count(*)::BIGINT AS df FROM tok
        WHERE regexp_full_match(term, 's[a-z]*a[a-z]*')
        GROUP BY 1 ORDER BY term
    """,
    # ES fuzzy query: BM25 over terms within 2 Levenshtein edits
    "fuzzy_search": f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), tok AS (
          SELECT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        ), tf AS (
          SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
          GROUP BY 1, 2
        ), dl AS (
          SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1
        ), stats AS (
          SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                 (SELECT count(*)::DOUBLE FROM tok) /
                 (SELECT count(*)::DOUBLE FROM documents) AS avgdl
        ), df AS (
          SELECT term, count(*)::DOUBLE AS df FROM tf
          WHERE levenshtein(term, 'sort') <= 2 GROUP BY 1
        ), scores AS (
          SELECT tf.doc_id,
                 sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * (1.2 + 1)
                     / (tf.tf + 1.2 * (1 - 0.75
                                       + 0.75 * dl.dl / stats.avgdl))
                 ) AS score
          FROM tf
          JOIN df USING (term) JOIN dl USING (doc_id)
          CROSS JOIN stats
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
    """,
    # ES highlight analog: fixed window around the first raw occurrence
    "highlight_topk": _BM25_BASE + """
        , top AS (
          SELECT doc_id FROM scores
          ORDER BY scores.score DESC, doc_id ASC LIMIT 10
        )
        SELECT d.doc_id,
               CASE WHEN strpos(d.text, 'merge') > 0
                    THEN substr(d.text,
                                greatest(1, strpos(d.text, 'merge') - 40),
                                96)
                    ELSE '' END AS snippet
        FROM documents d JOIN top USING (doc_id)
        ORDER BY d.doc_id
    """,
    # ES termvectors analog: (term, tf) of one doc
    "term_vectors": f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
          WHERE doc_id = 0
        )
        SELECT substr(t, 1, 64) AS term, count(*)::BIGINT AS tf
        FROM (SELECT unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
              FROM tr)
        WHERE t <> '' GROUP BY 1 ORDER BY term
    """,
    # ES multi_match: content BM25 + boosted path-field BM25, each field
    # under its own avgdl; the path string is derived from doc_id exactly
    # as the engine's corpus mapper derives it
    "multifield_search": _BM25_BASE + _PATH_BM25_CTE + """
        , combined AS (
          SELECT coalesce(c.doc_id, p.doc_id) AS doc_id,
                 coalesce(c.score, 0) + 2.0 * coalesce(p.score, 0)
                     AS score
          FROM scores c FULL OUTER JOIN pscores p USING (doc_id)
        )
        SELECT doc_id, round(combined.score, 6) AS score FROM combined
        ORDER BY combined.score DESC, doc_id ASC LIMIT 10
    """,
    # ES dis_max: best field wins, the other enters via the 0.5 tie
    # breaker; power-of-two boost/tie keep the combine bit-exact
    "dis_max": _BM25_BASE + _PATH_BM25_CTE + """
        , combined AS (
          SELECT coalesce(c.doc_id, p.doc_id) AS doc_id,
                 greatest(coalesce(c.score, 0),
                          2.0 * coalesce(p.score, 0))
                 + 0.5 * least(coalesce(c.score, 0),
                               2.0 * coalesce(p.score, 0)) AS score
          FROM scores c FULL OUTER JOIN pscores p USING (doc_id)
        )
        SELECT doc_id, round(combined.score, 6) AS score FROM combined
        ORDER BY combined.score DESC, doc_id ASC LIMIT 10
    """,
    # ES function_score filter+weight: BM25 * per-lang weight, applied
    # before top-k (weights re-rank); ORDER BY the unrounded product
    "function_score": _BM25_BASE + """
        , w AS (
          SELECT s.doc_id,
                 s.score * CASE d.lang WHEN 'en' THEN 1.5
                                       WHEN 'de' THEN 1.25
                                       ELSE 1.0 END AS score
          FROM scores s JOIN documents d USING (doc_id)
        )
        SELECT doc_id, round(w.score, 6) AS score FROM w
        ORDER BY w.score DESC, doc_id ASC LIMIT 10
    """,
    # ES rare_terms: least-frequent content terms (df <= 400)
    "rare_terms": f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), d AS (
          SELECT substr(t, 1, 64) AS term,
                 count(DISTINCT doc_id)::BIGINT AS df
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> '' GROUP BY 1
        )
        SELECT term, df FROM d WHERE df <= 400
        ORDER BY df ASC, term ASC LIMIT 20
    """,
    # ES string_stats: per-lang character-length stats of text
    "string_stats": """
        SELECT lang, count(*)::BIGINT AS n,
               min(length(text))::BIGINT AS min_len,
               max(length(text))::BIGINT AS max_len,
               CAST(sum(length(text)) AS BIGINT) AS sum_len,
               CAST(sum(length(text)) // count(*) AS BIGINT) AS avg_len
        FROM documents GROUP BY 1 ORDER BY lang
    """,
    # ES matrix_stats between value (centi) and hour(ts): floor
    # division emulated for any-sign numerators so a negative
    # covariance floors exactly like Python's //
    "matrix_stats": """
        WITH m AS (
          SELECT CAST(round(value * 1e2, 0) AS BIGINT) AS x,
                 CAST(hour(ts) AS BIGINT) AS y
          FROM events
        ), s AS (
          SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
                 sum(y)::HUGEINT AS sy, sum(x * y)::HUGEINT AS sxy,
                 sum(x * x)::HUGEINT AS sx2, sum(y * y)::HUGEINT AS sy2
          FROM m
        ), d AS (
          SELECT n, sx, sy, n * n AS den,
                 n * sxy - sx * sy AS cnum,
                 n * sx2 - sx * sx AS xnum,
                 n * sy2 - sy * sy AS ynum
          FROM s
        )
        SELECT CAST(n AS BIGINT) AS n, CAST(sx AS BIGINT) AS sum_x,
               CAST(sy AS BIGINT) AS sum_y,
               CAST((cnum - ((cnum % den) + den) % den) // den
                    AS BIGINT) AS cov_pop,
               CAST((xnum - ((xnum % den) + den) % den) // den
                    AS BIGINT) AS var_x_pop,
               CAST((ynum - ((ynum % den) + den) % den) // den
                    AS BIGINT) AS var_y_pop
        FROM d
    """,
    # ES top_metrics: metric value at the top of a (ts, event_id) desc
    # sort, per event type
    "top_metrics": """
        WITH r AS (
          SELECT event_type, event_id,
                 CAST(round(value * 1e6, 0) AS BIGINT) AS value_micro,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY ts DESC,
                                             event_id DESC) AS rn
          FROM events
        )
        SELECT event_type, event_id AS last_event,
               value_micro AS last_value_micro
        FROM r WHERE rn = 1 ORDER BY event_type
    """,
    # ES _rank_eval: P@10 inputs + first-relevant rank; relevance =
    # docs containing all 4 distinct query terms
    "rank_eval": _BM25_BASE + """
        , rel AS (
          SELECT doc_id FROM tf JOIN q USING (term)
          GROUP BY doc_id HAVING count(DISTINCT term) = 4
        ), top AS (
          SELECT doc_id,
                 row_number() OVER (ORDER BY scores.score DESC,
                                    doc_id ASC) AS rnk
          FROM scores ORDER BY scores.score DESC, doc_id ASC LIMIT 10
        )
        SELECT (SELECT count(*) FROM rel)::BIGINT AS n_rel,
               (SELECT count(*) FROM top JOIN rel USING (doc_id))
                   ::BIGINT AS n_rel_top10,
               CAST(coalesce((SELECT min(rnk) FROM top
                              JOIN rel USING (doc_id)), 0) AS BIGINT)
                   AS first_rel_rank
    """,
    # ES weighted_avg: priority-weighted mean in integer micro units
    # (weight = 6 - priority, severe events weigh more)
    "weighted_avg": f"""
        WITH m AS (
          SELECT (6 - {_SEVERITY_CASE}) AS w,
                 CAST(round(value * 1e6, 0) AS BIGINT) AS v
          FROM events
        )
        SELECT CAST(sum(w) AS BIGINT) AS sum_w,
               CAST(sum(w * v) // sum(w) AS BIGINT) AS wavg_micro
        FROM m
    """,
    # ES adjacency_matrix over the filters_agg predicates: singles +
    # pairwise intersections
    "adjacency_matrix": """
        WITH m AS (
          SELECT (event_type = 'error') AS f_err,
                 (CAST(round(value * 1e6, 0) AS BIGINT)
                  >= 100000000) AS f_hi,
                 (isodow(ts) >= 6) AS f_we
          FROM events
        )
        SELECT * FROM (
          SELECT 'errors' AS bucket, count(*) FILTER (f_err)::BIGINT
              AS n FROM m
          UNION ALL SELECT 'errors&high_value',
              count(*) FILTER (f_err AND f_hi)::BIGINT FROM m
          UNION ALL SELECT 'errors&weekend',
              count(*) FILTER (f_err AND f_we)::BIGINT FROM m
          UNION ALL SELECT 'high_value',
              count(*) FILTER (f_hi)::BIGINT FROM m
          UNION ALL SELECT 'high_value&weekend',
              count(*) FILTER (f_hi AND f_we)::BIGINT FROM m
          UNION ALL SELECT 'weekend',
              count(*) FILTER (f_we)::BIGINT FROM m
        ) ORDER BY bucket
    """,
    # ES percolator: stored term-conjunctions matched against the doc
    # stream; terms must match queries.PERCOLATE_QUERIES
    "percolate": f"""
        WITH t AS (
          SELECT doc_id, {_PHRASE_ARR} AS arr FROM documents
        )
        SELECT * FROM (
          SELECT CAST(0 AS BIGINT) AS query_id,
                 count(*) FILTER (list_contains(arr, 'error')
                                  AND list_contains(arr, 'merge'))
                     ::BIGINT AS n_docs FROM t
          UNION ALL
          SELECT 1, count(*) FILTER (
              list_contains(arr, 'authentication')
              AND list_contains(arr, 'failure'))::BIGINT FROM t
          UNION ALL
          SELECT 2, count(*) FILTER (list_contains(arr, 'window'))
              ::BIGINT FROM t
        ) ORDER BY query_id
    """,
    # ES minimum_should_match: docs matching >= 2 distinct query terms,
    # scored by the full BM25 sum
    "min_should_match": _BM25_BASE + """
        SELECT s.doc_id, round(s.score, 6) AS score FROM scores s
        WHERE s.doc_id IN (SELECT doc_id FROM tf JOIN q USING (term)
                           GROUP BY doc_id
                           HAVING count(DISTINCT term) >= 2)
        ORDER BY s.score DESC, s.doc_id ASC LIMIT 10
    """,
    # ES _analyze analog: the tokenizer chain over a fixed string;
    # position = post-filter sequential index (empties dropped)
    "analyze_tokens": f"""
        WITH a AS (
          SELECT regexp_split_to_array({_CAMEL.format(
              col="'GetUserById error_count FooBar2000"
                  " https://x.io/a?q=1'")},
              '[^a-z0-9]+') AS arr
        ), u AS (
          SELECT unnest(arr) AS t, generate_subscripts(arr, 1) AS i
          FROM a
        )
        SELECT CAST(row_number() OVER (ORDER BY i) - 1 AS BIGINT)
                   AS position,
               substr(t, 1, 64) AS token
        FROM u WHERE t <> '' ORDER BY position
    """,
    # query_string 'lang:en +merge -error "sort merge" spark window':
    # scoring terms are must+should+phrase tokens; candidates must hold
    # the lang filter, the must term, the phrase, and not the must_not
    "query_string": _bm25_base(
        "('merge'), ('sort'), ('spark'), ('window')") + f"""
        , arr AS (
          SELECT doc_id, {_PHRASE_ARR} AS arr FROM documents
        ), ph AS (
          SELECT doc_id FROM arr
          WHERE len(arr) >= 2
            AND len([i FOR i IN generate_series(1, len(arr) - 1)
                     IF arr[i] = 'sort' AND arr[i+1] = 'merge']) > 0
        )
        SELECT s.doc_id, round(s.score, 6) AS score
        FROM scores s JOIN documents d USING (doc_id)
        WHERE d.lang = 'en'
          AND s.doc_id IN (SELECT doc_id FROM tf WHERE term = 'merge')
          AND s.doc_id NOT IN (SELECT doc_id FROM tf
                               WHERE term = 'error')
          AND s.doc_id IN (SELECT doc_id FROM ph)
        ORDER BY s.score DESC, s.doc_id ASC LIMIT 10
    """,
    # ES _count analog: docs containing any query term
    "match_count": _BM25_BASE + """
        SELECT count(DISTINCT tf.doc_id)::BIGINT AS n_matches
        FROM tf JOIN q USING (term)
    """,
    # search_after pagination == OFFSET in total (score desc, id asc)
    # order; ORDER BY the unrounded score like bm25_topk
    "bm25_page2": _BM25_BASE + """
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10 OFFSET 10
    """,
    # more_like_this: top-5 tf*idf terms of doc 0 (tie term asc) as the
    # query, BM25 top-10 excluding the source doc
    "more_like_this": f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), tok AS (
          SELECT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        ), tf AS (
          SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
          GROUP BY 1, 2
        ), dl AS (
          SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1
        ), stats AS (
          SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                 (SELECT count(*)::DOUBLE FROM tok) /
                 (SELECT count(*)::DOUBLE FROM documents) AS avgdl
        ), alldf AS (
          SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1
        ), q AS (
          SELECT tf.term FROM tf
          JOIN alldf USING (term) CROSS JOIN stats
          WHERE tf.doc_id = 0
          ORDER BY tf.tf * ln(1 + (stats.n - alldf.df + 0.5)
                              / (alldf.df + 0.5)) DESC, tf.term ASC
          LIMIT 5
        ), df AS (
          SELECT term, df FROM alldf WHERE term IN (SELECT term FROM q)
        ), scores AS (
          SELECT tf.doc_id,
                 sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * (1.2 + 1)
                     / (tf.tf + 1.2 * (1 - 0.75
                                       + 0.75 * dl.dl / stats.avgdl))
                 ) AS score
          FROM tf
          JOIN q USING (term) JOIN df USING (term) JOIN dl USING (doc_id)
          CROSS JOIN stats
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        WHERE doc_id <> 0
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
    """,
    # ES bool query: score over must+should terms, restricted to docs
    # containing every must term and no must_not term
    "boolean_search":
    _BM25_BASE.replace(_BM25_TERMS, "('merge'), ('spark'), ('window')")
    + """
        SELECT s.doc_id, round(s.score, 6) AS score
        FROM scores s
        WHERE s.doc_id IN (SELECT doc_id FROM tf WHERE term = 'merge')
          AND s.doc_id IN (SELECT doc_id FROM tf WHERE term = 'window')
          AND s.doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'error')
        ORDER BY s.score DESC, s.doc_id ASC LIMIT 10
    """,
    # ES completion suggester: top-4 prefix completions by df
    "suggest": f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), tok AS (
          SELECT DISTINCT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        )
        SELECT term, count(*)::BIGINT AS df FROM tok
        WHERE term LIKE 's%' GROUP BY 1
        ORDER BY df DESC, term ASC LIMIT 4
    """,
    # ES term suggester ("did you mean"): fuzzy corrections by df
    "spell_suggest": f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), tok AS (
          SELECT DISTINCT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        )
        SELECT term, count(*)::BIGINT AS df FROM tok
        WHERE levenshtein(term, 'mrge') <= 2 GROUP BY 1
        ORDER BY df DESC, term ASC LIMIT 3
    """,
    # ES-default fuzziness (transpositions): Damerau–Levenshtein <= 1;
    # engine predicate is the Lowrance–Wagner matrix ≡ this function
    "fuzzy_suggest_dl": f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), tok AS (
          SELECT DISTINCT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        )
        SELECT term, count(*)::BIGINT AS df FROM tok
        WHERE damerau_levenshtein(term, 'mrege') <= 1 GROUP BY 1
        ORDER BY df DESC, term ASC LIMIT 3
    """,
    # events_ewma: the moving_fn ewma recurrence as a recursive CTE —
    # 0.3*x + 0.7*s per step, the engine's exact float op tree; NO
    # rounding either side (single deterministic chain; pc.round vs
    # DuckDB round differ 1 ulp at print boundaries)
    "events_ewma": """
        WITH RECURSIVE daily AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day, count(*)::BIGINT AS n
          FROM events WHERE event_type = 'error' GROUP BY 1
        ), idx AS (
          SELECT day, n,
                 row_number() OVER (ORDER BY day)::BIGINT AS i
          FROM daily
        ), rec AS (
          SELECT i, day, n, CAST(n AS DOUBLE) AS s FROM idx WHERE i = 1
          UNION ALL
          SELECT d.i, d.day, d.n, 0.3 * CAST(d.n AS DOUBLE) + 0.7 * r.s
          FROM idx d JOIN rec r ON d.i = r.i + 1
        )
        SELECT day, n, s AS ewma FROM rec ORDER BY day
    """,
    # ES|QL pipelines (query/esql.py) — the SQL mirrors each piped
    # command in order; micros make SUM exact (histogram convention)
    "esql_stats": """
        WITH f AS (
          SELECT user_id,
                 CAST(round(value * 1000000, 0) AS BIGINT) AS micro
          FROM events WHERE event_type = 'error'
        )
        SELECT user_id, count(*)::BIGINT AS n,
               CAST(sum(micro) AS BIGINT) AS total_micro,
               max(micro) AS vmax_micro
        FROM f GROUP BY user_id
        ORDER BY n DESC, user_id ASC LIMIT 10
    """,
    "esql_enrich": """
        SELECT c_mktsegment, count(*)::BIGINT AS n,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1 ORDER BY c_mktsegment ASC
    """,
    "esql_dissect": """
        WITH x AS (
          SELECT event_type,
                 CAST(regexp_extract(props, '\\{"k": (.*)\\}', 1)
                      AS BIGINT) AS kv
          FROM events
        )
        SELECT event_type, count(*)::BIGINT AS n,
               CAST(sum(kv) AS BIGINT) AS ksum
        FROM x GROUP BY 1 ORDER BY event_type ASC
    """,
    "esql_docs": """
        SELECT upper(lang) AS lang_u, count(*)::BIGINT AS docs,
               CAST(sum(n_chars) AS BIGINT) AS chars,
               max(n_chars) AS cmax
        FROM documents WHERE n_chars >= 100
        GROUP BY 1 ORDER BY docs DESC, lang_u ASC LIMIT 5
    """,
    # MV_EXPAND == UNNEST here (the corpus has no null/empty vectors;
    # the ES keep-null-row divergence is pinned by unit tests instead)
    "esql_rename_expand": """
        WITH x AS (
          SELECT vec_id,
                 CAST(round(CAST(u AS DOUBLE) * 1000000, 0) AS BIGINT)
                     AS m
          FROM (SELECT vec_id, unnest(embedding) AS u
                FROM embeddings WHERE vec_id < 40)
        )
        SELECT vec_id, count(*)::BIGINT AS n,
               CAST(sum(m) AS BIGINT) AS s
        FROM x GROUP BY 1 ORDER BY vec_id ASC LIMIT 15
    """,
    "esql_grok": """
        WITH x AS (
          SELECT event_type,
                 CAST(regexp_extract(props, '\\{"k": ([+-]?\\d+)\\}',
                                     1) AS BIGINT) AS kv
          FROM events
        )
        SELECT event_type, count(*)::BIGINT AS n,
               CAST(sum(kv) AS BIGINT) AS ksum
        FROM x GROUP BY 1 ORDER BY event_type ASC
    """,
    "esql_count_distinct": """
        SELECT event_type,
               count(DISTINCT user_id)::BIGINT AS users,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1 ORDER BY event_type ASC
    """,
    "esql_inlinestats": """
        WITH a AS (
          SELECT lang, avg(n_chars) AS m
          FROM documents GROUP BY 1
        )
        SELECT d.lang, count(*)::BIGINT AS above,
               max(d.n_chars)::BIGINT AS max_over
        FROM documents d JOIN a USING (lang)
        WHERE d.n_chars > a.m
        GROUP BY 1 ORDER BY d.lang ASC
    """,
    "esql_fork": """
        SELECT * FROM (
          SELECT source, count(*)::BIGINT AS n,
                 sum(n_chars)::BIGINT AS chars,
                 'fork1' AS _fork
          FROM documents WHERE lang = 'en' GROUP BY source
          UNION ALL
          SELECT source, count(*)::BIGINT, sum(n_chars)::BIGINT,
                 'fork2'
          FROM documents WHERE n_chars >= 400 GROUP BY source
        ) ORDER BY _fork ASC, source ASC
    """,
    # esql_mv_list_functions: dedupe of {a,b,a} == {least, greatest}
    # (sorted), slice 0..1 inclusive keeps both of <=2 elements
    "esql_mv_list_functions": """
        WITH e AS (
          SELECT CAST(n_chars % 3 AS VARCHAR) AS a,
                 CAST(n_chars % 5 AS VARCHAR) AS b
          FROM documents
        ), m AS (
          SELECT CASE WHEN a = b THEN 1 ELSE 2 END AS k,
                 least(a, b) AS mn,
                 greatest(a, b) AS mx
          FROM e
        )
        SELECT k, mn, mx, count(*)::BIGINT AS n
        FROM m GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    # esql_ip_functions: the CIDR masks in octet arithmetic —
    # 52.0.0.0/8 == (o1 = 52); 54.0.0.0/7 == (o1 // 2 == 27);
    # IP_PREFIX(ip, 12) == o1 . (high nibble of o2) . 0 . 0
    "esql_ip_functions": """
        WITH e AS (
          SELECT 52 + user_id % 3 AS o1, user_id % 200 AS o2,
                 event_id % 256 AS o3
          FROM events
        ), m AS (
          SELECT CAST(o1 AS VARCHAR) || '.'
                   || CAST((o2 // 16) * 16 AS VARCHAR)
                   || '.0.0' AS pfx,
                 (o1 = 52 OR o1 // 2 = 27) AS in_net
          FROM e
        )
        SELECT pfx, count(*)::BIGINT AS n,
               CAST(count(*) FILTER (WHERE in_net) AS BIGINT) AS hits
        FROM m GROUP BY 1 ORDER BY 1 LIMIT 500
    """,
    # esql_weighted_stats: identical double op trees over
    # centi-unit-quantized exact-integer inputs (scale-stable: every
    # partial sum representable in a double, so summation order is
    # irrelevant) — w = sum(v*w)/sum(w masked under v*w's null mask);
    # sd = sqrt(s2/n - (s/n)*(s/n)) with n = count of non-null values
    "esql_weighted_stats": """
        WITH e AS (
          SELECT event_type, user_id,
                 CAST(round(value * 100) AS BIGINT) AS v
          FROM events
        )
        SELECT event_type,
               round((sum(CAST(v AS DOUBLE) * user_id)
                      / sum(CASE WHEN v * user_id IS NOT NULL
                                 THEN CAST(user_id AS DOUBLE) END))
                     / 100, 6) AS w,
               round(sqrt(sum(CAST(v AS DOUBLE) * v) / count(v)
                          - (sum(CAST(v AS DOUBLE)) / count(v))
                            * (sum(CAST(v AS DOUBLE)) / count(v)))
                     / 100, 6) AS sd,
               count(*)::BIGINT AS n
        FROM e GROUP BY 1 ORDER BY 1
    """,
    "esql_string_functions2": """
        WITH e AS (
          SELECT reverse(lang) AS lang2,
                 left(source, 4) AS head,
                 strpos(text, 'error') AS pos
          FROM documents
        )
        SELECT lang2, head, count(*)::BIGINT AS n,
               CAST(count(*) FILTER (WHERE pos > 0) AS BIGINT) AS hits
        FROM e GROUP BY 1, 2 ORDER BY 1, 2
    """,
    # esql_bucket: BUCKET(n_chars, 10, 0, 600) — nice widths are
    # {1,2,5}x10^k; smallest fitting 600 in <=10 buckets: 10→60,
    # 20→30, 50→12 (all >10), 100→6 ✓ — so width = 100
    "esql_bucket": """
        SELECT floor(n_chars / 100.0) * 100.0 AS b,
               count(*)::BIGINT AS n,
               max(n_chars)::BIGINT AS max_chars
        FROM documents GROUP BY 1 ORDER BY 1
    """,
    "esql_lookup_join_multi": """
        SELECT n_name,
               count(*)::BIGINT AS customers,
               CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT))
                    AS BIGINT) AS total_bal
        FROM nation JOIN customer ON c_nationkey = n_nationkey
        GROUP BY 1 ORDER BY 1
    """,
    # esql_knn: same deterministic query vector as the entry
    # (_esql_knn_query_vec); DOUBLE-cast lists per the embedding_knn
    # convention; rank on the UNROUNDED similarity inside the subquery
    "esql_knn": """
        SELECT vec_id, round(sim, 6) AS sim FROM (
          SELECT vec_id,
                 list_cosine_similarity(
                     list_transform(embedding,
                                    x -> CAST(x AS DOUBLE)),
                     [{qvec}]) AS sim
          FROM embeddings
          ORDER BY sim DESC, vec_id ASC LIMIT 10
        )
    """.format(qvec=", ".join(
        repr((((i * 37) % 19) - 9) / 10.0) for i in range(64))),
    "esql_change_point": """
        WITH daily AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day, count(*)::BIGINT AS n
          FROM events GROUP BY 1
        ), ord AS (
          SELECT day, n,
                 row_number() OVER (ORDER BY day) AS i,
                 count(*) OVER () AS total,
                 sum(n) OVER (ORDER BY day) AS sl,
                 sum(n) OVER () AS s
          FROM daily
        ), scored AS (
          SELECT i AS k,
                 CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)
                     / CAST(i AS DOUBLE)
                   + CAST(s - sl AS DOUBLE) * CAST(s - sl AS DOUBLE)
                     / CAST(total - i AS DOUBLE) AS g
          FROM ord WHERE i < total
        ), best AS (
          SELECT k, g FROM scored ORDER BY g DESC, k ASC LIMIT 1
        )
        SELECT ord.day, ord.n, 'step_change' AS type,
               round(best.g, 6) AS pvalue
        FROM ord, best WHERE ord.i = best.k + 1
    """,
    "esql_agg_where": """
        WITH m AS (
          SELECT user_id, event_type,
                 CAST(round(value * 1000000, 0) AS BIGINT) AS micro
          FROM events
        )
        SELECT user_id,
               CAST(count(*) FILTER (WHERE event_type = 'error')
                    AS BIGINT) AS n_err,
               CAST(sum(micro) FILTER (WHERE event_type = 'error')
                    AS BIGINT) AS s_err,
               count(*)::BIGINT AS n
        FROM m GROUP BY 1 ORDER BY user_id ASC LIMIT 20
    """,
    "esql_match": f"""
        WITH tok AS (
          SELECT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(
                           {_CAMEL.format(col='text')},
                           '[^a-z0-9]+')) AS t
                FROM documents)
          WHERE t <> ''
        ), hits AS (
          SELECT DISTINCT doc_id FROM tok
          WHERE term IN ('error', 'merge')
        )
        SELECT d.source, count(*)::BIGINT AS n,
               CAST(sum(d.n_chars) AS BIGINT) AS chars
        FROM documents d JOIN hits USING (doc_id)
        WHERE d.lang = 'en'
        GROUP BY 1 ORDER BY d.source ASC
    """,
    "esql_sample": """
        SELECT event_type, count(*)::BIGINT AS n,
               count(DISTINCT user_id)::BIGINT AS users
        FROM events WHERE event_id % 16 = 0
        GROUP BY 1 ORDER BY event_type ASC
    """,
    "esql_date_format": """
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               CAST(extract(hour FROM ts) AS BIGINT) AS hr,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1, 2 ORDER BY day ASC, hr ASC LIMIT 50
    """,
    "esql_median": """
        WITH m AS (
          SELECT event_type,
                 CAST(round(value * 1000000, 0) AS BIGINT) AS micro
          FROM events
        )
        SELECT event_type, count(*)::BIGINT AS n,
               quantile_disc(micro, 0.5)::BIGINT AS med,
               quantile_disc(micro, 0.90)::BIGINT AS p90
        FROM m GROUP BY 1 ORDER BY event_type ASC
    """,
    "esql_mv_functions": """
        WITH x AS (
          SELECT label, len(embedding)::BIGINT AS dims,
                 CAST(round(CAST(list_aggregate(embedding, 'min')
                      AS DOUBLE) * 1000000, 0) AS BIGINT) AS mn,
                 CAST(round(CAST(list_aggregate(embedding, 'max')
                      AS DOUBLE) * 1000000, 0) AS BIGINT) AS mx,
                 CAST(round((SELECT sum(CAST(u AS DOUBLE))
                             FROM unnest(embedding) AS t(u))
                      * 1000000, 0) AS BIGINT) AS sm
          FROM embeddings
        )
        SELECT label, count(*)::BIGINT AS n,
               CAST(sum(dims) AS BIGINT) AS total_dims,
               CAST(sum(mn) AS BIGINT) AS sum_mn,
               CAST(sum(mx) AS BIGINT) AS sum_mx,
               CAST(sum(sm) AS BIGINT) AS sum_sm
        FROM x GROUP BY 1 ORDER BY label ASC
    """,
    "esql_having": """
        SELECT user_id, count(*)::BIGINT AS n,
               CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT))
                    AS BIGINT) AS micro
        FROM events GROUP BY 1 HAVING count(*) >= 60
        ORDER BY n DESC, user_id ASC LIMIT 500
    """,
    "esql_functions": """
        SELECT CASE WHEN n_chars >= 150 THEN 'long'
                    WHEN n_chars >= 100 THEN 'mid'
                    ELSE 'short' END AS band,
               lang || ':' || substr(source, 4) AS key,
               count(*)::BIGINT AS n
        FROM documents WHERE source LIKE 'src1%'
        GROUP BY 1, 2 ORDER BY band ASC, key ASC LIMIT 25
    """,
    "esql_date_trunc": """
        SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n,
               CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT))
                    AS BIGINT) AS sum_micro
        FROM events GROUP BY 1 ORDER BY day ASC
    """,
    "esql_like_in": """
        SELECT lang, source, count(*)::BIGINT AS docs,
               CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents
        WHERE lang IN ('en', 'de') AND source LIKE 'src1_'
          AND source NOT IN ('src13')
        GROUP BY 1, 2 ORDER BY lang ASC, source ASC
    """,
    "esql_lookup_join": """
        SELECT c_mktsegment, count(*)::BIGINT AS n,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_acctbal > 0
        GROUP BY 1 ORDER BY c_mktsegment ASC
    """,
    # LTR feature logging over the BM25 top-20: matched distinct query
    # terms, token dl, and the doc-aligned embedding cosine
    "ltr_features": _BM25_BASE + """
        , top AS (
          SELECT doc_id, scores.score AS score,
                 row_number() OVER (ORDER BY scores.score DESC,
                                    doc_id ASC) AS r
          FROM scores QUALIFY r <= 20
        ), mt AS (
          SELECT doc_id, count(DISTINCT term)::BIGINT AS matched_terms
          FROM tf WHERE term IN (SELECT term FROM q) GROUP BY 1
        ), kv AS (
          SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE vec_id = 0
        )
        SELECT t.doc_id, round(t.score, 6) AS score, mt.matched_terms,
               CAST(dl.dl AS BIGINT) AS dl,
               round(list_cosine_similarity(
                   list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                   (SELECT v FROM kv)), 6) AS cosine
        FROM top t JOIN mt USING (doc_id) JOIN dl USING (doc_id)
        JOIN embeddings e ON e.vec_id = t.doc_id
        ORDER BY t.score DESC, t.doc_id ASC
    """,
    # downsample/rollup serving equivalence: the oracle aggregates RAW
    # events into months; the engine serves the same months from its
    # persisted daily rollup. Integer micros (histogram_agg convention)
    # make every merge exact and order-independent.
    "rollup_downsample": """
        WITH m AS (
          SELECT event_type, strftime(ts, '%Y-%m') AS month,
                 CAST(round(value * 1e6, 0) AS BIGINT) AS micro
          FROM events
        )
        SELECT event_type, month, count(*)::BIGINT AS n_events,
               CAST(sum(micro) AS BIGINT) AS sum_value_micro,
               min(micro) AS min_value_micro,
               max(micro) AS max_value_micro
        FROM m GROUP BY 1, 2 ORDER BY event_type, month
    """,
    # moving_fn holt (level+trend double smoothing): the recursive CTE
    # carries (s, b); s_new is recomputed textually where needed — the
    # identical expression yields the identical IEEE value
    "events_holt": """
        WITH RECURSIVE daily AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day, count(*)::BIGINT AS n
          FROM events WHERE event_type = 'error' GROUP BY 1
        ), idx AS (
          SELECT day, n,
                 row_number() OVER (ORDER BY day)::BIGINT AS i
          FROM daily
        ), rec AS (
          SELECT i, day, n, CAST(n AS DOUBLE) AS s,
                 CAST(0 AS DOUBLE) AS b
          FROM idx WHERE i = 1
          UNION ALL
          SELECT d.i, d.day, d.n,
                 0.3 * CAST(d.n AS DOUBLE) + 0.7 * (r.s + r.b),
                 0.1 * ((0.3 * CAST(d.n AS DOUBLE)
                         + 0.7 * (r.s + r.b)) - r.s) + 0.9 * r.b
          FROM idx d JOIN rec r ON d.i = r.i + 1
        )
        SELECT day, n, s AS level, b AS trend, s + b AS forecast
        FROM rec ORDER BY day
    """,
    # terms_enum: keyword-field dictionary enumeration, term-asc (the
    # API contract); df = docs holding the value (keyword tf=1)
    "terms_enum": """
        SELECT lang AS value, count(*)::BIGINT AS df FROM documents
        GROUP BY 1 ORDER BY value ASC LIMIT 20
    """,
    # phrase suggester: per-slot fuzzy candidates (levenshtein <= 1,
    # df-ranked top 5 like expand_fuzzy) scored by total adjacent
    # bigram count; INNER join prunes zero-support pairs like the engine
    "phrase_suggest": f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), tok AS (
          SELECT DISTINCT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        ), tokdf AS (
          SELECT term, count(*)::BIGINT AS df FROM tok GROUP BY 1
        ), c1 AS (
          SELECT term FROM tokdf WHERE levenshtein(term, 'sor') <= 1
          ORDER BY df DESC, term ASC LIMIT 5
        ), c2 AS (
          SELECT term FROM tokdf WHERE levenshtein(term, 'mrge') <= 1
          ORDER BY df DESC, term ASC LIMIT 5
        ), t2 AS (
          SELECT doc_id, {_PHRASE_ARR} AS arr FROM documents
        ), bg AS (
          SELECT arr[i] AS w1, arr[i + 1] AS w2, count(*)::BIGINT AS cnt
          FROM t2, unnest(generate_series(1, len(arr) - 1)) AS g(i)
          GROUP BY 1, 2
        )
        SELECT a.term || ' ' || b.term AS suggestion, bg.cnt AS score
        FROM c1 a CROSS JOIN c2 b
        JOIN bg ON bg.w1 = a.term AND bg.w2 = b.term
        ORDER BY score DESC, suggestion ASC LIMIT 3
    """,
    # ES sort-by-keyword-field: first 10 matching docs by (lang, doc_id)
    "search_sorted": f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), tok AS (
          SELECT DISTINCT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        )
        SELECT DISTINCT tok.doc_id, d.lang
        FROM tok JOIN documents d USING (doc_id)
        WHERE tok.term IN ('error', 'merge', 'spark', 'window')
        ORDER BY d.lang, tok.doc_id LIMIT 10
    """,
    # ES aggregation on query results: per-lang doc count over docs
    # containing any query term
    "search_facets": f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), tok AS (
          SELECT DISTINCT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        )
        SELECT d.lang, count(DISTINCT tok.doc_id)::BIGINT AS n_docs
        FROM tok JOIN documents d USING (doc_id)
        WHERE tok.term IN ('error', 'merge', 'spark', 'window')
        GROUP BY 1 ORDER BY 1
    """,
    # ES prefix-query analogs: the engine expands the prefix against the
    # shard dictionaries; SQL expands it with LIKE over the token stream
    "prefix_df": f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), tok AS (
          SELECT DISTINCT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        )
        SELECT term, count(*)::BIGINT AS df FROM tok
        WHERE term LIKE 's%' GROUP BY 1 ORDER BY term
    """,
    "prefix_search": f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), tok AS (
          SELECT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        ), tf AS (
          SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
          GROUP BY 1, 2
        ), dl AS (
          SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1
        ), stats AS (
          SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                 (SELECT count(*)::DOUBLE FROM tok) /
                 (SELECT count(*)::DOUBLE FROM documents) AS avgdl
        ), df AS (
          SELECT term, count(*)::DOUBLE AS df FROM tf
          WHERE term LIKE 's%' GROUP BY 1
        ), scores AS (
          SELECT tf.doc_id,
                 sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * (1.2 + 1)
                     / (tf.tf + 1.2 * (1 - 0.75
                                       + 0.75 * dl.dl / stats.avgdl))
                 ) AS score
          FROM tf
          JOIN df USING (term) JOIN dl USING (doc_id)
          CROSS JOIN stats
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
    """,
    # wildcard *er* = LIKE '%er%' over the term dictionary, then the
    # standard BM25 sum over the expanded term set
    "wildcard_search": f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), tok AS (
          SELECT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        ), tf AS (
          SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
          GROUP BY 1, 2
        ), dl AS (
          SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1
        ), stats AS (
          SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                 (SELECT count(*)::DOUBLE FROM tok) /
                 (SELECT count(*)::DOUBLE FROM documents) AS avgdl
        ), df AS (
          SELECT term, count(*)::DOUBLE AS df FROM tf
          WHERE term LIKE '%er%' GROUP BY 1
        ), scores AS (
          SELECT tf.doc_id,
                 sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * (1.2 + 1)
                     / (tf.tf + 1.2 * (1 - 0.75
                                       + 0.75 * dl.dl / stats.avgdl))
                 ) AS score
          FROM tf
          JOIN df USING (term) JOIN dl USING (doc_id)
          CROSS JOIN stats
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
    """,
    # intervals (ordered, max_gaps=2): 'sort' strictly after 'merge'
    # with at most 2 tokens between -> position delta in [1, 3]
    "intervals_ordered": f"""
        WITH t AS (
          SELECT doc_id, {_PHRASE_ARR} AS arr FROM documents
        ), p AS (
          SELECT doc_id,
                 [i FOR i IN generate_series(1, len(arr))
                  IF arr[i] = 'merge'] AS p1,
                 [i FOR i IN generate_series(1, len(arr))
                  IF arr[i] = 'sort'] AS p2
          FROM t
        ), pm AS (
          SELECT doc_id,
                 CAST(list_sum(list_transform(p1,
                     x -> len(list_filter(p2,
                         y -> y - x BETWEEN 1 AND 3)))) AS BIGINT)
                     AS n_matches
          FROM p WHERE len(p1) > 0 AND len(p2) > 0
        )
        SELECT doc_id, n_matches FROM pm WHERE n_matches > 0
        ORDER BY doc_id
    """,
    "phrase_match": _PHRASE_MATCH_BASE + """
        SELECT doc_id, n_matches FROM pm WHERE n_matches > 0
        ORDER BY doc_id
    """,
    # the base+delta positional sidecar must equal full-corpus phrase
    # results — same oracle as phrase_match
    "phrase_match_incremental": _PHRASE_MATCH_BASE + """
        SELECT doc_id, n_matches FROM pm WHERE n_matches > 0
        ORDER BY doc_id
    """,
    # span_near: per doc, count (i, j) occurrence pairs of the two terms
    # within the window — nested list lambdas over position lists
    "span_near": f"""
        WITH t AS (
          SELECT doc_id, {_PHRASE_ARR} AS arr FROM documents
        ), p AS (
          SELECT doc_id,
                 [i FOR i IN generate_series(1, len(arr))
                  IF arr[i] = 'sort'] AS p1,
                 [i FOR i IN generate_series(1, len(arr))
                  IF arr[i] = 'merge'] AS p2
          FROM t
        ), pm AS (
          SELECT doc_id,
                 CAST(list_sum(list_transform(p1,
                     x -> len(list_filter(p2,
                         y -> abs(x - y) <= 3)))) AS BIGINT) AS n_matches
          FROM p WHERE len(p1) > 0 AND len(p2) > 0
        )
        SELECT doc_id, n_matches FROM pm WHERE n_matches > 0
        ORDER BY doc_id
    """,
    # match_phrase_prefix: last slot matches any term with the prefix
    "phrase_prefix": f"""
        WITH t AS (
          SELECT doc_id, {_PHRASE_ARR} AS arr FROM documents
        ), pm AS (
          SELECT doc_id,
                 len([i FOR i IN generate_series(1, len(arr) - 1)
                      IF arr[i] = 'merge' AND arr[i+1] LIKE 's%'])::BIGINT
                     AS n_matches
          FROM t WHERE len(arr) >= 2
        )
        SELECT doc_id, n_matches FROM pm WHERE n_matches > 0
        ORDER BY doc_id
    """,
    # BM25 over the phrase's terms restricted to exact-phrase docs — the
    # engine's phrase_topk (positional filter + standard TAAT scoring)
    "phrase_topk": _BM25_BASE.replace(_BM25_TERMS, "('merge'), ('sort')")
    + _PHRASE_MATCH_BASE.replace("WITH t AS", ", t AS") + """
        SELECT s.doc_id, round(s.score, 6) AS score
        FROM scores s JOIN pm USING (doc_id)
        WHERE pm.n_matches > 0
        ORDER BY s.score DESC, s.doc_id ASC LIMIT 10
    """,
    # ES rescore: top-50 BM25 window reranked by a constant-weight
    # phrase rescore query (score_mode: total, 0.5 per occurrence)
    "rescore_topk": _BM25_BASE
    + _PHRASE_MATCH_BASE.replace("WITH t AS", ", t AS") + """
        , w AS (
          SELECT doc_id, score FROM scores
          ORDER BY score DESC, doc_id ASC LIMIT 50
        )
        SELECT w.doc_id,
               round(w.score + 0.5 * coalesce(pm.n_matches, 0), 6)
                 AS score
        FROM w LEFT JOIN pm USING (doc_id)
        ORDER BY (w.score + 0.5 * coalesce(pm.n_matches, 0)) DESC,
                 w.doc_id ASC
        LIMIT 10
    """,
    "dedup_exact": """
        SELECT min(doc_id) AS doc_id FROM documents
        GROUP BY text ORDER BY doc_id
    """,
    # bigram-LM / BPE counting: top-20 adjacent token pairs by raw
    # occurrence count (same lower+split tokenization as the shingles)
    # PMI collocations: same lower+split tokenization as bigram_counts;
    # every count is an exact BIGINT, pmi = ln of one cast-double ratio
    # (single chain — no rounding either side), ORDER BY raw pmi
    "collocations_pmi": """
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text),
                                                   '[^a-z0-9]+'),
                             x -> x <> '') AS arr
          FROM documents
        ), uni AS (
          SELECT arr[i] AS w, count(*)::BIGINT AS c
          FROM t, unnest(generate_series(1, len(arr))) AS g(i)
          GROUP BY 1
        ), n AS (
          SELECT sum(c)::BIGINT AS n FROM uni
        ), bg AS (
          SELECT arr[i] AS w1, arr[i + 1] AS w2, count(*)::BIGINT AS cab
          FROM t, unnest(generate_series(1, len(arr) - 1)) AS g(i)
          GROUP BY 1, 2
        )
        SELECT bg.w1 || ' ' || bg.w2 AS pair, bg.cab AS n_pair,
               ln(CAST(n.n * bg.cab AS DOUBLE)
                  / CAST(u1.c * u2.c AS DOUBLE)) AS pmi
        FROM bg
        JOIN uni u1 ON u1.w = bg.w1
        JOIN uni u2 ON u2.w = bg.w2
        CROSS JOIN n
        WHERE bg.cab >= 5
        ORDER BY pmi DESC, pair ASC LIMIT 10
    """,
    "bigram_counts": """
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text),
                                                   '[^a-z0-9]+'),
                             x -> x <> '') AS arr
          FROM documents
        ), g AS (
          SELECT unnest([arr[i] || ' ' || arr[i+1]
                         FOR i IN generate_series(1, len(arr) - 1)])
                     AS pair
          FROM t WHERE len(arr) >= 2
        )
        SELECT pair, count(*)::BIGINT AS n FROM g GROUP BY 1
        ORDER BY n DESC, pair ASC LIMIT 20
    """,
    # add-1 bigram LM: per-doc average negative log-likelihood; order
    # by the UNROUNDED average like every scored oracle
    "bigram_perplexity": """
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text),
                                                   '[^a-z0-9]+'),
                             x -> x <> '') AS arr
          FROM documents
        ), g AS (
          SELECT doc_id,
                 unnest([arr[i] || ' ' || arr[i+1]
                         FOR i IN generate_series(1, len(arr) - 1)])
                     AS pair,
                 unnest([arr[i]
                         FOR i IN generate_series(1, len(arr) - 1)])
                     AS w1
          FROM t WHERE len(arr) >= 2
        ), c1 AS (
          SELECT w, count(*)::DOUBLE AS c
          FROM (SELECT unnest(arr) AS w FROM t) GROUP BY 1
        ), vv AS (SELECT count(*)::DOUBLE AS v FROM c1),
        c2 AS (
          SELECT pair, count(*)::DOUBLE AS c FROM g GROUP BY 1
        ), s AS (
          SELECT g.doc_id,
                 -sum(ln((c2.c + 1) / (c1.c + vv.v))) AS nll,
                 count(*)::BIGINT AS n_pairs
          FROM g JOIN c2 USING (pair)
          JOIN c1 ON c1.w = g.w1 CROSS JOIN vv
          GROUP BY 1
        )
        SELECT doc_id, n_pairs, round(nll / n_pairs, 6) AS avg_nll
        FROM s ORDER BY nll / n_pairs DESC, doc_id ASC LIMIT 15
    """,
    # sorted-layout early termination / manifest pruning — plain ORDER
    # BY oracles; the engine serves them reading only a file prefix /
    # intersecting partitions
    "sorted_index_topn": """
        SELECT doc_id, n_chars FROM documents
        ORDER BY n_chars ASC, doc_id ASC LIMIT 50
    """,
    "sorted_index_range": """
        SELECT doc_id, n_chars FROM documents
        WHERE n_chars BETWEEN 110 AND 125
        ORDER BY n_chars ASC, doc_id ASC
    """,
    # per-doc character Shannon entropy (quality signal), lowest 20;
    # -(p ln p) accumulates per cell on both sides, round6 absorbs
    # group addition order
    "char_entropy": """
        WITH c AS (
          SELECT doc_id, unnest(string_split(text, '')) AS ch
          FROM documents WHERE length(text) > 0
        ), cc AS (
          SELECT doc_id, ch, count(*)::DOUBLE AS k FROM c GROUP BY 1, 2
        ), wt AS (
          SELECT doc_id, k,
                 sum(k) OVER (PARTITION BY doc_id) AS tot
          FROM cc
        ), e AS (
          SELECT doc_id, -sum((k / tot) * ln(k / tot)) AS ent
          FROM wt GROUP BY 1
        )
        SELECT doc_id, round(ent, 6) AS entropy FROM e
        ORDER BY ent ASC, doc_id ASC LIMIT 20
    """,
    # Moore–Lewis cross-entropy selection: per-doc avg NLL under the
    # in-domain (lang='en') bigram LM minus under the general LM;
    # LEFT JOIN + COALESCE(0) = the engine's unseen-pair add-1 path
    "moore_lewis": """
        WITH t AS (
          SELECT doc_id, lang,
                 list_filter(regexp_split_to_array(lower(text),
                                                   '[^a-z0-9]+'),
                             x -> x <> '') AS arr
          FROM documents
        ), g AS (
          SELECT doc_id,
                 unnest([arr[i] || ' ' || arr[i+1]
                         FOR i IN generate_series(1, len(arr) - 1)])
                     AS pair,
                 unnest([arr[i]
                         FOR i IN generate_series(1, len(arr) - 1)])
                     AS w1
          FROM t WHERE len(arr) >= 2
        ), c1g AS (
          SELECT w, count(*)::DOUBLE AS c
          FROM (SELECT unnest(arr) AS w FROM t) GROUP BY 1
        ), vvg AS (SELECT count(*)::DOUBLE AS v FROM c1g),
        c2g AS (
          SELECT pair, count(*)::DOUBLE AS c FROM g GROUP BY 1
        ), gi AS (
          SELECT doc_id,
                 unnest([arr[i] || ' ' || arr[i+1]
                         FOR i IN generate_series(1, len(arr) - 1)])
                     AS pair
          FROM t WHERE len(arr) >= 2 AND lang = 'en'
        ), c1i AS (
          SELECT w, count(*)::DOUBLE AS c
          FROM (SELECT unnest(arr) AS w FROM t WHERE lang = 'en')
          GROUP BY 1
        ), vvi AS (SELECT count(*)::DOUBLE AS v FROM c1i),
        c2i AS (
          SELECT pair, count(*)::DOUBLE AS c FROM gi GROUP BY 1
        ), s AS (
          SELECT g.doc_id,
                 -sum(ln((c2g.c + 1) / (c1g.c + vvg.v))) AS nllg,
                 -sum(ln((COALESCE(c2i.c, 0) + 1)
                         / (COALESCE(c1i.c, 0) + vvi.v))) AS nlli,
                 count(*)::BIGINT AS n_pairs
          FROM g JOIN c2g USING (pair)
          JOIN c1g ON c1g.w = g.w1
          LEFT JOIN c2i ON c2i.pair = g.pair
          LEFT JOIN c1i ON c1i.w = g.w1
          CROSS JOIN vvg CROSS JOIN vvi
          GROUP BY 1
        )
        SELECT doc_id, n_pairs,
               round(nlli / n_pairs - nllg / n_pairs, 6) AS ml_score
        FROM s
        ORDER BY nlli / n_pairs - nllg / n_pairs ASC, doc_id ASC
        LIMIT 15
    """,
    # substring-level dedup rewrite: duplicated 3-grams removed outside
    # their min-doc keeper, docs rebuilt from kept tokens
    "dedup_span_removal": """
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text),
                                                   '[^a-z0-9]+'),
                             x -> x <> '') AS arr
          FROM documents
        ), g AS (
          SELECT doc_id,
                 unnest([i FOR i IN
                         generate_series(1, len(arr) - 2)]) AS pos,
                 unnest([arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]
                         FOR i IN generate_series(1, len(arr) - 2)])
                     AS sh
          FROM t WHERE len(arr) >= 3
        ), d AS (
          SELECT sh, min(doc_id) AS keeper
          FROM (SELECT DISTINCT doc_id, sh FROM g)
          GROUP BY sh HAVING count(*) >= 2
        ), m AS (
          SELECT g.doc_id, g.pos
          FROM g JOIN d USING (sh) WHERE g.doc_id <> d.keeper
        ), cov AS (
          SELECT doc_id, list(DISTINCT p) AS ps
          FROM (SELECT doc_id, unnest([pos, pos + 1, pos + 2]) AS p
                FROM m)
          GROUP BY doc_id
        ), r AS (
          SELECT t.doc_id,
                 [t.arr[i] FOR i IN generate_series(1, len(t.arr))
                  IF NOT list_contains(coalesce(cov.ps,
                                                CAST([] AS BIGINT[])),
                                       i)] AS kept,
                 len(t.arr)::BIGINT AS n_tokens
          FROM t LEFT JOIN cov USING (doc_id)
        )
        SELECT doc_id,
               coalesce(array_to_string(kept, ' '), '') AS clean_text,
               n_tokens, len(kept)::BIGINT AS kept_tokens
        FROM r ORDER BY doc_id
    """,
    # decontamination: docs sharing any word-3-gram with benchmark docs
    # 0-4; shingle spec matches ngram_jaccard_dupes / dedup/jaccard.py
    "contamination_check": """
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text),
                                                   '[^a-z0-9]+'),
                             x -> x <> '') AS arr
          FROM documents
        ), g AS (
          SELECT doc_id,
                 unnest([arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]
                         FOR i IN generate_series(1, len(arr) - 2)]) AS sh
          FROM t WHERE len(arr) >= 3
        ), gd AS (
          SELECT DISTINCT doc_id, sh FROM g
        ), bench AS (
          SELECT DISTINCT sh FROM gd WHERE doc_id < 5
        ), sz AS (
          SELECT doc_id, count(*)::BIGINT AS n FROM gd GROUP BY 1
        ), ov AS (
          SELECT gd.doc_id, count(*)::BIGINT AS n_overlap
          FROM gd JOIN bench USING (sh)
          WHERE gd.doc_id >= 5 GROUP BY 1
        )
        SELECT ov.doc_id, ov.n_overlap, sz.n AS n_shingles
        FROM ov JOIN sz USING (doc_id)
        ORDER BY ov.doc_id
    """,
    # per-doc tf-idf features: tf * ln(N/df), top-5 per target doc,
    # df over the WHOLE corpus, same [a-z0-9]+ token class
    "tfidf_top_terms": """
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(regexp_split_to_array(lower(text),
                                                          '[^a-z0-9]+'),
                                    x -> x <> '')) AS t
          FROM documents
        ), dfs AS (
          SELECT t, count(DISTINCT doc_id) AS df FROM toks GROUP BY t
        ), n AS (
          SELECT count(*) AS n FROM documents
        ), tf AS (
          SELECT doc_id, t, count(*) AS tf FROM toks
          WHERE doc_id < 20 GROUP BY 1, 2
        ), scored AS (
          SELECT tf.doc_id, tf.t AS term, tf.tf, dfs.df,
                 round(tf.tf * ln(n.n::DOUBLE / dfs.df), 6) AS tfidf,
                 row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * ln(n.n::DOUBLE / dfs.df) DESC,
                            tf.t ASC) AS rn
          FROM tf JOIN dfs ON tf.t = dfs.t CROSS JOIN n
        )
        SELECT doc_id, term, tf, df, tfidf FROM scored WHERE rn <= 5
        ORDER BY doc_id, tfidf DESC, term
    """,
    # duplicated-span coverage (Lee et al. substring dedup statistic):
    # per-doc union of [i, i+3) over starts of 3-grams seen in >= 2
    # distinct docs; n_tokens = filtered token-array length
    # hybrid BM25 + kNN retrieval fused with reciprocal-rank fusion
    # (1/(60+rank), the ES 8.x rrf retriever); ranks come from the same
    # BM25 CTE as bm25_topk and the same cosine CTE as embedding_knn
    "hybrid_search_rrf": _BM25_BASE + """
        , brank AS (
          SELECT doc_id,
                 row_number() OVER (ORDER BY scores.score DESC,
                                    doc_id ASC) AS r
          FROM scores QUALIFY r <= 50
        ), kv AS (
          SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE vec_id = 0
        ), ks AS (
          SELECT vec_id AS doc_id,
                 list_cosine_similarity(
                     list_transform(embedding, x -> CAST(x AS DOUBLE)),
                     (SELECT v FROM kv)) AS c
          FROM embeddings
        ), krank AS (
          SELECT doc_id,
                 row_number() OVER (ORDER BY c DESC, doc_id ASC) AS r
          FROM ks QUALIFY r <= 50
        ), fused AS (
          SELECT COALESCE(b.doc_id, k.doc_id) AS doc_id,
                 COALESCE(1.0 / (60 + b.r), 0)
                 + COALESCE(1.0 / (60 + k.r), 0) AS rrf
          FROM brank b FULL OUTER JOIN krank k ON b.doc_id = k.doc_id
        )
        SELECT doc_id, round(rrf, 6) AS rrf_score FROM fused
        ORDER BY rrf DESC, doc_id ASC LIMIT 10
    """,
    # ES ``linear`` retriever: minmax-normalized weighted fusion over
    # the same two top-50 pools as hybrid_search_rrf
    "hybrid_search_linear": _BM25_BASE + """
        , brank AS (
          SELECT doc_id, scores.score AS s,
                 row_number() OVER (ORDER BY scores.score DESC,
                                    doc_id ASC) AS r
          FROM scores QUALIFY r <= 50
        ), bnorm AS (
          SELECT doc_id,
                 CASE WHEN max(s) OVER () = min(s) OVER () THEN 1.0
                      ELSE (s - min(s) OVER ())
                           / (max(s) OVER () - min(s) OVER ())
                 END AS lex
          FROM brank
        ), kv AS (
          SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE vec_id = 0
        ), ks AS (
          SELECT vec_id AS doc_id,
                 list_cosine_similarity(
                     list_transform(embedding, x -> CAST(x AS DOUBLE)),
                     (SELECT v FROM kv)) AS c
          FROM embeddings
        ), krank AS (
          SELECT doc_id, c,
                 row_number() OVER (ORDER BY c DESC, doc_id ASC) AS r
          FROM ks QUALIFY r <= 50
        ), knorm AS (
          SELECT doc_id,
                 CASE WHEN max(c) OVER () = min(c) OVER () THEN 1.0
                      ELSE (c - min(c) OVER ())
                           / (max(c) OVER () - min(c) OVER ())
                 END AS vec
          FROM krank
        ), fused AS (
          SELECT COALESCE(b.doc_id, k.doc_id) AS doc_id,
                 0.7 * COALESCE(b.lex, 0) + 0.3 * COALESCE(k.vec, 0)
                 AS f
          FROM bnorm b FULL OUTER JOIN knorm k ON b.doc_id = k.doc_id
        )
        SELECT doc_id, round(f, 6) AS linear_score FROM fused
        ORDER BY f DESC, doc_id ASC LIMIT 10
    """,
    # Efraimidis–Spirakis A-ES weighted sample: deterministic uniform
    # from a Knuth multiplicative hash, key = u^(1/w), global top-20
    "weighted_sample": """
        WITH s AS (
          SELECT doc_id, n_chars,
                 pow(((doc_id * 2654435761) % 1000003 + 1) / 1000004.0,
                     1.0 / CAST(n_chars AS DOUBLE)) AS k
          FROM documents WHERE n_chars > 0
        )
        SELECT doc_id, n_chars, round(k, 6) AS sample_key FROM s
        ORDER BY k DESC, doc_id ASC LIMIT 20
    """,
    # distributed OLS closure over explicit partial sums — the SQL
    # mirrors the engine's (n·Σxy − Σx·Σy)/(n·Σxx − Σx²) formula
    # term-by-term so the IEEE op tree matches
    "ols_regression": """
        WITH p AS (
          SELECT event_type,
                 CAST((epoch_us(ts) // 3600000000) % 24 AS DOUBLE) AS x,
                 CAST(value AS DOUBLE) AS y
          FROM events
        ), sums AS (
          SELECT event_type, count(*)::DOUBLE AS n,
                 sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
                 sum(x * y) AS sxy, sum(y * y) AS syy
          FROM p GROUP BY event_type
        )
        SELECT event_type, CAST(n AS BIGINT) AS n,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                   AS slope,
               round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                      * sx) / n, 6) AS intercept,
               round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                     / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                   AS r2
        FROM sums ORDER BY event_type
    """,
    # ColBERT-style late interaction: docs are groups of 4 consecutive
    # embedding rows, query = vec_id 0..2, score = sum of per-query-
    # token max dot products (ES rank_vectors maxSimDotProduct)
    "late_interaction_maxsim": """
        WITH qv AS (
          SELECT vec_id AS qid,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q
          FROM embeddings WHERE vec_id < 3
        ), dv AS (
          SELECT vec_id // 4 AS group_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ), best AS (
          SELECT group_id, qid, max(list_dot_product(q, v)) AS m
          FROM dv CROSS JOIN qv GROUP BY group_id, qid
        ), pivoted AS (
          SELECT group_id,
                 (max(CASE WHEN qid = 0 THEN m END)
                  + max(CASE WHEN qid = 1 THEN m END))
                 + max(CASE WHEN qid = 2 THEN m END) AS f
          FROM best GROUP BY group_id
        )
        SELECT group_id, round(f, 6) AS maxsim_score FROM pivoted
        ORDER BY f DESC, group_id ASC LIMIT 10
    """,
    # Gopher repetition signals: top-unigram / top-bigram coverage
    # fractions per document
    "gopher_repetition": """
        WITH t AS (
          SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
                                                           '[^a-z0-9]+'),
                         x -> x <> '') AS arr
          FROM documents
        ), uc AS (
          SELECT doc_id, tok, count(*) AS c
          FROM (SELECT doc_id, unnest(arr) AS tok FROM t)
          GROUP BY 1, 2
        ), topu AS (
          SELECT doc_id, max(c) AS mu FROM uc GROUP BY 1
        ), bc AS (
          SELECT doc_id, bg, count(*) AS c
          FROM (SELECT doc_id,
                       unnest([arr[j] || ' ' || arr[j+1]
                               FOR j IN generate_series(1, len(arr) - 1)])
                           AS bg
                FROM t WHERE len(arr) >= 2)
          GROUP BY 1, 2
        ), topb AS (
          SELECT doc_id, max(c) AS mb FROM bc GROUP BY 1
        )
        SELECT t.doc_id, len(t.arr)::BIGINT AS n_tokens,
               topu.mu::BIGINT AS top_unigram,
               COALESCE(topb.mb, 0)::BIGINT AS top_bigram,
               topu.mu::DOUBLE / len(t.arr) AS top_unigram_frac,
               (2 * COALESCE(topb.mb, 0))::DOUBLE / len(t.arr)
                   AS top_bigram_frac
        FROM t JOIN topu USING (doc_id) LEFT JOIN topb USING (doc_id)
        WHERE len(t.arr) > 0
        ORDER BY t.doc_id
    """,
    # PII scrub over deterministically derived log lines (the driver
    # tables embed no literal PII — same convention as geoip_enrichment)
    "pii_scrub": r"""
        WITH e AS (
          SELECT event_type, user_id, event_id,
                 CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)
                     AS k
          FROM events
        ), l AS (
          SELECT event_type,
                 'user ' || CAST(user_id AS VARCHAR) || ' <u'
                 || CAST(user_id AS VARCHAR) || '@example.org> from 10.'
                 || CAST(k % 256 AS VARCHAR) || '.'
                 || CAST(user_id % 256 AS VARCHAR) || '.'
                 || CAST(1 + event_id % 254 AS VARCHAR)
                 || ' tel +1-555-'
                 || lpad(CAST(k % 10000 AS VARCHAR), 4, '0')
                 || ' ' || event_type AS line
          FROM e
        ), s AS (
          SELECT event_type,
                 len(regexp_extract_all(line,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                     AS n_emails,
                 len(regexp_extract_all(line, '\+\d[\d-]{6,}\d'))
                     AS n_phones,
                 len(regexp_extract_all(line,
                     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
                 length(regexp_replace(regexp_replace(regexp_replace(
                     line,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                     '<EMAIL>', 'g'),
                     '\+\d[\d-]{6,}\d', '<PHONE>', 'g'),
                     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                     '<IP>', 'g')) AS scrubbed
          FROM l
        )
        SELECT event_type, count(*)::BIGINT AS n,
               sum(n_emails)::BIGINT AS n_emails,
               sum(n_phones)::BIGINT AS n_phones,
               sum(n_ips)::BIGINT AS n_ips,
               sum(scrubbed)::BIGINT AS scrubbed_chars
        FROM s GROUP BY event_type ORDER BY event_type
    """,
    # ES bucket_selector (HAVING over the agg DSL): daily buckets above
    # the day-mean count
    "bucket_selector": """
        WITH d AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day, count(*)::BIGINT AS n
          FROM events GROUP BY 1
        )
        SELECT day, n FROM d
        WHERE n > (SELECT avg(n) FROM d)
        ORDER BY day
    """,
    # ES serial_diff with lag=7 over the daily histogram
    "serial_diff": """
        WITH d AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day, count(*)::BIGINT AS n
          FROM events GROUP BY 1
        )
        SELECT day, n,
               CAST(n - lag(n, 7) OVER (ORDER BY day) AS DOUBLE) AS diff7
        FROM d ORDER BY day
    """,
    # ES derivative pipeline agg over the daily histogram: first bucket
    # NULL, later buckets day-over-day count delta
    "events_derivative": """
        WITH d AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day, count(*)::BIGINT AS n
          FROM events GROUP BY 1
        )
        SELECT day, n,
               CAST(n - lag(n) OVER (ORDER BY day) AS DOUBLE)
                   AS derivative
        FROM d ORDER BY day
    """,
    # as-of join: each event matched to the most recent strictly-prior
    # 'error' event of the same user, rolled up per event type
    "asof_join": """
        WITH m AS (
          SELECT e.event_type,
                 (SELECT max(r.ts) FROM events r
                  WHERE r.user_id = e.user_id
                    AND r.event_type = 'error'
                    AND r.ts < e.ts) AS prev_err,
                 e.ts
          FROM events e
        )
        SELECT event_type, count(*)::BIGINT AS n,
               count(prev_err)::BIGINT AS n_matched,
               CASE WHEN count(prev_err) > 0 THEN
                 CAST(sum(epoch_us(ts) - epoch_us(prev_err)) AS DOUBLE)
                 / count(prev_err)
               END AS avg_us_since_error
        FROM m GROUP BY event_type ORDER BY event_type
    """,
    # range join: distinct per-user error windows [ts, ts+10min) x all
    # events of the same user inside the window, aggregated per window
    "range_join": """
        WITH e AS (
          SELECT user_id, event_type, epoch_us(ts) AS ts_us,
                 CAST(round(value * 1000000, 0) AS BIGINT) AS v
          FROM events
        ), w AS (
          SELECT DISTINCT user_id, ts_us AS wstart
          FROM e WHERE event_type = 'error'
        )
        SELECT w.user_id, w.wstart AS wstart_us,
               count(*)::BIGINT AS n_events,
               CAST(sum(e.v) AS BIGINT) AS sum_micro
        FROM w JOIN e ON e.user_id = w.user_id
                     AND e.ts_us >= w.wstart
                     AND e.ts_us < w.wstart + 600000000
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    # gap-based sessionization: >30-minute gaps split a user's events
    "sessionize": """
        WITH e AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > 1800000000
                      THEN 1 ELSE 0 END AS new_s
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
          SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM e
        ), g AS (
          SELECT user_id, sid, count(*) AS n_ev,
                 epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
          FROM s GROUP BY 1, 2
        )
        SELECT user_id, count(*)::BIGINT AS n_sessions,
               sum(n_ev)::BIGINT AS n_events,
               max(n_ev)::BIGINT AS longest_session_events,
               sum(dur_us)::BIGINT AS total_session_us
        FROM g GROUP BY user_id ORDER BY user_id
    """,
    # training-shard export summary: same multiplicative-hash shard
    # assignment and (h, doc_id) order arithmetic as the writer
    "training_shards": """
        WITH a AS (
          SELECT doc_id, n_chars,
                 (doc_id * 2654435761) % 8 AS shard_id,
                 (doc_id * 40503) % 65536 AS h
          FROM documents
        )
        SELECT shard_id::BIGINT AS shard_id, count(*)::BIGINT AS n_docs,
               sum(n_chars)::BIGINT AS total_chars,
               arg_min(doc_id, h * 1000000 + doc_id)::BIGINT AS first_doc,
               arg_max(doc_id, h * 1000000 + doc_id)::BIGINT AS last_doc
        FROM a GROUP BY shard_id ORDER BY shard_id
    """,
    "duplicate_spans": """
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text),
                                                   '[^a-z0-9]+'),
                             x -> x <> '') AS arr
          FROM documents
        ), g AS (
          SELECT doc_id,
                 unnest(generate_series(1, len(arr) - 2)) AS i,
                 unnest([arr[j] || ' ' || arr[j+1] || ' ' || arr[j+2]
                         FOR j IN generate_series(1, len(arr) - 2)]) AS sh
          FROM t WHERE len(arr) >= 3
        ), dup AS (
          SELECT sh FROM g GROUP BY sh HAVING count(DISTINCT doc_id) >= 2
        ), m AS (
          SELECT g.doc_id, g.i FROM g JOIN dup USING (sh)
        ), cov AS (
          SELECT doc_id, count(DISTINCT tt) AS dup_tokens
          FROM (SELECT doc_id, unnest(generate_series(i, i + 2)) AS tt
                FROM m)
          GROUP BY doc_id
        )
        SELECT c.doc_id, c.dup_tokens, len(t.arr) AS n_tokens,
               c.dup_tokens::DOUBLE / len(t.arr) AS dup_ratio
        FROM cov c JOIN t USING (doc_id)
        ORDER BY c.doc_id
    """,
    "ngram_jaccard_dupes": """
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text),
                                                   '[^a-z0-9]+'),
                             x -> x <> '') AS arr
          FROM documents
        ), g AS (
          SELECT doc_id,
                 unnest([arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]
                         FOR i IN generate_series(1, len(arr) - 2)]) AS sh
          FROM t WHERE len(arr) >= 3
        ), gd AS (
          SELECT DISTINCT doc_id, sh FROM g
        ), sz AS (
          SELECT doc_id, count(*) AS n FROM gd GROUP BY 1
        ), p AS (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
          FROM gd x JOIN gd y ON x.sh = y.sh AND x.doc_id < y.doc_id
          GROUP BY 1, 2
        )
        SELECT p.a, p.b,
               inter::DOUBLE / (sa.n + sb.n - inter) AS jaccard
        FROM p JOIN sz sa ON p.a = sa.doc_id JOIN sz sb ON p.b = sb.doc_id
        WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= 0.5
        ORDER BY a, b
    """,
    # containment (inter / min size) near-dup pairs — same shingle CTEs
    # as the jaccard oracle, asymmetric-subset formula, threshold 0.8
    "ngram_containment_dupes": """
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text),
                                                   '[^a-z0-9]+'),
                             x -> x <> '') AS arr
          FROM documents
        ), g AS (
          SELECT doc_id,
                 unnest([arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]
                         FOR i IN generate_series(1, len(arr) - 2)]) AS sh
          FROM t WHERE len(arr) >= 3
        ), gd AS (
          SELECT DISTINCT doc_id, sh FROM g
        ), sz AS (
          SELECT doc_id, count(*) AS n FROM gd GROUP BY 1
        ), p AS (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
          FROM gd x JOIN gd y ON x.sh = y.sh AND x.doc_id < y.doc_id
          GROUP BY 1, 2
        )
        SELECT p.a, p.b,
               inter::DOUBLE / least(sa.n, sb.n) AS containment
        FROM p JOIN sz sa ON p.a = sa.doc_id JOIN sz sb ON p.b = sb.doc_id
        WHERE inter::DOUBLE / least(sa.n, sb.n) >= 0.8
        ORDER BY a, b
    """,
    # connected components over the jaccard dup pairs: transitive closure
    # via a recursive CTE, cluster = min reachable id — exact (the pair
    # set at test scale is tiny; the closure is only oracle-side)
    "dedup_clusters": """
        WITH RECURSIVE t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text),
                                                   '[^a-z0-9]+'),
                             x -> x <> '') AS arr
          FROM documents
        ), g AS (
          SELECT doc_id,
                 unnest([arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]
                         FOR i IN generate_series(1, len(arr) - 2)]) AS sh
          FROM t WHERE len(arr) >= 3
        ), gd AS (
          SELECT DISTINCT doc_id, sh FROM g
        ), sz AS (
          SELECT doc_id, count(*) AS n FROM gd GROUP BY 1
        ), p AS (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
          FROM gd x JOIN gd y ON x.sh = y.sh AND x.doc_id < y.doc_id
          GROUP BY 1, 2
        ), dup AS (
          SELECT p.a, p.b
          FROM p JOIN sz sa ON p.a = sa.doc_id
                 JOIN sz sb ON p.b = sb.doc_id
          WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= 0.5
        ), e AS (
          SELECT a AS s, b AS t FROM dup
          UNION SELECT b, a FROM dup
        ), r(s, t) AS (
          SELECT s, t FROM e
          UNION
          SELECT r.s, e.t FROM r JOIN e ON r.t = e.s
        )
        SELECT s AS doc_id, least(s, min(t))::BIGINT AS cluster_id
        FROM r GROUP BY s ORDER BY doc_id
    """,
    # per-label embedding centroids (the k-means/IVF training aggregate);
    # float64 accumulation both sides, rounded to 6 in the projection
    "embedding_centroids": """
        SELECT label, dim, round(avg(CAST(val AS DOUBLE)), 6) AS mean_val
        FROM (SELECT label, unnest(embedding) AS val,
                     generate_subscripts(embedding, 1) AS dim
              FROM embeddings)
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    # C4-style quality filter: first-failing-rule verdicts, all-integer
    # comparisons (shared definition with queries.py q_quality_filter)
    "quality_filter": r"""
        WITH m AS (
          SELECT length(lower(text)) AS n_chars,
                 len(regexp_extract_all(lower(text), '[a-z]')) AS n_alpha,
                 len(regexp_extract_all(lower(text), '[0-9]')) AS n_digit,
                 len(regexp_extract_all(lower(text),
                     '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS n_stop
          FROM documents
        )
        SELECT CASE
                 WHEN n_chars < 200 THEN 'too_short'
                 WHEN n_alpha * 10 < n_chars * 6 THEN 'low_alpha'
                 WHEN n_digit * 10 > n_chars * 3 THEN 'high_digit'
                 WHEN n_stop = 0 THEN 'no_stopword'
                 ELSE 'kept' END AS verdict,
               count(*)::BIGINT AS n_docs
        FROM m GROUP BY 1 ORDER BY verdict
    """,
    # the composed pipeline: quality filter -> exact dedup (min doc_id
    # per text) -> BM25 over the cleaned corpus with its own stats
    "clean_corpus_search": r"""
        WITH m AS (
          SELECT doc_id, text,
                 length(lower(text)) AS n_chars,
                 len(regexp_extract_all(lower(text), '[a-z]')) AS n_alpha,
                 len(regexp_extract_all(lower(text), '[0-9]')) AS n_digit,
                 len(regexp_extract_all(lower(text),
                     '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS n_stop
          FROM documents
        ), kept AS (
          SELECT doc_id, text FROM m
          WHERE n_chars >= 200 AND n_alpha * 10 >= n_chars * 6
            AND n_digit * 10 <= n_chars * 3 AND n_stop > 0
        ), uniq AS (
          SELECT min(doc_id) AS doc_id FROM kept GROUP BY text
        ), d2 AS (
          SELECT kept.doc_id, kept.text FROM kept JOIN uniq USING (doc_id)
        ), tr AS (
          SELECT doc_id,
                 lower(regexp_replace(regexp_replace(text,
                     '([A-Z]+)([A-Z][a-z])', '\1 \2', 'g'),
                     '([a-z0-9])([A-Z])', '\1 \2', 'g')) AS s
          FROM d2
        ), tok AS (
          SELECT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        ), tf AS (
          SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
          GROUP BY 1, 2
        ), dl AS (
          SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1
        ), stats AS (
          SELECT (SELECT count(*)::DOUBLE FROM d2) AS n,
                 (SELECT count(*)::DOUBLE FROM tok) /
                 (SELECT count(*)::DOUBLE FROM d2) AS avgdl
        ), q(term) AS (VALUES ('error'), ('merge'), ('spark'),
                              ('window')),
        df AS (
          SELECT term, count(*)::DOUBLE AS df FROM tf
          WHERE term IN (SELECT term FROM q) GROUP BY 1
        ), scores AS (
          SELECT tf.doc_id,
                 sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * (1.2 + 1)
                     / (tf.tf + 1.2 * (1 - 0.75
                                       + 0.75 * dl.dl / stats.avgdl))
                 ) AS score
          FROM tf
          JOIN q USING (term) JOIN df USING (term) JOIN dl USING (doc_id)
          CROSS JOIN stats
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
    """,
    "corpus_card": r"""
        WITH m AS (
          SELECT doc_id, lang, text,
                 length(lower(text)) AS n_chars,
                 len(regexp_extract_all(lower(text), '[a-z]')) AS n_alpha,
                 len(regexp_extract_all(lower(text), '[0-9]')) AS n_digit,
                 len(regexp_extract_all(lower(text),
                     '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS n_stop,
                 len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tok
          FROM documents
        )
        SELECT (SELECT count(*) FROM m)::BIGINT AS n_docs,
               (SELECT count(DISTINCT text) FROM m)::BIGINT
                   AS n_unique_texts,
               (SELECT count(*) FROM m
                WHERE n_chars >= 200 AND n_alpha * 10 >= n_chars * 6
                  AND n_digit * 10 <= n_chars * 3
                  AND n_stop > 0)::BIGINT AS n_quality_kept,
               (SELECT sum(n_tok) FROM m)::BIGINT AS total_tokens,
               (SELECT count(DISTINCT lang) FROM m)::BIGINT AS n_langs
    """,
    # unigram-LM surprisal (perplexity-proxy quality score); engine and
    # SQL both round the mean to 6 before the ordering tie-break
    "unigram_surprisal": f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), tok AS (
          SELECT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        ), cnt AS (
          SELECT term, count(*)::DOUBLE AS n FROM tok GROUP BY 1
        ), tot AS (
          SELECT count(*)::DOUBLE AS t FROM tok
        ), sc AS (
          SELECT tok.doc_id,
                 round(sum(-ln(cnt.n / tot.t)) / count(*), 6)
                     AS avg_surprisal
          FROM tok JOIN cnt USING (term) CROSS JOIN tot
          GROUP BY tok.doc_id
        )
        SELECT doc_id, avg_surprisal FROM sc
        ORDER BY avg_surprisal DESC, doc_id ASC LIMIT 20
    """,
    "lang_id_confusion": r"""
        WITH s AS (
          SELECT doc_id, 'de' AS cand,
                 len(regexp_extract_all(lower(text),
                     '\b(der|die|und|nicht|das)\b')) AS sc FROM documents
          UNION ALL SELECT doc_id, 'en',
                 len(regexp_extract_all(lower(text),
                     '\b(the|and|of|is|to)\b')) FROM documents
          UNION ALL SELECT doc_id, 'es',
                 len(regexp_extract_all(lower(text),
                     '\b(el|la|de|que|los)\b')) FROM documents
          UNION ALL SELECT doc_id, 'fr',
                 len(regexp_extract_all(lower(text),
                     '\b(le|la|et|les|des)\b')) FROM documents
          UNION ALL SELECT doc_id, 'zh',
                 len(regexp_extract_all(lower(text),
                     '\b(de|shi|le|wo|zai)\b')) FROM documents
        ), best AS (
          SELECT doc_id, cand,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY sc DESC, cand ASC) AS rn
          FROM s
        )
        SELECT d.lang, b.cand AS predicted_lang, count(*)::BIGINT AS n
        FROM best b JOIN documents d USING (doc_id)
        WHERE b.rn = 1 GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "quality_by_lang": r"""
        SELECT lang, count(*)::BIGINT AS n_docs,
               sum(length(lower(text)))::BIGINT AS total_chars,
               sum(len(regexp_extract_all(lower(text), '[a-z]')))::BIGINT
                   AS total_alpha,
               sum(len(regexp_extract_all(lower(text), '[0-9]')))::BIGINT
                   AS total_digit,
               sum(len(regexp_extract_all(lower(text),
                   '[a-z0-9]+')))::BIGINT AS total_tokens,
               sum(len(regexp_extract_all(lower(text),
                   '\b(the|a|an|and|or|of|to|in|is|it)\b')))::BIGINT
                   AS total_stopwords
        FROM documents GROUP BY 1 ORDER BY lang
    """,
    "bpe_token_stats": r"""
        SELECT source, count(*)::BIGINT AS n_docs,
               sum(len(regexp_extract_all(text,
                   '''[a-z]+| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9'']+'
                   )))::BIGINT AS total_bpe_tokens
        FROM documents GROUP BY 1 ORDER BY source
    """,
    "token_stats": """
        SELECT source, count(*)::BIGINT AS n_docs,
               sum(len(regexp_extract_all(lower(text),
                   '[a-z0-9]+')))::BIGINT AS total_tokens,
               sum(n_chars)::BIGINT AS total_chars
        FROM documents GROUP BY 1 ORDER BY source
    """,
    "fingerprint_minmd5": """
        SELECT doc_id,
               CASE WHEN length(text) <= 8 THEN md5(text)
                    ELSE list_min([md5(substring(text, i, 8))
                                   FOR i IN generate_series(
                                       1, length(text) - 7)])
               END AS fingerprint
        FROM documents ORDER BY doc_id
    """,
    # ES scroll/reindex-with-query analog: all docs containing any query
    # term, with sha256(text) proving export round-trip integrity
    # remote line source round-trip: line-per-doc render (newline runs
    # flattened to one space), read back through the chunk-parallel
    # datasource in byte order == doc_id order, strip + drop-empty
    # whole-file read util round-trip: per-doc file (flattened text),
    # read back WHOLE through the transport; size = UTF-8 byte length
    "whole_file_read": r"""
        SELECT doc_id,
               octet_length(encode(regexp_replace(text, '[\r\n]+', ' ',
                                                  'g'))) AS size,
               regexp_replace(text, '[\r\n]+', ' ', 'g') AS content
        FROM documents WHERE doc_id < 50 ORDER BY doc_id
    """,
    # display normalizer: escape to the reference's literal-\n shape,
    # then strip (Python str.strip char set) + expand + '%2d: ' prefix.
    # DuckDB regular strings don't interpret escapes, so '\n' below is
    # the two-char literal; chr(10) is the real newline.
    "display_normalize": r"""
        SELECT doc_id,
               printf('%2d', doc_id + 1) || ': ' ||
               replace(trim(replace(text, chr(10), '\n'),
                            ' ' || chr(9) || chr(10) || chr(13) ||
                            chr(11) || chr(12)),
                       '\n', chr(10)) AS display
        FROM documents WHERE doc_id < 500 ORDER BY doc_id
    """,
    "remote_tail_lines": r"""
        SELECT line FROM (
          SELECT doc_id,
                 trim(regexp_replace(text, '[\r\n]+', ' ', 'g')) AS line
          FROM documents WHERE doc_id < 200
        ) WHERE line <> '' ORDER BY doc_id
    """,
    "scroll_export": f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), m AS (
          SELECT DISTINCT doc_id
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE substr(t, 1, 64) IN ('error', 'merge', 'spark', 'window')
        )
        SELECT d.doc_id, d.lang, sha256(d.text) AS sha256
        FROM documents d JOIN m USING (doc_id)
        ORDER BY d.doc_id
    """,
    # pre-filtered kNN (ES knn with filter): restrict BEFORE scoring
    "embedding_knn_filtered": """
        WITH q AS (
          SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id = 0
        ), scored AS (
          SELECT vec_id,
                 list_cosine_similarity(
                     list_transform(embedding, x -> CAST(x AS DOUBLE)),
                     (SELECT qv FROM q)) AS c
          FROM embeddings WHERE label <= 4
        )
        SELECT vec_id, round(c, 6) AS cosine FROM scored
        ORDER BY c DESC, vec_id ASC LIMIT 10
    """,
    "embedding_knn": """
        WITH q AS (
          SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id = 0
        ), scored AS (
          SELECT vec_id,
                 list_cosine_similarity(
                     list_transform(embedding, x -> CAST(x AS DOUBLE)),
                     (SELECT qv FROM q)) AS c
          FROM embeddings
        )
        SELECT vec_id, round(c, 6) AS cosine FROM scored
        ORDER BY c DESC, vec_id ASC LIMIT 10
    """,
    # kNN with a similarity cutoff: top-25, then cosine >= 0.24
    "knn_similarity_cutoff": """
        WITH q AS (
          SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id = 0
        ), scored AS (
          SELECT vec_id,
                 list_cosine_similarity(
                     list_transform(embedding, x -> CAST(x AS DOUBLE)),
                     (SELECT qv FROM q)) AS c
          FROM embeddings
        ), top AS (
          SELECT vec_id, c FROM scored
          ORDER BY c DESC, vec_id ASC LIMIT 25
        )
        SELECT vec_id, round(c, 6) AS cosine FROM top
        WHERE c >= 0.24 ORDER BY c DESC, vec_id ASC
    """,
    # batched multi-query kNN: queries 0..4, per-query top-10
    "embedding_knn_batch": """
        WITH q AS (
          SELECT vec_id AS query_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id < 5
        ), scored AS (
          SELECT q.query_id, e.vec_id,
                 list_cosine_similarity(
                     list_transform(e.embedding,
                                    x -> CAST(x AS DOUBLE)), q.qv) AS c
          FROM embeddings e CROSS JOIN q
        ), ranked AS (
          SELECT query_id, vec_id, c,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY c DESC, vec_id ASC) AS rn
          FROM scored
        )
        SELECT query_id, vec_id, round(c, 6) AS cosine FROM ranked
        WHERE rn <= 10 ORDER BY query_id, c DESC, vec_id
    """,
    "session_duration": """
        SELECT user_id, count(*)::BIGINT AS n_events,
               CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000
                    AS BIGINT) AS elapsed_s
        FROM events GROUP BY 1 ORDER BY user_id
    """,
    "highest_severity_event": f"""
        WITH p AS (
          SELECT user_id, event_id, event_type, ts,
                 {_SEVERITY_CASE} AS priority,
                 row_number() OVER (
                     PARTITION BY user_id
                     ORDER BY {_SEVERITY_CASE}, ts, event_id) AS rn
          FROM events
        )
        SELECT user_id, event_id, event_type, priority::BIGINT AS priority
        FROM p WHERE rn = 1 ORDER BY user_id
    """,
    "alert_format": """
        SELECT event_id,
               '[CRITICAL] user=' || CAST(user_id AS VARCHAR) ||
               ' props=' || substring(coalesce(props, ''), 1, 100)
                   AS message
        FROM events WHERE event_type = 'error' ORDER BY event_id
    """,
    "ip_classification": r"""
        WITH x AS (
          SELECT lang,
                 unnest(regexp_extract_all(text,
                     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS ip
          FROM documents
        ), c AS (
          SELECT lang,
                 CAST(string_split(ip, '.')[1] AS INT) AS o1,
                 CAST(string_split(ip, '.')[2] AS INT) AS o2,
                 CAST(string_split(ip, '.')[3] AS INT) AS o3,
                 CAST(string_split(ip, '.')[4] AS INT) AS o4
          FROM x
        ), v AS (
          SELECT lang,
                 CASE WHEN o1 > 255 OR o2 > 255 OR o3 > 255 OR o4 > 255
                      THEN NULL
                      WHEN o1 = 10 OR (o1 = 172 AND o2 BETWEEN 16 AND 31)
                           OR (o1 = 192 AND o2 = 168) OR o1 = 127
                           OR (o1 = 169 AND o2 = 254)
                      THEN 1 ELSE 0 END AS is_priv
          FROM c
        ), agg AS (
          SELECT lang, count(*) AS total_ips,
                 sum(CASE WHEN is_priv = 1 THEN 1 ELSE 0 END)
                     AS total_private,
                 sum(CASE WHEN is_priv = 0 THEN 1 ELSE 0 END)
                     AS total_public
          FROM v GROUP BY 1
        )
        SELECT d.lang, coalesce(a.total_ips, 0)::BIGINT AS total_ips,
               coalesce(a.total_private, 0)::BIGINT AS total_private,
               coalesce(a.total_public, 0)::BIGINT AS total_public
        FROM (SELECT DISTINCT lang FROM documents) d
        LEFT JOIN agg a USING (lang)
        ORDER BY d.lang
    """,
    "sampled_severity_histogram": f"""
        SELECT event_type, {_SEVERITY_CASE} AS priority,
               count(*)::BIGINT AS n
        FROM events WHERE event_id % 16 = 0
        GROUP BY 1, 2 ORDER BY priority
    """,
    "alert_sink": f"""
        SELECT event_id, {_SEVERITY_CASE} AS priority,
               '[' || CASE {_SEVERITY_CASE} WHEN 1 THEN 'CRITICAL'
                      ELSE 'HIGH' END ||
               '] user=' || CAST(user_id AS VARCHAR) ||
               ' props=' || substring(coalesce(props, ''), 1, 100)
                   AS message
        FROM events WHERE {_SEVERITY_CASE} <= 2 ORDER BY event_id
    """,
    # nested build→explode→aggregate reduces to a flat group-by over the
    # same rows (the nesting is the Ray pipeline's work, not the math's)
    "nested_severity_histogram": f"""
        SELECT event_type, {_SEVERITY_CASE} AS priority,
               count(*)::BIGINT AS n,
               count(DISTINCT user_id)::BIGINT AS n_docs
        FROM events GROUP BY 1, 2 ORDER BY priority
    """,
    "geoip_enrichment": """
        WITH e AS (
          SELECT event_id, user_id,
                 CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)
                     AS k
          FROM events
        ), raw AS (
          SELECT event_id,
                 CASE user_id % 5 WHEN 0 THEN 10 WHEN 1 THEN 172
                      WHEN 2 THEN 192 WHEN 3 THEN 52 ELSE 98 END AS o1,
                 CASE user_id % 5 WHEN 1 THEN 16 + (k % 16)
                      WHEN 2 THEN 168 ELSE k % 256 END AS o2,
                 user_id % 256 AS o3,
                 1 + (k % 254) AS o4
          FROM e
          UNION ALL
          SELECT event_id,
                 CASE event_id % 2 WHEN 0 THEN 8 ELSE 127 END,
                 (event_id // 7) % 256, k % 256, 1 + (event_id % 254)
          FROM e
        ), pub AS (
          SELECT DISTINCT event_id, o1, o2, o3,
                 CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.'
                   || CAST(o3 AS VARCHAR) || '.' || CAST(o4 AS VARCHAR)
                     AS ip
          FROM raw
          WHERE NOT (o1 = 10 OR (o1 = 172 AND o2 BETWEEN 16 AND 31)
                     OR (o1 = 192 AND o2 = 168) OR o1 = 127
                     OR (o1 = 169 AND o2 = 254))
        ), cc AS (
          SELECT event_id, ip,
                 list_extract(['US','DE','KR','JP','BR','IN','FR','GB'],
                              1 + (o1*7 + o2*13 + o3*31) % 8)
                     AS country_code
          FROM pub
        ), per_ip AS (
          SELECT country_code, ip, count(*) AS n
          FROM cc GROUP BY 1, 2
        ), ranked AS (
          SELECT country_code, ip || ' (' || country_code || ')' AS top_ip,
                 row_number() OVER (PARTITION BY country_code
                                    ORDER BY n DESC, ip ASC) AS rn
          FROM per_ip
        )
        SELECT p.country_code, CAST(sum(p.n) AS BIGINT) AS n_ips,
               count(*)::BIGINT AS n_uniq_ips, any_value(r.top_ip) AS top_ip
        FROM per_ip p
        JOIN (SELECT country_code, top_ip FROM ranked WHERE rn = 1) r
          USING (country_code)
        GROUP BY 1 ORDER BY 1
    """,
    "geo_distance_agg": """__GEO_BASE__
        SELECT CASE
                 WHEN d2 < 4000000 THEN 'ring_0_under_20deg'
                 WHEN d2 < 36000000 THEN 'ring_1_20_to_60deg'
                 WHEN d2 < 144000000 THEN 'ring_2_60_to_120deg'
                 ELSE 'ring_3_over_120deg' END AS bucket,
               count(*)::BIGINT AS n,
               count(DISTINCT ip)::BIGINT AS n_uniq_ips
        FROM (SELECT ip, (lat_cd - 5011)*(lat_cd - 5011)
                         + (lon_cd - 864)*(lon_cd - 864) AS d2 FROM geo)
        GROUP BY 1 ORDER BY 1
    """,
    "geohash_grid_agg": """__GEO_BASE__
        , cells AS (SELECT __GH_CL__ AS cl, __GH_CT__ AS ct FROM geo),
        codes AS (SELECT __GH_CODE__ AS code FROM cells)
        SELECT __GH_CHARS__ AS gh, count(*)::BIGINT AS n
        FROM codes GROUP BY 1 ORDER BY n DESC, gh ASC LIMIT 15
    """,
    "geotile_grid_agg": """__GEO_BASE__
        , t AS (
          SELECT CAST(((lon_cd + 18000) * 16) // 36000 AS BIGINT) AS x,
                 CAST(least(greatest(
                     floor((1 - ln(tan(lat_cd / 100.0 * (pi() / 180))
                                   + 1 / cos(lat_cd / 100.0
                                             * (pi() / 180)))
                            / pi()) / 2 * 16),
                     0), 15) AS BIGINT) AS y
          FROM geo
        )
        SELECT '4/' || CAST(x AS VARCHAR) || '/' || CAST(y AS VARCHAR)
                   AS tile,
               count(*)::BIGINT AS n
        FROM t GROUP BY 1 ORDER BY n DESC, tile ASC LIMIT 15
    """,
    "geo_centroid_agg": """__GEO_BASE__
        SELECT country_code AS cc, count(*)::BIGINT AS n,
               CAST(sum(lat_cd) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   / 100.0 AS centroid_lat,
               CAST(sum(lon_cd) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   / 100.0 AS centroid_lon
        FROM geo GROUP BY 1 ORDER BY 1
    """,
    "geo_bounds_agg": """__GEO_BASE__
        SELECT country_code AS cc, count(*)::BIGINT AS n,
               min(lat_cd)::BIGINT AS min_lat_cd,
               max(lat_cd)::BIGINT AS max_lat_cd,
               min(lon_cd)::BIGINT AS min_lon_cd,
               max(lon_cd)::BIGINT AS max_lon_cd
        FROM geo GROUP BY 1 ORDER BY 1
    """,
    "multimodal_stats": """
        SELECT lang, count(*)::BIGINT AS n,
               sum(octet_length(encode(text)))::BIGINT AS total_bytes,
               sum(octet_length(encode(text)) % 640 + 1)::BIGINT
                   AS total_width,
               sum((octet_length(encode(text)) // 640) % 480 + 1)::BIGINT
                   AS total_height
        FROM documents GROUP BY 1 ORDER BY lang
    """,
}


# Shared geo CTE prefix: the deterministic IP derivation (the same octet
# arithmetic as queries._derive_ip_lines), public-IP filter, and the
# city-level lookup's integer centi-degree coordinates
# (stages/geoip._fake_city_lookup).
_GEO_BASE = """
        WITH e AS (
          SELECT event_id, user_id,
                 CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)
                     AS k
          FROM events
        ), raw AS (
          SELECT event_id,
                 CASE user_id % 5 WHEN 0 THEN 10 WHEN 1 THEN 172
                      WHEN 2 THEN 192 WHEN 3 THEN 52 ELSE 98 END AS o1,
                 CASE user_id % 5 WHEN 1 THEN 16 + (k % 16)
                      WHEN 2 THEN 168 ELSE k % 256 END AS o2,
                 user_id % 256 AS o3, 1 + (k % 254) AS o4
          FROM e
          UNION ALL
          SELECT event_id,
                 CASE event_id % 2 WHEN 0 THEN 8 ELSE 127 END,
                 (event_id // 7) % 256, k % 256, 1 + (event_id % 254)
          FROM e
        ), pub AS (
          SELECT DISTINCT event_id, o1, o2, o3, o4,
                 CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.'
                   || CAST(o3 AS VARCHAR) || '.' || CAST(o4 AS VARCHAR)
                     AS ip
          FROM raw
          WHERE NOT (o1 = 10 OR (o1 = 172 AND o2 BETWEEN 16 AND 31)
                     OR (o1 = 192 AND o2 = 168) OR o1 = 127
                     OR (o1 = 169 AND o2 = 254))
        ), geo AS (
          SELECT event_id, ip,
                 list_extract(['US','DE','KR','JP','BR','IN','FR','GB'],
                              1 + (o1*7 + o2*13 + o3*31) % 8)
                     AS country_code,
                 (o1*131 + o2*17 + o3*3 + o4) % 17000 - 8500 AS lat_cd,
                 (o1*31 + o2*101 + o3*7 + o4*11) % 36000 - 18000 AS lon_cd
          FROM pub
        )
"""


def _expand_geo_placeholders() -> None:
    """Fill the geo oracles' placeholders: the shared CTE prefix and the
    unrolled geohash bit-interleave generated by stages/geo.geohash_sql
    (the SAME generator the engine kernel is tested against)."""
    from ..stages.geo import geohash_sql

    cl, ct, code, chars = geohash_sql(precision=3)
    for key in ("geo_distance_agg", "geohash_grid_agg",
                "geotile_grid_agg", "geo_centroid_agg", "geo_bounds_agg"):
        sql = ORACLE_SQL[key]
        sql = sql.replace("__GEO_BASE__", _GEO_BASE)
        sql = (sql.replace("__GH_CL__", cl).replace("__GH_CT__", ct)
               .replace("__GH_CODE__", code).replace("__GH_CHARS__", chars))
        ORACLE_SQL[key] = sql


_expand_geo_placeholders()


# ES missing / global / date_range / ip_range / cumulative_cardinality /
# PIT — appended post-dict (they reuse _GEO_BASE and the BM25 template).
ORACLE_SQL["missing_agg"] = _GEO_BASE + """
        , per AS (SELECT DISTINCT event_id, country_code FROM geo),
        cnt AS (SELECT country_code AS bucket, count(*)::BIGINT AS n
                FROM per GROUP BY 1),
        miss AS (SELECT '__missing__' AS bucket,
                 ((SELECT count(*) FROM events)
                  - (SELECT count(DISTINCT event_id) FROM geo))::BIGINT
                     AS n)
        SELECT * FROM (SELECT * FROM cnt UNION ALL SELECT * FROM miss)
        WHERE n > 0 ORDER BY bucket
"""

ORACLE_SQL["global_agg"] = """
        WITH m AS (SELECT event_type,
                          CAST(round(value * 1e6, 0) AS BIGINT) AS micro
                   FROM events),
        scopes AS (
          SELECT 'query' AS scope, count(*)::BIGINT AS n,
                 CAST(sum(micro) AS BIGINT) AS sum_value_micro
          FROM m WHERE event_type = 'error'
          UNION ALL
          SELECT 'global', count(*)::BIGINT, CAST(sum(micro) AS BIGINT)
          FROM m)
        SELECT scope, n, sum_value_micro,
               CAST(sum_value_micro AS DOUBLE) / CAST(n AS DOUBLE) / 1e6
                   AS avg_value
        FROM scopes ORDER BY scope
"""

ORACLE_SQL["date_range_agg"] = """
        WITH m AS (
          SELECT CASE WHEN ts < TIMESTAMP '2024-01-10'
                        THEN 'r0_before_jan10'
                      WHEN ts < TIMESTAMP '2024-01-20'
                        THEN 'r1_jan10_to_jan20'
                      ELSE 'r2_from_jan20' END AS bucket,
                 CAST(round(value * 1e6, 0) AS BIGINT) AS micro
          FROM events)
        SELECT bucket, count(*)::BIGINT AS n,
               CAST(sum(micro) AS BIGINT) AS sum_value_micro
        FROM m GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["ip_range_agg"] = _GEO_BASE + """
        , num AS (
          SELECT ip, o1*16777216 + o2*65536 + o3*256 + o4 AS v
          FROM (SELECT DISTINCT event_id, ip, o1, o2, o3, o4 FROM pub))
        SELECT CASE WHEN v < 536870912 THEN 'r0_lt_32.0.0.0'
                    WHEN v < 1073741824 THEN 'r1_32_to_64'
                    WHEN v < 1610612736 THEN 'r2_64_to_96'
                    ELSE 'r3_ge_96.0.0.0' END AS bucket,
               count(*)::BIGINT AS n, count(DISTINCT ip)::BIGINT
                   AS n_uniq_ips
        FROM num GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["ingest_pipeline"] = """
        SELECT event_id,
               CAST(user_id AS VARCHAR) AS user_id,
               regexp_replace(upper(event_type), '^ERR', 'E_', 'g')
                   AS event_type,
               strftime(ts, '%Y-%m-%d') AS day,
               value AS amount,
               value * 2.0 AS amount2,
               'v1' AS pipeline,
               regexp_replace(upper(event_type), '^ERR', 'E_', 'g')
                 || '|' || strftime(ts, '%Y-%m-%d') AS key
        FROM events ORDER BY event_id
"""

ORACLE_SQL["field_caps"] = f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), tok AS (
          SELECT DISTINCT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+'))
                           AS t
                FROM tr)
          WHERE t <> ''
        ), c AS (
          SELECT count(DISTINCT term)::BIGINT AS n_values,
                 count(*)::BIGINT AS total_df
          FROM tok
        )
        SELECT 'content' AS field, 'text' AS type, n_values, total_df
        FROM c
        UNION ALL
        SELECT 'lang', 'keyword', count(DISTINCT lang)::BIGINT,
               count(*)::BIGINT FROM documents
        UNION ALL
        SELECT 'repo', 'keyword', count(DISTINCT doc_id)::BIGINT,
               count(*)::BIGINT FROM documents
        ORDER BY field
"""

ORACLE_SQL["scripted_metric"] = """
        WITH s AS (
          SELECT
            sum(CASE WHEN event_type = 'purchase'
                     THEN CAST(floor(value * 100) AS BIGINT)
                     ELSE 0 END) AS revenue_cents,
            sum(CASE WHEN event_type = 'error'
                     THEN CAST(floor(value * 100) AS BIGINT)
                     ELSE 0 END) AS cost_cents,
            count(*)::BIGINT AS n_events
          FROM events
        )
        SELECT CAST(revenue_cents AS BIGINT) AS revenue_cents,
               CAST(cost_cents AS BIGINT) AS cost_cents,
               CAST(revenue_cents - cost_cents AS BIGINT)
                   AS profit_cents,
               n_events
        FROM s
"""

ORACLE_SQL["terms_lookup"] = _BM25_BASE + """
        , top_src AS (
          SELECT source FROM documents GROUP BY source
          ORDER BY count(*) DESC, source ASC LIMIT 1
        ), lookup AS (
          SELECT DISTINCT lang FROM documents JOIN top_src USING (source)
        )
        SELECT s.doc_id, round(s.score, 6) AS score
        FROM scores s JOIN documents d USING (doc_id)
        WHERE d.lang IN (SELECT lang FROM lookup)
        ORDER BY s.score DESC, s.doc_id ASC LIMIT 10
"""

ORACLE_SQL["ip_prefix_agg"] = _GEO_BASE + """
        , d AS (SELECT DISTINCT event_id, ip, o1, o2 FROM pub)
        SELECT CAST(o1 AS VARCHAR) || '.'
                 || CAST((o2 // 16) * 16 AS VARCHAR) || '.0.0/12'
                   AS bucket,
               count(*)::BIGINT AS n,
               count(DISTINCT ip)::BIGINT AS n_uniq_ips
        FROM d GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["cumulative_cardinality"] = """
        WITH fd AS (SELECT user_id, min(strftime(ts, '%Y-%m-%d')) AS day
                    FROM events GROUP BY 1),
        pd AS (SELECT day, count(*)::BIGINT AS new_users
               FROM fd GROUP BY 1)
        SELECT day, new_users,
               CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT)
                   AS cumulative_users
        FROM pd ORDER BY day
"""

# PIT: BM25 over ONLY the base half (doc_id < floor(median)) — the view
# the reader pinned before the delta append.
_PIT_DOCS = ("(SELECT * FROM documents WHERE doc_id < "
             "(SELECT CAST(floor(median(doc_id)) AS BIGINT)"
             " FROM documents)) documents")
ORACLE_SQL["pit_search"] = (
    _bm25_base(_BM25_TERMS).replace("FROM documents", "FROM " + _PIT_DOCS)
    + """
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
    """)

ORACLE_SQL["t_test_agg"] = """
        WITH m AS (
          SELECT event_type, CAST(round(value * 1e2, 0) AS BIGINT) AS c
          FROM events WHERE event_type IN ('error', 'purchase')),
        comp AS (
          SELECT event_type, count(*)::BIGINT AS n,
                 CAST(sum(c) AS BIGINT) AS s,
                 CAST(sum(c*c) AS BIGINT) AS ss
          FROM m GROUP BY 1),
        a AS (SELECT * FROM comp WHERE event_type = 'error'),
        b AS (SELECT * FROM comp WHERE event_type = 'purchase')
        SELECT a.n AS n_a, b.n AS n_b,
               CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) AS mean_a_cents,
               CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS mean_b_cents,
               (CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
                - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
               / sqrt(((CAST(a.ss AS DOUBLE)
                        - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE)
                          / CAST(a.n AS DOUBLE))
                       / (CAST(a.n AS DOUBLE) - 1.0)) / CAST(a.n AS DOUBLE)
                      + ((CAST(b.ss AS DOUBLE)
                          - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE)
                            / CAST(b.n AS DOUBLE))
                         / (CAST(b.n AS DOUBLE) - 1.0))
                        / CAST(b.n AS DOUBLE)) AS t_stat
        FROM a, b
"""

ORACLE_SQL["mad_agg"] = """
        WITH m AS (
          SELECT event_type, CAST(round(value * 1e6, 0) AS BIGINT)
                     AS micro
          FROM events),
        med AS (SELECT event_type, quantile_disc(micro, 0.5) AS med
                FROM m GROUP BY 1),
        dev AS (SELECT m.event_type, abs(m.micro - med.med) AS d
                FROM m JOIN med USING (event_type))
        SELECT d.event_type, count(*)::BIGINT AS n,
               CAST(any_value(med.med) AS BIGINT) AS median_micro,
               CAST(quantile_disc(d.d, 0.5) AS BIGINT) AS mad_micro
        FROM dev d JOIN med ON d.event_type = med.event_type
        GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["diversified_sampler_agg"] = """
        WITH ranked AS (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS rn
          FROM events),
        sample AS (SELECT * FROM ranked WHERE rn <= 2
                   ORDER BY ts, event_id LIMIT 200),
        m AS (SELECT event_type,
                     CAST(round(value * 1e6, 0) AS BIGINT) AS micro
              FROM sample)
        SELECT event_type, count(*)::BIGINT AS n,
               CAST(sum(micro) AS BIGINT) AS sum_value_micro
        FROM m GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["reverse_nested_agg"] = """
        SELECT event_type, count(*)::BIGINT AS n_events,
               count(DISTINCT user_id)::BIGINT AS n_parent_docs
        FROM events GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["boosting_query"] = _BM25_BASE + """
        SELECT doc_id,
               round(scores.score * (CASE WHEN doc_id IN
                     (SELECT DISTINCT doc_id FROM tok
                      WHERE term = 'failure')
                   THEN 0.5 ELSE 1.0 END), 6) AS score
        FROM scores
        ORDER BY score DESC, doc_id ASC LIMIT 10
"""

ORACLE_SQL["pinned_query"] = _BM25_BASE + """
        , pinned(doc_id, score) AS (VALUES (CAST(7 AS BIGINT), 999999.0),
                                           (CAST(3 AS BIGINT), 999998.0),
                                           (CAST(11 AS BIGINT), 999997.0)),
        org AS (SELECT doc_id, round(scores.score, 6) AS score
                FROM scores WHERE doc_id NOT IN (7, 3, 11)
                ORDER BY scores.score DESC, doc_id ASC LIMIT 7)
        SELECT * FROM pinned UNION ALL SELECT * FROM org
"""

ORACLE_SQL["distance_feature"] = _BM25_BASE + """
        SELECT doc_id,
               round(scores.score
                     + 1.0 * (1000.0 / (1000.0
                              + CAST(abs(doc_id - 0) AS DOUBLE))), 6)
                   AS score
        FROM scores
        ORDER BY score DESC, doc_id ASC LIMIT 10
"""

ORACLE_SQL["rank_feature"] = _BM25_BASE + """
        SELECT s.doc_id,
               round(s.score + 0.7 * (dl.dl / (dl.dl + 50.0)), 6)
                   AS score
        FROM scores s JOIN dl USING (doc_id)
        ORDER BY score DESC, s.doc_id ASC LIMIT 10
"""

# combined_fields (BM25F-style): tf/dl summed across content+path with the
# path boost (2.0), df over either-field matches, BM25 over combined stats.
# The expression trees mirror SearchEngine.combined_fields_search exactly:
# tf_c + 2.0*tf_p, dl_c + 2.0*dl_p, (total_c + 2.0*total_p)/n, and
# idf * (tf*(k1+1)/(tf + k1*(1-b+b*dl/avg))); ORDER BY the unrounded sum.
ORACLE_SQL["combined_fields"] = """
WITH tr AS (
  SELECT doc_id, lower(regexp_replace(regexp_replace(text,
         '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'),
         '([a-z0-9])([A-Z])', '\\1 \\2', 'g')) AS s FROM documents
), tokc AS (
  SELECT doc_id, substr(t, 1, 64) AS term
  FROM (SELECT doc_id, unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
        FROM tr)
  WHERE t <> ''
), tokp AS (
  SELECT doc_id, t AS term
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(
                   lower('doc_' || CAST(doc_id AS VARCHAR) || '.md'),
                   '[^a-z0-9]+')) AS t
        FROM documents)
  WHERE t <> ''
), tfc AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tokc GROUP BY 1, 2
), tfp AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tokp GROUP BY 1, 2
), dlc AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM tokc GROUP BY 1
), dlp AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM tokp GROUP BY 1
), stats AS (
  SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
         ((SELECT count(*)::DOUBLE FROM tokc)
          + 2.0 * (SELECT count(*)::DOUBLE FROM tokp))
         / (SELECT count(*)::DOUBLE FROM documents) AS avgdl
), q(term) AS (VALUES ('42'), ('doc'), ('md'), ('merge')),
comb AS (
  SELECT coalesce(c.doc_id, p.doc_id) AS doc_id,
         coalesce(c.term, p.term) AS term,
         coalesce(c.tf, 0) + 2.0 * coalesce(p.tf, 0) AS tf
  FROM (SELECT * FROM tfc WHERE term IN (SELECT term FROM q)) c
  FULL OUTER JOIN
       (SELECT * FROM tfp WHERE term IN (SELECT term FROM q)) p
  USING (doc_id, term)
), df AS (
  SELECT term, count(*)::DOUBLE AS df FROM comb GROUP BY 1
), norms AS (
  SELECT d.doc_id,
         coalesce(dlc.dl, 0) + 2.0 * coalesce(dlp.dl, 0) AS dl
  FROM documents d
  LEFT JOIN dlc ON dlc.doc_id = d.doc_id
  LEFT JOIN dlp ON dlp.doc_id = d.doc_id
), scores AS (
  SELECT comb.doc_id,
         sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * (comb.tf * (1.2 + 1)
                / (comb.tf + 1.2 * (1 - 0.75
                                    + 0.75 * norms.dl / stats.avgdl)))
         ) AS score
  FROM comb JOIN df USING (term) JOIN norms USING (doc_id)
  CROSS JOIN stats
  GROUP BY comb.doc_id
)
SELECT doc_id, round(scores.score, 6) AS score FROM scores
ORDER BY scores.score DESC, doc_id ASC LIMIT 10
"""

# bm25_topk_stopped: the stop_words=('the','a') analyzer — tokens drop
# BEFORE tf/dl/df/avgdl, exactly the engine's StopFilter placement
ORACLE_SQL["bm25_topk_stopped"] = """
WITH tr AS (
  SELECT doc_id, lower(regexp_replace(regexp_replace(text,
         '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'),
         '([a-z0-9])([A-Z])', '\\1 \\2', 'g')) AS s FROM documents
), tok AS (
  SELECT doc_id, substr(t, 1, 64) AS term
  FROM (SELECT doc_id, unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
        FROM tr)
  WHERE t <> '' AND substr(t, 1, 64) NOT IN ('the', 'a')
), tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1
), stats AS (
  SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
         (SELECT count(*)::DOUBLE FROM tok) /
         (SELECT count(*)::DOUBLE FROM documents) AS avgdl
), q(term) AS (VALUES ('error'), ('merge'), ('spark'), ('window')),
df AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN (SELECT term FROM q) GROUP BY 1
), scores AS (
  SELECT tf.doc_id,
         sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * (1.2 + 1)
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM tf
  JOIN q USING (term) JOIN df USING (term) JOIN dl USING (doc_id)
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(scores.score, 6) AS score FROM scores
ORDER BY scores.score DESC, doc_id ASC LIMIT 10
"""

# bm25_topk_stemmed: the stem="minimal_english" analyzer — every
# corpus token goes through the S-stemmer CASE (exactly
# tokenizer.stem_minimal_english's rule order) BEFORE tf/df/avgdl;
# query terms are the stems of "errors merges sparks windows"
ORACLE_SQL["bm25_topk_stemmed"] = """
WITH tr AS (
  SELECT doc_id, lower(regexp_replace(regexp_replace(text,
         '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'),
         '([a-z0-9])([A-Z])', '\\1 \\2', 'g')) AS s FROM documents
), tok0 AS (
  SELECT doc_id, substr(t, 1, 64) AS t2
  FROM (SELECT doc_id, unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
        FROM tr)
  WHERE t <> ''
), tok AS (
  SELECT doc_id,
         CASE
           WHEN length(t2) < 3 OR right(t2, 1) <> 's' THEN t2
           WHEN right(t2, 2) IN ('ss', 'us') THEN t2
           WHEN regexp_matches(t2, '[^ae]ies$')
             THEN regexp_replace(t2, 'ies$', 'y')
           WHEN regexp_matches(t2, '[aeio]es$') THEN t2
           ELSE substr(t2, 1, length(t2) - 1)
         END AS term
  FROM tok0
), tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1
), stats AS (
  SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
         (SELECT count(*)::DOUBLE FROM tok) /
         (SELECT count(*)::DOUBLE FROM documents) AS avgdl
), q(term) AS (VALUES ('error'), ('merge'), ('spark'), ('window')),
df AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN (SELECT term FROM q) GROUP BY 1
), scores AS (
  SELECT tf.doc_id,
         sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * (1.2 + 1)
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM tf
  JOIN q USING (term) JOIN df USING (term) JOIN dl USING (doc_id)
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(scores.score, 6) AS score FROM scores
ORDER BY scores.score DESC, doc_id ASC LIMIT 10
"""

# ilm_search: after the delete phase drops the first rollover
# generation (the corpus head, ceil(n/3) docs in sorted-key order) the
# alias serves BM25 over the retained tail — same CTE shape as
# _BM25_BASE but rooted at docs_r; warm-shrink changes layout only
# (rank identity pinned by the shrink tests)
ORACLE_SQL["ilm_search"] = """
WITH docs_r AS (
  SELECT * FROM documents
  WHERE doc_id >= (SELECT (count(*) + 2) // 3 FROM documents)
), tr AS (
  SELECT doc_id, lower(regexp_replace(regexp_replace(text,
         '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'),
         '([a-z0-9])([A-Z])', '\\1 \\2', 'g')) AS s FROM docs_r
), tok AS (
  SELECT doc_id, substr(t, 1, 64) AS term
  FROM (SELECT doc_id, unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
        FROM tr)
  WHERE t <> ''
), tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1
), stats AS (
  SELECT (SELECT count(*)::DOUBLE FROM docs_r) AS n,
         (SELECT count(*)::DOUBLE FROM tok) /
         (SELECT count(*)::DOUBLE FROM docs_r) AS avgdl
), q(term) AS (VALUES ('error'), ('merge'), ('spark'), ('window')),
df AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN (SELECT term FROM q) GROUP BY 1
), scores AS (
  SELECT tf.doc_id,
         sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * (1.2 + 1)
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM tf
  JOIN q USING (term) JOIN df USING (term) JOIN dl USING (doc_id)
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(scores.score, 6) AS score FROM scores
ORDER BY scores.score DESC, doc_id ASC LIMIT 10
"""

# sparse-vector dot product: per-term doc weight (1 + ln(tf)) * ln(1 + n/df)
# — same expression tree as SearchEngine.sparse_vector_search (w * ((1 +
# ln(tf)) * idf)); ORDER BY the unrounded sum, round in projection only
ORACLE_SQL["text_expansion"] = """
WITH tr AS (
  SELECT doc_id, lower(regexp_replace(regexp_replace(text,
         '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'),
         '([a-z0-9])([A-Z])', '\\1 \\2', 'g')) AS s FROM documents
), tok AS (
  SELECT doc_id, substr(t, 1, 64) AS term
  FROM (SELECT doc_id, unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
        FROM tr)
  WHERE t <> ''
), tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2
), stats AS (
  SELECT (SELECT count(*)::DOUBLE FROM documents) AS n
), q(term, w) AS (VALUES ('authentication', 2.0), ('error', 1.5),
                         ('merge', 1.0), ('window', 0.5)),
df AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN (SELECT term FROM q) GROUP BY 1
), scores AS (
  SELECT tf.doc_id,
         sum(q.w * ((1 + ln(tf.tf)) * ln(1 + stats.n / df.df))) AS score
  FROM tf JOIN q USING (term) JOIN df USING (term) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(scores.score, 6) AS score FROM scores
ORDER BY scores.score DESC, doc_id ASC LIMIT 10
"""

ORACLE_SQL["constant_score"] = _bm25_base("('merge')") + """
        SELECT t.doc_id, 1.0 AS score
        FROM (SELECT DISTINCT tok.doc_id
              FROM tok JOIN tr USING (doc_id)
              WHERE tok.term = 'merge' AND tr.lang = 'en') t
        ORDER BY doc_id LIMIT 10
"""

ORACLE_SQL["span_first"] = f"""
        WITH t AS (
          SELECT doc_id, {_PHRASE_ARR} AS arr FROM documents
        ), pm AS (
          SELECT doc_id,
                 len([i FOR i IN generate_series(1, least(len(arr), 10))
                      IF arr[i] = 'merge'])::BIGINT AS n_matches
          FROM t
        )
        SELECT doc_id, n_matches FROM pm WHERE n_matches > 0
        ORDER BY doc_id
"""

# span_not: 'sort' occurrences with no 'merge' within 2 tokens either
# side (pre = post = 2) — the 1-based oracle positions cancel in the
# |i - j| window exactly as in span_near
ORACLE_SQL["span_not"] = f"""
        WITH t AS (
          SELECT doc_id, {_PHRASE_ARR} AS arr FROM documents
        ), p AS (
          SELECT doc_id,
                 [i FOR i IN generate_series(1, len(arr))
                  IF arr[i] = 'sort'] AS p1,
                 [i FOR i IN generate_series(1, len(arr))
                  IF arr[i] = 'merge'] AS p2
          FROM t
        ), pm AS (
          SELECT doc_id,
                 CAST(len(list_filter(p1,
                     x -> len(list_filter(p2,
                         y -> abs(x - y) <= 2)) = 0)) AS BIGINT)
                     AS n_matches
          FROM p WHERE len(p1) > 0
        )
        SELECT doc_id, n_matches FROM pm WHERE n_matches > 0
        ORDER BY doc_id
"""

# span_containing / span_within: big = Lucene-minimal ordered span per
# start (first 'merge' after each 'sort' within 6 positions — the
# list_min of the filtered positions; empty -> NULL -> predicate false,
# exactly the engine's "no j found" case). 1-based oracle positions are
# shift-invariant for containment. Counting matches the engine: one per
# qualifying big span (containing) / one per enclosed little occurrence
# (within).
ORACLE_SQL["span_containing"] = f"""
        WITH t AS (
          SELECT doc_id, {_PHRASE_ARR} AS arr FROM documents
        ), p AS (
          SELECT doc_id,
                 [i FOR i IN generate_series(1, len(arr))
                  IF arr[i] = 'sort'] AS p1,
                 [i FOR i IN generate_series(1, len(arr))
                  IF arr[i] = 'merge'] AS p2,
                 [i FOR i IN generate_series(1, len(arr))
                  IF arr[i] = 'agg'] AS p3
          FROM t
        ), pm AS (
          SELECT doc_id,
                 CAST(len(list_filter(p1, i ->
                     len(list_filter(p3, p -> i <= p AND
                         p <= list_min(list_filter(p2,
                             y -> y > i AND y - i <= 6)))) > 0))
                     AS BIGINT) AS n_matches
          FROM p WHERE len(p1) > 0
        )
        SELECT doc_id, n_matches FROM pm WHERE n_matches > 0
        ORDER BY doc_id
"""

ORACLE_SQL["span_within"] = f"""
        WITH t AS (
          SELECT doc_id, {_PHRASE_ARR} AS arr FROM documents
        ), p AS (
          SELECT doc_id,
                 [i FOR i IN generate_series(1, len(arr))
                  IF arr[i] = 'sort'] AS p1,
                 [i FOR i IN generate_series(1, len(arr))
                  IF arr[i] = 'merge'] AS p2,
                 [i FOR i IN generate_series(1, len(arr))
                  IF arr[i] = 'agg'] AS p3
          FROM t
        ), pm AS (
          SELECT doc_id,
                 CAST(len(list_filter(p3, p ->
                     len(list_filter(p1, i -> i <= p AND
                         p <= list_min(list_filter(p2,
                             y -> y > i AND y - i <= 6)))) > 0))
                     AS BIGINT) AS n_matches
          FROM p WHERE len(p3) > 0
        )
        SELECT doc_id, n_matches FROM pm WHERE n_matches > 0
        ORDER BY doc_id
"""

# phrase_slop: Lucene sloppy two-term distance |j - i - 1| <= 2; the
# 1-based oracle positions cancel in the difference exactly as in
# span_near
ORACLE_SQL["phrase_slop"] = f"""
        WITH t AS (
          SELECT doc_id, {_PHRASE_ARR} AS arr FROM documents
        ), p AS (
          SELECT doc_id,
                 [i FOR i IN generate_series(1, len(arr))
                  IF arr[i] = 'sort'] AS p1,
                 [i FOR i IN generate_series(1, len(arr))
                  IF arr[i] = 'merge'] AS p2
          FROM t
        ), pm AS (
          SELECT doc_id,
                 CAST(coalesce(list_sum(list_transform(p1,
                     x -> len(list_filter(p2,
                         y -> abs(y - x - 1) <= 2)))), 0) AS BIGINT)
                     AS n_matches
          FROM p WHERE len(p1) > 0 AND len(p2) > 0
        )
        SELECT doc_id, n_matches FROM pm WHERE n_matches > 0
        ORDER BY doc_id
"""

ORACLE_SQL["terms_set"] = _BM25_BASE + """
        , m AS (
          SELECT tf.doc_id FROM tf JOIN q USING (term)
          GROUP BY tf.doc_id HAVING count(DISTINCT tf.term) >= 3
        )
        SELECT s.doc_id, round(s.score, 6) AS score
        FROM scores s JOIN m USING (doc_id)
        ORDER BY s.score DESC, s.doc_id ASC LIMIT 10
"""

ORACLE_SQL["categorize_text"] = """
        WITH e AS (
          SELECT event_type, user_id,
                 CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)
                     AS k
          FROM events
        ), lines AS (
          SELECT event_type || ' user=' || CAST(user_id AS VARCHAR)
                 || ' session k=' || CAST(k AS VARCHAR)
                 || CASE k % 3 WHEN 0 THEN ' retry'
                               WHEN 1 THEN ' ok' ELSE '' END AS line
          FROM e
        )
        SELECT regexp_replace(line, '[0-9]+', '#', 'g') AS template,
               count(*)::BIGINT AS n
        FROM lines GROUP BY 1 ORDER BY n DESC, template ASC LIMIT 10
"""

ORACLE_SQL["bucket_sort"] = """
        WITH m AS (
          SELECT event_type,
                 CAST(round(value * 1e6, 0) AS BIGINT) AS micro
          FROM events
        ), buckets AS (
          SELECT event_type, count(*)::BIGINT AS n,
                 CAST(sum(micro) AS BIGINT) AS sum_micro
          FROM m GROUP BY 1
        )
        SELECT event_type, n, sum_micro FROM buckets
        ORDER BY sum_micro DESC, event_type ASC LIMIT 3 OFFSET 1
"""

ORACLE_SQL["moving_median"] = """
        WITH daily AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day, count(*)::BIGINT AS n
          FROM events GROUP BY 1
        )
        SELECT day, n,
               round(median(n) OVER (ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
                   AS mov_median7
        FROM daily ORDER BY day
"""

ORACLE_SQL["frequent_item_sets"] = """
        WITH d AS (
          SELECT DISTINCT user_id, event_type FROM events
        )
        SELECT a.event_type AS item_a, b.event_type AS item_b,
               count(*)::BIGINT AS support
        FROM d a JOIN d b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2 ORDER BY support DESC, item_a ASC, item_b ASC
"""

# change_point: argmax of g(k) = SL^2/k + SR^2/(n-k) over the daily
# series, doubles built cast-first exactly like the engine so the
# argmax and the tie-break (earliest k) agree bit-for-bit
ORACLE_SQL["change_point"] = """
        WITH daily AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day, count(*)::BIGINT AS n
          FROM events GROUP BY 1
        ), ord AS (
          SELECT day, n,
                 row_number() OVER (ORDER BY day) AS i,
                 count(*) OVER () AS total,
                 sum(n) OVER (ORDER BY day) AS sl,
                 sum(n) OVER () AS s
          FROM daily
        ), scored AS (
          SELECT i AS k, total,
                 CAST(sl AS DOUBLE) AS sld,
                 CAST(s - sl AS DOUBLE) AS srd,
                 CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)
                     / CAST(i AS DOUBLE)
                   + CAST(s - sl AS DOUBLE) * CAST(s - sl AS DOUBLE)
                     / CAST(total - i AS DOUBLE) AS g
          FROM ord WHERE i < total
        ), best AS (
          SELECT k, total, sld, srd FROM scored
          ORDER BY g DESC, k ASC LIMIT 1
        )
        SELECT (SELECT day FROM ord, best WHERE ord.i = best.k + 1)
                   AS change_day,
               round(sld / CAST(k AS DOUBLE), 6) AS mean_before,
               round(srd / CAST(total - k AS DOUBLE), 6) AS mean_after
        FROM best
"""

# cross_fields: blended df (greatest across fields), per-doc greatest of
# per-field tf-norms, path field is exactly ['doc', <id>, 'md'] (dl = 3,
# avgdl = 3.0) per _corpusify_docs
ORACLE_SQL["cross_fields"] = f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), tok AS (
          SELECT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        ), tf AS (
          SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
          GROUP BY 1, 2
        ), dl AS (
          SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1
        ), stats AS (
          SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                 (SELECT count(*)::DOUBLE FROM tok) /
                 (SELECT count(*)::DOUBLE FROM documents) AS avgdl
        ), q(term) AS (VALUES ('error'), ('merge'), ('md')),
        ptf AS (
          SELECT doc_id, term, 1.0 AS tf
          FROM (SELECT doc_id,
                       unnest(['doc', CAST(doc_id AS VARCHAR), 'md'])
                           AS term
                FROM documents)
        ), dfc AS (
          SELECT term, count(*)::DOUBLE AS df FROM tf
          JOIN q USING (term) GROUP BY 1
        ), dfp AS (
          SELECT term, count(*)::DOUBLE AS df FROM ptf
          JOIN q USING (term) GROUP BY 1
        ), dfb AS (
          SELECT q.term,
                 greatest(coalesce(dfc.df, 0), coalesce(dfp.df, 0)) AS df
          FROM q LEFT JOIN dfc USING (term) LEFT JOIN dfp USING (term)
          WHERE coalesce(dfc.df, 0) + coalesce(dfp.df, 0) > 0
        ), normc AS (
          SELECT tf.doc_id, tf.term,
                 tf.tf * (1.2 + 1)
                 / (tf.tf + 1.2 * (1 - 0.75
                                   + 0.75 * dl.dl / stats.avgdl)) AS norm
          FROM tf JOIN q USING (term) JOIN dl USING (doc_id)
          CROSS JOIN stats
        ), normp AS (
          SELECT doc_id, term,
                 tf * (1.2 + 1)
                 / (tf + 1.2 * (1 - 0.75 + 0.75 * 3.0 / 3.0)) AS norm
          FROM ptf JOIN q USING (term)
        ), blended AS (
          SELECT coalesce(nc.doc_id, np.doc_id) AS doc_id,
                 coalesce(nc.term, np.term) AS term,
                 greatest(coalesce(nc.norm, 0), coalesce(np.norm, 0))
                     AS norm
          FROM normc nc FULL OUTER JOIN normp np
            USING (doc_id, term)
        ), scores AS (
          SELECT doc_id,
                 sum(ln(1 + (stats.n - dfb.df + 0.5) / (dfb.df + 0.5))
                     * norm) AS score
          FROM blended JOIN dfb USING (term) CROSS JOIN stats
          GROUP BY doc_id
        )
        SELECT doc_id, round(score, 6) AS score FROM scores
        ORDER BY score DESC, doc_id ASC LIMIT 10
"""

ORACLE_SQL["eql_sequence"] = """
        WITH e1 AS (
          SELECT user_id, ts FROM events WHERE event_type = 'error'
        ), e2 AS (
          SELECT user_id, ts FROM events WHERE event_type = 'purchase'
        ), pairs AS (
          SELECT e1.user_id, e1.ts AS t1
          FROM e1 JOIN e2 ON e1.user_id = e2.user_id
                         AND e2.ts > e1.ts
                         AND e2.ts <= e1.ts + INTERVAL 30 MINUTE
        )
        SELECT user_id, count(*)::BIGINT AS n_sequences,
               CAST(epoch_us(min(t1)) AS BIGINT) AS first_error_us
        FROM pairs GROUP BY 1 ORDER BY user_id
"""

# dsir_weights: add-1-smoothed unigram log-ratio, target = lang 'en',
# source = whole corpus; ln argument built cast-first exactly like the
# engine (doubles throughout)
ORACLE_SQL["dsir_weights"] = f"""
        WITH tr AS (
          SELECT doc_id, lang, {_CAMEL.format(col='text')} AS s
          FROM documents
        ), tok AS (
          SELECT doc_id, lang, substr(t, 1, 64) AS term
          FROM (SELECT doc_id, lang,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        ), vocab AS (
          SELECT term,
                 sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE
                     AS c_tgt,
                 count(*)::DOUBLE AS c_all
          FROM tok GROUP BY 1
        ), consts AS (
          SELECT count(*)::DOUBLE AS v,
                 sum(c_tgt) AS t_tgt, sum(c_all) AS t_src
          FROM vocab
        ), lr AS (
          SELECT term,
                 ln(((c_tgt + 1.0) * (t_src + v))
                    / ((c_all + 1.0) * (t_tgt + v))) AS lr
          FROM vocab CROSS JOIN consts
        ), tf AS (
          SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
          GROUP BY 1, 2
        ), w AS (
          SELECT doc_id, round(sum(tf * lr.lr), 6) AS weight
          FROM tf JOIN lr USING (term) GROUP BY 1
        )
        SELECT doc_id, weight FROM w
        ORDER BY weight DESC, doc_id ASC LIMIT 20
"""

ORACLE_SQL["rate_agg"] = """
        WITH m AS (
          SELECT strftime(ts, '%Y-%m') AS month,
                 CAST(round(value * 1e6, 0) AS BIGINT) AS micro
          FROM events
        ), buckets AS (
          SELECT month, count(*)::BIGINT AS n,
                 CAST(sum(micro) AS BIGINT) AS sum_micro
          FROM m GROUP BY 1
        )
        SELECT month, n, sum_micro,
               round(CAST(sum_micro AS DOUBLE)
                     / CAST(date_part('day',
                           last_day(CAST(month || '-01' AS DATE)))
                         AS DOUBLE), 6) AS rate_micro_per_day
        FROM buckets ORDER BY month
"""

ORACLE_SQL["normalize_agg"] = """
        WITH b AS (
          SELECT event_type, count(*)::BIGINT AS n FROM events GROUP BY 1
        )
        SELECT event_type, n,
               CAST(n AS DOUBLE)
                   / CAST((SELECT sum(n) FROM b) AS DOUBLE)
                   * 100.0 AS pct_of_total
        FROM b ORDER BY event_type
"""

ORACLE_SQL["ks_test_agg"] = """
        WITH daily AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day,
                 sum(CASE WHEN event_type = 'error'
                     THEN 1 ELSE 0 END)::BIGINT AS e,
                 count(*)::BIGINT AS a
          FROM events GROUP BY 1
        ), c AS (
          SELECT day,
                 CAST(sum(e) OVER (ORDER BY day) AS DOUBLE)
                   / CAST((SELECT sum(e) FROM daily) AS DOUBLE) AS ce,
                 CAST(sum(a - e) OVER (ORDER BY day) AS DOUBLE)
                   / CAST((SELECT sum(a - e) FROM daily) AS DOUBLE)
                     AS cr
          FROM daily
        )
        SELECT round(abs(ce - cr), 6) AS ks_d, day AS at_day
        FROM c ORDER BY abs(ce - cr) DESC, day ASC LIMIT 1
"""

# rate_anomalies: trailing-7 window EXCLUDES the scored day (ROWS 7
# PRECEDING .. 1 PRECEDING), population variance, cast-first doubles
ORACLE_SQL["rate_anomalies"] = """
        WITH daily AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day, count(*)::BIGINT AS n
          FROM events GROUP BY 1
        ), w AS (
          SELECT day, n,
                 row_number() OVER (ORDER BY day) AS i,
                 sum(n) OVER (ORDER BY day
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS s,
                 sum(n * n) OVER (ORDER BY day
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS s2
          FROM daily
        ), v AS (
          SELECT day, n,
                 CAST(s AS DOUBLE) / 7.0 AS mean,
                 CAST(s2 AS DOUBLE) / 7.0
                   - (CAST(s AS DOUBLE) / 7.0)
                     * (CAST(s AS DOUBLE) / 7.0) AS var
          FROM w WHERE i > 7
        ), z AS (
          SELECT day, n, mean,
                 (CAST(n AS DOUBLE) - mean) / sqrt(var) AS z
          FROM v WHERE var > 0.0
        )
        SELECT day, n, round(mean, 6) AS win_mean, round(z, 6) AS z
        FROM z ORDER BY abs(z) DESC, day ASC LIMIT 3
"""

ORACLE_SQL["pivot_transform"] = """
        WITH m AS (
          SELECT user_id,
                 CAST(round(value * 1e6, 0) AS BIGINT) AS micro,
                 CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                 event_type
          FROM events
        )
        SELECT user_id, count(*)::BIGINT AS n_events,
               CAST(sum(micro) AS BIGINT) AS sum_micro,
               sum(CASE WHEN event_type = 'error'
                   THEN 1 ELSE 0 END)::BIGINT AS n_error,
               min(ts_us) AS first_ts_us,
               max(ts_us) AS last_ts_us
        FROM m GROUP BY 1 ORDER BY user_id
"""

ORACLE_SQL["funnel_analysis"] = """
        WITH e AS (
          SELECT user_id, event_type,
                 CAST(epoch_us(ts) AS BIGINT) AS ts_us
          FROM events
        ), v AS (
          SELECT user_id, min(ts_us) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY 1
        ), c AS (
          SELECT e.user_id, min(e.ts_us) AS t2
          FROM e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts_us > v.t1
            AND e.ts_us <= v.t1 + 604800000000
          GROUP BY 1
        ), p AS (
          SELECT e.user_id, min(e.ts_us) AS t3
          FROM e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts_us > c.t2
            AND e.ts_us <= c.t2 + 604800000000
          GROUP BY 1
        )
        SELECT CAST(1 AS BIGINT) AS step_no, 'view' AS step,
               (SELECT count(*) FROM v)::BIGINT AS n_users
        UNION ALL
        SELECT CAST(2 AS BIGINT), 'click', (SELECT count(*) FROM c)::BIGINT
        UNION ALL
        SELECT CAST(3 AS BIGINT), 'purchase',
               (SELECT count(*) FROM p)::BIGINT
        ORDER BY step_no
"""

ORACLE_SQL["retention_cohorts"] = """
        WITH d AS (
          SELECT DISTINCT user_id,
                 CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
          FROM events
        ), c AS (
          SELECT user_id, min(day) AS cd FROM d GROUP BY 1
        )
        SELECT strftime(DATE '1970-01-01' + cd * INTERVAL 1 DAY,
                        '%Y-%m-%d') AS cohort,
               (day - cd)::BIGINT AS offset_days,
               count(*)::BIGINT AS n_users
        FROM d JOIN c USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2
"""

# dsl_search: bool{must: match(4 terms), filter: lang=en, must_not:
# match('failure')} — OR-of-terms match, keyword filter, exclusion
ORACLE_SQL["dsl_search"] = _BM25_BASE + """
        SELECT s.doc_id, round(s.score, 6) AS score
        FROM scores s
        JOIN tr ON tr.doc_id = s.doc_id AND tr.lang = 'en'
        WHERE s.doc_id NOT IN (
          SELECT doc_id FROM tok WHERE term = 'failure')
        ORDER BY s.score DESC, s.doc_id ASC LIMIT 10
"""

ORACLE_SQL["sliced_scroll"] = ORACLE_SQL["scroll_export"].replace(
    "FROM documents d JOIN m USING (doc_id)",
    "FROM documents d JOIN m USING (doc_id) WHERE d.doc_id % 3 = 1")

# mixture_temperature: q_l = (tokens/total)^0.3 normalized; pow/div
# cast-first doubles, round6 absorbs the unordered 5-term sum
ORACLE_SQL["mixture_temperature"] = """
        WITH tk AS (
          SELECT lang,
                 sum(len(regexp_extract_all(lower(text),
                     '[a-z0-9]+')))::BIGINT AS tokens
          FROM documents GROUP BY 1
        ), p AS (
          SELECT lang, tokens,
                 CAST(tokens AS DOUBLE)
                   / CAST((SELECT sum(tokens) FROM tk) AS DOUBLE)
                     AS token_share
          FROM tk
        ), q AS (
          SELECT lang, tokens, token_share,
                 pow(token_share, 0.3) AS qv
          FROM p
        )
        SELECT lang, tokens, round(token_share, 6) AS token_share,
               round(qv / (SELECT sum(qv) FROM q), 6) AS sample_share
        FROM q ORDER BY lang
"""

# synonym_search: 'error join' with join->merge expands to the union
# {error, join, merge}; plain BM25 over the expanded set
ORACLE_SQL["synonym_search"] = _bm25_base(
    "('error'), ('join'), ('merge')") + """
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
"""

# multimodal_resize: stub decode geometry (width = n%640+1, height =
# (n//640)%480+1 over the utf-8 payload bytes, as in multimodal_stats),
# fit-inside integer resize to target_w=256, RGB byte count
ORACLE_SQL["multimodal_resize"] = """
        WITH m AS (
          SELECT lang, octet_length(encode(text)) AS n FROM documents
        ), g AS (
          SELECT lang, (n % 640 + 1) AS w,
                 ((n // 640) % 480 + 1) AS h
          FROM m
        ), r AS (
          SELECT lang, least(w, 256) AS out_w,
                 greatest(1, h * least(w, 256) // w) AS out_h
          FROM g
        )
        SELECT lang, count(*)::BIGINT AS n,
               sum(out_w)::BIGINT AS total_out_width,
               sum(out_h)::BIGINT AS total_out_height,
               sum(out_w * out_h * 3)::BIGINT AS total_resized_bytes
        FROM r GROUP BY 1 ORDER BY lang
"""

ORACLE_SQL["video_frame_sample"] = """
        WITH m AS (
          SELECT doc_id, octet_length(encode(text)) AS n
          FROM documents WHERE doc_id < 300
        ), f AS (
          SELECT doc_id, (n // 1024 + 1) AS nf FROM m
        ), s AS (
          SELECT doc_id, least(nf, 8) AS k,
                 nf // least(nf, 8) AS stride
          FROM f
        )
        SELECT doc_id, CAST(k AS BIGINT) AS n_frames,
               CAST((k - 1) * stride AS BIGINT) AS last_frame
        FROM s ORDER BY doc_id
"""

# span_or: occurrences of either clause term, positions comprehension
ORACLE_SQL["span_or"] = f"""
        WITH t AS (
          SELECT doc_id, {_PHRASE_ARR} AS arr FROM documents
        ), pm AS (
          SELECT doc_id,
                 len([i FOR i IN generate_series(1, len(arr))
                      IF arr[i] IN ('merge', 'sort')])::BIGINT
                     AS n_matches
          FROM t
        )
        SELECT doc_id, n_matches FROM pm WHERE n_matches > 0
        ORDER BY doc_id
"""

# match_bool_prefix: exact terms {error, merge} plus every dictionary
# term with prefix 's' as additional should terms (the engine's
# max_expansions=1024 cap never binds on the sf vocab)
ORACLE_SQL["match_bool_prefix"] = f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), tok AS (
          SELECT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE t <> ''
        ), tf AS (
          SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
          GROUP BY 1, 2
        ), dl AS (
          SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1
        ), stats AS (
          SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                 (SELECT count(*)::DOUBLE FROM tok) /
                 (SELECT count(*)::DOUBLE FROM documents) AS avgdl
        ), df AS (
          SELECT term, count(*)::DOUBLE AS df FROM tf
          WHERE term IN ('error', 'merge') OR term LIKE 's%'
          GROUP BY 1
        ), scores AS (
          SELECT tf.doc_id,
                 sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * (1.2 + 1)
                     / (tf.tf + 1.2 * (1 - 0.75
                                       + 0.75 * dl.dl / stats.avgdl))
                 ) AS score
          FROM tf
          JOIN df USING (term) JOIN dl USING (doc_id)
          CROSS JOIN stats
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(scores.score, 6) AS score FROM scores
        ORDER BY scores.score DESC, doc_id ASC LIMIT 10
"""

ORACLE_SQL["percentiles_bucket"] = """
        WITH daily AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day, count(*)::BIGINT AS n
          FROM events GROUP BY 1
        )
        SELECT count(*)::BIGINT AS n_buckets,
               quantile_disc(n, 0.5)::BIGINT AS p50,
               quantile_disc(n, 0.9)::BIGINT AS p90
        FROM daily
"""

ORACLE_SQL["geo_bbox_filter"] = _GEO_BASE + """
        SELECT country_code AS cc, count(*)::BIGINT AS n_in_box
        FROM geo
        WHERE lat_cd BETWEEN -3000 AND 3000
          AND lon_cd BETWEEN -9000 AND 9000
        GROUP BY 1 ORDER BY 1
"""

# geo_polygon: convex CCW polygon from queries._GEO_POLYGON, unrolled as
# one edge-cross-product condition per edge — all int64 centi-degrees,
# bit-exact (condition: (x2-x1)*(lat-y1) - (y2-y1)*(lon-x1) >= 0)
ORACLE_SQL["geo_polygon_filter"] = _GEO_BASE + """
        SELECT country_code AS cc, count(*)::BIGINT AS n_in_poly
        FROM geo
        WHERE 12000 * (lat_cd - -4000) - -2000 * (lon_cd - -12000) >= 0
          AND 12000 * (lat_cd - -6000) - 4000 * (lon_cd - 0) >= 0
          AND -4000 * (lat_cd - -2000) - 7000 * (lon_cd - 12000) >= 0
          AND -16000 * (lat_cd - 5000) - 1000 * (lon_cd - 8000) >= 0
          AND -4000 * (lat_cd - 6000) - -10000 * (lon_cd - -8000) >= 0
        GROUP BY 1 ORDER BY 1
"""

# geo_line: per-user ordered location track (points ordered by the ES
# sort-field contract: event_id, then ip for determinism); top-10 users
# by point count, user_id asc tiebreak
ORACLE_SQL["geo_line_agg"] = _GEO_BASE + """
        , pts AS (
          SELECT e2.user_id, g.event_id, g.ip,
                 CAST(g.lat_cd AS VARCHAR) || ':'
                   || CAST(g.lon_cd AS VARCHAR) AS pt
          FROM geo g JOIN events e2 USING (event_id)
        ), ln AS (
          SELECT user_id, count(*)::BIGINT AS n_points,
                 string_agg(pt, '>' ORDER BY event_id, ip) AS line
          FROM pts GROUP BY 1
        )
        SELECT user_id, n_points, line FROM ln
        ORDER BY n_points DESC, user_id ASC LIMIT 10
"""

# bucket_correlation: Pearson r between the error and purchase per-day
# count series. Every moment is an exact BIGINT; the final expression is
# a single division chain evaluated once (same op tree as the engine),
# so neither side rounds.
ORACLE_SQL["bucket_correlation"] = """
        WITH daily AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day,
                 sum(CASE WHEN event_type = 'error' THEN 1
                     ELSE 0 END)::BIGINT AS x,
                 sum(CASE WHEN event_type = 'purchase' THEN 1
                     ELSE 0 END)::BIGINT AS y
          FROM events GROUP BY 1
        ), s AS (
          SELECT count(*)::BIGINT AS k,
                 sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                 sum(x * y)::BIGINT AS sxy,
                 sum(x * x)::BIGINT AS sxx,
                 sum(y * y)::BIGINT AS syy
          FROM daily
        )
        SELECT k AS n_buckets,
               CAST(k * sxy - sx * sy AS DOUBLE)
               / (sqrt(CAST(k * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(k * syy - sy * sy AS DOUBLE)))
                   AS correlation
        FROM s
"""

# pagerank: 5 unrolled integer fixed-point power iterations over the
# user k-cooccurrence graph — every op is BIGINT floor arithmetic, so
# engine and SQL agree bit-for-bit with no float tolerance at all
_PR_ITER_SQL = """
        , i{next} AS MATERIALIZED (
          SELECT e.dst AS u,
                 (SELECT base FROM consts)
                   + (85 * sum(it.p // dg.outdeg)) // 100 AS p
          FROM edges e
          JOIN i{cur} it ON it.u = e.src
          JOIN deg dg ON dg.src = e.src
          GROUP BY e.dst
        )"""

# MATERIALIZED everywhere: without it DuckDB re-inlines the shared
# CTEs through the 5 chained iteration joins and the recomputation
# cascade spilled >100 GB of temp at sf0.1 (measured; with
# materialization the same query runs in seconds)
ORACLE_SQL["pagerank"] = ("""
        WITH d AS MATERIALIZED (
          SELECT DISTINCT
                 CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)
                     AS k,
                 user_id AS u
          FROM events
        ), edges AS MATERIALIZED (
          SELECT DISTINCT a.u AS src, b.u AS dst
          FROM d a JOIN d b ON a.k = b.k AND a.u <> b.u
        ), deg AS MATERIALIZED (
          SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY 1
        ), consts AS MATERIALIZED (
          SELECT count(*)::BIGINT AS n,
                 (1000000000000 // count(*))::BIGINT AS p0,
                 ((15 * (1000000000000 // count(*))) // 100)::BIGINT
                     AS base
          FROM deg
        ), i0 AS (
          SELECT src AS u, (SELECT p0 FROM consts) AS p FROM deg
        )"""
    + "".join(_PR_ITER_SQL.format(cur=i, next=i + 1) for i in range(5))
    + """
        SELECT u AS user_id, CAST(p AS BIGINT) AS rank_fp FROM i5
        ORDER BY p DESC, u ASC LIMIT 20
""")

# update_by_query: docs matching 'merge' now carry lang 'xx'
ORACLE_SQL["update_by_query"] = f"""
        WITH tr AS (
          SELECT doc_id, {_CAMEL.format(col='text')} AS s FROM documents
        ), m AS (
          SELECT DISTINCT doc_id
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+')) AS t
                FROM tr)
          WHERE substr(t, 1, 64) = 'merge'
        )
        SELECT doc_id, 'xx' AS lang FROM m ORDER BY doc_id
"""

# security_detections: the k-keyed payload families (LAST assignment
# wins in the engine's suffix derivation, so the CASE tests the
# moduli in reverse order) mapped to the rule pack's (rule, severity)
ORACLE_SQL["security_detections"] = """
        WITH e AS (
          SELECT event_id,
                 CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)
                     AS k
          FROM events
        ), s AS (
          SELECT event_id,
                 CASE WHEN k % 31 = 0 THEN 'admin_probe'
                      WHEN k % 29 = 0 THEN 'xss_script'
                      WHEN k % 23 = 0 THEN 'path_traversal'
                      WHEN k % 17 = 0 THEN 'sqli_union'
                      ELSE NULL END AS rule
          FROM e
        )
        SELECT CASE rule
                 WHEN 'sqli_union' THEN 'CRITICAL'
                 WHEN 'path_traversal' THEN 'CRITICAL'
                 ELSE 'HIGH' END AS severity,
               rule, count(*)::BIGINT AS n_events
        FROM s WHERE rule IS NOT NULL
        GROUP BY 1, 2 ORDER BY severity, rule
"""

ORACLE_SQL["resumable_export"] = """
        SELECT (doc_id * 2654435761) % 8 AS shard_id,
               count(*)::BIGINT AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY 1 ORDER BY 1
"""

# eql_sequence_strict: greedy non-overlapping [error][purchase] within
# 30min, event-consuming — the recursive CTE steps the same
# (last-consumed purchase, count) state as the engine's two-pointer
ORACLE_SQL["eql_sequence_strict"] = """
        WITH RECURSIVE ee AS (
          SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts
          FROM events WHERE event_type = 'error'
        ), pp AS (
          SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts
          FROM events WHERE event_type = 'purchase'
        ), err AS (
          SELECT user_id, ts,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts) AS i
          FROM ee
        ), n_err AS (
          SELECT user_id, max(i) AS n FROM err GROUP BY 1
        ), m(user_id, i, last_p, cnt) AS (
          SELECT user_id, 0, CAST(-1 AS BIGINT), 0 FROM n_err
          UNION ALL
          SELECT m.user_id, m.i + 1,
                 coalesce((SELECT min(p.ts) FROM pp p
                           WHERE p.user_id = m.user_id
                             AND p.ts > greatest(e.ts, m.last_p)
                             AND p.ts <= e.ts + 1800000000), m.last_p),
                 m.cnt + CASE WHEN EXISTS (
                     SELECT 1 FROM pp p
                     WHERE p.user_id = m.user_id
                       AND p.ts > greatest(e.ts, m.last_p)
                       AND p.ts <= e.ts + 1800000000)
                   THEN 1 ELSE 0 END
          FROM m JOIN err e ON e.user_id = m.user_id AND e.i = m.i + 1
        )
        SELECT m.user_id, CAST(m.cnt AS BIGINT) AS n_sequences
        FROM m JOIN n_err USING (user_id)
        WHERE m.i = n_err.n AND m.cnt > 0 ORDER BY user_id
"""

ORACLE_SQL["ids_query"] = """
        SELECT doc_id, lang, sha256(text) AS sha256
        FROM documents WHERE doc_id IN (3, 141, 59, 999999999)
        ORDER BY doc_id
"""

# access_log_parse: status/bytes derive from k (status map k%7, bytes
# k*17%4096); the malformed family (k%41==0, unbalanced quote) fails
# the parse and lands in the -1 dead-letter bucket with zero bytes
ORACLE_SQL["access_log_parse"] = """
        WITH e AS (
          SELECT CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)
                     AS k
          FROM events
        ), s AS (
          SELECT CASE WHEN k % 41 = 0 THEN -1
                      ELSE list_extract([200, 200, 200, 404, 500,
                                         301, 403], 1 + k % 7)
                 END AS status,
                 CASE WHEN k % 41 = 0 THEN 0
                      ELSE (k * 17) % 4096 END AS b
          FROM e
        )
        SELECT CAST(status AS BIGINT) AS status, count(*)::BIGINT AS n,
               CAST(sum(b) AS BIGINT) AS total_bytes
        FROM s GROUP BY 1 ORDER BY 1
"""

# syslog_parse: the oracle recomputes the reference Statistics shape
# from the DERIVATION arithmetic; the engine must recover it by
# actually parsing the rendered RFC3164 lines (round-trip proof).
# username exists for sshd + CRON families, source ip for sshd only.
ORACLE_SQL["syslog_parse"] = """
        WITH e AS (
          SELECT CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)
                     AS k,
                 user_id AS uid
          FROM events
        ), s AS (
          SELECT CASE
                   WHEN k % 37 = 0 THEN '_malformed'
                   WHEN k % 5 = 0 THEN 'auth_failure'
                   WHEN k % 5 = 1 THEN 'auth_success'
                   WHEN k % 5 = 2 THEN 'session'
                   WHEN k % 5 = 3 THEN 'service'
                   ELSE 'kernel'
                 END AS etype,
                 CASE WHEN k % 37 <> 0 AND k % 5 IN (0, 1, 2)
                      THEN 'u' || CAST(uid AS VARCHAR) END AS username,
                 CASE WHEN k % 37 <> 0 AND k % 5 IN (0, 1)
                      THEN '10.0.' || CAST(uid % 4 AS VARCHAR) || '.'
                           || CAST(k % 256 AS VARCHAR) END AS ip
          FROM e
        )
        SELECT etype, count(*)::BIGINT AS n,
               count(DISTINCT username)::BIGINT AS unique_users,
               count(DISTINCT ip)::BIGINT AS unique_ips
        FROM s GROUP BY 1 ORDER BY 1
"""

# pack_bestfit: best-fit-decreasing is sequential, but DuckDB's
# recursive CTE can step the IDENTICAL algorithm state (the
# eql_sequence_strict / pagerank fixed-point convention): per lang the
# working row carries parallel lists (remaining capacity / count /
# total / first-doc per bin, list position - 1 == bin id), each
# iteration consumes the next item in (n_chars DESC, doc_id ASC)
# order and either best-fits it (list_min of fitting remainders;
# list_position takes the FIRST occurrence = lowest bin id, the tie
# rule) or opens a new bin (oversize bins get remaining -1 so nothing
# ever fits them — the dedicated-oversize-bin rule).
ORACLE_SQL["pack_bestfit"] = """
WITH RECURSIVE items AS (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id ASC) AS r
  FROM documents
), pack AS (
  SELECT lang, 0::BIGINT AS i,
         CAST([] AS BIGINT[]) AS rems,
         CAST([] AS BIGINT[]) AS cnts,
         CAST([] AS BIGINT[]) AS tots,
         CAST([] AS BIGINT[]) AS firsts
  FROM (SELECT DISTINCT lang FROM documents)
  UNION ALL
  SELECT p.lang, p.i + 1,
    CASE WHEN f.idx IS NULL THEN
      list_append(p.rems, CASE WHEN it.n_chars <= 10000
                               THEN 10000 - it.n_chars ELSE -1 END)
    ELSE p.rems[1:f.idx-1] || [f.best - it.n_chars] || p.rems[f.idx+1:]
    END,
    CASE WHEN f.idx IS NULL THEN list_append(p.cnts, 1)
    ELSE p.cnts[1:f.idx-1] || [p.cnts[f.idx] + 1] || p.cnts[f.idx+1:]
    END,
    CASE WHEN f.idx IS NULL THEN list_append(p.tots, it.n_chars)
    ELSE p.tots[1:f.idx-1] || [p.tots[f.idx] + it.n_chars]
         || p.tots[f.idx+1:] END,
    CASE WHEN f.idx IS NULL THEN list_append(p.firsts, it.doc_id)
    ELSE p.firsts[1:f.idx-1]
         || [least(p.firsts[f.idx], it.doc_id)] || p.firsts[f.idx+1:]
    END
  FROM pack p
  JOIN items it ON it.lang = p.lang AND it.r = p.i + 1,
  LATERAL (
    SELECT list_min(list_filter(p.rems, x -> x >= it.n_chars)) AS best,
           CASE WHEN it.n_chars <= 10000
                THEN list_position(p.rems,
                     list_min(list_filter(p.rems,
                                          x -> x >= it.n_chars)))
                END AS idx
  ) f
), final AS (
  SELECT p.lang, p.cnts, p.tots, p.firsts
  FROM pack p
  JOIN (SELECT lang, max(i) AS mi FROM pack GROUP BY 1) m
    ON p.lang = m.lang AND p.i = m.mi
)
SELECT lang, unnest(range(len(cnts)))::BIGINT AS bin_id,
       unnest(cnts)::BIGINT AS n_docs,
       unnest(tots)::BIGINT AS total_chars,
       unnest(firsts)::BIGINT AS first_doc,
       (unnest(tots) * 1000000 // 10000)::BIGINT AS fill_ppm
FROM final
ORDER BY lang, bin_id
"""

# profile_search: the per-query-term dictionary profile (term, df,
# sparse-regime flag) — df via the engine-tokenizer-equivalent SQL
# (the df_top_terms convention); the non-SQL pruning counters are
# invariant-checked inside the entry and pinned in test_engine.py.
ORACLE_SQL["profile_search"] = f"""
        WITH tr AS (
          SELECT doc_id, {{camel}} AS s FROM documents
        ), tok AS (
          SELECT DISTINCT doc_id, substr(t, 1, 64) AS term
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(s, '[^a-z0-9]+'))
                           AS t
                FROM tr)
          WHERE t <> ''
        ), q AS (
          SELECT unnest(['error', 'merge', 'spark', 'window']) AS term
        )
        SELECT q.term, count(tok.doc_id)::BIGINT AS df,
               (count(tok.doc_id) <= 4096) AS sparse
        FROM q LEFT JOIN tok ON tok.term = q.term
        GROUP BY 1 ORDER BY 1
""".format(camel=_CAMEL.format(col='text'))

# error_log_parse: the oracle recomputes the reference httpd_server
# Statistics shape (total_event / event_by_level / event_by_type as
# long-form rows) from the DERIVATION arithmetic; the engine must
# recover it by actually parsing the rendered Apache error lines.
ORACLE_SQL["error_log_parse"] = """
        WITH e AS (
          SELECT CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)
                     AS k
          FROM events
        ), s AS (
          SELECT CASE
                   WHEN k % 43 = 0 THEN '_malformed'
                   WHEN k % 6 <= 3 THEN 'error'
                   WHEN k % 6 = 4 THEN 'notice'
                   ELSE 'warn'
                 END AS level,
                 CASE
                   WHEN k % 43 = 0 THEN '_malformed'
                   WHEN k % 6 = 0 THEN 'unauthorized_access'
                   WHEN k % 6 = 1 THEN 'missing_file'
                   WHEN k % 6 = 2 THEN 'directory_traversal'
                   WHEN k % 6 = 3 THEN 'config_error'
                   WHEN k % 6 = 4 THEN 'other'
                   ELSE 'module_error'
                 END AS etype
          FROM e
        )
        SELECT dim, bucket, n FROM (
          SELECT 'level' AS dim, level AS bucket,
                 count(*)::BIGINT AS n FROM s GROUP BY 2
          UNION ALL
          SELECT 'type', etype, count(*)::BIGINT FROM s GROUP BY 2
          UNION ALL
          SELECT 'total', 'total_event', count(*)::BIGINT FROM s
          WHERE level <> '_malformed'
        ) ORDER BY dim, bucket
"""

# general_log_profile: the oracle recomputes the reference
# general_log pattern fields + EventStatistics (detected_formats /
# timestamp_patterns / categories / log_sources / unique_sources /
# total_events) from the DERIVATION arithmetic; the engine must
# recover it by profiling the rendered mixed-format lines.
ORACLE_SQL["general_log_profile"] = """
        WITH e AS (
          SELECT CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)
                     AS k
          FROM events
        ), s AS (
          SELECT CASE
                   WHEN k % 37 = 0 THEN 'unknown'
                   WHEN k % 4 = 0 THEN 'apache_combined'
                   WHEN k % 4 = 1 THEN 'apache_error'
                   WHEN k % 4 = 2 THEN 'syslog'
                   ELSE 'json'
                 END AS fmt,
                 CASE
                   WHEN k % 37 = 0 THEN 'none'
                   WHEN k % 4 = 0 THEN 'dd/Mon/yyyy:HH:MM:SS'
                   WHEN k % 4 = 1 THEN 'Day Mon dd HH:MM:SS yyyy'
                   WHEN k % 4 = 2 THEN 'Mon dd HH:MM:SS'
                   ELSE 'ISO8601'
                 END AS pat,
                 CASE
                   WHEN k % 37 = 0 THEN 'UNKNOWN'
                   WHEN k % 4 = 0 THEN 'ACCESS'
                   WHEN k % 4 = 1 THEN 'ERROR'
                   WHEN k % 4 = 2 THEN 'AUTHENTICATION'
                   ELSE 'PERFORMANCE'
                 END AS cat,
                 CASE
                   WHEN k % 37 = 0 THEN '_none'
                   WHEN k % 4 IN (0, 1) THEN 'httpd'
                   WHEN k % 4 = 2 THEN 'sshd(pam_unix)'
                   ELSE 'app' || CAST(k % 3 AS VARCHAR)
                 END AS src
          FROM e
        )
        SELECT dim, bucket, n FROM (
          SELECT 'format' AS dim, fmt AS bucket,
                 count(*)::BIGINT AS n FROM s GROUP BY 2
          UNION ALL
          SELECT 'ts_pattern', pat, count(*)::BIGINT FROM s GROUP BY 2
          UNION ALL
          SELECT 'category', cat, count(*)::BIGINT FROM s GROUP BY 2
          UNION ALL
          SELECT 'source', src, count(*)::BIGINT FROM s GROUP BY 2
          UNION ALL
          SELECT 'summary', 'unique_sources',
                 count(DISTINCT src)::BIGINT FROM s
          WHERE src <> '_none'
          UNION ALL
          SELECT 'summary', 'total_events', count(*)::BIGINT FROM s
        ) ORDER BY dim, bucket
"""

# zorder_layout: the SAME unrolled Morton interleave the engine kernel
# runs, generated from the identical Python (_morton16_sql); every term
# fully parenthesized — DuckDB gives &, |, << equal precedence
ORACLE_SQL["zorder_layout"] = """
        WITH coded AS (
          SELECT (((((user_id & 65535) >> 0) & 1) << 0) | (((((epoch_us(ts) // 86400000000) & 65535) >> 0) & 1) << 1) | ((((user_id & 65535) >> 1) & 1) << 2) | (((((epoch_us(ts) // 86400000000) & 65535) >> 1) & 1) << 3) | ((((user_id & 65535) >> 2) & 1) << 4) | (((((epoch_us(ts) // 86400000000) & 65535) >> 2) & 1) << 5) | ((((user_id & 65535) >> 3) & 1) << 6) | (((((epoch_us(ts) // 86400000000) & 65535) >> 3) & 1) << 7) | ((((user_id & 65535) >> 4) & 1) << 8) | (((((epoch_us(ts) // 86400000000) & 65535) >> 4) & 1) << 9) | ((((user_id & 65535) >> 5) & 1) << 10) | (((((epoch_us(ts) // 86400000000) & 65535) >> 5) & 1) << 11) | ((((user_id & 65535) >> 6) & 1) << 12) | (((((epoch_us(ts) // 86400000000) & 65535) >> 6) & 1) << 13) | ((((user_id & 65535) >> 7) & 1) << 14) | (((((epoch_us(ts) // 86400000000) & 65535) >> 7) & 1) << 15) | ((((user_id & 65535) >> 8) & 1) << 16) | (((((epoch_us(ts) // 86400000000) & 65535) >> 8) & 1) << 17) | ((((user_id & 65535) >> 9) & 1) << 18) | (((((epoch_us(ts) // 86400000000) & 65535) >> 9) & 1) << 19) | ((((user_id & 65535) >> 10) & 1) << 20) | (((((epoch_us(ts) // 86400000000) & 65535) >> 10) & 1) << 21) | ((((user_id & 65535) >> 11) & 1) << 22) | (((((epoch_us(ts) // 86400000000) & 65535) >> 11) & 1) << 23) | ((((user_id & 65535) >> 12) & 1) << 24) | (((((epoch_us(ts) // 86400000000) & 65535) >> 12) & 1) << 25) | ((((user_id & 65535) >> 13) & 1) << 26) | (((((epoch_us(ts) // 86400000000) & 65535) >> 13) & 1) << 27) | ((((user_id & 65535) >> 14) & 1) << 28) | (((((epoch_us(ts) // 86400000000) & 65535) >> 14) & 1) << 29) | ((((user_id & 65535) >> 15) & 1) << 30) | (((((epoch_us(ts) // 86400000000) & 65535) >> 15) & 1) << 31)) AS z,
                 user_id,
                 ((epoch_us(ts) // 86400000000) & 65535) AS day
          FROM events
        )
        SELECT ((z - (SELECT min(z) FROM coded)) * 16)
                 // ((SELECT max(z) FROM coded)
                     - (SELECT min(z) FROM coded) + 1) AS zpart,
               count(*)::BIGINT AS n,
               min(z)::BIGINT AS zmin, max(z)::BIGINT AS zmax,
               min(user_id)::BIGINT AS umin, max(user_id)::BIGINT AS umax,
               min(day)::BIGINT AS dmin, max(day)::BIGINT AS dmax
        FROM coded GROUP BY 1 ORDER BY 1
"""

# fastText-style hashed-feature classifier: md5 low-32 feature hash,
# Knuth multiplicative weights, sigmoid of the mean token weight; rank
# by the UNROUNDED score like every scored oracle
ORACLE_SQL["hashed_ngram_classifier"] = """
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text),
                                               '[^a-z0-9]+'),
                         x -> x <> '') AS arr
      FROM documents
    ), g AS (
      SELECT doc_id, unnest(arr) AS tok FROM t WHERE len(arr) > 0
    ), f AS (
      SELECT doc_id,
             (('0x' || substr(md5(tok), 1, 8))::BIGINT % 256) AS j
      FROM g
    ), s AS (
      SELECT doc_id,
             sum(((j * 2654435761) % 4294967296) / 2147483648.0 - 1.0)
                 AS sw,
             count(*)::BIGINT AS n_tokens
      FROM f GROUP BY 1
    )
    SELECT doc_id, n_tokens,
           round(1.0 / (1.0 + exp(-(sw / n_tokens))), 6) AS score
    FROM s
    ORDER BY 1.0 / (1.0 + exp(-(sw / n_tokens))) DESC, doc_id ASC
    LIMIT 10
"""

# stride-16 / window-32 token chunker over the 1%-sampled docs;
# generate_series starts mirror range(0, n, S)
ORACLE_SQL["sliding_window_chunks"] = """
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text),
                                               '[^a-z0-9]+'),
                         x -> x <> '') AS arr
      FROM documents WHERE doc_id % 101 = 0
    ), c AS (
      SELECT doc_id, arr,
             unnest([s FOR s IN
                     generate_series(0, len(arr) - 1, 16)]) AS s
      FROM t WHERE len(arr) > 0
    )
    SELECT doc_id, (s // 16)::BIGINT AS chunk_id,
           least(32, len(arr) - s)::BIGINT AS chunk_len,
           array_to_string(list_slice(arr, s + 1, s + 32), ' ')
               AS chunk_text
    FROM c ORDER BY doc_id, chunk_id
"""

# nested query reduces to a flat filtered group-by (the nesting is the
# Ray pipeline's work, not the math's) — cf. nested_severity_histogram
ORACLE_SQL["nested_events_query"] = f"""
    SELECT user_id, count(*)::BIGINT AS n_inner,
           round(max(value), 6) AS max_value
    FROM events
    WHERE {_SEVERITY_CASE} <= 2 AND value >= 99.5
    GROUP BY 1 ORDER BY n_inner DESC, user_id ASC LIMIT 20
"""

# variable-width histogram: distinct round(value,1) domain, 7 largest
# lag-window gaps become boundaries (tie -> lower value), bucket =
# number of cut values <= round(value,1)
ORACLE_SQL["variable_width_histogram"] = """
    WITH d AS (SELECT DISTINCT round(value, 1) AS v FROM events),
    g AS (SELECT v, v - lag(v) OVER (ORDER BY v) AS gap FROM d),
    cuts AS (
      SELECT v FROM g WHERE gap IS NOT NULL
      ORDER BY gap DESC, v ASC LIMIT 7
    )
    SELECT (SELECT count(*) FROM cuts c
            WHERE c.v <= round(e.value, 1))::BIGINT AS bucket,
           count(*)::BIGINT AS n,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value
    FROM events e GROUP BY 1 ORDER BY 1
"""

# seeded random_score: md5('42:' || doc_id) low-32 / 2^32
ORACLE_SQL["random_score"] = """
    SELECT doc_id,
           round(('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)),
                                 1, 8))::BIGINT / 4294967296.0, 6)
               AS score
    FROM documents WHERE lang = 'en'
    ORDER BY ('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)),
                             1, 8))::BIGINT DESC, doc_id ASC
    LIMIT 10
"""

# gauss decay: exp(ln(0.5)/scale^2 * max(0,|x-origin|-offset)^2),
# same op tree as the engine (libm parity)
ORACLE_SQL["gauss_decay_score"] = """
    WITH s AS (
      SELECT doc_id, n_chars,
             exp((ln(0.5) / (100.0 * 100.0))
                 * pow(greatest(abs(n_chars - 300.0) - 20.0, 0.0), 2))
                 AS score
      FROM documents
    )
    SELECT doc_id, n_chars, round(score, 6) AS score FROM s
    ORDER BY score DESC, doc_id ASC LIMIT 15
"""


# distributed Gram matrix: vec self-join on subscripts, upper triangle
ORACLE_SQL["embedding_gram"] = """
    WITH e AS (
      SELECT vec_id, t.i AS i, embedding[t.i]::DOUBLE AS x
      FROM embeddings,
           unnest(generate_series(1, len(embedding))) AS t(i)
    )
    SELECT (a.i - 1)::BIGINT AS i, (b.i - 1)::BIGINT AS j,
           round(sum(a.x * b.x), 6) AS g
    FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY 1, 2 ORDER BY 1, 2
"""

# power iteration on the round6-pinned Gram matrix, 8 steps unrolled
# (v0 = 1/sqrt(64) = 0.125 exactly; eigenvalue = last step's norm)
ORACLE_SQL["embedding_pca_power"] = """
    WITH e AS MATERIALIZED (
      SELECT vec_id, t.i AS i, embedding[t.i]::DOUBLE AS x
      FROM embeddings,
           unnest(generate_series(1, len(embedding))) AS t(i)
    ), ug AS MATERIALIZED (
      SELECT (a.i - 1) AS i, (b.i - 1) AS j, round(sum(a.x * b.x), 6) AS g
      FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2
    ), gm AS MATERIALIZED (
      SELECT i, j, g FROM ug
      UNION ALL SELECT j, i, g FROM ug WHERE i < j
    ), v0 AS MATERIALIZED (SELECT i, 0.125 AS val FROM range(64) t(i)),
    m1 AS MATERIALIZED (
      SELECT gm.i AS i, sum(gm.g * v0.val) AS val
      FROM gm JOIN v0 ON gm.j = v0.i GROUP BY 1
    ), n1 AS MATERIALIZED (SELECT sqrt(sum(val * val)) AS nrm FROM m1),
    v1 AS MATERIALIZED (SELECT i, val / (SELECT nrm FROM n1) AS val FROM m1),
    m2 AS MATERIALIZED (
      SELECT gm.i AS i, sum(gm.g * v1.val) AS val
      FROM gm JOIN v1 ON gm.j = v1.i GROUP BY 1
    ), n2 AS MATERIALIZED (SELECT sqrt(sum(val * val)) AS nrm FROM m2),
    v2 AS MATERIALIZED (SELECT i, val / (SELECT nrm FROM n2) AS val FROM m2),
    m3 AS MATERIALIZED (
      SELECT gm.i AS i, sum(gm.g * v2.val) AS val
      FROM gm JOIN v2 ON gm.j = v2.i GROUP BY 1
    ), n3 AS MATERIALIZED (SELECT sqrt(sum(val * val)) AS nrm FROM m3),
    v3 AS MATERIALIZED (SELECT i, val / (SELECT nrm FROM n3) AS val FROM m3),
    m4 AS MATERIALIZED (
      SELECT gm.i AS i, sum(gm.g * v3.val) AS val
      FROM gm JOIN v3 ON gm.j = v3.i GROUP BY 1
    ), n4 AS MATERIALIZED (SELECT sqrt(sum(val * val)) AS nrm FROM m4),
    v4 AS MATERIALIZED (SELECT i, val / (SELECT nrm FROM n4) AS val FROM m4),
    m5 AS MATERIALIZED (
      SELECT gm.i AS i, sum(gm.g * v4.val) AS val
      FROM gm JOIN v4 ON gm.j = v4.i GROUP BY 1
    ), n5 AS MATERIALIZED (SELECT sqrt(sum(val * val)) AS nrm FROM m5),
    v5 AS MATERIALIZED (SELECT i, val / (SELECT nrm FROM n5) AS val FROM m5),
    m6 AS MATERIALIZED (
      SELECT gm.i AS i, sum(gm.g * v5.val) AS val
      FROM gm JOIN v5 ON gm.j = v5.i GROUP BY 1
    ), n6 AS MATERIALIZED (SELECT sqrt(sum(val * val)) AS nrm FROM m6),
    v6 AS MATERIALIZED (SELECT i, val / (SELECT nrm FROM n6) AS val FROM m6),
    m7 AS MATERIALIZED (
      SELECT gm.i AS i, sum(gm.g * v6.val) AS val
      FROM gm JOIN v6 ON gm.j = v6.i GROUP BY 1
    ), n7 AS MATERIALIZED (SELECT sqrt(sum(val * val)) AS nrm FROM m7),
    v7 AS MATERIALIZED (SELECT i, val / (SELECT nrm FROM n7) AS val FROM m7),
    m8 AS MATERIALIZED (
      SELECT gm.i AS i, sum(gm.g * v7.val) AS val
      FROM gm JOIN v7 ON gm.j = v7.i GROUP BY 1
    ), n8 AS MATERIALIZED (SELECT sqrt(sum(val * val)) AS nrm FROM m8),
    v8 AS MATERIALIZED (SELECT i, val / (SELECT nrm FROM n8) AS val FROM m8)
    SELECT v8.i::BIGINT AS i, round(v8.val, 6) AS loading,
           round((SELECT nrm FROM n8), 6) AS eigenvalue
    FROM v8 ORDER BY i
"""

ORACLE_SQL["has_child_topk"] = """
    WITH cs AS (
      SELECT l_orderkey,
             max(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                            + 0.5) AS BIGINT)) AS child_score_cents
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey
    )
    SELECT o.o_orderkey, o.o_orderstatus, cs.child_score_cents
    FROM orders o JOIN cs ON cs.l_orderkey = o.o_orderkey
    ORDER BY cs.child_score_cents DESC, o.o_orderkey ASC LIMIT 10
"""

ORACLE_SQL["has_parent_agg"] = """
    SELECT l.l_returnflag, count(*) AS n_items,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["latest_transform"] = """
    SELECT user_id, event_id, event_type, round(value, 6) AS value,
           epoch_us(ts) AS ts_us
    FROM (SELECT *, row_number() OVER (
              PARTITION BY user_id
              ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1 ORDER BY user_id
"""

ORACLE_SQL["knn_outlier"] = """
    WITH sub AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE vec_id < 2048
    ), pairs AS (
      SELECT a.vec_id AS vec_id,
             1 - list_cosine_similarity(a.v, b.v) AS d
      FROM sub a JOIN sub b ON a.vec_id <> b.vec_id
    ), ranked AS (
      SELECT vec_id, d, row_number() OVER (
          PARTITION BY vec_id ORDER BY d ASC) AS rn
      FROM pairs
    )
    SELECT vec_id, round(d, 6) AS knn_distance
    FROM ranked WHERE rn = 10
    ORDER BY d DESC, vec_id ASC LIMIT 20
"""

ORACLE_SQL["graph_explore"] = """
    WITH seed AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    ), hop AS (
      SELECT e.event_type, count(*) AS n,
             count(DISTINCT e.user_id) AS nu
      FROM events e JOIN seed s ON e.user_id = s.user_id
      WHERE e.event_type <> 'error' GROUP BY 1
    )
    SELECT event_type, n, nu FROM hop
    ORDER BY nu DESC, n DESC, event_type ASC
"""

ORACLE_SQL["perplexity_buckets"] = """
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text),
                                               '[^a-z0-9]+'),
                         x -> x <> '') AS arr
      FROM documents
    ), g AS (
      SELECT doc_id,
             unnest([arr[i] || ' ' || arr[i+1]
                     FOR i IN generate_series(1, len(arr) - 1)])
                 AS pair,
             unnest([arr[i]
                     FOR i IN generate_series(1, len(arr) - 1)])
                 AS w1
      FROM t WHERE len(arr) >= 2
    ), c1 AS (
      SELECT w, count(*)::DOUBLE AS c
      FROM (SELECT unnest(arr) AS w FROM t) GROUP BY 1
    ), vv AS (SELECT count(*)::DOUBLE AS v FROM c1),
    c2 AS (
      SELECT pair, count(*)::DOUBLE AS c FROM g GROUP BY 1
    ), s AS (
      SELECT g.doc_id,
             -sum(ln((c2.c + 1) / (c1.c + vv.v))) AS nll,
             count(*)::BIGINT AS n_pairs
      FROM g JOIN c2 USING (pair)
      JOIN c1 ON c1.w = g.w1 CROSS JOIN vv
      GROUP BY 1
    ), r AS (
      SELECT d.lang, s.doc_id, s.nll / s.n_pairs AS a,
             row_number() OVER (PARTITION BY d.lang
                 ORDER BY s.nll / s.n_pairs ASC, s.doc_id ASC) AS rn,
             count(*) OVER (PARTITION BY d.lang) AS cnt
      FROM s JOIN documents d USING (doc_id)
    )
    SELECT lang, CAST((3 * (rn - 1)) // cnt AS BIGINT) AS bucket,
           count(*)::BIGINT AS n_docs,
           round(min(a), 6) AS lo, round(max(a), 6) AS hi
    FROM r GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLE_SQL["winnowing_fingerprints"] = """
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text),
                                               '[^a-z0-9]+'),
                         x -> x <> '') AS arr
      FROM documents
    ), g AS (
      SELECT doc_id, i,
             md5(arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]) AS h,
             len(arr) - 2 AS ng
      FROM t, unnest(generate_series(1, len(arr) - 2)) AS u(i)
      WHERE len(arr) >= 3
    ), k AS (
      SELECT doc_id, i, ng,
             h || lpad(CAST(1000000000 - i AS VARCHAR), 10, '0') AS key
      FROM g
    ), wmin AS (
      SELECT doc_id, i, ng,
             min(key) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN 3 PRECEDING
                            AND CURRENT ROW) AS wkey
      FROM k
    ), sel AS (
      SELECT DISTINCT doc_id, substr(wkey, 1, 32) AS h
      FROM wmin WHERE i >= 4 OR (ng < 4 AND i = ng)
    ), cap AS (
      -- mirror the entry's corpus-aware max_group="auto" cap:
      -- min(10k, max(64, int(4*sqrt(n_docs)) + 1)); boilerplate
      -- fingerprints shared by more docs are excluded on BOTH sides
      SELECT least(10000, greatest(64,
               CAST(trunc(4 * sqrt(count(*))) AS BIGINT) + 1)) AS g
      FROM documents
    ), keep AS (
      SELECT h FROM sel GROUP BY h
      HAVING count(*) <= (SELECT g FROM cap)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*)::BIGINT AS shared
    FROM sel a JOIN sel b ON a.h = b.h AND a.doc_id < b.doc_id
    JOIN keep k ON k.h = a.h
    GROUP BY 1, 2 ORDER BY shared DESC, doc_a ASC, doc_b ASC LIMIT 15
"""

ORACLE_SQL["mixture_unimax"] = """
    WITH RECURSIVE tk AS (
      SELECT lang,
             sum(len(regexp_extract_all(lower(text),
                 '[a-z0-9]+')))::BIGINT AS tokens
      FROM documents GROUP BY 1
    ), tot AS (SELECT sum(tokens)::BIGINT AS b FROM tk),
    caps AS (
      SELECT lang, tokens, 2 * tokens AS cap,
             row_number() OVER (ORDER BY 2 * tokens ASC, lang ASC) AS rn,
             count(*) OVER () AS n
      FROM tk
    ), alloc AS (
      SELECT c.rn, c.n, c.lang, c.tokens, c.cap,
             least(c.cap, (SELECT b FROM tot) // c.n) AS a,
             (SELECT b FROM tot)
               - least(c.cap, (SELECT b FROM tot) // c.n) AS rem
      FROM caps c WHERE c.rn = 1
      UNION ALL
      SELECT c.rn, c.n, c.lang, c.tokens, c.cap,
             least(c.cap, p.rem // (c.n - c.rn + 1)),
             p.rem - least(c.cap, p.rem // (c.n - c.rn + 1))
      FROM caps c JOIN alloc p ON c.rn = p.rn + 1
    )
    SELECT lang, tokens, CAST(cap AS BIGINT) AS cap,
           CAST(a AS BIGINT) AS alloc,
           CAST((a * 1000000) // tokens AS BIGINT) AS epochs_ppm
    FROM alloc ORDER BY lang
"""

# KQL: lang:en and (merge or "sort merge") and not error — candidate
# predicate over keyword field + term/phrase union + exclusion, scored
# by the shared BM25 CTE over the positive text terms (merge, sort)
# simple_query_string: q(term) is a SELECT (not VALUES) because the
# prefix wildcard's expansions score too — the engine ranks over
# merge/sort/spark plus every content term starting with 'windo'
ORACLE_SQL["simple_query_string"] = _bm25_base("('merge')").replace(
    "q(term) AS (VALUES ('merge'))",
    "q(term) AS (SELECT DISTINCT term FROM tf WHERE term IN "
    "('merge', 'sort', 'spark') OR term LIKE 'windo%')") + f"""
    , arr AS (
      SELECT doc_id, {_PHRASE_ARR} AS arr FROM documents
    ), ph AS (
      SELECT doc_id FROM arr
      WHERE len(arr) >= 2
        AND len([i FOR i IN generate_series(1, len(arr) - 1)
                 IF arr[i] = 'sort' AND arr[i+1] = 'merge']) > 0
    )
    SELECT s.doc_id, round(s.score, 6) AS score
    FROM scores s
    WHERE (
        (s.doc_id IN (SELECT doc_id FROM tf WHERE term = 'merge')
         OR s.doc_id IN (SELECT doc_id FROM ph))
        AND s.doc_id IN (SELECT doc_id FROM tf
                         WHERE term LIKE 'windo%')
        AND s.doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'join')
      )
      OR s.doc_id IN (SELECT doc_id FROM tf WHERE term = 'spark')
    ORDER BY s.score DESC, s.doc_id ASC LIMIT 10
"""

ORACLE_SQL["kql_search"] = _bm25_base("('merge'), ('sort')") + f"""
    , arr AS (
      SELECT doc_id, {_PHRASE_ARR} AS arr FROM documents
    ), ph AS (
      SELECT doc_id FROM arr
      WHERE len(arr) >= 2
        AND len([i FOR i IN generate_series(1, len(arr) - 1)
                 IF arr[i] = 'sort' AND arr[i+1] = 'merge']) > 0
    )
    SELECT s.doc_id, round(s.score, 6) AS score
    FROM scores s JOIN documents d USING (doc_id)
    WHERE d.lang = 'en'
      AND (s.doc_id IN (SELECT doc_id FROM tf WHERE term = 'merge')
           OR s.doc_id IN (SELECT doc_id FROM ph))
      AND s.doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'error')
    ORDER BY s.score DESC, s.doc_id ASC LIMIT 10
"""


# analyze_linux2k / analyze_apache100: the strongest parity evidence —
# the oracle re-parses the reference's OWN raw sample corpus
# (fixed-size real files; CONTRIBUTING.md:71-77 prescribes exactly
# these as the analyzers' manual-test inputs) with the SAME RE2
# patterns in DuckDB, independently reproducing the Ray parser's
# Statistics rollup (ground truth: 490 auth_failure / 246 session on
# linux-2k). read_csv with a sentinel delim + disabled quoting reads
# raw lines; both files were checked free of the sentinel.
ORACLE_SQL["analyze_linux2k"] = r"""
    WITH raw AS (
      SELECT line FROM read_csv(
          '/root/reference/sample-logs/linux-2k.log',
          header=false, delim=chr(1), quote='', escape='',
          columns={'line': 'VARCHAR'})
    ), p AS (
      SELECT
        regexp_matches(line,
          '^[A-Z][a-z]{2} +\d{1,2} \d{2}:\d{2}:\d{2} \S+ [A-Za-z0-9_.-]+(?:\([A-Za-z0-9_.-]+\))?(?:\[\d+\])?: ')
          AS ok,
        regexp_extract(line,
          '^([A-Z][a-z]{2}) +(\d{1,2}) (\d{2}:\d{2}:\d{2}) (\S+) ([A-Za-z0-9_.-]+(?:\([A-Za-z0-9_.-]+\))?)(?:\[(\d+)\])?: (.*)$',
          ['mon','day','time','host','proc','pid','msg']) AS g
      FROM raw
    ), c AS (
      SELECT
        CASE WHEN NOT ok THEN '_malformed'
             WHEN regexp_matches(g.msg,
                 '^Failed password|authentication failure')
                 THEN 'auth_failure'
             WHEN regexp_matches(g.msg, '^Accepted password')
                 THEN 'auth_success'
             WHEN regexp_matches(g.msg,
                 '^pam_unix|session (?:opened|closed)') THEN 'session'
             WHEN g.proc = 'kernel' THEN 'kernel'
             WHEN g.proc = 'systemd' THEN 'service'
             ELSE 'other' END AS etype,
        CASE WHEN ok THEN coalesce(
            nullif(regexp_extract(g.msg,
                '(?:for user |for )(?:invalid user )?(\S+?)(?: from| port| by|$)',
                1), ''),
            nullif(regexp_extract(g.msg, '\buser=(\S+)', 1), ''))
        END AS username,
        CASE WHEN ok THEN coalesce(
            nullif(regexp_extract(g.msg, 'from ([0-9.]+) port', 1), ''),
            nullif(regexp_extract(g.msg, '\brhost=([0-9.]+)(?:\s|$)',
                                  1), ''))
        END AS ip
      FROM p
    )
    SELECT etype, count(*)::BIGINT AS n,
           count(DISTINCT username)::BIGINT AS unique_users,
           count(DISTINCT ip)::BIGINT AS unique_ips
    FROM c GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["analyze_apache100"] = r"""
    WITH raw AS (
      SELECT line FROM read_csv(
          '/root/reference/sample-logs/apache-100.log',
          header=false, delim=chr(1), quote='', escape='',
          columns={'line': 'VARCHAR'})
    ), p AS (
      SELECT
        regexp_matches(line,
          '^\[[A-Z][a-z]{2} [A-Z][a-z]{2} +\d{1,2} \d{2}:\d{2}:\d{2} \d{4}\] \[[a-z]+\](?: \[client [0-9.]+\])? ')
          AS ok,
        regexp_extract(line,
          '^\[([A-Z][a-z]{2}) ([A-Z][a-z]{2}) +(\d{1,2}) (\d{2}:\d{2}:\d{2}) (\d{4})\] \[([a-z]+)\](?: \[client ([0-9.]+)\])? (.*)$',
          ['dow','mon','day','time','year','level','client','msg'])
          AS g
      FROM raw
    ), c AS (
      SELECT
        CASE WHEN ok THEN g.level ELSE '_malformed' END AS level,
        CASE WHEN NOT ok THEN '_malformed'
             WHEN regexp_matches(g.msg, '%252e|%2e%2e|\.\./')
                 THEN 'directory_traversal'
             WHEN regexp_matches(g.msg, '^Invalid method in request')
                 THEN 'invalid_http_method'
             WHEN regexp_matches(g.msg, '^Directory index forbidden')
                 THEN 'unauthorized_access'
             WHEN regexp_matches(g.msg, '^File does not exist')
                 THEN 'missing_file'
             WHEN regexp_matches(g.msg, $$Can't create|Factory error$$)
                 THEN 'config_error'
             WHEN regexp_matches(g.msg, '^mod_jk|^workerEnv')
                 THEN 'module_error'
             ELSE 'other' END AS etype
      FROM p
    ), long AS (
      SELECT 'level' AS dim, level AS bucket FROM c
      UNION ALL
      SELECT 'etype' AS dim, etype AS bucket FROM c
    )
    SELECT dim, bucket, count(*)::BIGINT AS n
    FROM long GROUP BY 1, 2 ORDER BY 1, 2
"""


# esql_categorize: the SAME three-pass RE2 template cascade as the
# engine (digit-bearing tokens -> "*", "*" runs collapse, whitespace
# normalized, trimmed) — both sides RE2, so byte-identical categories
ORACLE_SQL["esql_categorize"] = r"""
    WITH m AS (
      SELECT user_id,
             'user ' || CAST(user_id AS VARCHAR) || ' action '
               || event_type || ' took '
               || CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)
               || ' us' AS msg
      FROM events
    ), c AS (
      SELECT user_id,
             trim(regexp_replace(regexp_replace(regexp_replace(
                 msg, '\S*\d\S*', '*', 'g'),
                 '\*(?:\s+\*)+', '*', 'g'),
                 '\s+', ' ', 'g')) AS cat
      FROM m
    )
    SELECT cat, count(*)::BIGINT AS n,
           count(DISTINCT user_id)::BIGINT AS users
    FROM c GROUP BY 1 ORDER BY 1
"""

# esql_date_diff: epoch-microsecond integer division (every diff is
# positive — min(ts) > the anchor — so floor division == the ES
# trunc-toward-zero contract); greatest/least need no null guard here
# (ts and the literals are non-null)
ORACLE_SQL["esql_date_diff"] = """
    WITH e AS (
      SELECT epoch_us(ts)
               - epoch_us(TIMESTAMP '2024-01-01 00:00:00') AS du,
             (year(ts) - 2023) * 12 + (month(ts) - 11) AS mraw,
             -- intra-month position; DuckDB microsecond() includes
             -- the seconds component (= (…*60+s)*1e6 + us)
             (((day(ts) * 24 + hour(ts)) * 60 + minute(ts)) * 60)
               * 1000000 + microsecond(ts) AS pos2
      FROM events
    ), d AS (
      SELECT du // 86400000000 AS days,
             du // 3600000000 AS hours,
             mraw - CASE WHEN mraw > 0
                          AND pos2 < ((15 * 24 + 12) * 60 * 60)
                                       * CAST(1000000 AS BIGINT)
                         THEN 1 ELSE 0 END AS months
      FROM e
    )
    SELECT days, count(*)::BIGINT AS n, max(hours) AS hmax,
           min(greatest(days, 10)) AS gmin,
           max(least(hours, 200)) AS lmax,
           min(months) AS momin, max(months) AS momax
    FROM d GROUP BY 1 ORDER BY 1
"""


# esql_hash_functions: digests compared byte-for-byte; DuckDB's
# bit_length/octet_length already count UTF-8 bytes, matching the
# engine's binary_length semantics
ORACLE_SQL["esql_hash_functions"] = """
    WITH e AS (
      SELECT md5(lang) AS h, sha256(lang) AS sh,
             to_base64(encode(lang)) AS b,
             decode(from_base64(to_base64(encode(lang)))) AS r,
             bit_length(text) AS bl, octet_length(encode(source)) AS ob
      FROM documents
    )
    SELECT h, sh, b, r, count(*)::BIGINT AS n,
           sum(bl)::BIGINT AS bits, sum(ob)::BIGINT AS obytes
    FROM e GROUP BY 1, 2, 3, 4 ORDER BY 1
"""


# esql_mad: two-level quantile_disc — the entry's exact element-pick
# median convention on both levels, over integer centi-units
ORACLE_SQL["esql_mad"] = """
    WITH e AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
      FROM events
    ), m AS (
      SELECT event_type, quantile_disc(v, 0.5) AS med
      FROM e GROUP BY 1
    )
    SELECT e.event_type,
           quantile_disc(abs(e.v - m.med), 0.5)::BIGINT AS mad,
           m.med::BIGINT AS med, count(*)::BIGINT AS n
    FROM e JOIN m USING (event_type)
    GROUP BY 1, m.med ORDER BY 1
"""


# analyze_categorize: the same three-pass RE2 template cascade over the
# same raw reference corpus, top 20 by (n desc, category asc)
ORACLE_SQL["analyze_categorize"] = r"""
    WITH raw AS (
      SELECT line FROM read_csv(
          '/root/reference/sample-logs/linux-2k.log',
          header=false, delim=chr(1), quote='', escape='',
          columns={'line': 'VARCHAR'})
    ), c AS (
      SELECT trim(regexp_replace(regexp_replace(regexp_replace(
                 line, '\S*\d\S*', '*', 'g'),
                 '\*(?:\s+\*)+', '*', 'g'),
                 '\s+', ' ', 'g')) AS category
      FROM raw
    )
    SELECT category, count(*)::BIGINT AS n
    FROM c GROUP BY 1 ORDER BY n DESC, category ASC LIMIT 20
"""


# msearch_template: UNION ALL of the two rendered requests'
# filtered-BM25 selects (rendering adds zero scoring surface); each
# branch carries its own top-10 cut before the union
ORACLE_SQL["msearch_template"] = _BM25_BASE + """
    SELECT * FROM (
      SELECT 0::BIGINT AS query_id, s.doc_id,
             round(s.score, 6) AS score
      FROM scores s JOIN documents d USING (doc_id)
      WHERE d.lang = 'es'
      ORDER BY s.score DESC, s.doc_id ASC LIMIT 10)
    UNION ALL
    SELECT * FROM (
      SELECT 1::BIGINT AS query_id, s.doc_id,
             round(s.score, 6) AS score
      FROM scores s JOIN documents d USING (doc_id)
      WHERE d.lang = 'fr'
      ORDER BY s.score DESC, s.doc_id ASC LIMIT 10)
    ORDER BY query_id, score DESC, doc_id ASC
"""
