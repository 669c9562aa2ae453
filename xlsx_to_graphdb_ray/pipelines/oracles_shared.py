"""DuckDB oracles for the relational / stream / dedup / text / ANN queries.

The driver pre-registers the shared testdata tables as views (region nation
customer supplier part orders lineitem events documents embeddings);
synthetic corpora are referenced by ``read_parquet`` path.
"""

from __future__ import annotations

from .. import synth
from ..stages.dedup_docs import JACCARD_T, K_HASHES, N_BANDS
from ..stages.textstats import (LANG_MARKERS, LM_PPM_MIN, LM_RARE_MAX,
                                LM_RARE_PERMYRIAD_MAX, PII_PATTERNS,
                                REP_DUP_3GRAM_MAX, REP_TOP_TOKEN_MAX,
                                STOPWORDS)
from .training import ANN_QUERY_IDS


def relational_oracles() -> dict[str, str]:
    return {
        "rel_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "rel_top_parts": """
            SELECT l_partkey, count(*) AS n FROM lineitem
            GROUP BY l_partkey ORDER BY n DESC, l_partkey LIMIT 10""",
        "rel_parts_having": """
            SELECT l_partkey, count(*) AS n FROM lineitem
            GROUP BY l_partkey HAVING count(*) > 40""",
        "rel_brand_revenue": """
            SELECT p.p_brand,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                       AS revenue,
                   count(*) AS n
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY p.p_brand""",
        "rel_top_customers": """
            SELECT o.o_custkey, round(sum(o.o_totalprice), 2) AS total,
                   count(*) AS n_orders, any_value(c.c_name) AS c_name
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY o.o_custkey
            ORDER BY total DESC, o.o_custkey LIMIT 10""",
        "rel_distinct_nations": """
            SELECT DISTINCT nationkey FROM (
              SELECT c_nationkey AS nationkey FROM customer
              UNION ALL SELECT s_nationkey FROM supplier)""",
        "rel_region_order_stats": """
            SELECT r.r_name, round(sum(o.o_totalprice), 2) AS total,
                   count(*) AS n
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY r.r_name""",
    }


def stream_oracles() -> dict[str, str]:
    return {
        "events_tumbling": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2""",
        "events_sessionize": """
            WITH ordered AS (
              SELECT user_id, event_id, ts,
                     lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_ts
              FROM events),
            flagged AS (
              SELECT *, CASE WHEN prev_ts IS NULL
                             OR ts - prev_ts > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_session
              FROM ordered),
            numbered AS (
              SELECT user_id, event_id, ts,
                     CAST(sum(new_session) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id
                                                 ROWS UNBOUNDED PRECEDING) - 1
                          AS BIGINT) AS session_idx
              FROM flagged)
            SELECT user_id, session_idx, count(*) AS n_events,
                   min(ts) AS start_ts, max(ts) AS end_ts
            FROM numbered GROUP BY user_id, session_idx""",
        # 60-min windows sliding by 30: each event lands in exactly 2
        # windows — the same epoch-µs floor arithmetic as
        # windows.hopping_counts
        "events_hopping": """
            WITH w AS (
              SELECT make_timestamp((epoch_us(ts) // 1800000000)
                                    * 1800000000 - i * 1800000000)
                         AS window_start,
                     event_type, value
              FROM events CROSS JOIN (SELECT unnest(range(2)) AS i))
            SELECT window_start, event_type, count(*) AS n,
                   round(sum(value), 2) AS sum_value
            FROM w GROUP BY 1, 2""",
        # exact per-type quantiles at integer rank ceil(n*pct/100)
        "events_value_quantiles": """
            WITH v AS (
              SELECT event_type, value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value) AS rk,
                     count(*) OVER (PARTITION BY event_type) AS n
              FROM events),
            p AS (SELECT unnest([50, 90, 99]) AS pct)
            SELECT v.event_type, p.pct::BIGINT AS pct, v.value
            FROM v JOIN p ON v.rk = (v.n * p.pct + 99) // 100""",
        # exact mirror of the mergeable histogram sketch
        # (stages/windows.py value_quantiles_sketch): the estimate is fully
        # determined by the per-type (min, max), the 4096-bin equi-width
        # assignment trunc((v-lo)/width*4096) clipped to [0,4095], and the
        # upper edge of the bin holding rank ceil(n*pct/100) — identical
        # float64 op order on both engines, so values match bit-exactly
        "events_quantiles_sketch": """
            WITH rng AS (
              SELECT event_type, min(value) AS lo, max(value) AS hi
              FROM events GROUP BY event_type),
            binned AS (
              SELECT e.event_type,
                     LEAST(GREATEST(CAST(TRUNC(
                         (e.value - r.lo)
                         / GREATEST(r.hi - r.lo, 1e-300) * 4096)
                       AS BIGINT), 0), 4095) AS bin
              FROM events e JOIN rng r USING (event_type)),
            hist AS (
              SELECT event_type, bin, count(*) AS n
              FROM binned GROUP BY 1, 2),
            cum AS (
              SELECT event_type, bin,
                     sum(n) OVER (PARTITION BY event_type ORDER BY bin)
                         AS cdf,
                     sum(n) OVER (PARTITION BY event_type) AS total
              FROM hist),
            p AS (SELECT unnest([50, 90, 99]) AS pct),
            sel AS (
              SELECT c.event_type, p.pct::BIGINT AS pct, min(c.bin) AS bin
              FROM cum c CROSS JOIN p
              WHERE c.cdf >= (CAST(c.total AS BIGINT) * p.pct + 99) // 100
              GROUP BY 1, 2)
            SELECT s.event_type, s.pct,
                   CASE WHEN (r.hi - r.lo) / 4096 <= 0 THEN r.lo
                        ELSE r.lo + (s.bin + 1) * ((r.hi - r.lo) / 4096)
                   END AS value
            FROM sel s JOIN rng r USING (event_type)""",
        "events_next_purchase": """
            SELECT v.event_id, v.user_id,
                   coalesce((SELECT p.event_id FROM events p
                             WHERE p.user_id = v.user_id
                               AND p.event_type = 'purchase' AND p.ts > v.ts
                             ORDER BY p.ts, p.event_id LIMIT 1), -1)
                       AS next_event_id
            FROM events v WHERE v.event_type = 'view'""",
    }


def changes_oracles(sf_dir: str) -> dict[str, str]:
    p = synth.ensure_synth(sf_dir)
    from .changes import MAX_TEXT_MATCHES, TYPE_LABELS
    label_case = "CASE type " + " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in TYPE_LABELS.items()) \
        + " ELSE 'Other' END"
    return {
        "changes_by_type": f"""
            SELECT {label_case} AS change_label, count(*) AS n
            FROM read_parquet('{p["changes"]}') GROUP BY 1""",
        "changes_affects_links": f"""
            WITH ranked AS (
              SELECT c.change_id, e.entity_id,
                     row_number() OVER (PARTITION BY c.change_id
                                        ORDER BY e.entity_id) AS rk
              FROM read_parquet('{p["changes"]}') c
              JOIN read_parquet('{p["entities"]}') e
                ON contains(c.description, e.name))
            SELECT change_id, entity_id FROM ranked
            WHERE rk <= {MAX_TEXT_MATCHES}""",
        "changes_depends_on": f"""
            SELECT change_id AS change_a,
                   lead(change_id) OVER (PARTITION BY affected_id
                                         ORDER BY create_date, change_id)
                       AS change_b,
                   affected_id
            FROM read_parquet('{p["changes"]}')
            QUALIFY change_b IS NOT NULL""",
    }


def events_extra_oracles() -> dict[str, str]:
    return {
        "events_type_transitions": """
            WITH w AS (
              SELECT event_type,
                     lag(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)
                         AS prev_type
              FROM events)
            SELECT prev_type, event_type AS next_type, count(*) AS n
            FROM w WHERE prev_type IS NOT NULL GROUP BY 1, 2""",
        "events_props_sum": """
            SELECT event_type,
                   CAST(sum(coalesce(CAST(json_extract_string(props, '$.k')
                                          AS BIGINT), 0)) AS BIGINT) AS sum_k
            FROM events GROUP BY event_type""",
    }


def _doc_shingle_cte(docs_path: str) -> str:
    return _shingle_cte_from(f"read_parquet('{docs_path}')")


def _shingle_cte_from(docs_src: str) -> str:
    """Shingle CTE over any FROM source (a parquet path or the pre-
    registered ``documents`` view)."""
    return f"""
docs AS (SELECT doc_id, string_split(text, ' ') AS toks
         FROM {docs_src}),
sh AS (SELECT doc_id, list_distinct(
         CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
              ELSE [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                    for i in range(1, len(toks) - 1)] END) AS shingles
       FROM docs),
exploded AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
ns AS (SELECT doc_id, count(*) AS n FROM exploded GROUP BY doc_id)"""


def _simhash_cte(docs_path: str) -> str:
    """64-bit SimHash recomputed in SQL: DISTINCT tokens per doc, md5 →
    uint64 (first 16 hex chars), per-bit ±1 sums, bit set when sum ≥ 0;
    two's-complement fold to BIGINT matches numpy's int64 view."""
    return f"""
dt AS (SELECT DISTINCT doc_id,
              unnest(string_split(coalesce(text, ''), ' ')) AS tok
       FROM read_parquet('{docs_path}')),
h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS hv
      FROM dt),
bits AS (SELECT doc_id, b AS bit,
                sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
         FROM h CROSS JOIN (SELECT unnest(range(64)) AS b)
         GROUP BY doc_id, b),
sigraw AS (SELECT doc_id,
                  sum(CASE WHEN s >= 0 THEN (1::HUGEINT << bit)
                      ELSE 0 END) AS v
           FROM bits GROUP BY doc_id),
sig AS (SELECT doc_id,
               (CASE WHEN v >= 9223372036854775808
                     THEN v - 18446744073709551616
                     ELSE v END)::BIGINT AS simhash
        FROM sigraw)"""


def dedup_oracles(sf_dir: str) -> dict[str, str]:
    p = synth.ensure_synth(sf_dir)
    shingle_cte = _doc_shingle_cte(p["docs"])
    simhash_cte = _simhash_cte(p["docs"])
    # self-contained minhash-pairs query — used directly AND nested as the
    # `pairs` CTE of the cluster-collapse oracle
    minhash_pairs_sql = f"""
            WITH {shingle_cte},
            minh AS (
              SELECT doc_id, i, min(md5(CAST(i AS VARCHAR) || '|' || s)) AS mh
              FROM exploded CROSS JOIN range({K_HASHES}) AS t(i)
              GROUP BY doc_id, i),
            bands AS (
              SELECT doc_id, CAST(i // {K_HASHES // N_BANDS} AS BIGINT)
                         AS band,
                     string_agg(mh, '|' ORDER BY i) AS sigpart
              FROM minh GROUP BY doc_id, i // {K_HASHES // N_BANDS}),
            cand AS (
              SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.sigpart = b.sigpart
               AND a.doc_id < b.doc_id),
            shared AS (
              SELECT c.da, c.db, count(*) AS sh_n
              FROM cand c
              JOIN exploded ea ON ea.doc_id = c.da
              JOIN exploded eb ON eb.doc_id = c.db AND eb.s = ea.s
              GROUP BY c.da, c.db)
            SELECT s.da AS doc_a, s.db AS doc_b,
                   round(s.sh_n * 1.0 / (na.n + nb.n - s.sh_n), 6) AS jaccard
            FROM shared s
            JOIN ns na ON na.doc_id = s.da
            JOIN ns nb ON nb.doc_id = s.db
            WHERE s.sh_n * 1.0 / (na.n + nb.n - s.sh_n) >= {JACCARD_T}"""
    return {
        "docs_simhash": f"""
            WITH {simhash_cte}
            SELECT doc_id, simhash FROM sig""",
        # brute-force cross join over all pairs — the oracle for the banded
        # (exact for hamming<=3) LSH path
        "docs_simhash_pairs": f"""
            WITH {simhash_cte}
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""",
        "docs_exact_dedup": f"""
            SELECT md5(text) AS text_md5, min(doc_id) AS keep_id,
                   count(*) AS n_copies
            FROM read_parquet('{p["docs"]}') GROUP BY md5(text)""",
        "docs_minhash_pairs": minhash_pairs_sql,
        # near-dup cluster collapse: connected components of the minhash
        # pair graph (recursive reachability), member → min-id keeper
        "docs_dup_clusters": f"""
            WITH RECURSIVE pairs AS ({minhash_pairs_sql}),
            edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
                      UNION SELECT doc_b, doc_a FROM pairs),
            reach(u, v) AS (
              SELECT u, v FROM edges
              UNION
              SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
              WHERE e.v <> r.u),
            canon AS (SELECT u AS doc_id, least(u, min(v)) AS keep_id
                      FROM reach GROUP BY u)
            SELECT doc_id, keep_id FROM canon WHERE keep_id <> doc_id""",
        # end-to-end near-dup dedup: the corpus that SURVIVES cluster
        # collapse (cluster min-id reps flagged, non-reps dropped)
        "docs_dedup_corpus": f"""
            WITH RECURSIVE pairs AS ({minhash_pairs_sql}),
            edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
                      UNION SELECT doc_b, doc_a FROM pairs),
            reach(u, v) AS (
              SELECT u, v FROM edges
              UNION
              SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
              WHERE e.v <> r.u),
            canon AS (SELECT u AS doc_id, least(u, min(v)) AS keep_id
                      FROM reach GROUP BY u),
            removed AS (SELECT doc_id FROM canon WHERE keep_id <> doc_id),
            reps AS (SELECT DISTINCT keep_id FROM canon
                     WHERE keep_id <> doc_id)
            SELECT d.doc_id,
                   CASE WHEN d.doc_id IN (SELECT keep_id FROM reps)
                        THEN 1 ELSE 0 END AS is_cluster_rep
            FROM read_parquet('{p["docs"]}') d
            WHERE d.doc_id NOT IN (SELECT doc_id FROM removed)""",
        "docs_ngram_pairs": f"""
            WITH {shingle_cte},
            freq AS (SELECT s, count(*) AS df FROM exploded GROUP BY s
                     HAVING count(*) BETWEEN 2 AND 50),
            co AS (
              SELECT ea.doc_id AS doc_a, eb.doc_id AS doc_b,
                     count(*) AS sh_n
              FROM exploded ea
              JOIN freq f ON f.s = ea.s
              JOIN exploded eb ON eb.s = ea.s AND ea.doc_id < eb.doc_id
              GROUP BY ea.doc_id, eb.doc_id)
            SELECT co.doc_a, co.doc_b,
                   round(co.sh_n * 1.0 / (na.n + nb.n - co.sh_n), 6)
                       AS jaccard
            FROM co
            JOIN ns na ON na.doc_id = co.doc_a
            JOIN ns nb ON nb.doc_id = co.doc_b
            WHERE co.sh_n * 1.0 / (na.n + nb.n - co.sh_n) >= {JACCARD_T}""",
    }


def text_oracles() -> dict[str, str]:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    lang_counts = ", ".join(
        f"len(list_intersect(toks, {list(LANG_MARKERS[lang])})) AS c_{lang}"
        for lang in sorted(LANG_MARKERS))
    # first alphabetical language achieving the max marker count, 'und' if 0
    langs = sorted(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"c_{lang}" for lang in langs) + ")"
    pick = "CASE WHEN " + best + " = 0 THEN 'und' " + " ".join(
        f"WHEN c_{lang} = {best} THEN '{lang}'" for lang in langs) + " END"
    return {
        "docs_token_stats": """
            SELECT doc_id,
                   len(string_split_regex(text, '\\s+')) AS n_tokens,
                   len(list_distinct(string_split_regex(text, '\\s+')))
                       AS n_uniq,
                   length(text) AS n_chars
            FROM documents""",
        "docs_quality": f"""
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            m AS (SELECT doc_id, greatest(len(toks), 1) AS n, len(toks) AS nt,
                         len(list_filter(toks, x -> x IN ({stop_list})))
                             AS n_stop,
                         len(array_to_string(toks, '')) AS tok_chars
                  FROM t)
            SELECT doc_id, round(n_stop * 1.0 / n, 6) AS stop_ratio,
                   round(tok_chars * 1.0 / n, 6) AS mean_token_len,
                   CASE WHEN nt BETWEEN 20 AND 1000
                         AND n_stop * 1.0 / n <= 0.5
                        THEN 1 ELSE 0 END AS quality
            FROM m""",
        "docs_lang_id": f"""
            WITH t AS (SELECT doc_id,
                              list_distinct(string_split(text, ' ')) AS toks
                       FROM documents),
            c AS (SELECT doc_id, {lang_counts} FROM t)
            SELECT doc_id, {pick} AS lang_pred FROM c""",
        # integer-quantized tf-idf (tf * 1e6 // df) so numpy and SQL rank
        # bit-identically; ties break by term
        "docs_tfidf_topk": """
            WITH tf AS (
              SELECT doc_id, tok AS term, count(*) AS tf
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents)
              GROUP BY doc_id, tok),
            df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            j AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                         (tf.tf * 1000000) // df.df AS score
                  FROM tf JOIN df USING (term)),
            r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                               ORDER BY score DESC, term)
                         AS rank
                  FROM j)
            SELECT doc_id, rank, term, tf, df FROM r WHERE rank <= 5""",
        # fixed-length (64-token) sequence-packing boundaries per doc
        "docs_chunk_seqs": """
            WITH t AS (SELECT doc_id,
                              len(string_split(text, ' ')) AS n
                       FROM documents),
            s AS (SELECT doc_id, n, unnest(range((n + 63) // 64)) AS seq_idx
                  FROM t)
            SELECT doc_id, seq_idx,
                   least(64, n - seq_idx * 64) AS n_tokens
            FROM s""",
        # corpus top-20 token bigrams; ties by bigram text
        "docs_top_bigrams": """
            WITH t AS (SELECT string_split(text, ' ') AS toks
                       FROM documents),
            b AS (SELECT unnest([toks[i] || ' ' || toks[i+1]
                                 for i in range(1, len(toks))]) AS bigram
                  FROM t)
            SELECT bigram, count(*) AS n FROM b
            GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""",
        # deterministic md5-keyed train/val/test split (80/10/10)
        "docs_split": """
            SELECT doc_id,
                   CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))
                             ::BIGINT % 100 < 80 THEN 'train'
                        WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))
                             ::BIGINT % 100 < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents""",
        # salted ~5% Bernoulli subsample, independent of the split draw
        "docs_sample": """
            SELECT doc_id FROM documents
            WHERE ('0x' || substr(md5('s|' || doc_id::VARCHAR), 1, 8))
                  ::BIGINT % 100 < 5""",
        # stratified rebalance: rate = floor(target*10000/stratum_count),
        # same md5-permyriad predicate as stages/sampling.stratified_sample
        "docs_stratified_sample": """
            WITH c AS (SELECT source, count(*) AS n FROM documents
                       GROUP BY source)
            SELECT d.doc_id, d.source AS stratum
            FROM documents d JOIN c USING (source)
            WHERE ('0x' || substr(md5('b|' || d.doc_id::VARCHAR), 1, 8))
                  ::BIGINT % 10000 < least(10 * 10000 // c.n, 10000)""",
        "docs_fingerprint": """
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            g AS (SELECT doc_id,
                         CASE WHEN len(toks) < 4
                              THEN [array_to_string(toks, ' ')]
                              ELSE [toks[i] || ' ' || toks[i+1] || ' ' ||
                                    toks[i+2] || ' ' || toks[i+3]
                                    for i in range(1, len(toks) - 2)] END
                             AS grams
                  FROM t)
            SELECT doc_id,
                   list_aggregate(list_transform(grams, x -> md5(x)), 'min')
                       AS fp
            FROM g""",
        # eval-set decontamination: non-eval docs sharing >=1 distinct
        # 3-gram shingle with the doc_id % 97 == 0 eval slice
        "docs_decontaminate": f"""
            WITH {_shingle_cte_from('documents')},
            evs AS (SELECT DISTINCT s FROM exploded WHERE doc_id % 97 = 0)
            SELECT e.doc_id, count(*) AS n_hits
            FROM exploded e JOIN evs USING (s)
            WHERE e.doc_id % 97 <> 0
            GROUP BY e.doc_id""",
        "docs_mix_report": """
            SELECT source, lang, count(*) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS sum_tokens,
                   CAST(sum(length(text)) AS BIGINT) AS sum_chars
            FROM documents GROUP BY source, lang""",
        # composed training-mix filter: quality==1 AND lang_pred=='en',
        # then exact first-wins dedup among the eligible
        "docs_train_mix": f"""
            WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
                       FROM documents),
            m AS (SELECT doc_id, text, greatest(len(toks), 1) AS n,
                         len(toks) AS nt,
                         len(list_filter(toks, x -> x IN ({stop_list})))
                             AS n_stop
                  FROM t),
            q AS (SELECT doc_id, text,
                         CASE WHEN nt BETWEEN 20 AND 1000
                               AND n_stop * 1.0 / n <= 0.5
                              THEN 1 ELSE 0 END AS quality
                  FROM m),
            lt AS (SELECT doc_id, list_distinct(string_split(text, ' '))
                              AS toks
                   FROM documents),
            c AS (SELECT doc_id, {lang_counts} FROM lt),
            lp AS (SELECT doc_id, {pick} AS lang_pred FROM c),
            elig AS (SELECT q.doc_id, md5(q.text) AS text_md5
                     FROM q JOIN lp USING (doc_id)
                     WHERE q.quality = 1 AND lp.lang_pred = 'en')
            SELECT text_md5, min(doc_id) AS doc_id, count(*) AS n_copies
            FROM elig GROUP BY text_md5""",
        # unigram-LM quality score: integer-ppm token probabilities
        # (cnt * 1e6 // total), tf-weighted per-doc mean, floor-quantized —
        # pure integer arithmetic end-to-end, mirrors
        # stages/textstats.lm_score bit-for-bit
        "docs_lm_score": f"""
            WITH tf AS (
              SELECT doc_id, tok AS term, count(*) AS tf
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents)
              GROUP BY doc_id, tok),
            cnt AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY term),
            tot AS (SELECT greatest(sum(cnt), 1) AS total FROM cnt),
            ppm AS (SELECT term, cnt,
                           CAST((cnt * 1000000) // (SELECT total FROM tot)
                                AS BIGINT) AS tok_ppm
                    FROM cnt),
            j AS (SELECT tf.doc_id, tf.tf, ppm.cnt, ppm.tok_ppm
                  FROM tf JOIN ppm USING (term)),
            a AS (SELECT doc_id, greatest(sum(tf), 1) AS n,
                         sum(tf * tok_ppm) AS w,
                         sum(CASE WHEN cnt <= {LM_RARE_MAX} THEN tf
                             ELSE 0 END) AS r
                  FROM j GROUP BY doc_id)
            SELECT doc_id,
                   CAST(w // n AS BIGINT) AS mean_prob_ppm,
                   CAST((r * 10000) // n AS BIGINT) AS rare_permyriad,
                   CASE WHEN w // n >= {LM_PPM_MIN}
                         AND (r * 10000) // n <= {LM_RARE_PERMYRIAD_MAX}
                        THEN 1 ELSE 0 END AS well_modeled
            FROM a""",
        # deterministic md5-keyed corpus shuffle into 8 training shards;
        # pos = rank of (key, doc_id) within the shard
        "docs_shuffle_shards": """
            WITH k AS (
              SELECT doc_id, md5('sh|' || doc_id::VARCHAR) AS key,
                     ('0x' || substr(md5('sh|' || doc_id::VARCHAR), 1, 8))
                         ::BIGINT % 8 AS shard
              FROM documents)
            SELECT doc_id, shard,
                   row_number() OVER (PARTITION BY shard
                                      ORDER BY key, doc_id) - 1 AS pos
            FROM k""",
        # GPT-style sequence packing: docs concatenated in the shuffled
        # shard order (same md5 key as docs_shuffle_shards), token stream
        # cut into 256-token bins, one row per (doc, bin it spans)
        "docs_pack_bins": """
            WITH k AS (
              SELECT doc_id, md5('sh|' || doc_id::VARCHAR) AS key,
                     ('0x' || substr(md5('sh|' || doc_id::VARCHAR), 1, 8))
                         ::BIGINT % 8 AS shard,
                     len(string_split(text, ' ')) AS nt
              FROM documents),
            o AS (SELECT doc_id, shard, nt,
                         CAST(sum(nt) OVER (PARTITION BY shard
                                            ORDER BY key, doc_id
                                            ROWS UNBOUNDED PRECEDING) - nt
                              AS BIGINT) AS start
                  FROM k),
            s AS (SELECT doc_id, shard, nt, start,
                         unnest(range(start // 256,
                                      (start + nt - 1) // 256 + 1)) AS bin_id
                  FROM o)
            SELECT shard, CAST(bin_id AS BIGINT) AS bin_id, doc_id,
                   CAST(least(start + nt, (bin_id + 1) * 256)
                        - greatest(start, bin_id * 256) AS BIGINT)
                       AS n_tokens
            FROM s""",
        # Gopher-style repetition signals; bigrams/3-grams via lockstep
        # unnest + positional self-joins (mirrors stages/textstats.py
        # repetition_batch, which is bit-exact on round(…, 6))
        "docs_repetition": f"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split(coalesce(text,''), ' ')) AS tok,
                     generate_subscripts(
                         string_split(coalesce(text,''), ' '), 1) AS i
              FROM documents),
            nt AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY 1),
            tt AS (SELECT doc_id, max(c) AS top_tok FROM (
                    SELECT doc_id, tok, count(*) c FROM toks
                    GROUP BY 1, 2) GROUP BY 1),
            bg AS (SELECT a.doc_id, a.tok || ' ' || b.tok AS g
                   FROM toks a
                   JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
            tb AS (SELECT doc_id, max(c) AS top_bg FROM (
                    SELECT doc_id, g, count(*) c FROM bg
                    GROUP BY 1, 2) GROUP BY 1),
            tg AS (SELECT a.doc_id,
                          a.tok || ' ' || b.tok || ' ' || c.tok AS g
                   FROM toks a
                   JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                   JOIN toks c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
            t3 AS (SELECT doc_id, count(*) AS n3, count(DISTINCT g) AS d3
                   FROM tg GROUP BY 1),
            r AS (SELECT nt.doc_id,
                    round(tt.top_tok * 1.0 / greatest(nt.n, 1), 6)
                        AS top_token_ratio,
                    round(coalesce(tb.top_bg, 0) * 1.0
                          / greatest(nt.n - 1, 1), 6) AS top_bigram_ratio,
                    round(coalesce(1.0 - t3.d3 * 1.0 / t3.n3, 0.0), 6)
                        AS dup_3gram_ratio
                  FROM nt LEFT JOIN tt USING (doc_id)
                          LEFT JOIN tb USING (doc_id)
                          LEFT JOIN t3 USING (doc_id))
            SELECT doc_id, top_token_ratio, top_bigram_ratio,
                   dup_3gram_ratio,
                   CASE WHEN top_token_ratio > {REP_TOP_TOKEN_MAX}
                         OR dup_3gram_ratio > {REP_DUP_3GRAM_MAX}
                        THEN 1 ELSE 0 END AS repetitive
            FROM r""",
        # RE2 redaction on both engines; numbers counted AFTER email
        # redaction so an address's digits are never double-counted
        "docs_pii_scrub": f"""
            SELECT doc_id,
              len(regexp_extract_all(coalesce(text,''),
                  '{PII_PATTERNS[0][1]}')) AS n_email,
              len(regexp_extract_all(regexp_replace(coalesce(text,''),
                  '{PII_PATTERNS[0][1]}', '<EMAIL>', 'g'),
                  '{PII_PATTERNS[1][1]}')) AS n_number,
              regexp_replace(regexp_replace(coalesce(text,''),
                  '{PII_PATTERNS[0][1]}', '<EMAIL>', 'g'),
                  '{PII_PATTERNS[1][1]}', '<NUM>', 'g') AS clean_text
            FROM documents""",
    }


def ann_oracles(sf_dir: str) -> dict[str, str]:
    p = synth.ensure_synth(sf_dir)
    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    return {
        "ann_topk": f"""
            WITH q AS (SELECT vec_id AS qid, embedding AS qe
                       FROM embeddings WHERE vec_id IN ({ids})),
            s AS (SELECT q.qid AS query_id, e.vec_id,
                         list_cosine_similarity(e.embedding, q.qe) AS sim
                  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
            r AS (SELECT query_id, vec_id,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY sim DESC, vec_id)
                             AS rank
                  FROM s)
            SELECT query_id, rank, vec_id FROM r WHERE rank <= 10""",
        # nearest-centroid assignment: centroids are the vec_id < 16
        # corpus vectors (deterministic seed choice mirrored by
        # ann.centroid_assign); ties toward the lowest centroid id
        "vecs_centroid_assign": """
            WITH c AS (SELECT vec_id AS cid, embedding AS ce
                       FROM embeddings WHERE vec_id < 16),
            s AS (SELECT e.vec_id, c.cid,
                         list_cosine_similarity(e.embedding, c.ce) AS sim
                  FROM embeddings e CROSS JOIN c),
            r AS (SELECT vec_id, cid,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY sim DESC, cid) AS rk
                  FROM s)
            SELECT vec_id, cid AS centroid_id FROM r WHERE rk = 1""",
        # one Lloyd iteration: nearest-centroid assignment (same seeds as
        # vecs_centroid_assign) then per-dim offset-quantized member means
        # (floor((v+1)*1e6) keeps operands positive so // matches numpy)
        "vecs_kmeans_step": """
            WITH c AS (SELECT vec_id AS cid, embedding AS ce
                       FROM embeddings WHERE vec_id < 16),
            s AS (SELECT e.vec_id, c.cid,
                         list_cosine_similarity(e.embedding, c.ce) AS sim
                  FROM embeddings e CROSS JOIN c),
            r AS (SELECT vec_id, cid,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY sim DESC, cid) AS rk
                  FROM s),
            a AS (SELECT vec_id, cid FROM r WHERE rk = 1),
            x AS (SELECT a.cid,
                         generate_subscripts(e.embedding, 1) - 1 AS dim,
                         unnest(e.embedding) AS v
                  FROM a JOIN embeddings e USING (vec_id))
            SELECT cid AS centroid_id, CAST(dim AS BIGINT) AS dim,
                   CAST(sum(CAST(floor((CAST(v AS DOUBLE) + 1) * 1000000)
                                 AS BIGINT)) // count(*) AS BIGINT)
                       AS mean_q,
                   count(*) AS n_members
            FROM x GROUP BY cid, dim""",
        "vecs_near_dup_exact": f"""
            WITH e AS (SELECT vec_id, embedding
                       FROM read_parquet('{p["vecs"]}'))
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95""",
        # embedding near-dup cluster collapse: connected components of the
        # exact pair graph (recursive reachability), member → min-id keeper
        "vecs_dup_clusters": f"""
            WITH RECURSIVE e AS (SELECT vec_id, embedding
                                 FROM read_parquet('{p["vecs"]}')),
            pairs AS (
              SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
              FROM e a JOIN e b ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.embedding, b.embedding)
                    >= 0.95),
            edges AS (SELECT vec_a AS u, vec_b AS v FROM pairs
                      UNION SELECT vec_b, vec_a FROM pairs),
            reach(u, v) AS (
              SELECT u, v FROM edges
              UNION
              SELECT r.u, e2.v FROM reach r JOIN edges e2 ON e2.u = r.v
              WHERE e2.v <> r.u),
            canon AS (SELECT u AS vec_id, least(u, min(v)) AS keep_id
                      FROM reach GROUP BY u)
            SELECT vec_id, keep_id FROM canon WHERE keep_id <> vec_id""",
        # end-to-end embedding dedup: vectors surviving cluster collapse
        "vecs_dedup_corpus": f"""
            WITH RECURSIVE e AS (SELECT vec_id, embedding
                                 FROM read_parquet('{p["vecs"]}')),
            pairs AS (
              SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
              FROM e a JOIN e b ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.embedding, b.embedding)
                    >= 0.95),
            edges AS (SELECT vec_a AS u, vec_b AS v FROM pairs
                      UNION SELECT vec_b, vec_a FROM pairs),
            reach(u, v) AS (
              SELECT u, v FROM edges
              UNION
              SELECT r.u, e2.v FROM reach r JOIN edges e2 ON e2.u = r.v
              WHERE e2.v <> r.u),
            canon AS (SELECT u AS vec_id, least(u, min(v)) AS keep_id
                      FROM reach GROUP BY u),
            removed AS (SELECT vec_id FROM canon WHERE keep_id <> vec_id),
            reps AS (SELECT DISTINCT keep_id FROM canon
                     WHERE keep_id <> vec_id)
            SELECT v.vec_id,
                   CASE WHEN v.vec_id IN (SELECT keep_id FROM reps)
                        THEN 1 ELSE 0 END AS is_cluster_rep
            FROM read_parquet('{p["vecs"]}') v
            WHERE v.vec_id NOT IN (SELECT vec_id FROM removed)""",
    }


def mm_oracles(sf_dir: str) -> dict[str, str]:
    p = synth.ensure_synth(sf_dir)
    return {
        "mm_byte_stats": f"""
            SELECT media_id, kind, octet_length(data) AS n_bytes,
                   md5(hex(data)) AS checksum
            FROM read_parquet('{p["media"]}')""",
        "mm_entropy": f"""
            WITH bytes AS (
              SELECT media_id,
                     unnest([substring(hex(data), 2*i-1, 2)
                             for i in range(1, octet_length(data) + 1)])
                         AS byte
              FROM read_parquet('{p["media"]}')
              WHERE octet_length(data) > 0),
            hist AS (
              SELECT media_id, byte, count(*) AS c
              FROM bytes GROUP BY media_id, byte),
            tot AS (SELECT media_id, sum(c) AS n FROM hist GROUP BY media_id),
            e AS (
              SELECT h.media_id,
                     round(-sum((h.c / t.n) * log2(h.c / t.n)), 6) AS entropy
              FROM hist h JOIN tot t ON t.media_id = h.media_id
              GROUP BY h.media_id)
            SELECT m.media_id, coalesce(e.entropy, 0.0) AS entropy
            FROM read_parquet('{p["media"]}') m
            LEFT JOIN e ON e.media_id = m.media_id""",
        # header fields re-derived from the raw BYTES in SQL (hex substring
        # arithmetic): PNG sig+IHDR big-endian at fixed offsets, RIFF/WAVE
        # fmt little-endian — independently mirrors stages/multimodal
        # parse_headers' numpy parse
        "mm_header_meta": f"""
            WITH m AS (SELECT media_id, hex(data) AS hx,
                              octet_length(data) AS n
                       FROM read_parquet('{p["media"]}')),
            f AS (SELECT media_id, hx, n,
                   n >= 33 AND substr(hx, 1, 16) = '89504E470D0A1A0A'
                       AND substr(hx, 25, 8) = '49484452' AS is_png,
                   n >= 44 AND substr(hx, 1, 8) = '52494646'
                       AND substr(hx, 17, 8) = '57415645'
                       AND substr(hx, 25, 8) = '666D7420' AS is_wav
                  FROM m)
            SELECT media_id,
              CASE WHEN is_png THEN 'png' WHEN is_wav THEN 'wav'
                   ELSE 'unknown' END AS container,
              CASE WHEN is_png THEN ('0x' || substr(hx, 33, 8))::BIGINT
                   ELSE 0 END AS width,
              CASE WHEN is_png THEN ('0x' || substr(hx, 41, 8))::BIGINT
                   ELSE 0 END AS height,
              CASE WHEN is_png THEN ('0x' || substr(hx, 49, 2))::BIGINT
                   WHEN is_wav THEN ('0x' || substr(hx, 71, 2)
                                     || substr(hx, 69, 2))::BIGINT
                   ELSE 0 END AS bit_depth,
              CASE WHEN is_png THEN
                     CASE ('0x' || substr(hx, 51, 2))::BIGINT
                       WHEN 0 THEN 1 WHEN 2 THEN 3 WHEN 3 THEN 1
                       WHEN 4 THEN 2 WHEN 6 THEN 4 ELSE 0 END
                   WHEN is_wav THEN ('0x' || substr(hx, 47, 2)
                                     || substr(hx, 45, 2))::BIGINT
                   ELSE 0 END AS channels,
              CASE WHEN is_wav THEN ('0x' || substr(hx, 55, 2)
                                     || substr(hx, 53, 2)
                                     || substr(hx, 51, 2)
                                     || substr(hx, 49, 2))::BIGINT
                   ELSE 0 END AS sample_rate
            FROM f""",
        # REAL decode round-trip: the engine inflates+unfilters the PNG /
        # views the WAV PCM frames and must reproduce the writer-truth
        # sums the synth ENCODER recorded for what it actually encoded
        # (the xlsx golden-count pattern applied to codecs)
        "mm_decoded_means": f"""
            SELECT media_id, pixel_sum, n_pixels
            FROM read_parquet('{p["media"]}')""",
    }


def temporal_oracles(sf_dir: str) -> dict[str, str]:
    p = synth.ensure_synth(sf_dir)
    return {
        "vers_latest": f"""
            WITH v AS (
              SELECT *, row_number() OVER (PARTITION BY entity_id
                                           ORDER BY version DESC,
                                                    iteration DESC) AS rk
              FROM read_parquet('{p["versions"]}'))
            SELECT entity_id, version, iteration, full_id, state,
                   created_date, rk = 1 AS is_latest
            FROM v""",
        "vers_evolves_to": f"""
            WITH v AS (SELECT * FROM read_parquet('{p["versions"]}')),
            heads AS (
              SELECT entity_id, version, full_id AS head_id,
                     row_number() OVER (PARTITION BY entity_id, version
                                        ORDER BY iteration) AS rk
              FROM v),
            h1 AS (SELECT entity_id, version, head_id FROM heads
                   WHERE rk = 1),
            nx AS (SELECT entity_id, version,
                          lead(head_id) OVER (PARTITION BY entity_id
                                              ORDER BY version) AS next_head
                   FROM h1)
            SELECT v.full_id AS from_id, nx.next_head AS to_id
            FROM v JOIN nx ON nx.entity_id = v.entity_id
                          AND nx.version = v.version
            WHERE nx.next_head IS NOT NULL""",
    }


def shared_oracles(sf_dir: str) -> dict[str, str]:
    out = {}
    out.update(relational_oracles())
    out.update(stream_oracles())
    out.update(dedup_oracles(sf_dir))
    out.update(text_oracles())
    out.update(ann_oracles(sf_dir))
    out.update(mm_oracles(sf_dir))
    out.update(changes_oracles(sf_dir))
    out.update(events_extra_oracles())
    out.update(temporal_oracles(sf_dir))
    return out
