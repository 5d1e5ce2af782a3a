"""DuckDB oracle SQL for the training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal) — mirrors of
``ccm_spark.pipeline.*``.

Same determinism toolkit as oracle_sql.py: md5-derived integer hashes
(``functions.hashing``), LCG-generated literal parameter tables shared with
the Spark side, exact integer arithmetic, and `round(x, n) + 0.0` at double
boundaries. DuckDB 1.0 quirks handled here: no lateral generate_series
(scalar range() + zipped unnest instead), list functions for token work.
"""

from __future__ import annotations

from ccm_spark.pipeline.dedup import (
    LSH_BANDS,
    NUM_PERMS,
    SHINGLE_WIDTH,
    SIMHASH_BAND_BITS,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    minhash_perm_params,
)
from ccm_spark.pipeline.similarity import DIM, SRP_PLANES, srp_plane_values
from ccm_spark.pipeline.text import (
    BPE_CHARS_PER_TOKEN,
    LANG_MARKERS,
    QF_MAX_MEAN_TOKEN_LEN,
    QF_MAX_TOKENS,
    QF_MIN_ALPHA_FRAC,
    QF_MIN_MEAN_TOKEN_LEN,
    QF_MIN_STOPWORD_FRAC,
    QF_MIN_TOKENS,
)

P31 = 2_147_483_647

from ccm_spark.functions.hashing import sql_tokens as _sql_tokens

TOKENS = _sql_tokens("text")


def _md5_long(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------- text ops

def sql_text_token_stats() -> str:
    return f"""
WITH t AS (SELECT doc_id, {TOKENS} AS toks, length(text) AS nc FROM documents)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS INT) AS n_unique,
       CAST(nc AS INT) AS n_chars_text,
       CASE WHEN len(toks) = 0 THEN 0.0
            ELSE round(CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE), 6) + 0.0
       END AS ttr
FROM t"""


def sql_text_quality() -> str:
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n_tokens,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_unique,
         CAST(len(list_filter(toks, x -> regexp_full_match(x, '[a-z]+'))) AS DOUBLE) AS n_alpha
  FROM (SELECT doc_id, {TOKENS} AS toks FROM documents) s
)
SELECT doc_id,
       round(
         LEAST(1.0, n_tokens / 100.0)
         * (0.5 + 0.5 * (CASE WHEN n_tokens = 0 THEN 0.0 ELSE n_unique / n_tokens END))
         * (CASE WHEN n_tokens = 0 THEN 0.0 ELSE n_alpha / n_tokens END), 6) + 0.0 AS quality
FROM t"""


def sql_text_quality_filter() -> str:
    # per-language stopword markers keyed on the doc's lang column,
    # mirroring pipeline.text.quality_filter's CASE chain exactly
    branches = " ".join(
        "WHEN lang = '{}' THEN CAST(len(list_filter(toks, x -> list_contains([{}], x))) AS DOUBLE)".format(
            lang, ", ".join(f"'{w}'" for w in words)
        )
        for lang, words in sorted(LANG_MARKERS.items())
    )
    all_markers = ", ".join(
        f"'{w}'" for _, ws in sorted(LANG_MARKERS.items()) for w in ws
    )
    stop_case = (
        f"CASE {branches} ELSE CAST(len(list_filter(toks, "
        f"x -> list_contains([{all_markers}], x))) AS DOUBLE) END"
    )
    mean_len = "CASE WHEN n_tokens = 0 THEN 0.0 ELSE tok_chars / n_tokens END"
    alpha_frac = "CASE WHEN n_tokens = 0 THEN 0.0 ELSE n_alpha / n_tokens END"
    stop_frac = "CASE WHEN n_tokens = 0 THEN 0.0 ELSE n_stop / n_tokens END"
    return f"""
WITH t AS (SELECT doc_id, lang, {TOKENS} AS toks FROM documents),
b AS (
  SELECT doc_id,
         CAST(len(toks) AS INT) AS n_tokens,
         CAST(length(array_to_string(toks, '')) AS DOUBLE) AS tok_chars,
         CAST(len(list_filter(toks, x -> regexp_full_match(x, '[a-z]+'))) AS DOUBLE) AS n_alpha,
         {stop_case} AS n_stop
  FROM t
)
SELECT doc_id, n_tokens,
       round({mean_len}, 6) + 0.0 AS mean_token_len,
       round({alpha_frac}, 6) + 0.0 AS alpha_frac,
       round({stop_frac}, 6) + 0.0 AS stopword_frac,
       (n_tokens BETWEEN {QF_MIN_TOKENS} AND {QF_MAX_TOKENS}
        AND ({mean_len}) BETWEEN {QF_MIN_MEAN_TOKEN_LEN} AND {QF_MAX_MEAN_TOKEN_LEN}
        AND ({alpha_frac}) >= {QF_MIN_ALPHA_FRAC}
        AND ({stop_frac}) >= {QF_MIN_STOPWORD_FRAC}) AS keep
FROM b"""


def sql_text_langid() -> str:
    langs = sorted(LANG_MARKERS.items())
    hit_cols = []
    for lang, words in langs:
        lst = ", ".join(f"'{w}'" for w in words)
        hit_cols.append(
            f"CAST(len(list_filter(toks, x -> list_contains([{lst}], x))) AS INT) AS h_{lang}"
        )
    names = [lang for lang, _ in langs]
    greatest = ", ".join(f"h_{l}" for l in names)
    chain = " ".join(
        f"WHEN h_{l} >= GREATEST({greatest}) THEN '{l}'" for l in names
    )
    return f"""
WITH t AS (SELECT doc_id, lang, {TOKENS} AS toks FROM documents),
h AS (SELECT doc_id, lang, {', '.join(hit_cols)} FROM t)
SELECT doc_id,
       CASE WHEN GREATEST({greatest}) <= 0 THEN 'und' {chain} ELSE 'und' END AS predicted_lang,
       lang
FROM h"""


def sql_text_token_counts() -> str:
    return f"""
WITH t AS (SELECT doc_id, text, {TOKENS} AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+')) AS INT) AS regex_tokens,
       COALESCE(CAST(list_sum(list_transform(toks,
           x -> CAST(ceil(length(x) / {BPE_CHARS_PER_TOKEN}.0) AS BIGINT))) AS BIGINT), 0) AS bpe_est_tokens
FROM t"""


def sql_text_fingerprint() -> str:
    return f"""
WITH t AS (SELECT doc_id, {TOKENS} AS toks FROM documents),
e AS (
  SELECT doc_id, unnest(toks) AS tok, unnest(range(0, len(toks))) AS pos FROM t
)
SELECT doc_id,
       CAST(SUM(({_md5_long('tok')} % {P31}) * (pos + 1)) % {P31} AS BIGINT) AS fingerprint
FROM e GROUP BY doc_id"""


def sql_text_vocab_topk(k: int = 50) -> str:
    return f"""
WITH t AS (SELECT doc_id, {TOKENS} AS toks FROM documents),
occ AS (SELECT doc_id, unnest(toks) AS token FROM t),
per_doc AS (SELECT doc_id, token, COUNT(*) AS n FROM occ GROUP BY 1, 2),
totals AS (
  SELECT token, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_total
  FROM per_doc GROUP BY 1
),
r AS (SELECT *, row_number() OVER (ORDER BY n_total DESC, token ASC) AS rank FROM totals)
SELECT CAST(rank AS INT) AS rank, token, n_docs, n_total FROM r WHERE rank <= {k}"""


# --------------------------------------------------------------- dedup ops

def sql_dedup_exact() -> str:
    return f"""
SELECT {_md5_long('text')} AS content_hash,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies,
       COUNT(DISTINCT source) AS n_sources
FROM documents GROUP BY 1"""


def _shingle_ctes(width: int = SHINGLE_WIDTH) -> str:
    grams = " || ' ' || ".join(
        f"list_extract(toks, i + {j})" for j in range(width)
    )
    return f"""
t AS (SELECT doc_id, {TOKENS} AS toks FROM documents),
pos AS (SELECT doc_id, toks, unnest(range(1, len(toks) - {width - 2})) AS i FROM t),
sh AS (
  SELECT DISTINCT doc_id, ({_md5_long(f"({grams})")} % {P31}) AS shingle_hash
  FROM pos
)"""


def sql_shared_span_pairs(
    min_run: int = 8, width: int = SHINGLE_WIDTH, max_doc_freq: int = 1000
) -> str:
    """DuckDB replay of pipeline.dedup.shared_span_pairs: positional
    shingles (0-based, duplicates kept), df-capped matching, per-diagonal
    gaps-and-islands. Not in the driver gate (50-entry window full);
    exercised by tests/test_oracle_local.py against the Spark op."""
    grams = " || ' ' || ".join(
        f"list_extract(toks, i + {j})" for j in range(width)
    )
    return f"""
WITH t AS (SELECT doc_id, {TOKENS} AS toks FROM documents),
p AS (SELECT doc_id, toks, unnest(range(1, len(toks) - {width - 2})) AS i FROM t),
sq AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         ({_md5_long(f"({grams})")} % {P31}) AS shingle_hash
  FROM p
),
hot AS (
  SELECT shingle_hash FROM sq GROUP BY 1
  HAVING COUNT(DISTINCT doc_id) > {max_doc_freq}
),
rare AS (
  SELECT * FROM sq WHERE shingle_hash NOT IN (SELECT shingle_hash FROM hot)
),
m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a,
         a.pos - b.pos AS diag
  FROM rare a JOIN rare b
    ON a.shingle_hash = b.shingle_hash AND a.doc_id < b.doc_id
),
isl AS (
  SELECT doc_a, doc_b, diag,
         pos_a - ROW_NUMBER() OVER (
           PARTITION BY doc_a, doc_b, diag ORDER BY pos_a
         ) AS island
  FROM m
),
runs AS (
  SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM isl GROUP BY doc_a, doc_b, diag, island
  HAVING COUNT(*) >= {min_run}
)
SELECT doc_a, doc_b,
       CAST(MAX(run_len) AS BIGINT) AS max_run,
       CAST(MAX(run_len) + {width - 1} AS BIGINT) AS span_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_spans
FROM runs GROUP BY 1, 2"""


def _jaccard_tail(threshold: float) -> str:
    return f"""
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
common AS (
  SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
  FROM cand_pairs p
  JOIN sh sa ON sa.doc_id = p.doc_a
  JOIN sh sb ON sb.doc_id = p.doc_b AND sb.shingle_hash = sa.shingle_hash
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       round(CAST(c.n_common AS DOUBLE) / (na.n + nb.n - c.n_common), 6) + 0.0 AS jaccard
FROM common c
JOIN sizes na ON na.doc_id = c.doc_a
JOIN sizes nb ON nb.doc_id = c.doc_b
WHERE CAST(c.n_common AS DOUBLE) / (na.n + nb.n - c.n_common) >= {threshold}"""


def sql_dedup_minhash_lsh(
    threshold: float = 0.5, seed: int = 7, max_bucket_size: int = 1000
) -> str:
    perms = minhash_perm_params(NUM_PERMS, seed)
    values = ", ".join(f"({j}, {a}, {b})" for j, a, b in perms)
    rows_per_band = NUM_PERMS // LSH_BANDS
    return f"""
WITH {_shingle_ctes()},
perms AS (SELECT CAST(perm_id AS INT) AS perm_id, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
          FROM (VALUES {values}) AS v(perm_id, a, b)),
sig AS (
  SELECT doc_id, perm_id, MIN((a * shingle_hash + b) % {P31}) AS minhash
  FROM sh CROSS JOIN perms GROUP BY 1, 2
),
band_keys0 AS (
  SELECT doc_id, CAST(perm_id // {rows_per_band} AS INT) AS band,
         string_agg(CAST(minhash AS VARCHAR), ':' ORDER BY minhash) AS band_key
  FROM sig GROUP BY 1, 2
),
band_keys AS (
  SELECT doc_id, band, band_key FROM band_keys0
  QUALIFY COUNT(*) OVER (PARTITION BY band, band_key) <= {max_bucket_size}
),
cand_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM band_keys a JOIN band_keys b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),{_jaccard_tail(threshold)}"""


def sql_dedup_against_index(
    threshold: float = 0.25, modulus: int = 10, seed: int = 7
) -> str:
    """Incremental probe twin (pipeline/dedup.py dedup_against_index):
    index = docs with doc_id % modulus != 0, increment = the rest;
    similarity is the signature estimate (agreeing perms / NUM_PERMS)."""
    perms = minhash_perm_params(NUM_PERMS, seed)
    values = ", ".join(f"({j}, {a}, {b})" for j, a, b in perms)
    rows_per_band = NUM_PERMS // LSH_BANDS
    return f"""
WITH {_shingle_ctes()},
perms AS (SELECT CAST(perm_id AS INT) AS perm_id, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
          FROM (VALUES {values}) AS v(perm_id, a, b)),
sig AS (
  SELECT doc_id, perm_id, MIN((a * shingle_hash + b) % {P31}) AS minhash
  FROM sh CROSS JOIN perms GROUP BY 1, 2
),
band_keys AS (
  SELECT doc_id, CAST(perm_id // {rows_per_band} AS INT) AS band,
         string_agg(CAST(minhash AS VARCHAR), ':' ORDER BY minhash) AS band_key
  FROM sig GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT n.doc_id AS new_doc_id, i.doc_id AS index_doc_id
  FROM band_keys n JOIN band_keys i
    ON n.band = i.band AND n.band_key = i.band_key
  WHERE n.doc_id % {modulus} = 0 AND i.doc_id % {modulus} != 0
),
agree AS (
  SELECT c.new_doc_id, c.index_doc_id,
         SUM(CASE WHEN sn.minhash = si.minhash THEN 1 ELSE 0 END) AS k
  FROM cand c
  JOIN sig sn ON sn.doc_id = c.new_doc_id
  JOIN sig si ON si.doc_id = c.index_doc_id AND si.perm_id = sn.perm_id
  GROUP BY 1, 2
)
SELECT new_doc_id, index_doc_id,
       CAST(k AS DOUBLE) / {NUM_PERMS} AS est_jaccard
FROM agree
WHERE CAST(k AS DOUBLE) / {NUM_PERMS} >= {threshold}"""


def sql_dedup_ngram_jaccard(threshold: float = 0.5, max_doc_freq: int = 1000) -> str:
    return f"""
WITH {_shingle_ctes()},
rare AS (
  SELECT * FROM sh
  QUALIFY COUNT(*) OVER (PARTITION BY shingle_hash) <= {max_doc_freq}
),
cand_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM rare a JOIN rare b ON a.shingle_hash = b.shingle_hash AND a.doc_id < b.doc_id
),{_jaccard_tail(threshold)}"""


def sql_dedup_components(threshold: float = 0.5, seed: int = 7) -> str:
    """Transitive closure over the MinHash near-dup pair graph; label =
    smallest reachable doc_id (singletons label themselves) — replays the
    Spark min-label propagation exactly (both are 'smallest id in the
    connected component')."""
    return f"""
WITH RECURSIVE edges AS (
  SELECT doc_a, doc_b FROM ({sql_dedup_minhash_lsh(threshold, seed)})
),
sym AS (SELECT doc_a AS a, doc_b AS b FROM edges UNION ALL SELECT doc_b, doc_a FROM edges),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
lbl AS (SELECT a AS node, MIN(b) AS m FROM reach GROUP BY 1)
SELECT d.doc_id,
       CAST(LEAST(d.doc_id, COALESCE(l.m, d.doc_id)) AS BIGINT) AS component
FROM documents d LEFT JOIN lbl l ON l.node = d.doc_id"""


def sql_dedup_representatives(threshold: float = 0.5, seed: int = 7) -> str:
    return f"""
SELECT component AS keep_doc_id, COUNT(*) AS n_members
FROM ({sql_dedup_components(threshold, seed)})
GROUP BY 1"""


def _simhash_ctes(bits: int = SIMHASH_BITS) -> str:
    bit_values = ", ".join(f"({b}, {1 << b})" for b in range(bits))
    return f"""
t AS (SELECT doc_id, {TOKENS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
th AS (SELECT doc_id, ({_md5_long('tok')} % {1 << bits}) AS h FROM tok),
bits AS (SELECT CAST(bit AS INT) AS bit, CAST(pw AS BIGINT) AS pw
         FROM (VALUES {bit_values}) AS v(bit, pw)),
contrib AS (
  SELECT doc_id, bit, pw,
         SUM(CASE WHEN (h // pw) % 2 = 1 THEN 1 ELSE -1 END) AS total
  FROM th CROSS JOIN bits GROUP BY 1, 2, 3
),
fp AS (
  SELECT doc_id, CAST(SUM(CASE WHEN total > 0 THEN pw ELSE 0 END) AS BIGINT) AS simhash
  FROM contrib GROUP BY 1
)"""


def sql_dedup_simhash() -> str:
    return f"WITH {_simhash_ctes()}\nSELECT doc_id, simhash FROM fp"


def sql_dedup_simhash_pairs(max_hamming: int = 6, max_bucket_size: int = 1000) -> str:
    key_mod = 1 << SIMHASH_BAND_BITS
    bands = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {i} AS band, "
        f"(simhash // {1 << (SIMHASH_BAND_BITS * i)}) % {key_mod} AS band_key FROM fp"
        for i in range(SIMHASH_BANDS)
    )
    return f"""
WITH {_simhash_ctes()},
banded AS ({bands}),
kept AS (
  SELECT * FROM banded
  QUALIFY COUNT(*) OVER (PARTITION BY band, band_key) <= {max_bucket_size}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.simhash AS sh_a, b.simhash AS sh_b
  FROM kept a JOIN kept b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
FROM pairs WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}"""


# ---------------------------------------------------------- similarity ops

def sql_ann_cosine_topk(n_queries: int = 100, k: int = 5) -> str:
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {n_queries}),
t AS (SELECT vec_id AS target_id, embedding::DOUBLE[] AS tv FROM embeddings),
scored AS (
  SELECT query_id, target_id,
         round(CASE WHEN sqrt(list_dot_product(qv, qv)) = 0 OR sqrt(list_dot_product(tv, tv)) = 0 THEN 0.0
                    ELSE list_dot_product(qv, tv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(tv, tv)))
               END, 9) AS cos_sim
  FROM q CROSS JOIN t WHERE query_id != target_id
),
rk AS (
  SELECT query_id, target_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, target_id) AS rk
  FROM scored
)
SELECT query_id, CAST(rk AS INT) AS rank, target_id, cos_sim FROM rk WHERE rk <= {k}"""


def sql_ann_ivf_topk(
    n_queries: int = 100, k: int = 5, stride: int = 125, nprobe: int = 2
) -> str:
    cos = (
        "round(CASE WHEN sqrt(list_dot_product({a}, {a})) = 0 "
        "OR sqrt(list_dot_product({b}, {b})) = 0 THEN 0.0 "
        "ELSE list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
        "* sqrt(list_dot_product({b}, {b}))) END, 9)"
    )
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
cents AS (SELECT vec_id AS centroid_id, vec AS cvec FROM v WHERE vec_id % {stride} = 0),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT a.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY {cos.format(a='a.vec', b='c.cvec')} DESC, c.centroid_id) AS crk
    FROM v a CROSS JOIN cents c
  ) r WHERE crk = 1
),
q AS (SELECT vec_id AS query_id, vec AS qvec FROM v WHERE vec_id < {n_queries}),
probes AS (
  SELECT query_id, qvec, centroid_id FROM (
    SELECT q.query_id, q.qvec, c.centroid_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {cos.format(a='q.qvec', b='c.cvec')} DESC, c.centroid_id) AS crk
    FROM q CROSS JOIN cents c
  ) r WHERE crk <= {nprobe}
),
cands AS (
  SELECT DISTINCT p.query_id, a.vec_id AS target_id,
         {cos.format(a='p.qvec', b='t.vec')} AS cos_sim
  FROM probes p
  JOIN assign a ON a.centroid_id = p.centroid_id AND a.vec_id != p.query_id
  JOIN v t ON t.vec_id = a.vec_id
),
ranked AS (
  SELECT query_id, target_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, target_id) AS rk
  FROM cands
)
SELECT query_id, CAST(rk AS INT) AS rank, target_id, cos_sim
FROM ranked WHERE rk <= {k}"""


def _kmeans_cte_parts(stride: int = 125, n_iters: int = 2) -> list[str]:
    parts = [
        f"dims AS (SELECT CAST(unnest(range(0, {DIM})) AS INT) AS d)",
        """vals AS (
  SELECT e.vec_id, dims.d, list_extract(e.embedding::DOUBLE[], dims.d + 1) AS val
  FROM embeddings e CROSS JOIN dims
)""",
        "vnorm AS (SELECT vec_id, sqrt(SUM(val * val)) AS vn FROM vals GROUP BY 1)",
        f"cent0 AS (SELECT vec_id AS centroid_id, d, val AS cval FROM vals WHERE vec_id % {stride} = 0)",
    ]
    for i in range(n_iters):
        parts += [
            f"cn{i} AS (SELECT centroid_id, sqrt(SUM(cval * cval)) AS cn FROM cent{i} GROUP BY 1)",
            f"""dot{i} AS (
  SELECT v.vec_id, c.centroid_id, SUM(v.val * c.cval) AS dot
  FROM vals v JOIN cent{i} c ON c.d = v.d GROUP BY 1, 2
)""",
            f"""cos{i} AS (
  SELECT d.vec_id, d.centroid_id,
         round(CASE WHEN n.vn = 0 OR c.cn = 0 THEN 0.0 ELSE d.dot / (n.vn * c.cn) END, 9) AS cs
  FROM dot{i} d JOIN vnorm n USING (vec_id) JOIN cn{i} c USING (centroid_id)
)""",
            f"""asg{i} AS (
  SELECT vec_id, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, centroid_id) AS rk
    FROM cos{i}
  ) r WHERE rk = 1
)""",
            f"""cent{i + 1} AS (
  SELECT a.centroid_id, v.d, round(AVG(v.val), 6) AS cval
  FROM asg{i} a JOIN vals v USING (vec_id) GROUP BY 1, 2
)""",
        ]
    return parts


def sql_ann_ivf_kmeans(stride: int = 125, n_iters: int = 2) -> str:
    """Lloyd iterations unrolled as CTE chains; centroids rounded to 6
    decimals per update exactly like the Spark plan, so each iteration
    restarts from identical state in both engines."""
    parts = _kmeans_cte_parts(stride, n_iters)
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT centroid_id, d AS dim_idx, round(cval, 6) + 0.0 AS comp FROM cent{n_iters}"
    )


def sql_ann_ivf_kmeans_topk(
    n_queries: int = 100, k: int = 5, stride: int = 125, nprobe: int = 2, n_iters: int = 2
) -> str:
    """Trained-IVF probe: the k-means CTE chain feeds the same
    assign/probe/rerank shape as sql_ann_ivf_topk."""
    cos = (
        "round(CASE WHEN sqrt(list_dot_product({a}, {a})) = 0 "
        "OR sqrt(list_dot_product({b}, {b})) = 0 THEN 0.0 "
        "ELSE list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
        "* sqrt(list_dot_product({b}, {b}))) END, 9)"
    )
    parts = _kmeans_cte_parts(stride, n_iters)
    parts += [
        f"cents AS (SELECT centroid_id, list(cval ORDER BY d) AS cvec FROM cent{n_iters} GROUP BY 1)",
        "v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings)",
        f"""assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT a.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY {cos.format(a='a.vec', b='c.cvec')} DESC, c.centroid_id) AS crk
    FROM v a CROSS JOIN cents c
  ) r WHERE crk = 1
)""",
        f"q AS (SELECT vec_id AS query_id, vec AS qvec FROM v WHERE vec_id < {n_queries})",
        f"""probes AS (
  SELECT query_id, qvec, centroid_id FROM (
    SELECT q.query_id, q.qvec, c.centroid_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {cos.format(a='q.qvec', b='c.cvec')} DESC, c.centroid_id) AS crk
    FROM q CROSS JOIN cents c
  ) r WHERE crk <= {nprobe}
)""",
        f"""cands AS (
  SELECT DISTINCT p.query_id, a.vec_id AS target_id,
         {cos.format(a='p.qvec', b='t.vec')} AS cos_sim
  FROM probes p
  JOIN assign a ON a.centroid_id = p.centroid_id AND a.vec_id != p.query_id
  JOIN v t ON t.vec_id = a.vec_id
)""",
        """ranked AS (
  SELECT query_id, target_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, target_id) AS rk
  FROM cands
)""",
    ]
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT query_id, CAST(rk AS INT) AS rank, target_id, cos_sim"
        + f"\nFROM ranked WHERE rk <= {k}"
    )


def _srp_ctes(
    planes: int = SRP_PLANES,
    seed: int = 99,
    sfx: str = "",
    source: str = "embeddings",
) -> str:
    """``sfx`` renames the CTEs (``buckets`` -> ``buckets<sfx>``) so one
    statement can replay SEVERAL independent SRP hash tables — the
    multi-table seeding of ``sql_knn_graph``. ``source`` swaps the
    embeddings relation (e.g. a parenthesized subquery selecting the
    pre-insert corpus for ``sql_knn_graph_insert``'s base graph)."""
    rows = srp_plane_values(planes, DIM, seed)
    values = ", ".join(f"({pl}, {d}, {c!r})" for pl, d, c in rows)
    pw_values = ", ".join(f"({pl}, {1 << pl})" for pl in range(planes))
    return f"""
planes{sfx} AS (SELECT CAST(plane AS INT) AS plane, CAST(dim_idx AS INT) AS dim_idx, CAST(comp AS DOUBLE) AS comp
           FROM (VALUES {values}) AS v(plane, dim_idx, comp)),
plane_pw{sfx} AS (SELECT CAST(plane AS INT) AS plane, CAST(pw AS BIGINT) AS pw
             FROM (VALUES {pw_values}) AS v(plane, pw)),
dots{sfx} AS (
  SELECT e.vec_id, p.plane,
         SUM(list_extract(e.embedding::DOUBLE[], p.dim_idx + 1) * p.comp) AS dot
  FROM {source} e CROSS JOIN planes{sfx} p
  GROUP BY 1, 2
),
buckets{sfx} AS (
  SELECT d.vec_id, CAST(SUM(CASE WHEN d.dot >= 0.0 THEN w.pw ELSE 0 END) AS BIGINT) AS bucket
  FROM dots{sfx} d JOIN plane_pw{sfx} w ON w.plane = d.plane
  GROUP BY 1
)"""


def sql_ann_srp_buckets() -> str:
    return f"WITH {_srp_ctes()}\nSELECT vec_id, bucket FROM buckets"


def sql_embedding_projection(out_dim: int = 16, seed: int = 177) -> str:
    """Random projection oracle: same LCG planes, same SUM-of-products /
    sqrt(SUM-of-squares) shape as the Spark plan."""
    rows = srp_plane_values(out_dim, DIM, seed)
    values = ", ".join(f"({pl}, {d}, {c!r})" for pl, d, c in rows)
    return f"""
WITH planes AS (SELECT CAST(plane AS INT) AS plane, CAST(dim_idx AS INT) AS dim_idx, CAST(comp AS DOUBLE) AS comp
                FROM (VALUES {values}) AS v(plane, dim_idx, comp)),
dims AS (SELECT CAST(unnest(range(0, {DIM})) AS INT) AS d),
vals AS (
  SELECT e.vec_id, dims.d, list_extract(e.embedding::DOUBLE[], dims.d + 1) AS val
  FROM embeddings e CROSS JOIN dims
),
norms AS (SELECT vec_id, sqrt(SUM(val * val)) AS norm FROM vals GROUP BY 1),
dots AS (
  SELECT v.vec_id, p.plane, SUM(v.val * p.comp) AS dot
  FROM vals v JOIN planes p ON p.dim_idx = v.d
  GROUP BY 1, 2
)
SELECT d.vec_id, d.plane AS dim_idx,
       round(CASE WHEN n.norm = 0 THEN 0.0 ELSE d.dot / n.norm END, 6) + 0.0 AS comp
FROM dots d JOIN norms n ON n.vec_id = d.vec_id"""


def sql_dedup_embedding(threshold: float = 0.95, max_bucket_size: int = 1000) -> str:
    # kept mirrors the Spark side's hot-bucket cap: bucket assignment is
    # deterministic and engine-identical, so both engines drop the same
    # oversized buckets and candidate sets stay equal
    return f"""
WITH {_srp_ctes()},
kept AS (
  SELECT b.vec_id, b.bucket
  FROM buckets b
  JOIN (SELECT bucket FROM buckets GROUP BY bucket
        HAVING COUNT(*) <= {max_bucket_size}) ok USING (bucket)
),
v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, va.vec AS va, vb.vec AS vb
  FROM kept a JOIN kept b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  JOIN v va ON va.vec_id = a.vec_id
  JOIN v vb ON vb.vec_id = b.vec_id
),
scored AS (
  SELECT id_a, id_b,
         round(CASE WHEN sqrt(list_dot_product(va, va)) = 0 OR sqrt(list_dot_product(vb, vb)) = 0 THEN 0.0
                    ELSE list_dot_product(va, vb) / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb)))
               END, 9) AS cos_sim
  FROM pairs
)
SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= {threshold}"""


# ---------------------------------------------------------- generator ops

def sql_gen_logistic_maps(length: int = 300, coupling: float = 0.15) -> str:
    """G1 (reference lib/coupled_logistic_maps_generator.ex:6-27) as a
    recursive CTE — the same IEEE double expressions numpy evaluates, in the
    same order, so values are bit-identical before the boundary rounding."""
    return f"""
WITH RECURSIVE g(t, x, y) AS (
  SELECT 0 AS t, CAST(0.1 AS DOUBLE) AS x, CAST(0.2 AS DOUBLE) AS y
  UNION ALL
  SELECT t + 1,
         GREATEST(0.0, LEAST(1.0, 3.7 * x * (1.0 - x) + {coupling} * (y - x))),
         GREATEST(0.0, LEAST(1.0, 3.6 * y * (1.0 - y)))
  FROM g WHERE t < {length}
)
SELECT CAST(t AS BIGINT) AS t, round(x, 6) + 0.0 AS x, round(y, 6) + 0.0 AS y FROM g"""


def sql_gen_coupled_series(length: int = 100, coupling: float = 0.3) -> str:
    """G2 noise-free recurrence (reference lib/coupled_series_generator.ex:
    46-67; observation noise off — the seeded-noise variant is numpy-only)."""
    return f"""
WITH RECURSIVE g(t, x, y) AS (
  SELECT 0 AS t, CAST(0.3 AS DOUBLE) AS x, CAST(0.4 AS DOUBLE) AS y
  UNION ALL
  SELECT t + 1,
         GREATEST(0.001, LEAST(0.999, 3.8 * x * (1.0 - x))),
         GREATEST(0.001, LEAST(0.999, 3.6 * y * (1.0 - y) + {coupling} * (x - y)))
  FROM g WHERE t < {length}
)
SELECT CAST(t AS BIGINT) AS t, round(x, 6) + 0.0 AS x, round(y, 6) + 0.0 AS y FROM g"""


def sql_gen_coupled_series_noisy(
    length: int = 100,
    coupling: float = 0.3,
    noise_level: float = 0.05,
    seed: int = 123,
) -> str:
    """G2 with observation noise (reference lib/coupled_series_generator.ex:
    78-83): the recurrence replays as a recursive CTE, and the uniform noise
    replays as the LCG rank key keyed on (t, series, seed) — the same pure
    scalar expression numpy evaluates in generators.coupled_series."""
    from ccm_spark.rng import sql_rank_key_expr

    ux = f"(CAST({sql_rank_key_expr('t', '0', '0', '0', seed)} AS DOUBLE) / 2147483648.0)"
    uy = f"(CAST({sql_rank_key_expr('t', '0', '0', '1', seed)} AS DOUBLE) / 2147483648.0)"
    return f"""
WITH RECURSIVE g(t, x, y) AS (
  SELECT 0 AS t, CAST(0.3 AS DOUBLE) AS x, CAST(0.4 AS DOUBLE) AS y
  UNION ALL
  SELECT t + 1,
         GREATEST(0.001, LEAST(0.999, 3.8 * x * (1.0 - x))),
         GREATEST(0.001, LEAST(0.999, 3.6 * y * (1.0 - y) + {coupling} * (x - y)))
  FROM g WHERE t < {length}
)
SELECT CAST(t AS BIGINT) AS t,
       round(x + {noise_level} * ({ux} - 0.5) * 2.0, 6) + 0.0 AS x,
       round(y + {noise_level} * ({uy} - 0.5) * 2.0, 6) + 0.0 AS y
FROM g"""


# -------------------------------------------------------------- events ops

def sql_events_hourly_stats() -> str:
    # DuckDB reads the ns-parquet timestamp us-truncated; epoch_us // 3600e6
    # equals Spark's (ns DIV 1000) DIV 3600000000 hour index exactly.
    return """
SELECT epoch_us(ts) // 3600000000 AS hour_bucket,
       event_type,
       COUNT(*) AS n_events,
       round(SUM(value), 6) + 0.0 AS sum_value,
       round(round(SUM(value), 6) / COUNT(*), 6) + 0.0 AS avg_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2"""


# ------------------------------------------------- events / relational ops

def sql_events_asof_join(left_type: str = "click", right_type: str = "view") -> str:
    return f"""
WITH tagged AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         event_type = '{left_type}' AS is_left, value
  FROM events WHERE event_type IN ('{left_type}', '{right_type}')
),
carried AS (
  SELECT *,
         last_value(CASE WHEN NOT is_left THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id
                 ORDER BY ts_us, CASE WHEN is_left THEN 0 ELSE 1 END, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_value
  FROM tagged
)
SELECT event_id, user_id, ts_us, value AS left_value, asof_value
FROM carried WHERE is_left"""


def sql_events_asof_tolerance(
    left_type: str = "click", right_type: str = "view", tolerance_minutes: int = 60
) -> str:
    tol_us = tolerance_minutes * 60_000_000
    return f"""
WITH tagged AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         event_type = '{left_type}' AS is_left, value
  FROM events WHERE event_type IN ('{left_type}', '{right_type}')
),
carried AS (
  SELECT *,
         last_value(CASE WHEN NOT is_left THEN value END IGNORE NULLS) OVER w AS asof_value,
         last_value(CASE WHEN NOT is_left THEN ts_us END IGNORE NULLS) OVER w AS asof_ts
  FROM tagged
  WINDOW w AS (PARTITION BY user_id
               ORDER BY ts_us, CASE WHEN is_left THEN 0 ELSE 1 END, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts_us, value AS left_value,
       CASE WHEN asof_ts IS NOT NULL AND ts_us - asof_ts <= {tol_us}
            THEN asof_value END AS asof_value
FROM carried WHERE is_left"""


def sql_events_sessionize(gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60_000_000
    return f"""
WITH marked AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
         lag(epoch_us(ts)) OVER w AS prev_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
flagged AS (
  SELECT *,
         CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > {gap_us} THEN 1 ELSE 0 END AS new_session
  FROM marked
),
sessioned AS (
  SELECT *,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, COUNT(*) AS n_events,
       MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
       round(SUM(value), 6) + 0.0 AS sum_value
FROM sessioned GROUP BY 1, 2"""


def sql_events_quantiles() -> str:
    return """
SELECT event_type,
       round(quantile_cont(value, 0.25), 6) + 0.0 AS p25,
       round(quantile_cont(value, 0.5), 6) + 0.0 AS p50,
       round(quantile_cont(value, 0.75), 6) + 0.0 AS p75,
       round(quantile_cont(value, 0.95), 6) + 0.0 AS p95
FROM events GROUP BY 1"""


def sql_pricing_summary(cutoff_date: str = "1996-06-30") -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       round(SUM(l_quantity), 6) + 0.0 AS sum_qty,
       round(SUM(l_extendedprice), 6) + 0.0 AS sum_base_price,
       round(SUM(l_extendedprice * (1 - l_discount)), 6) + 0.0 AS sum_disc_price,
       round(round(SUM(l_quantity), 6) / COUNT(*), 6) + 0.0 AS avg_qty,
       round(round(SUM(l_extendedprice), 6) / COUNT(*), 6) + 0.0 AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '{cutoff_date}'
GROUP BY 1, 2"""


def sql_customers_no_urgent_orders() -> str:
    return """
SELECT n.n_name AS nation,
       COUNT(*) AS n_customers,
       round(SUM(c.c_acctbal), 6) + 0.0 AS sum_acctbal
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY 1"""


def sql_parts_no_bulk_returns() -> str:
    return """
SELECT p_brand,
       COUNT(*) AS n_parts,
       round(AVG(p_retailprice), 6) + 0.0 AS avg_retail
FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey
                    AND l.l_returnflag = 'R' AND l.l_quantity >= 40)
GROUP BY 1"""


def sql_top_customers_by_nation(k: int = 5) -> str:
    return f"""
WITH per_cust AS (
  SELECT o_custkey, SUM(o_totalprice) AS total_spend, COUNT(*) AS n_orders
  FROM orders GROUP BY 1
),
joined AS (
  SELECT n.n_name AS nation, p.o_custkey AS c_custkey, p.n_orders, p.total_spend
  FROM per_cust p
  JOIN customer c ON c.c_custkey = p.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY nation
                               ORDER BY round(total_spend, 6) DESC, c_custkey) AS rk
  FROM joined
)
SELECT nation, CAST(rk AS INT) AS rank, c_custkey, n_orders,
       round(total_spend, 6) + 0.0 AS total_spend
FROM ranked WHERE rk <= {k}"""


# ---------------------------------------------------------- multimodal ops

def sql_multimodal_frames(every_n: int = 10) -> str:
    """Frame-sampling plumbing oracle: the stubbed decoder reports
    byte_len // 100 frames; sample every Nth index."""
    return f"""
WITH f AS (SELECT doc_id, strlen(text) // 100 AS n_frames FROM documents)
SELECT doc_id, CAST(unnest(range(0, n_frames, {every_n})) AS INT) AS frame_idx
FROM f WHERE n_frames >= 1"""


def sql_multimodal_features() -> str:
    return """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS byte_len,
       md5(text) AS payload_md5,
       CASE WHEN lower(hex(text::BLOB)) LIKE '89504e47%' THEN 'png'
            WHEN lower(hex(text::BLOB)) LIKE 'ffd8ff%' THEN 'jpeg'
            WHEN lower(hex(text::BLOB)) LIKE '47494638%' THEN 'gif'
            WHEN lower(hex(text::BLOB)) LIKE '52494646%' THEN 'riff'
            ELSE 'unknown' END AS sniffed_format
FROM documents"""


# ------------------------------------------------- corpus assembly / PII

def sql_sample_mixture() -> str:
    from ccm_spark.pipeline.mixing import (
        DEFAULT_MIX_FALLBACK,
        DEFAULT_MIX_RATES,
        DEFAULT_MIX_SALT,
        MIX_MOD,
    )

    fallback = int(round(DEFAULT_MIX_FALLBACK * MIX_MOD))
    chain = " ".join(
        f"WHEN '{lang}' THEN {int(round(rate * MIX_MOD))}"
        for lang, rate in sorted(DEFAULT_MIX_RATES.items())
    )
    key = _md5_long(f"CAST(doc_id AS VARCHAR) || ':{DEFAULT_MIX_SALT}'")
    return f"""
WITH keyed AS (
  SELECT doc_id, lang, source, CAST({key} % {MIX_MOD} AS BIGINT) AS sample_key
  FROM documents
)
SELECT doc_id, lang, source, sample_key
FROM keyed
WHERE sample_key < CASE lang {chain} ELSE {fallback} END"""


def sql_pack_sequences() -> str:
    from ccm_spark.pipeline.mixing import PACK_BUDGET, PACK_SHARDS

    shard = f"CAST({_md5_long('CAST(doc_id AS VARCHAR)')} % {PACK_SHARDS} AS BIGINT)"
    return f"""
WITH RECURSIVE numbered AS (
  SELECT shard, doc_id, n_tokens,
         row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
  FROM (SELECT {shard} AS shard, doc_id,
               CAST(len({TOKENS}) AS BIGINT) AS n_tokens
        FROM documents)
),
pack AS (
  SELECT shard, doc_id, n_tokens, rn,
         CAST(0 AS BIGINT) AS bin_idx, CAST(0 AS BIGINT) AS bin_offset,
         n_tokens AS fill
  FROM numbered WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.doc_id, d.n_tokens, d.rn,
         CASE WHEN p.fill + d.n_tokens <= {PACK_BUDGET} THEN p.bin_idx
              ELSE p.bin_idx + 1 END,
         CASE WHEN p.fill + d.n_tokens <= {PACK_BUDGET} THEN p.fill
              ELSE CAST(0 AS BIGINT) END,
         CASE WHEN p.fill + d.n_tokens <= {PACK_BUDGET} THEN p.fill + d.n_tokens
              ELSE d.n_tokens END
  FROM pack p JOIN numbered d ON d.shard = p.shard AND d.rn = p.rn + 1
)
SELECT shard, doc_id, n_tokens, bin_idx, bin_offset FROM pack"""


def sql_text_redact_pii() -> str:
    from ccm_spark.pipeline.text import EMAIL_RE, NUMBER_RE

    return f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com ref '
              || CAST(doc_id * 1000003 + 123456 AS VARCHAR) AS text
  FROM documents
),
red AS (
  SELECT doc_id, text,
         regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS red1
  FROM aug
),
red2 AS (
  SELECT doc_id, text, red1,
         regexp_replace(red1, '{NUMBER_RE}', '<NUM>', 'g') AS redacted
  FROM red
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(red1, '{NUMBER_RE}')) AS BIGINT) AS n_numbers,
       CAST(length(redacted) AS BIGINT) AS red_len,
       {_md5_long('redacted')} AS red_fp
FROM red2"""


def sql_decontaminate(width: int | None = None, mod: int = 31) -> str:
    from ccm_spark.pipeline.dedup import SHINGLE_WIDTH

    w = SHINGLE_WIDTH if width is None else width
    grams = " || ' ' || ".join(f"list_extract(toks, i + {j})" for j in range(w))
    return f"""
WITH tr AS (SELECT doc_id, {TOKENS} AS toks FROM documents WHERE doc_id % {mod} <> 0),
ev AS (SELECT doc_id, {TOKENS} AS toks FROM documents WHERE doc_id % {mod} = 0),
trpos AS (SELECT doc_id, toks, unnest(range(1, len(toks) - {w - 2})) AS i FROM tr),
trsh AS (
  SELECT DISTINCT doc_id, ({_md5_long(f"({grams})")} % {P31}) AS shingle_hash
  FROM trpos
),
evpos AS (SELECT doc_id, toks, unnest(range(1, len(toks) - {w - 2})) AS i FROM ev),
evsh AS (
  SELECT DISTINCT ({_md5_long(f"({grams})")} % {P31}) AS shingle_hash
  FROM evpos
),
hits AS (
  SELECT t.doc_id, COUNT(*) AS n
  FROM trsh t JOIN evsh e USING (shingle_hash) GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_contaminated_shingles,
       COALESCE(h.n, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {mod} <> 0) d
LEFT JOIN hits h ON h.doc_id = d.doc_id"""


def sql_text_repetition() -> str:
    return f"""
WITH t AS (SELECT doc_id, {TOKENS} AS toks FROM documents),
pos AS (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t),
g AS (
  SELECT doc_id, list_extract(toks, i) || ' ' || list_extract(toks, i + 1) AS gram
  FROM pos
),
c AS (SELECT doc_id, gram, COUNT(*) AS n FROM g GROUP BY 1, 2),
agg AS (
  SELECT doc_id,
         CAST(SUM(n) AS BIGINT) AS n_2grams,
         CAST(MAX(n) AS BIGINT) AS top2_count,
         CAST(COALESCE(SUM(n) FILTER (WHERE n > 1), 0) AS BIGINT) AS dup2_occ
  FROM c GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(a.n_2grams, 0) AS n_2grams,
       COALESCE(a.top2_count, 0) AS top2_count,
       COALESCE(a.dup2_occ, 0) AS dup2_occ,
       CASE WHEN COALESCE(a.n_2grams, 0) > 0
            THEN round(CAST(a.top2_count AS DOUBLE) / a.n_2grams, 6) + 0.0
            ELSE 0.0 END AS top2_frac,
       CASE WHEN COALESCE(a.n_2grams, 0) > 0
            THEN round(CAST(a.dup2_occ AS DOUBLE) / a.n_2grams, 6) + 0.0
            ELSE 0.0 END AS dup2_frac
FROM documents d LEFT JOIN agg a USING (doc_id)"""


def sql_boilerplate_ngrams(width: int = 3, min_docs: int = 2, k: int = 20) -> str:
    grams = " || ' ' || ".join(f"list_extract(toks, i + {j})" for j in range(width))
    return f"""
WITH t AS (SELECT doc_id, source, {TOKENS} AS toks FROM documents),
pos AS (SELECT doc_id, source, toks, unnest(range(1, len(toks) - {width - 2})) AS i FROM t),
g AS (SELECT DISTINCT doc_id, source, ({grams}) AS gram FROM pos),
c AS (SELECT source, gram, COUNT(*) AS n_docs FROM g GROUP BY 1, 2),
r AS (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY n_docs DESC, gram ASC) AS rank
  FROM c WHERE n_docs >= {min_docs}
)
SELECT source, CAST(rank AS INT) AS rank, gram, CAST(n_docs AS BIGINT) AS n_docs
FROM r WHERE rank <= {k}"""


def sql_ann_ivf_recall(n_queries: int = 100, k: int = 5) -> str:
    """Recall@k of the trained-IVF probe vs exact brute force: the two
    already-pinned topk queries nested as CTE subqueries (DuckDB allows a
    WITH inside a parenthesised CTE body), joined on (query_id, target_id)."""
    return f"""
WITH exact_tk AS ({sql_ann_cosine_topk(n_queries, k)}),
approx_tk AS ({sql_ann_ivf_kmeans_topk(n_queries, k)})
SELECT e.query_id,
       CAST(COUNT(a.target_id) AS BIGINT) AS n_hits,
       round(CAST(COUNT(a.target_id) AS DOUBLE) / {float(k)}, 6) + 0.0 AS recall
FROM exact_tk e
LEFT JOIN approx_tk a
  ON a.query_id = e.query_id AND a.target_id = e.target_id
GROUP BY e.query_id"""


URL_TRACKING_RE = (
    "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|igshid|mc_cid|mc_eid"
    "|ref|ref_src|spm)="
)


def _sql_url_fixture() -> str:
    """The deterministic synthetic URL per document (documents has no URL
    column) — MUST mirror ccm_spark.entry._url_fixture expression for
    expression: doc pairs (doc_id DIV 2) share a target URL, the odd member
    carrying one normalisation hazard chosen by (pair % 7): scheme/host
    case, default port, tracking params, fragment, unsorted params,
    bracketed-IPv6 host case, or a '?' inside the fragment (the last two
    gate the r6-advice host/query regex fixes)."""
    return """
uf AS (
  SELECT doc_id,
         doc_id // 2 AS g, doc_id % 2 AS v, (doc_id // 2) % 7 AS k,
         CASE WHEN (doc_id // 2) % 7 = 5
              THEN '[2001:db8::' || CAST((doc_id // 2) % 9 AS VARCHAR) || ']'
              ELSE 'example' || CAST((doc_id // 2) % 7 AS VARCHAR) || '.com'
         END AS host,
         '/page/' || CAST(doc_id // 2 AS VARCHAR) AS tail
  FROM documents
),
urls AS (
  SELECT doc_id,
    CASE WHEN v = 0 THEN
      CASE WHEN k = 4 THEN 'http://' || host || tail || '?a=1&b=2'
           ELSE 'http://' || host || tail END
    ELSE
      CASE k
        WHEN 0 THEN 'HTTP://' || upper(host) || tail
        WHEN 1 THEN 'http://' || host || ':80' || tail
        WHEN 2 THEN 'http://' || host || tail || '?utm_source=x&utm_medium=y'
        WHEN 3 THEN 'http://' || host || tail || '#frag'
        WHEN 4 THEN 'http://' || host || tail || '?b=2&a=1'
        WHEN 5 THEN 'HTTP://' || upper(host) || tail
        ELSE 'http://' || host || tail || '#sec?a=1'
      END
    END AS url
  FROM uf
)"""


def sql_url_dedup() -> str:
    """DuckDB twin of pipeline.urls.url_duplicates over the synthetic URL
    fixture: the full normalisation contract (case, userinfo, default
    ports, fragments, tracking-param removal, param sort, empty path)
    replayed with the same regexes, then the URL-exact group-by."""
    return f"""
WITH {_sql_url_fixture()},
p AS (
  SELECT doc_id, url,
    regexp_extract(url, '^[ \t]*([A-Za-z][A-Za-z0-9+.-]*)://', 1) AS scheme0,
    regexp_extract(url, '^[ \t]*[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth,
    regexp_extract(url, '^[ \t]*[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
    regexp_extract(url, '^[^#]*?\\?([^#]*)', 1) AS query0
  FROM urls
),
c AS (
  SELECT doc_id,
    lower(scheme0) AS scheme,
    regexp_replace(lower(regexp_extract(auth, '^(?:[^@]*@)?(\\[[^\\]]*\\]|[^:]*)', 1)), '\\.$', '') AS host,
    regexp_extract(auth, ':([0-9]+)$', 1) AS port,
    CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
    COALESCE(array_to_string(
      list_sort(
        list_filter(string_split(query0, '&'),
                    kv -> kv <> '' AND NOT regexp_matches(kv, '{URL_TRACKING_RE}'))
      ), '&'), '') AS kept
  FROM p
),
n AS (
  SELECT doc_id,
    CASE WHEN scheme = '' OR host = ''
              OR (host LIKE '[%' AND NOT regexp_matches(host, '^\\[[^\\]]+\\]$'))
         THEN NULL ELSE
      scheme || '://' || host ||
      CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                OR (scheme = 'https' AND port = '443')
           THEN '' ELSE ':' || port END ||
      path ||
      CASE WHEN kept = '' THEN '' ELSE '?' || kept END
    END AS url_norm
  FROM c
)
SELECT url_norm, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM n WHERE url_norm IS NOT NULL GROUP BY 1"""


# --------------------------------------------------- lexical search + LM

# shared with entry.q_bm25_topk / entry.q_lm_perplexity so the two
# engines always run the same parameters
BM25_QUERIES = ["data processing pipeline", "the spark shuffle"]
BM25_K = 10
BM25_K1 = 1.2
BM25_B = 0.75
LM_VOCAB_SIZE = 1000
LM_MAX_BIGRAMS = 5000
LM_ALPHA = 0.1
LM_KN_DISCOUNT = 0.75


def sql_bm25_topk(query_source: str | None = None, k: int | None = None) -> str:
    """DuckDB twin of pipeline.search.bm25_topk over the documents table:
    same tokenizer, same postings/df/dl relations, same
    Robertson/Sparck-Jones formula with identical literal arithmetic
    (k1+1, 1-b precomputed like the Spark plan), ranks on the
    6-rounded score with doc_id tiebreak. ``query_source`` swaps the
    gate's literal VALUES queries for any (query_id, qtext) SELECT —
    the sql_split_sentences source-hook pattern, used by
    sql_hybrid_search_rrf to derive queries from the documents
    themselves; defaults stay byte-identical for the gated row."""
    if query_source is None:
        qvals = ", ".join(f"({i}, '{q}')" for i, q in enumerate(BM25_QUERIES))
        q_cte = f"q(query_id, qtext) AS (VALUES {qvals})"
    else:
        q_cte = f"q AS ({query_source})"
    k = BM25_K if k is None else int(k)
    return f"""
WITH {q_cte},
occ AS (
  SELECT doc_id, unnest(toks) AS term
  FROM (SELECT doc_id, {TOKENS} AS toks FROM documents) s
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM occ GROUP BY 1),
post AS (
  SELECT o.term, o.doc_id, COUNT(*) AS tf, ANY_VALUE(d.dl) AS dl
  FROM occ o JOIN dl d USING (doc_id) GROUP BY 1, 2
),
scal AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM dl),
qt AS (
  SELECT DISTINCT query_id, term
  FROM (SELECT query_id, unnest({_sql_tokens('qtext')}) AS term FROM q) u
),
qdf AS (
  SELECT term, COUNT(*) AS df FROM post
  WHERE term IN (SELECT term FROM qt) GROUP BY 1
),
scored AS (
  SELECT qt.query_id, p.doc_id,
         round(SUM(
           ln((s.n - f.df + 0.5) / (f.df + 0.5) + 1.0)
           * p.tf * {BM25_K1 + 1.0}
           / (p.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * p.dl / s.avgdl))
         ), 6) + 0.0 AS score
  FROM post p JOIN qt ON p.term = qt.term
  JOIN qdf f ON p.term = f.term CROSS JOIN scal s
  GROUP BY 1, 2
)
SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= {k}"""


def sql_hybrid_search_rrf(
    n_queries: int = 20,
    k_each: int = 10,
    top_k: int = 10,
    q_tokens: int = 8,
) -> str:
    """DuckDB twin of pipeline.search.hybrid_search_rrf: the bm25 chain
    nested VERBATIM via its query-source hook (queries = each query
    doc's leading ``q_tokens`` whitespace tokens — the shared tokenizer
    constant), the cosine chain nested verbatim
    (sql_ann_cosine_topk), lexical self-hits dropped AFTER ranking,
    RRF contributions 1/(60 + rank) summed per (query, doc) — at most
    two addends, one IEEE addition, bit-identical — rounded 9, ranked
    (score desc, doc_id asc), top_k per query."""
    q_src = (
        "SELECT doc_id AS query_id, "
        f"array_to_string({TOKENS}[1:{int(q_tokens)}], ' ') AS qtext "
        f"FROM documents WHERE doc_id < {int(n_queries)}"
    )
    return f"""
WITH lex AS MATERIALIZED ({sql_bm25_topk(query_source=q_src, k=k_each)}),
vec AS MATERIALIZED ({sql_ann_cosine_topk(n_queries=n_queries, k=k_each)}),
contrib AS (
  SELECT query_id, doc_id, 1.0 / (60 + rank) AS c
  FROM lex WHERE doc_id != query_id
  UNION ALL
  SELECT query_id, target_id AS doc_id, 1.0 / (60 + rank) AS c FROM vec
),
fused AS (
  SELECT query_id, doc_id, round(SUM(c), 9) AS rrf_score
  FROM contrib GROUP BY 1, 2
)
SELECT query_id, CAST(rank AS INT) AS rank, doc_id, rrf_score FROM (
  SELECT query_id, doc_id, rrf_score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf_score DESC, doc_id) AS rank
  FROM fused
) WHERE rank <= {int(top_k)}"""


def sql_lm_perplexity() -> str:
    """DuckDB twin of pipeline.lm train_bigram_lm + perplexity, trained
    and scored on the same documents table: exact-count vocab/bigram
    tables with the Spark plan's deterministic tiebreaks
    (count desc, token asc / count desc, w1, w2), OOV folded to <unk> on
    both sides, add-alpha smoothing with K = vocab+1 classes, first
    token under the smoothed unigram and every next token under the
    smoothed bigram — the same arithmetic score_model runs in the Arrow
    pass. Token-less docs emit NULL scores."""
    return f"""
WITH toks AS (SELECT doc_id, {TOKENS} AS toks FROM documents),
nz AS (SELECT doc_id, toks FROM toks WHERE len(toks) > 0),
uni AS (
  SELECT term, COUNT(*) AS n
  FROM (SELECT unnest(toks) AS term FROM nz) GROUP BY 1
),
vocab AS (SELECT term, n FROM uni ORDER BY n DESC, term ASC LIMIT {LM_VOCAB_SIZE}),
scal AS (
  SELECT CAST((SELECT SUM(n) FROM uni) AS DOUBLE) AS total,
         CAST((SELECT SUM(n) FROM uni) - (SELECT SUM(n) FROM vocab) AS DOUBLE) AS unk_count,
         CAST((SELECT COUNT(*) FROM vocab) + 1 AS DOUBLE) AS k
),
bg AS (
  SELECT doc_id,
         CASE WHEN z[1] IN (SELECT term FROM vocab) THEN z[1] ELSE '<unk>' END AS w1,
         CASE WHEN z[2] IN (SELECT term FROM vocab) THEN z[2] ELSE '<unk>' END AS w2
  FROM (
    SELECT doc_id, unnest(list_zip(toks[:len(toks)-1], toks[2:])) AS z
    FROM nz WHERE len(toks) > 1
  ) s
),
bi AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY 1, 2),
bigrams AS (
  SELECT w1, w2, n FROM bi ORDER BY n DESC, w1 ASC, w2 ASC LIMIT {LM_MAX_BIGRAMS}
),
firsts AS (
  SELECT doc_id, len(toks) AS n_scored,
         CASE WHEN toks[1] IN (SELECT term FROM vocab) THEN toks[1] ELSE '<unk>' END AS w
  FROM nz
),
uni_term AS (
  SELECT f.doc_id,
         -log2((CASE WHEN f.w = '<unk>' THEN s.unk_count ELSE v.n END + {LM_ALPHA})
               / (s.total + {LM_ALPHA} * s.k)) AS bits
  FROM firsts f LEFT JOIN vocab v ON f.w = v.term CROSS JOIN scal s
),
pair_terms AS (
  SELECT g.doc_id,
         SUM(-log2((COALESCE(b.n, 0) + {LM_ALPHA}) /
             (CASE WHEN g.w1 = '<unk>' THEN s.unk_count ELSE v.n END + {LM_ALPHA} * s.k))) AS bits
  FROM bg g
  LEFT JOIN bigrams b ON g.w1 = b.w1 AND g.w2 = b.w2
  LEFT JOIN vocab v ON g.w1 = v.term
  CROSS JOIN scal s
  GROUP BY 1
),
scored AS (
  SELECT f.doc_id, f.n_scored,
         (u.bits + COALESCE(p.bits, 0.0)) / f.n_scored AS h
  FROM firsts f JOIN uni_term u USING (doc_id)
  LEFT JOIN pair_terms p USING (doc_id)
)
SELECT doc_id, CAST(n_scored AS BIGINT) AS n_scored,
       round(h, 6) + 0.0 AS cross_entropy,
       round(2.0 ** h, 6) + 0.0 AS perplexity
FROM scored
UNION ALL
SELECT doc_id, 0, NULL, NULL FROM toks WHERE len(toks) = 0"""


# ---------------------------------------------------- series search gate

# shared with entry.q_series_topk: series fixture geometry + LCG query
SERIES_SID_MOD = 32
SERIES_N = 64
SERIES_K = 10


def sql_series_topk() -> str:
    """DuckDB twin of pipeline.series_search.series_topk over an
    events-derived series fixture — deliberately ALGORITHM-INDEPENDENT:
    the SQL is plain brute-force z-normalised ED over every complete
    series, while the Spark side runs the PAA-pruned two-phase search,
    so a hash match certifies the pruning machinery returns EXACTLY the
    exhaustive answer (the PAA lower-bound lemma, end-to-end). Fixture:
    series_id = user_id % SID_MOD, t = dense rank by (epoch-us ts,
    event_id), first SERIES_N points, incomplete series dropped; query =
    a deterministic integer-LCG sequence both engines derive exactly."""
    return f"""
WITH ev AS (
  SELECT user_id % {SERIES_SID_MOD} AS series_id, epoch_us(ts) AS ts_us,
         event_id, value
  FROM events
),
ranked AS (
  SELECT series_id, value,
         row_number() OVER (PARTITION BY series_id ORDER BY ts_us, event_id) - 1 AS t
  FROM ev
),
pts AS (SELECT * FROM ranked WHERE t < {SERIES_N}),
com AS (SELECT series_id FROM pts GROUP BY 1 HAVING COUNT(*) = {SERIES_N}),
q AS (
  SELECT t, ((1103515245 * (t + 7) + 12345) % 2147483647 % 2001) / 1000.0 - 1.0 AS qv
  FROM range({SERIES_N}) r(t)
),
qs AS (SELECT avg(qv) AS mu, stddev_pop(qv) AS sd FROM q),
qz AS (
  SELECT t, CASE WHEN (SELECT sd FROM qs) > 0
                 THEN (qv - (SELECT mu FROM qs)) / (SELECT sd FROM qs)
                 ELSE 0.0 END AS zq
  FROM q
),
st AS (
  SELECT series_id, avg(value) AS mu, stddev_pop(value) AS sd
  FROM pts WHERE series_id IN (SELECT series_id FROM com) GROUP BY 1
),
sz AS (
  SELECT p.series_id, p.t,
         CASE WHEN s.sd > 0 THEN (p.value - s.mu) / s.sd ELSE 0.0 END AS zs
  FROM pts p JOIN st s USING (series_id)
),
d AS (
  SELECT series_id, round(sqrt(SUM((zq - zs) * (zq - zs))), 9) + 0.0 AS distance
  FROM sz JOIN qz USING (t) GROUP BY 1
)
SELECT CAST(rank AS INT) AS rank, series_id, distance FROM (
  SELECT series_id, distance,
         row_number() OVER (ORDER BY distance, series_id) AS rank
  FROM d
) WHERE rank <= {SERIES_K}"""


# ------------------------------------------------- html extraction (r07)

def _html_strip_chain(expr: str) -> str:
    """The extraction chain of pipeline.html.strip_html as one DuckDB
    expression — patterns imported from the Spark module (single source
    of truth), engine-portable by construction (no backreferences, no
    lookaround; same replay tests/test_html.py pins on a hand fixture)."""
    from ccm_spark.pipeline.html import (
        ANY_TAG_RE,
        BLOCK_TAG_RE,
        DROP_BLOCK_RES,
        ENTITIES,
    )

    for pat in DROP_BLOCK_RES:
        expr = f"regexp_replace({expr}, '{pat}', '', 'g')"
    expr = f"regexp_replace({expr}, '{BLOCK_TAG_RE}', chr(10), 'g')"
    expr = f"regexp_replace({expr}, '{ANY_TAG_RE}', '', 'g')"
    for ent, repl in ENTITIES:
        lit = repl.replace("'", "''")
        expr = f"replace({expr}, '{ent}', '{lit}')"
    expr = f"regexp_replace({expr}, '[ \\t\\r\\x0b\\f]+', ' ', 'g')"
    expr = f"regexp_replace({expr}, ' ?\\n ?', chr(10), 'g')"
    expr = f"regexp_replace({expr}, '\\n{{3,}}', chr(10) || chr(10), 'g')"
    expr = f"regexp_replace({expr}, '^\\s+|\\s+$', '', 'g')"
    return expr


def sql_html_extract() -> str:
    """Deterministic markup fixture (doc_id % 4 picks the template: full
    page with script/style/comment blocks, div+list, entity tail, or
    bare pass-through) wrapped around documents.text, then the full
    extraction chain; hash pins the exact cleaned text per doc."""
    chain = _html_strip_chain("html")
    return f"""
WITH fx AS (
  SELECT doc_id,
         CASE
           WHEN doc_id % 4 = 0 THEN '<html><head><title>D' || CAST(doc_id AS VARCHAR) || '</title><style>body {{ x:1; }}</style></head><body><script>var q = 1;</script><p>' || text || '</p></body></html>'
           WHEN doc_id % 4 = 1 THEN '<div class="m"><h1>H' || CAST(doc_id AS VARCHAR) || '</h1><!-- hidden --><p>' || text || '</p><ul><li>one</li><li>two</li></ul></div>'
           WHEN doc_id % 4 = 2 THEN '<p>' || text || '</p><br>tail &amp; &lt;end&gt;&nbsp;fin'
           ELSE text
         END AS html
  FROM documents
),
ext AS (SELECT doc_id, {chain} AS text FROM fx)
SELECT doc_id, text, CAST(length(text) AS INT) AS n_chars_clean FROM ext"""


# -------------------------------------------- distributed k-means (r07)

def sql_kmeans_clusters(k: int = 8, n_iters: int = 2) -> str:
    """Full-corpus Euclidean Lloyd replay of pipeline.clustering: init =
    first k vectors by vec_id (L2-normalised, round 6), per-iteration
    argmin of ||x-c||^2 ranked as (c.c - 2 x.c) with lowest-cluster
    ties, update = member mean rounded 6 (empty clusters keep their
    previous centroid), final assignment against the trained centroids."""
    parts = [
        f"dims AS (SELECT CAST(unnest(range(0, {DIM})) AS INT) AS d)",
        """vals AS (
  SELECT e.vec_id, dims.d, list_extract(e.embedding::DOUBLE[], dims.d + 1) AS val
  FROM embeddings e CROSS JOIN dims
)""",
        "vnorm AS (SELECT vec_id, sqrt(SUM(val * val)) AS vn FROM vals GROUP BY 1)",
        """nv AS (
  SELECT v.vec_id, v.d, CASE WHEN n.vn = 0 THEN v.val ELSE v.val / n.vn END AS val
  FROM vals v JOIN vnorm n USING (vec_id)
)""",
        f"""init AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS centroid_id
  FROM (SELECT DISTINCT vec_id FROM nv ORDER BY vec_id LIMIT {k})
)""",
        "cent0 AS (SELECT i.centroid_id, v.d, round(v.val, 6) AS cval FROM init i JOIN nv v USING (vec_id))",
    ]

    def _score(i: int) -> list[str]:
        return [
            f"cn{i} AS (SELECT centroid_id, SUM(cval * cval) AS c2 FROM cent{i} GROUP BY 1)",
            f"""sc{i} AS (
  SELECT v.vec_id, c.centroid_id, n.c2 - 2.0 * SUM(v.val * c.cval) AS d2
  FROM nv v JOIN cent{i} c ON c.d = v.d JOIN cn{i} n ON n.centroid_id = c.centroid_id
  GROUP BY 1, 2, n.c2
)""",
        ]

    for i in range(n_iters):
        parts += _score(i)
        parts += [
            f"""asg{i} AS (
  SELECT vec_id, centroid_id AS cluster FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, centroid_id) AS rk
    FROM sc{i}
  ) r WHERE rk = 1
)""",
            f"""cent{i + 1} AS (
  SELECT a.cluster AS centroid_id, v.d, round(AVG(v.val), 6) AS cval
  FROM asg{i} a JOIN nv v USING (vec_id) GROUP BY 1, 2
  UNION ALL
  SELECT c.centroid_id, c.d, c.cval FROM cent{i} c
  WHERE c.centroid_id NOT IN (SELECT DISTINCT cluster FROM asg{i})
)""",
        ]
    parts += _score(n_iters)
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT vec_id, CAST(centroid_id AS BIGINT) AS cluster FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, centroid_id) AS rk
  FROM sc{n_iters}
) r WHERE rk = 1"""
    )


# ------------------------------------------------- r08 gated families

#: PQ gate geometry: small ksub keeps the unrolled Lloyd CTE chain
#: tractable while exercising the full trainer + ADC path; the
#: production-size path (ksub=256, 5 iters) is pinned by tests/test_pq.py
PQ_GATE_M = 8
PQ_GATE_KSUB = 16
PQ_GATE_ITERS = 2
PQ_GATE_NQ = 100
PQ_GATE_K = 5


def sql_pq_topk(
    n_queries: int = PQ_GATE_NQ,
    k: int = PQ_GATE_K,
    m: int = PQ_GATE_M,
    ksub: int = PQ_GATE_KSUB,
    n_iters: int = PQ_GATE_ITERS,
) -> str:
    """Full replay of similarity.pq_codebooks + pq_encode + pq_topk:
    L2-normalise, per-subspace Lloyd k-means (init = sample rows strided
    by (code*n)//ksub in vec_id order, assignment = exact squared
    distance with lowest-code ties, update = member mean rounded 6,
    empty codes keep their centroid), final encode against the trained
    books, then ADC scoring (query-subvector x centroid inner products
    summed over subspaces, rounded 9) with self-matches dropped and
    (score desc, target asc) top-k. Assumes the corpus has >= ksub
    vectors (all test scale factors hold 500+)."""
    dsub = DIM // m
    parts = [
        f"dims AS (SELECT CAST(unnest(range(0, {DIM})) AS INT) AS d)",
        """vals AS (
  SELECT e.vec_id, dims.d, list_extract(e.embedding::DOUBLE[], dims.d + 1) AS val
  FROM embeddings e CROSS JOIN dims
)""",
        "vnorm AS (SELECT vec_id, sqrt(SUM(val * val)) AS vn FROM vals GROUP BY 1)",
        f"""nv AS (
  SELECT v.vec_id, v.d // {dsub} AS s, v.d % {dsub} AS j,
         CASE WHEN n.vn = 0 THEN v.val ELSE v.val / n.vn END AS val
  FROM vals v JOIN vnorm n USING (vec_id)
)""",
        "ncnt AS (SELECT COUNT(DISTINCT vec_id) AS n FROM nv)",
        """ord AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS idx
  FROM (SELECT DISTINCT vec_id FROM nv)
)""",
        f"codes AS (SELECT CAST(unnest(range(0, {ksub})) AS BIGINT) AS code)",
        f"init AS (SELECT c.code, (c.code * n.n) // {ksub} AS idx FROM codes c CROSS JOIN ncnt n)",
        """cent0 AS (
  SELECT i.code, v.s, v.j, round(v.val, 6) AS cval
  FROM init i JOIN ord o USING (idx) JOIN nv v ON v.vec_id = o.vec_id
)""",
    ]

    def _assign(i: int) -> list[str]:
        return [
            f"""sc{i} AS (
  SELECT v.vec_id, v.s, c.code, SUM((v.val - c.cval) * (v.val - c.cval)) AS d2
  FROM nv v JOIN cent{i} c ON c.s = v.s AND c.j = v.j
  GROUP BY 1, 2, 3
)""",
            f"""asg{i} AS (
  SELECT vec_id, s, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code) AS rk
    FROM sc{i}
  ) r WHERE rk = 1
)""",
        ]

    for i in range(n_iters):
        parts += _assign(i)
        parts += [
            f"""cent{i + 1} AS (
  SELECT a.code, a.s, v.j, round(AVG(v.val), 6) AS cval
  FROM asg{i} a JOIN nv v ON v.vec_id = a.vec_id AND v.s = a.s
  GROUP BY 1, 2, 3
  UNION ALL
  SELECT c.code, c.s, c.j, c.cval FROM cent{i} c
  WHERE NOT EXISTS (SELECT 1 FROM asg{i} a WHERE a.s = c.s AND a.code = c.code)
)""",
        ]
    parts += _assign(n_iters)
    parts += [
        f"""qtab AS (
  SELECT q.vec_id AS query_id, c.s, c.code, SUM(q.val * c.cval) AS ip
  FROM nv q JOIN cent{n_iters} c ON c.s = q.s AND c.j = q.j
  WHERE q.vec_id < {n_queries}
  GROUP BY 1, 2, 3
)""",
        f"""scored AS (
  SELECT qt.query_id, t.vec_id AS target_id, round(SUM(qt.ip), 9) + 0.0 AS adc_sim
  FROM asg{n_iters} t JOIN qtab qt ON qt.s = t.s AND qt.code = t.code
  GROUP BY 1, 2
)""",
    ]
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT query_id, CAST(rk AS INT) AS rank, target_id, adc_sim
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_sim DESC, target_id) AS rk
  FROM scored WHERE query_id != target_id
) r WHERE rk <= {k}"""
    )


#: pagerank gate fixture/loop parameters, shared with entry.q_pagerank_hosts:
#: hosts h0..h22 emit links, h23..h36 can only receive (dangling mass
#: exercised); 5 quantised power iterations
PAGERANK_GATE_SRC_MOD = 23
PAGERANK_GATE_DST_MOD = 37
PAGERANK_GATE_ITERS = 5
PAGERANK_GATE_QUANT = 9
PAGERANK_GATE_DAMPING = 0.85


def sql_pagerank_hosts(
    n_iters: int = PAGERANK_GATE_ITERS,
    damping: float = PAGERANK_GATE_DAMPING,
    quant: int = PAGERANK_GATE_QUANT,
) -> str:
    """Power-iteration replay of pipeline.graph.pagerank over the
    deterministic documents-derived host graph (src = doc_id %
    SRC_MOD, dst = (13*doc_id+5) % DST_MOD, weight 1..3, self-edges
    dropped): out-strength-normalised contributions, dangling mass
    redistributed uniformly, every rank rounded to ``quant`` decimals
    per update (the trainers' cross-engine discipline — both engines
    restart each iteration from identical state)."""
    smod, dmod = PAGERANK_GATE_SRC_MOD, PAGERANK_GATE_DST_MOD
    parts = [
        f"""e AS (
  SELECT 'h' || CAST(doc_id % {smod} AS VARCHAR) AS src,
         'h' || CAST((doc_id * 13 + 5) % {dmod} AS VARCHAR) AS dst,
         CAST(1 + doc_id % 3 AS DOUBLE) AS w
  FROM documents
  WHERE 'h' || CAST(doc_id % {smod} AS VARCHAR)
        != 'h' || CAST((doc_id * 13 + 5) % {dmod} AS VARCHAR)
)""",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "ncnt AS (SELECT COUNT(*) AS n FROM nodes)",
        "outw AS (SELECT src, SUM(w) AS ow FROM e GROUP BY 1)",
        "ep AS (SELECT e.src, e.dst, e.w / o.ow AS p FROM e JOIN outw o USING (src))",
        "dang AS (SELECT node FROM nodes WHERE node NOT IN (SELECT DISTINCT src FROM e))",
        "r0 AS (SELECT node, 1.0 / n.n AS rank FROM nodes CROSS JOIN ncnt n)",
    ]
    for i in range(n_iters):
        parts += [
            f"""c{i} AS (
  SELECT ep.dst, SUM(ep.p * r.rank) AS contrib
  FROM ep JOIN r{i} r ON r.node = ep.src GROUP BY 1
)""",
            f"""dm{i} AS (
  SELECT COALESCE(SUM(r.rank), 0.0) AS dmass
  FROM r{i} r JOIN dang d ON d.node = r.node
)""",
            f"""r{i + 1} AS (
  SELECT nodes.node,
         round((1.0 - {damping}) / n.n
               + {damping} * (COALESCE(c.contrib, 0.0) + dm.dmass / n.n), {quant}) AS rank
  FROM nodes LEFT JOIN c{i} c ON c.dst = nodes.node
  CROSS JOIN dm{i} dm CROSS JOIN ncnt n
)""",
        ]
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, round(rank, {quant}) + 0.0 AS rank FROM r{n_iters}"
    )


def sql_warc_extract() -> str:
    """Replay of the warc_extract fixture round-trip: the Spark side
    builds one WARC response record per document (HTTP 200 text/plain
    payload carrying documents.text), concatenates them into doc_id%8
    shards, and runs the REAL record parser (sources.warc._parse_mapper
    via parse_warc_shards); this twin states what a correct parse must
    recover — any framing or header bug drops/corrupts records and
    breaks count or hash."""
    return """
SELECT '<urn:uuid:doc-' || CAST(doc_id AS VARCHAR) || '>' AS record_id,
       'http://ex' || CAST(doc_id % 7 AS VARCHAR) || '.com/doc/'
           || CAST(doc_id AS VARCHAR) AS target_uri,
       'response' AS warc_type,
       'application/http;msgtype=response' AS content_type,
       CAST(200 AS INT) AS http_status,
       'text/plain' AS http_content_type,
       COALESCE(text, '') AS text,
       CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT) AS payload_len
FROM documents"""


def sql_cms_sketch() -> str:
    """Replay of pipeline.sketches.cms_build at the default 4x2048
    geometry: per token, depth seeded md5 cells, exact integer counts."""
    from ccm_spark.pipeline.sketches import CMS_DEPTH, CMS_WIDTH

    cells = "\n  UNION ALL\n  ".join(
        f"SELECT CAST({r} AS INT) AS row_idx, "
        + _md5_long(f"'cms{r}:' || tok")
        + f" % {CMS_WIDTH} AS col_idx FROM tok"
        for r in range(CMS_DEPTH)
    )
    return f"""
WITH tok AS (SELECT unnest({TOKENS}) AS tok FROM documents),
cells AS (
  {cells}
)
SELECT row_idx, col_idx, COUNT(*) AS count FROM cells GROUP BY 1, 2"""


#: fixed literal BPE merge table for the gated encoder row (training is
#: the driver-side loop pinned by tests/test_tokenize.py; the gate pins
#: the DISTRIBUTED apply kernel). Ordering invariant: every composite
#: symbol is created by an earlier merge, which is what makes
#: apply-in-rank-order equal to lowest-rank-first greedy — the SQL twin
#: relies on it.
BPE_GATE_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "</w>"), ("t", "h"), ("th", "e</w>"), ("i", "n"), ("in", "g"),
    ("ing", "</w>"), ("a", "n"), ("an", "d"), ("and", "</w>"), ("o", "f"),
    ("of", "</w>"), ("t", "o"), ("to", "</w>"), ("e", "r"), ("er", "</w>"),
    ("o", "n"), ("s", "</w>"), ("e", "s</w>"), ("a", "t"), ("at", "</w>"),
)
BPE_GATE_END = "</w>"
#: unit separator: cannot occur in whitespace-split tokens of the
#: synthetic corpus (it is not in WS_CLASS, and the fixture corpus is
#: printable text)
_BPE_SEP = "\x1f"

# Enforce the ordering invariant the SQL twin's two-pass replace relies
# on: the pattern SEP+a+SEP+b+SEP must never overlap itself. Since
# symbols cannot contain SEP, the ONLY possible nontrivial self-overlap
# is a == b (a run like "a a a a a" then gives [aa, a, aa] via replace
# but [aa, aa, a] via the real greedy kernel — verified in DuckDB), so
# a != b is exactly the sufficient condition. Checked at import so a
# future table edit fails loudly instead of silently breaking the gate.
for _a, _b in BPE_GATE_MERGES:
    if _a == _b:
        raise AssertionError(
            f"BPE_GATE_MERGES contains a self-adjacent merge ({_a!r}, {_b!r}); "
            "the two-pass string-replace oracle (sql_bpe_encode) is only "
            "equivalent to the greedy kernel when no merge pair is "
            "self-overlapping — pick a different gate table"
        )
    if _BPE_SEP in _a or _BPE_SEP in _b:
        raise AssertionError(
            f"BPE_GATE_MERGES symbol contains the unit separator: ({_a!r}, {_b!r})"
        )
del _a, _b


def sql_bpe_encode() -> str:
    """Algorithm-independent replay of tokenize.bpe_encode with the
    fixed BPE_GATE_MERGES table: each word becomes a separator-joined
    symbol string and every merge is applied as TWO string replaces of
    sep+a+sep+b+sep -> sep+ab+sep (two passes merge every chained
    occurrence — pass one takes alternating links, pass two the
    isolated leftovers), which equals the greedy lowest-rank-first
    apply because composite symbols are only ever ranked after their
    parts (the ordering invariant stated on the merge table). The
    Spark side runs the real per-word greedy kernel, so a hash match
    is two independent algorithms agreeing."""
    sep = _BPE_SEP
    expr = f"'{sep}' || regexp_replace(w, '(.)', '\\1{sep}', 'g') || '{BPE_GATE_END}{sep}'"
    for a, b in BPE_GATE_MERGES:
        pat, rep = f"'{sep}{a}{sep}{b}{sep}'", f"'{sep}{a}{b}{sep}'"
        expr = f"replace(replace({expr}, {pat}, {rep}), {pat}, {rep})"
    return f"""
WITH t AS (SELECT doc_id, {TOKENS} AS toks FROM documents),
enc AS (SELECT doc_id, list_transform(toks, w -> {expr}) AS encs FROM t)
SELECT doc_id,
       COALESCE(array_to_string(
           list_transform(encs, s -> replace(trim(s, '{sep}'), '{sep}', ' ')), ' '), '') AS pieces,
       CAST(COALESCE(list_sum(
           list_transform(encs, s -> length(s) - length(replace(s, '{sep}', '')) - 1)), 0) AS BIGINT) AS n_pieces
FROM enc"""


def sql_hll_registers(p: int = 12) -> str:
    """Replay of pipeline.sketches.hll_registers at by=None: register =
    top p bits of the 60-bit md5 token hash, rho = leading zeros of the
    rest + 1 via integer/string bin-length (never float log2), MAX per
    register."""
    rest_bits = 60 - p
    h = _md5_long("'hll:' || tok")
    return f"""
WITH tok AS (SELECT unnest({TOKENS}) AS tok FROM documents),
hashed AS (SELECT {h} AS h FROM tok),
split AS (
  SELECT h // {1 << rest_bits} AS register_idx, h % {1 << rest_bits} AS rest
  FROM hashed
)
SELECT register_idx,
       CAST(MAX(CASE WHEN rest = 0 THEN {rest_bits + 1}
                     ELSE {rest_bits} - length(bin(rest)) + 1 END) AS INT) AS rho_max
FROM split GROUP BY 1"""


#: classifier replay parameters, shared with the tests (and a future
#: gate rotation): deterministic label rule on doc_id, small iteration
#: count to keep the unrolled CTE chain readable
CLS_DIM = 256
CLS_ITERS = 3
CLS_LR = 2.0


def sql_quality_classifier_scores(
    dim: int = CLS_DIM, n_iters: int = CLS_ITERS, lr: float = CLS_LR
) -> str:
    """Full replay of pipeline.classify.train_quality_classifier +
    score_quality with the deterministic ``doc_id % 3 == 0`` label rule:
    hashed count-ratio features, unrolled full-batch GD (gradients
    rounded 6 after the global sum, weights/bias rounded 6 per update —
    both engines restart every iteration from identical state), then
    the final margin per document rounded 6. Token-less documents score
    the bias."""
    h = _md5_long("'qf:' || tok")
    parts = [
        f"tok AS (SELECT doc_id, unnest({TOKENS}) AS tok FROM documents)",
        f"""cnts AS (
  SELECT doc_id, {h} % {dim} AS feat_idx, COUNT(*) AS cnt
  FROM tok GROUP BY 1, 2
)""",
        "tot AS (SELECT doc_id, SUM(cnt) AS t FROM cnts GROUP BY 1)",
        """x AS (
  SELECT c.doc_id, c.feat_idx, CAST(c.cnt AS DOUBLE) / t.t AS x
  FROM cnts c JOIN tot t USING (doc_id)
)""",
        """lab AS (
  SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 1.0 ELSE 0.0 END AS y
  FROM documents
)""",
        "n AS (SELECT COUNT(*) AS n FROM tot)",
        "w0 AS (SELECT CAST(NULL AS BIGINT) AS feat_idx, CAST(NULL AS DOUBLE) AS w WHERE FALSE)",
        "b0 AS (SELECT 0.0 AS b)",
    ]
    for i in range(n_iters):
        parts += [
            f"""m{i} AS (
  SELECT x.doc_id, SUM(x.x * COALESCE(w.w, 0.0)) AS m
  FROM x LEFT JOIN w{i} w USING (feat_idx) GROUP BY 1
)""",
            f"""p{i} AS (
  SELECT m.doc_id, 1.0 / (1.0 + exp(-(m.m + b.b))) AS p
  FROM m{i} m CROSS JOIN b{i} b
)""",
            f"""g{i} AS (
  SELECT x.feat_idx, round(SUM(x.x * (p.p - l.y)), 6) AS g
  FROM x JOIN p{i} p USING (doc_id) JOIN lab l USING (doc_id)
  GROUP BY 1
)""",
            f"""w{i + 1} AS (
  SELECT g.feat_idx, round(COALESCE(w.w, 0.0) - {lr} * g.g / n.n, 6) AS w
  FROM g{i} g LEFT JOIN w{i} w USING (feat_idx) CROSS JOIN n
)""",
            f"""b{i + 1} AS (
  SELECT round(b.b - {lr} * round(SUM(p.p - l.y), 6) / n.n, 6) AS b
  FROM p{i} p JOIN lab l USING (doc_id) CROSS JOIN b{i} b CROSS JOIN n
  GROUP BY b.b, n.n
)""",
        ]
    # final scores in EXACT fixed-point, ROUNDING INCLUDED (mirrors
    # score_quality): the margin is the exact rational
    # (S + b_int*t) / (t*1e6) with S an order-free integer sum of
    # (w*1e6)*cnt, and the 9-decimal value is integer HALF_UP of
    # numer/den at the 1e9 scale — (2*|numer| + den) // (2*den) —
    # then ONE float division by 1e9. A float margin + round() diverges
    # here: DuckDB's round multiplies by 1e9 first (a margin one ulp
    # below a .5 boundary crosses it in the product) while the Arrow
    # kernel's Decimal path rounds the shortest repr — observed
    # splitting one sf0.01 document before this formulation.
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT d.doc_id,
       CAST(CASE WHEN numer >= 0
                 THEN (2 * numer + den) // (2 * den)
                 ELSE -((-2 * numer + den) // (2 * den)) END AS DOUBLE)
         / 1000000000.0 + 0.0 AS score
FROM (
  SELECT d0.doc_id,
         (COALESCE(CAST(mfin.s AS BIGINT), 0)
          + CAST(round(b.b * 1000000.0) AS BIGINT)
            * COALESCE(CAST(mfin.t AS BIGINT), 1)) * 1000 AS numer,
         COALESCE(CAST(mfin.t AS BIGINT), 1) AS den
  FROM documents d0
  LEFT JOIN (
    SELECT c.doc_id,
           SUM(COALESCE(CAST(round(w.w * 1000000.0) AS BIGINT), 0) * c.cnt) AS s,
           MAX(t.t) AS t
    FROM cnts c
    LEFT JOIN w{n_iters} w USING (feat_idx)
    JOIN tot t USING (doc_id)
    GROUP BY 1
  ) mfin ON mfin.doc_id = d0.doc_id
  CROSS JOIN b{n_iters} b
) d"""
    )


def sql_dsir_log_weights(
    n: int = 2,
    dim: int = 10_000,
    alpha: float = 0.5,
    target_mod: int = 10,
) -> str:
    """Replay of pipeline.dsir.dsir_log_weights with the test fixture
    split (target = documents with doc_id % target_mod == 0, raw = the
    rest): hashed word-n-gram counts with multiplicity, add-alpha
    smoothed log-ratio per feature over the full outer feature space,
    per-doc dot product rounded 6, featureless docs weigh 0.0."""
    h = _md5_long("'dsir:' || gram")
    return f"""
WITH t0 AS (SELECT doc_id, {TOKENS} AS toks FROM documents),
grams AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= {n}
                     THEN list_transform(range(1, len(toks) - {n} + 2),
                          i -> array_to_string(list_slice(toks, i, i + {n} - 1), ' '))
                     ELSE [] END) AS gram
  FROM t0
),
feats AS (
  SELECT doc_id, {h} % {dim} AS feat_idx, COUNT(*) AS cnt
  FROM grams GROUP BY 1, 2
),
tc AS (SELECT feat_idx, SUM(cnt) AS c FROM feats WHERE doc_id % {target_mod} = 0 GROUP BY 1),
rc AS (SELECT feat_idx, SUM(cnt) AS c FROM feats WHERE doc_id % {target_mod} != 0 GROUP BY 1),
joined AS (
  SELECT COALESCE(tc.feat_idx, rc.feat_idx) AS feat_idx,
         COALESCE(tc.c, 0) AS tc, COALESCE(rc.c, 0) AS rc
  FROM tc FULL JOIN rc ON rc.feat_idx = tc.feat_idx
),
tot AS (SELECT SUM(tc) AS tt, SUM(rc) AS rt FROM joined),
ratios AS (
  SELECT j.feat_idx,
         ln((j.tc + {alpha}) / (t.tt + {alpha} * {dim}))
         - ln((j.rc + {alpha}) / (t.rt + {alpha} * {dim})) AS log_ratio
  FROM joined j CROSS JOIN tot t
),
scored AS (
  SELECT f.doc_id, round(SUM(f.cnt * r.log_ratio), 6) AS log_w
  FROM feats f JOIN ratios r USING (feat_idx)
  WHERE f.doc_id % {target_mod} != 0
  GROUP BY 1
)
SELECT d.doc_id, COALESCE(s.log_w, 0.0) + 0.0 AS log_w
FROM documents d LEFT JOIN scored s USING (doc_id)
WHERE d.doc_id % {target_mod} != 0"""


def sql_robots_rules_fixture(host_mod: int = 7) -> str:
    """Declarative twin of the robots-rules fixture parse (the
    warc_extract pattern — the oracle states what a correct parse
    recovers, it does not re-implement the parser): per document one
    rule line chosen by doc_id % 5 (plain disallow / allow / wildcard
    disallow / '$'-anchored disallow / comment), assembled per host
    'h<doc_id % host_mod>.com' under a 'User-agent: *' header. Expected
    rows replicate the conservative wildcard degradation: the wildcard
    pattern truncates at '*', the trailing '$' strips, and prec keeps
    the ORIGINAL pattern length."""
    return f"""
WITH k AS (SELECT doc_id, doc_id % 5 AS k, 'h' || CAST(doc_id % {host_mod} AS VARCHAR) || '.com' AS host
           FROM documents)
SELECT host,
       CASE WHEN k = 1 THEN 'allow' ELSE 'disallow' END AS rule,
       CASE k
         WHEN 0 THEN '/d' || CAST(doc_id AS VARCHAR) || '/'
         WHEN 1 THEN '/d' || CAST(doc_id AS VARCHAR) || '/ok'
         WHEN 2 THEN '/w' || CAST(doc_id AS VARCHAR) || '/'
         ELSE '/e' || CAST(doc_id AS VARCHAR)
       END AS prefix,
       CAST(CASE k
         WHEN 0 THEN length('/d' || CAST(doc_id AS VARCHAR) || '/')
         WHEN 1 THEN length('/d' || CAST(doc_id AS VARCHAR) || '/ok')
         WHEN 2 THEN length('/w' || CAST(doc_id AS VARCHAR) || '/*.php')
         ELSE length('/e' || CAST(doc_id AS VARCHAR) || '$')
       END AS INT) AS prec
FROM k WHERE k != 4"""


def wordpiece_gate_vocab() -> dict:
    """The fixed literal vocabulary the wordpiece-apply twin shares with
    the Spark side (the BPE_GATE_MERGES pattern — vocabulary DERIVATION
    has its own gated surface via text_vocab_topk; this pins the greedy
    APPLY kernel): lowercase letters as word-initial and '##'
    continuation pieces plus a handful of common multi-char pieces.
    Digits are deliberately absent so numeric tokens exercise the
    whole-word-UNK path. Ids are assigned by sorted piece string from 1
    (0 = unk) — the build_wordpiece_vocab rule."""
    pieces = set("abcdefghijklmnopqrstuvwxyz")
    pieces |= {"##" + c for c in "abcdefghijklmnopqrstuvwxyz"}
    pieces |= {
        "the", "and", "of", "to", "in", "is", "on", "for", "data",
        "##ing", "##ed", "##s", "##er", "##tion", "##al",
    }
    return {p: i + 1 for i, p in enumerate(sorted(pieces))}


def sql_wordpiece_encode(unk_id: int = 0, max_piece: int = 32) -> str:
    """Replay of tokenize.tokenize_docs' greedy longest-match-first
    wordpiece kernel with the fixed wordpiece_gate_vocab: a recursive
    CTE advances a cursor per DISTINCT word, a LEFT LATERAL against the
    vocab picks the longest matching piece ('##'-prefixed lookups after
    the first), and a position with no match collapses the whole word
    to the unk id — exactly py_wordpiece's contract. Per-doc output
    re-joins encodings to the positional token explode."""
    vocab = wordpiece_gate_vocab()
    assert all(len(p) <= max_piece for p in vocab)
    values = ", ".join(f"({p!r}, {i})" for p, i in sorted(vocab.items()))
    return f"""
WITH RECURSIVE
vocab(piece, id) AS (SELECT * FROM (VALUES {values}) v(piece, id)),
t AS (SELECT doc_id, {TOKENS} AS toks FROM documents),
tw AS (
  SELECT doc_id, unnest(range(1, len(toks) + 1)) AS pos, unnest(toks) AS w
  FROM t
),
words AS (SELECT DISTINCT w FROM tw),
rec(w, pos, first, ids, failed) AS (
  SELECT w, 0, TRUE, CAST('' AS VARCHAR), FALSE FROM words
  UNION ALL
  SELECT r.w,
         CASE WHEN best.id IS NULL THEN length(r.w) ELSE r.pos + best.mlen END,
         FALSE,
         CASE WHEN best.id IS NULL THEN CAST({unk_id} AS VARCHAR)
              WHEN r.ids = '' THEN CAST(best.id AS VARCHAR)
              ELSE r.ids || ',' || CAST(best.id AS VARCHAR) END,
         best.id IS NULL
  FROM rec r
  LEFT JOIN LATERAL (
    SELECT v.id,
           CASE WHEN r.first THEN length(v.piece) ELSE length(v.piece) - 2 END AS mlen
    FROM vocab v
    WHERE CASE WHEN r.first
               THEN v.piece NOT LIKE '##%'
                    AND length(v.piece) <= {max_piece}
                    AND v.piece = substr(r.w, r.pos + 1, length(v.piece))
               ELSE v.piece LIKE '##%'
                    AND length(v.piece) - 2 <= {max_piece}
                    AND length(v.piece) > 2
                    AND substr(v.piece, 3) = substr(r.w, r.pos + 1, length(v.piece) - 2)
          END
    ORDER BY length(v.piece) DESC LIMIT 1
  ) best ON TRUE
  WHERE r.pos < length(r.w) AND NOT r.failed
),
enc AS (
  SELECT w, ids, failed FROM rec WHERE pos >= length(w)
)
SELECT d.doc_id,
       COALESCE(string_agg(e.ids, ',' ORDER BY tw.pos), '') AS ids,
       CAST(COALESCE(SUM(len(string_split(e.ids, ','))), 0) AS BIGINT) AS n_pieces
FROM documents d
LEFT JOIN tw ON tw.doc_id = d.doc_id
LEFT JOIN enc e ON e.w = tw.w
GROUP BY d.doc_id"""


def sql_streaming_hourly_stats(n_batches: int = 3, delay_hours: int = 72) -> str:
    """Batch-equivalent replay of streaming.windows.windowed_stats_replay:
    the micro-batch sequence (events split by event_id % n_batches,
    processed in shard order) re-expressed as plain SQL using the
    calibrated watermark rules —

    - the LATE-ROW FILTER of batch k uses the watermark from batches
      0..k-2 (one batch behind eviction: running MAX over batch maxima
      with a 2-PRECEDING window), dropping rows whose hour-window END
      <= that watermark;
    - the final sink holds every surviving row's window with end
      <= max(ALL event time) - delay (the trailing no-data batch's
      eviction pass; the global max includes late-dropped rows because
      the source updates the watermark before the filter drops them).

    avg is re-derived from the 6-rounded sum on both engines (the
    sql_events_hourly_stats discipline)."""
    h = 3_600_000_000
    delay = delay_hours * h
    return f"""
WITH e AS (
  SELECT event_id % {n_batches} AS b, epoch_us(ts) AS ts_us, event_type, value
  FROM events
),
bmax AS (SELECT b, MAX(ts_us) AS mx FROM e GROUP BY 1),
fwm AS (
  SELECT b,
         MAX(mx) OVER (ORDER BY b
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
           - {delay} AS filter_wm
  FROM bmax
),
gmax AS (SELECT MAX(ts_us) - {delay} AS final_wm FROM e),
kept AS (
  SELECT e.ts_us, e.event_type, e.value
  FROM e JOIN fwm USING (b)
  WHERE fwm.filter_wm IS NULL OR (e.ts_us // {h} + 1) * {h} > fwm.filter_wm
)
SELECT (ts_us // {h}) * {h} AS window_start_us,
       event_type,
       COUNT(*) AS n_events,
       round(SUM(value), 6) + 0.0 AS sum_value,
       round(round(SUM(value), 6) / COUNT(*), 6) + 0.0 AS avg_value
FROM kept, gmax
WHERE (ts_us // {h} + 1) * {h} <= gmax.final_wm
GROUP BY 1, 2"""


def sql_lm_perplexity_kn() -> str:
    """DuckDB twin of pipeline.lm train_kn_bigram_lm + perplexity on the
    same documents table: the add-alpha twin's bounded vocab/bigram
    tables, then the KN tables derived as exact integer aggregates of
    the CAPPED bigram relation (c_out / N1+ forward / N1+ continuation /
    type count) and interpolated-KN scoring with the add-one smoothed
    continuation distribution — every expression shaped exactly like
    lm._score_kn (same division order) so the doubles match
    bit-for-bit. Token-less docs emit NULL scores."""
    d = LM_KN_DISCOUNT
    return f"""
WITH toks AS (SELECT doc_id, {TOKENS} AS toks FROM documents),
nz AS (SELECT doc_id, toks FROM toks WHERE len(toks) > 0),
uni AS (
  SELECT term, COUNT(*) AS n
  FROM (SELECT unnest(toks) AS term FROM nz) GROUP BY 1
),
vocab AS (SELECT term, n FROM uni ORDER BY n DESC, term ASC LIMIT {LM_VOCAB_SIZE}),
bg AS (
  SELECT doc_id,
         CASE WHEN z[1] IN (SELECT term FROM vocab) THEN z[1] ELSE '<unk>' END AS w1,
         CASE WHEN z[2] IN (SELECT term FROM vocab) THEN z[2] ELSE '<unk>' END AS w2
  FROM (
    SELECT doc_id, unnest(list_zip(toks[:len(toks)-1], toks[2:])) AS z
    FROM nz WHERE len(toks) > 1
  ) s
),
bi AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY 1, 2),
bigrams AS (
  SELECT w1, w2, n FROM bi ORDER BY n DESC, w1 ASC, w2 ASC LIMIT {LM_MAX_BIGRAMS}
),
cout AS (SELECT w1, SUM(n) AS c_out, COUNT(*) AS n1p_fwd FROM bigrams GROUP BY 1),
nbwd AS (SELECT w2, COUNT(*) AS n1p_bwd FROM bigrams GROUP BY 1),
scal AS (
  SELECT CAST((SELECT COUNT(*) FROM bigrams)
              + (SELECT COUNT(*) FROM vocab) + 1 AS DOUBLE) AS denom
),
firsts AS (
  SELECT doc_id, len(toks) AS n_scored,
         CASE WHEN toks[1] IN (SELECT term FROM vocab) THEN toks[1] ELSE '<unk>' END AS w
  FROM nz
),
first_term AS (
  SELECT f.doc_id,
         -log2((COALESCE(nb.n1p_bwd, 0) + 1) / s.denom) AS bits
  FROM firsts f LEFT JOIN nbwd nb ON nb.w2 = f.w CROSS JOIN scal s
),
pair_terms AS (
  SELECT g.doc_id,
         SUM(-log2(
           CASE WHEN co.c_out IS NOT NULL THEN
             GREATEST(COALESCE(b.n, 0) - {d}, 0.0) / CAST(co.c_out AS BIGINT)
             + {d} * CAST(co.n1p_fwd AS BIGINT) / CAST(co.c_out AS BIGINT)
               * ((COALESCE(nb.n1p_bwd, 0) + 1) / s.denom)
           ELSE (COALESCE(nb.n1p_bwd, 0) + 1) / s.denom END)) AS bits
  FROM bg g
  LEFT JOIN bigrams b ON g.w1 = b.w1 AND g.w2 = b.w2
  LEFT JOIN cout co ON co.w1 = g.w1
  LEFT JOIN nbwd nb ON nb.w2 = g.w2
  CROSS JOIN scal s
  GROUP BY 1
),
scored AS (
  SELECT f.doc_id, f.n_scored,
         (u.bits + COALESCE(p.bits, 0.0)) / f.n_scored AS h
  FROM firsts f JOIN first_term u USING (doc_id)
  LEFT JOIN pair_terms p USING (doc_id)
)
SELECT doc_id, CAST(n_scored AS BIGINT) AS n_scored,
       round(h, 6) + 0.0 AS cross_entropy,
       round(2.0 ** h, 6) + 0.0 AS perplexity
FROM scored
UNION ALL
SELECT doc_id, 0, NULL, NULL FROM toks WHERE len(toks) = 0"""


def sql_redact_pii_extended(inject: bool = True) -> str:
    """Replay of text.redact_pii_extended over the documents table with
    the test fixture's deterministic PII injection (the corpus has
    none): per doc an email, a payment-card candidate that is
    Luhn-VALID for even doc_ids and Luhn-INVALID for odd ones (the
    invalid one must fall through to <NUM>), an IPv4, a phone, and a
    reference number. Every stage replays: email replace, candidate
    extraction, in-SQL Luhn checksum filter, longest-first
    deterministic replace fold, IP/phone/number replaces."""
    from ccm_spark.pipeline.text import CARD_RE, EMAIL_RE, IP_RE, NUMBER_RE, PHONE_RE

    dig = "regexp_replace(x, '[^0-9]', '', 'g')"
    d_i = f"CAST(substr(reverse({dig}), i, 1) AS INT)"
    luhn = (
        f"list_sum(list_transform(range(1, length({dig}) + 1), "
        f"i -> CASE WHEN i % 2 = 0 THEN 2 * {d_i} - "
        f"CASE WHEN 2 * {d_i} > 9 THEN 9 ELSE 0 END ELSE {d_i} END)) % 10 = 0 "
        f"AND length({dig}) BETWEEN 13 AND 19"
    )
    text_expr = "text"
    if inject:
        text_expr = (
            "text || ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com"
            " card ' || CASE WHEN doc_id % 2 = 0 THEN '4111 1111 1111 1111'"
            " ELSE '4111 1111 1111 1112' END || ' ip 10.' ||"
            " CAST(doc_id % 200 AS VARCHAR) || '.0.' ||"
            " CAST(doc_id % 250 AS VARCHAR) || ' tel +1-555-0' ||"
            " CAST(100 + doc_id % 900 AS VARCHAR) || '-' ||"
            " CAST(1000 + doc_id % 9000 AS VARCHAR) || ' ref ' ||"
            " CAST(doc_id * 1000003 + 123456 AS VARCHAR)"
        )
    return f"""
WITH base AS (SELECT doc_id, {text_expr} AS text FROM documents),
s1 AS (
  SELECT doc_id, text,
         regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS red1
  FROM base
),
s2 AS (
  SELECT doc_id, text, red1,
         list_filter(list_distinct(regexp_extract_all(red1, '{CARD_RE}')),
                     x -> {luhn}) AS verified
  FROM s1
),
s3 AS (
  SELECT doc_id, text, red1, verified,
         list_reduce(
           list_prepend(red1,
             list_reverse(list_sort(
               list_transform(verified,
                 x -> lpad(CAST(length(x) AS VARCHAR), 2, '0') || x)))),
           (a, k) -> replace(a, substr(k, 3), '<CARD>')) AS red2
  FROM s2
),
s4 AS (
  SELECT doc_id, text, verified, red2,
         regexp_replace(red2, '{IP_RE}', '<IP>', 'g') AS red3
  FROM s3
),
s5 AS (
  SELECT doc_id, text, verified, red2, red3,
         regexp_replace(red3, '{PHONE_RE}', '<PHONE>', 'g') AS red4
  FROM s4
),
s6 AS (
  SELECT *, regexp_replace(red4, '{NUMBER_RE}', '<NUM>', 'g') AS red5 FROM s5
)
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(length(verified) AS BIGINT) AS n_cards,
       CAST(length(regexp_extract_all(red2, '{IP_RE}')) AS BIGINT) AS n_ips,
       CAST(length(regexp_extract_all(red3, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(length(regexp_extract_all(red4, '{NUMBER_RE}')) AS BIGINT) AS n_numbers,
       CAST(length(red5) AS BIGINT) AS red_len,
       {_md5_long('red5')} AS red_fp
FROM s6"""


def sql_tokenizer_fertility() -> str:
    """Replay of tokenize.fertility_report (corpus-level, by=None) with
    the fixed wordpiece gate vocabulary: the whole sql_wordpiece_encode
    chain nested as a CTE (the ann_ivf_recall pattern), word counts and
    UTF-8 byte counts re-derived from documents, OOV words counted as
    unk-id pieces (a word collapses to the single id 0 exactly when it
    is OOV), ratios rounded 6 from exact integer sums."""
    return f"""
WITH wp AS ({sql_wordpiece_encode()}),
doc AS (
  SELECT doc_id, len({TOKENS}) AS n_words,
         octet_length(encode(text)) AS n_bytes
  FROM documents
),
oov AS (
  SELECT doc_id,
         CASE WHEN ids = '' THEN 0
              ELSE len(list_filter(string_split(ids, ','), x -> x = '0'))
         END AS n_oov
  FROM wp
),
agg AS (
  SELECT COUNT(*) AS n_docs,
         SUM(d.n_words) AS n_words,
         SUM(w.n_pieces) AS n_pieces,
         SUM(d.n_bytes) AS n_bytes,
         SUM(o.n_oov) AS n_oov_words
  FROM doc d JOIN wp w USING (doc_id) JOIN oov o USING (doc_id)
)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_pieces AS BIGINT) AS n_pieces,
       CASE WHEN n_words > 0
            THEN round(CAST(n_pieces AS BIGINT) / CAST(n_words AS BIGINT), 6) + 0.0
            ELSE 0.0 END AS fertility,
       CASE WHEN n_pieces > 0
            THEN round(CAST(n_bytes AS BIGINT) / CAST(n_pieces AS BIGINT), 6) + 0.0
            ELSE 0.0 END AS bytes_per_piece,
       CASE WHEN n_words > 0
            THEN round(CAST(n_oov_words AS BIGINT) / CAST(n_words AS BIGINT), 6) + 0.0
            ELSE 0.0 END AS oov_word_frac
FROM agg"""


def sql_quantize_embeddings(bits: int = 8) -> str:
    """Replay of similarity.quantize_embeddings: per-vector symmetric
    scale (max|v| / (2^(bits-1)-1)), integer codes via round at 0
    decimals (no multiply-first hazard — both engines round the raw
    double), output scale rounded 9. Codes are flattened to a CSV
    string (r11 gate-schema fix): the driver canonicalizer cannot
    hash list columns, so both engines emit scalar columns only."""
    qmax = float(2 ** (bits - 1) - 1)
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
s AS (
  SELECT vec_id, vec,
         list_max(list_transform(vec, x -> abs(x))) / {qmax} AS sc
  FROM v
)
SELECT vec_id,
       round(sc, 9) + 0.0 AS scale,
       array_to_string(
         CASE WHEN sc = 0 THEN list_transform(vec, x -> 0)
              ELSE list_transform(vec, x -> CAST(round(x / sc) AS INT))
         END, ',') AS codes_csv
FROM s"""


def sql_sessionize_updates(n_batches: int = 3, gap_minutes: int = 30) -> str:
    """Replay of streaming.stateful.sessionize_updates_replay — the FULL
    update-mode emission multiset of the stateful sessionizer over the
    deterministic time-tercile micro-batch split:

    - CLOSED rows: session s of user u emits its final stats in the
      batch where the first event of u's session s+1 arrives (batches
      are time-ordered, so every event of s has already arrived);
    - SNAPSHOT rows: every (user, batch-with-input) pair emits the open
      session (the user's max session index among events in batches
      <= k) with stats restricted to events in batches <= k.

    The union keeps duplicates (a snapshot that later re-emits as an
    identical closed row) — the driver's multiset hash must see both."""
    gap_us = gap_minutes * 60_000_000
    return f"""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events),
rng AS (SELECT MIN(ts_us) AS lo, MAX(ts_us) AS hi FROM e),
eb AS (
  SELECT e.*, LEAST({n_batches - 1}, (ts_us - r.lo) * {n_batches} // (r.hi - r.lo + 1)) AS b
  FROM e, rng r
),
marked AS (
  SELECT *, lag(ts_us) OVER w AS prev_ts
  FROM eb
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT *, SUM(CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > {gap_us}
                     THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sidx
  FROM marked
),
fin AS (
  SELECT user_id, sidx, COUNT(*) AS n, MIN(ts_us) AS st, MAX(ts_us) AS en,
         SUM(value) AS sv, MIN(b) AS b_first
  FROM sess GROUP BY 1, 2
),
closed AS (
  SELECT f.user_id, f.sidx, f.n, f.st, f.en, f.sv
  FROM fin f
  JOIN fin nx ON nx.user_id = f.user_id AND nx.sidx = f.sidx + 1
),
ub AS (SELECT DISTINCT user_id, b FROM sess),
cum AS (
  SELECT s.user_id, ub.b AS k, s.sidx, s.ts_us, s.value
  FROM sess s JOIN ub ON ub.user_id = s.user_id AND s.b <= ub.b
),
open_s AS (SELECT user_id, k, MAX(sidx) AS sidx FROM cum GROUP BY 1, 2),
snap AS (
  SELECT c.user_id, c.sidx, COUNT(*) AS n, MIN(c.ts_us) AS st,
         MAX(c.ts_us) AS en, SUM(c.value) AS sv
  FROM cum c
  JOIN open_s o ON o.user_id = c.user_id AND o.k = c.k AND o.sidx = c.sidx
  GROUP BY c.user_id, c.k, c.sidx
),
emitted AS (
  SELECT * FROM closed
  UNION ALL
  SELECT * FROM snap
)
SELECT user_id, CAST(sidx AS BIGINT) AS session_idx, CAST(n AS BIGINT) AS n_events,
       st AS start_us, en AS end_us, round(sv, 6) + 0.0 AS sum_value
FROM emitted"""


# ------------------------------------------------- k-NN graph (r11 candidate)

#: sql_knn_graph gate geometry: small k / one descent round / two seed
#: tables keep the DuckDB replay tractable while exercising every stage
#: (multi-table seeding, bucket valve, per-table cap, canonicalised
#: scoring, mirror, top-k, rho-sampled reverse adjacency, owner-join
#: two-hop, rescore)
KNN_GRAPH_K = 5
KNN_GRAPH_ROUNDS = 1
KNN_GRAPH_TABLES = 2
KNN_GRAPH_SEED = 99


def sql_knn_graph(
    k: int = KNN_GRAPH_K,
    n_rounds: int = KNN_GRAPH_ROUNDS,
    n_tables: int = KNN_GRAPH_TABLES,
    seed: int = KNN_GRAPH_SEED,
    max_bucket_size: int = 1000,
    rho: float = 1.5,
    source: str = "embeddings",
) -> str:
    """DuckDB twin of pipeline.ann_graph.knn_graph_descent at the gate
    geometry: SRP multi-table seeding (the _srp_ctes replay, one table
    per seed), the max_bucket_size valve BEFORE the bucket self-join,
    the per-table lowest-dst seed cap (2k), canonicalised cosine
    scoring (round 9, zero-norm -> 0.0) mirrored to both directions
    with the (cos desc, dst asc) top-k, then per round: forward edges ∪
    an md5-rank rho·k-sample of reverse edges (engine-portable
    md5_long('src:dst'), the repo hashing rule), owner-join two-hop
    candidates, rescore. Every expression shaped like the Spark plan so
    doubles match bit-for-bit after the shared round-9."""
    import math

    cap = 2 * k
    rev_cap = max(1, math.ceil(rho * k))
    cos = (
        "round(CASE WHEN sqrt(list_dot_product({a}, {a})) = 0 "
        "OR sqrt(list_dot_product({b}, {b})) = 0 THEN 0.0 "
        "ELSE list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
        "* sqrt(list_dot_product({b}, {b}))) END, 9) + 0.0"
    )
    md5rank = _md5_long("CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)")
    ctes = [
        _srp_ctes(SRP_PLANES, seed + t, sfx=f"_t{t}", source=source).strip()
        for t in range(n_tables)
    ]
    ctes.append(
        f"v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM {source})"
    )
    seed_parts = []
    for t in range(n_tables):
        ctes.append(
            f"""kept_t{t} AS (
  SELECT b.vec_id, b.bucket FROM buckets_t{t} b
  JOIN (SELECT bucket FROM buckets_t{t} GROUP BY bucket
        HAVING COUNT(*) <= {max_bucket_size}) ok USING (bucket)
)"""
        )
        ctes.append(
            f"""seed_t{t} AS (
  SELECT src, dst FROM (
    SELECT a.vec_id AS src, b.vec_id AS dst,
           row_number() OVER (PARTITION BY a.vec_id ORDER BY b.vec_id ASC) AS rk
    FROM kept_t{t} a JOIN kept_t{t} b
      ON a.bucket = b.bucket AND a.vec_id != b.vec_id
  ) s WHERE rk <= {cap}
)"""
        )
        seed_parts.append(f"SELECT src, dst FROM seed_t{t}")
    ctes.append(
        "seed_pairs AS (SELECT DISTINCT src, dst FROM ("
        + " UNION ALL ".join(seed_parts)
        + ") u)"
    )

    def score_topk(pairs_cte: str, out: str) -> list[str]:
        return [
            f"""cp_{out} AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM {pairs_cte}
)""",
            f"""sc_{out} AS (
  SELECT c.a, c.b, {cos.format(a='va.vec', b='vb.vec')} AS cos_sim
  FROM cp_{out} c JOIN v va ON va.vec_id = c.a JOIN v vb ON vb.vec_id = c.b
)""",
            f"""m_{out} AS (
  SELECT a AS src, b AS dst, cos_sim FROM sc_{out}
  UNION ALL
  SELECT b AS src, a AS dst, cos_sim FROM sc_{out}
)""",
            f"""{out} AS (
  SELECT src, dst, cos_sim, rk FROM (
    SELECT src, dst, cos_sim,
           row_number() OVER (PARTITION BY src
                              ORDER BY cos_sim DESC, dst ASC) AS rk
    FROM m_{out}
  ) r WHERE rk <= {k}
)""",
        ]

    ctes.extend(score_topk("seed_pairs", "g0"))
    prev = "g0"
    for rnd in range(1, n_rounds + 1):
        ctes.append(
            f"""adj_{rnd} AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM {prev}
    UNION ALL
    SELECT src, dst FROM (
      SELECT src, dst,
             row_number() OVER (PARTITION BY src
                                ORDER BY {md5rank} ASC, dst ASC) AS rrk
      FROM (SELECT dst AS src, src AS dst FROM {prev}) rev
    ) s WHERE rrk <= {rev_cap}
  ) u
)"""
        )
        ctes.append(
            f"""cand_{rnd} AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM adj_{rnd}
    UNION ALL
    SELECT l.dst AS src, r.dst AS dst
    FROM adj_{rnd} l JOIN adj_{rnd} r ON l.src = r.src
    WHERE l.dst != r.dst
  ) u
)"""
        )
        ctes.extend(score_topk(f"cand_{rnd}", f"g{rnd}"))
        prev = f"g{rnd}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT src, dst, cos_sim, CAST(rk AS INT) AS rank FROM {prev}"
    )


#: sql_knn_graph_insert gate split: every 5th vector (20%) arrives as
#: the ingestion increment against a graph served over the other 80%
KNN_INSERT_MOD = 5


def sql_knn_graph_insert(
    k: int = KNN_GRAPH_K,
    n_tables: int = KNN_GRAPH_TABLES,
    seed: int = KNN_GRAPH_SEED,
    max_bucket_size: int = 1000,
    mod: int = KNN_INSERT_MOD,
) -> str:
    """DuckDB twin of pipeline.ann_graph.knn_graph_insert at the gate
    geometry (r12 candidate): the SERVED graph is ``sql_knn_graph``
    over the pre-insert 80% (vec_id % mod != 0) nested verbatim via the
    ``source`` hook; the increment (vec_id % mod = 0) then replays the
    insert chain — full-corpus multi-table SRP bucketization with the
    valve, increment-side pair generation with the per-table
    lowest-dst cap (2k), one hop through the served graph's ranked
    edges, the shared canonical scoring (round-9 cosine, mirror), and
    the three-way merge: NEW nodes take their top-k, TOUCHED existing
    nodes re-rank incumbent ∪ mirror edges, untouched rows pass
    through byte-identical (original rank preserved)."""
    cap = 2 * k
    base = f"(SELECT * FROM embeddings WHERE vec_id % {mod} != 0)"
    cos = (
        "round(CASE WHEN sqrt(list_dot_product({a}, {a})) = 0 "
        "OR sqrt(list_dot_product({b}, {b})) = 0 THEN 0.0 "
        "ELSE list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
        "* sqrt(list_dot_product({b}, {b}))) END, 9) + 0.0"
    )
    ctes = [f"base_graph AS MATERIALIZED ({sql_knn_graph(source=base)})"]
    # full-corpus bucketization, increment-side pairs (sfx _i to keep
    # the inner base-graph CTE names out of scope conflicts)
    seed_parts = []
    for t in range(n_tables):
        ctes.append(_srp_ctes(SRP_PLANES, seed + t, sfx=f"_i{t}").strip())
        ctes.append(
            f"""kept_i{t} AS (
  SELECT b.vec_id, b.bucket FROM buckets_i{t} b
  JOIN (SELECT bucket FROM buckets_i{t} GROUP BY bucket
        HAVING COUNT(*) <= {max_bucket_size}) ok USING (bucket)
)"""
        )
        ctes.append(
            f"""seed_i{t} AS (
  SELECT src, dst FROM (
    SELECT a.vec_id AS src, b.vec_id AS dst,
           row_number() OVER (PARTITION BY a.vec_id ORDER BY b.vec_id ASC) AS rk
    FROM kept_i{t} a JOIN kept_i{t} b
      ON a.bucket = b.bucket AND a.vec_id != b.vec_id
    WHERE a.vec_id % {mod} = 0
  ) s WHERE rk <= {cap}
)"""
        )
        seed_parts.append(f"SELECT src, dst FROM seed_i{t}")
    ctes.append(
        "pairs0 AS (SELECT DISTINCT src, dst FROM ("
        + " UNION ALL ".join(seed_parts)
        + ") u)"
    )
    ctes.append(
        """hop AS (
  SELECT DISTINCT p.src, g.dst
  FROM pairs0 p JOIN base_graph g ON g.src = p.dst
  WHERE p.src != g.dst
)"""
    )
    ctes.append(
        "vf AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings)"
    )
    ctes.append(
        """cp AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM (
    SELECT src, dst FROM pairs0 UNION ALL SELECT src, dst FROM hop
  ) u
)"""
    )
    ctes.append(
        f"""sc0 AS (
  SELECT c.a, c.b, {cos.format(a='va.vec', b='vb.vec')} AS cos_sim
  FROM cp c JOIN vf va ON va.vec_id = c.a JOIN vf vb ON vb.vec_id = c.b
)"""
    )
    ctes.append(
        """sc AS (
  SELECT a AS src, b AS dst, cos_sim FROM sc0
  UNION ALL
  SELECT b AS src, a AS dst, cos_sim FROM sc0
)"""
    )
    ctes.append(
        f"""new_rows AS (
  SELECT src, dst, cos_sim, rk FROM (
    SELECT src, dst, cos_sim,
           row_number() OVER (PARTITION BY src
                              ORDER BY cos_sim DESC, dst ASC) AS rk
    FROM sc WHERE src % {mod} = 0
  ) r WHERE rk <= {k}
)"""
    )
    ctes.append(f"touched AS (SELECT * FROM sc WHERE src % {mod} != 0)")
    ctes.append("touched_src AS (SELECT DISTINCT src FROM touched)")
    ctes.append(
        f"""updated AS (
  SELECT src, dst, cos_sim, rk FROM (
    SELECT src, dst, cos_sim,
           row_number() OVER (PARTITION BY src
                              ORDER BY cos_sim DESC, dst ASC) AS rk
    FROM (
      SELECT g.src, g.dst, g.cos_sim
      FROM base_graph g JOIN touched_src USING (src)
      UNION ALL
      SELECT src, dst, cos_sim FROM touched
    ) m
  ) r WHERE rk <= {k}
)"""
    )
    ctes.append(
        """untouched AS (
  SELECT g.src, g.dst, g.cos_sim, g.rank AS rk FROM base_graph g
  WHERE g.src NOT IN (SELECT src FROM touched_src)
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT src, dst, cos_sim, CAST(rk AS INT) AS rank FROM untouched
UNION ALL
SELECT src, dst, cos_sim, CAST(rk AS INT) AS rank FROM updated
UNION ALL
SELECT src, dst, cos_sim, CAST(rk AS INT) AS rank FROM new_rows"""
    )


# --------------------------------------------- bottom-k sketch (r11 candidate)

BK_GATE_PROBS = (0.25, 0.5, 0.75, 0.95)


def sql_bottomk_quantiles(k: int = 256, probs: tuple = BK_GATE_PROBS) -> str:
    """DuckDB twin of sketches.bottomk_build + bottomk_quantiles over
    doc_len = length(text): the sketch IS the k rows with the smallest
    md5_long('bk:' || doc_id) hashes (the threshold pre-filter in the
    Spark build is a pure optimisation — same k survivors), and each
    quantile is the exact interpolated percentile of that uniform
    sample (Spark `percentile` == DuckDB `quantile_cont`), rounded 6 at
    the boundary."""
    h = _md5_long("'bk:' || CAST(doc_id AS VARCHAR)")
    # quantile_cont takes only CONSTANT probabilities in DuckDB, so one
    # SELECT per prob, unioned
    per_prob = "\nUNION ALL\n".join(
        f"SELECT CAST({float(p)!r} AS DOUBLE) AS prob, "
        f"round(quantile_cont(value, {float(p)!r}), 6) + 0.0 AS value_est FROM sk"
        for p in probs
    )
    return f"""
WITH rows_bk AS (
  SELECT {h} AS h, CAST(length(text) AS DOUBLE) AS value
  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
),
sk AS (SELECT h, value FROM rows_bk ORDER BY h ASC, value ASC LIMIT {k})
{per_prob}"""


# --------------------------------- eval contamination audit (r11 candidate)

def sql_eval_contamination(
    width: int | None = None, mod: int = 31, threshold: float = 0.7
) -> str:
    """DuckDB twin of dedup.eval_contamination_report on the
    decontaminate gate split (doc_id % mod == 0 plays the eval set):
    per eval doc, the fraction of its DISTINCT token w-grams present
    anywhere in the training side — verdict on the exact integer
    ratio, frac rounded 6 at the boundary, shingle-less docs 0.0 /
    false."""
    from ccm_spark.pipeline.dedup import SHINGLE_WIDTH

    w = SHINGLE_WIDTH if width is None else width
    grams = " || ' ' || ".join(f"list_extract(toks, i + {j})" for j in range(w))
    return f"""
WITH tr AS (SELECT doc_id, {TOKENS} AS toks FROM documents WHERE doc_id % {mod} <> 0),
ev AS (SELECT doc_id, {TOKENS} AS toks FROM documents WHERE doc_id % {mod} = 0),
trpos AS (SELECT doc_id, toks, unnest(range(1, len(toks) - {w - 2})) AS i FROM tr),
trsh AS (
  SELECT DISTINCT ({_md5_long(f"({grams})")} % {P31}) AS shingle_hash
  FROM trpos
),
evpos AS (SELECT doc_id, toks, unnest(range(1, len(toks) - {w - 2})) AS i FROM ev),
evsh AS (
  SELECT DISTINCT doc_id, ({_md5_long(f"({grams})")} % {P31}) AS shingle_hash
  FROM evpos
),
per AS (SELECT doc_id, COUNT(*) AS n_shingles FROM evsh GROUP BY 1),
hits AS (
  SELECT e.doc_id, COUNT(*) AS n_hit
  FROM evsh e JOIN trsh t USING (shingle_hash) GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       CASE WHEN COALESCE(p.n_shingles, 0) = 0 THEN 0.0
            ELSE round(COALESCE(h.n_hit, 0) / p.n_shingles, 6) + 0.0
       END AS overlap_frac,
       CASE WHEN COALESCE(p.n_shingles, 0) = 0 THEN FALSE
            ELSE COALESCE(h.n_hit, 0) / p.n_shingles >= {threshold}
       END AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {mod} = 0) d
LEFT JOIN per p ON p.doc_id = d.doc_id
LEFT JOIN hits h ON h.doc_id = d.doc_id"""


# ------------------------------------------- SemDeDup twin (r11 candidate)

#: gate threshold for sql_semantic_dedup: the synthetic corpus is
#: isotropic (no true 0.95-near-dups), so the gate runs the greedy at a
#: low threshold where real drops occur and the cover recursion is
#: genuinely exercised; the planted-dup behavior at production
#: thresholds is pinned separately in tests/test_clustering.py
SEMDEDUP_GATE_THRESHOLD = 0.2


def sql_semantic_dedup(
    k: int = 8, n_iters: int = 2, threshold: float = SEMDEDUP_GATE_THRESHOLD
) -> str:
    """DuckDB twin of clustering.semantic_dedup (n_probe=1): the ENTIRE
    chain — the distributed Lloyd trainer + final assignment
    (sql_kmeans_clusters nested verbatim, the ann_ivf_recall pattern),
    L2-normalised vector lists, then the within-cluster greedy
    epsilon-cover as a RECURSIVE CTE carrying the kept-vector list as
    row state: members scan in vec_id order and a member is dropped
    iff round(dot(kept, v), 9) >= threshold for some already-kept
    earlier member — exactly the Arrow kernel's rule. The
    max_cluster_size valve never fires at gate scale (documented; the
    valve itself is pinned in tests/test_clustering.py)."""
    t = float(threshold)
    return f"""
WITH RECURSIVE
assign AS MATERIALIZED ({sql_kmeans_clusters(k, n_iters)}),
nvl AS MATERIALIZED (
  SELECT vec_id,
         CASE WHEN sqrt(list_dot_product(vec, vec)) = 0 THEN vec
              ELSE list_transform(vec, x -> x / sqrt(list_dot_product(vec, vec)))
         END AS nvec
  FROM (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings) b
),
mem AS MATERIALIZED (
  SELECT a.cluster, n.vec_id, n.nvec,
         CAST(row_number() OVER (PARTITION BY a.cluster ORDER BY n.vec_id) AS INT) AS idx
  FROM assign a JOIN nvl n USING (vec_id)
),
greedy AS (
  SELECT cluster, 0 AS idx,
         CAST([] AS BIGINT[]) AS keep_ids,
         CAST([] AS DOUBLE[][]) AS kept_vecs
  FROM (SELECT DISTINCT cluster FROM mem) c
  UNION ALL
  SELECT cluster, idx,
         CASE WHEN cov THEN keep_ids ELSE list_append(keep_ids, vec_id) END,
         CASE WHEN cov THEN kept_vecs ELSE list_append(kept_vecs, nvec) END
  FROM (
    SELECT g.cluster, m.idx, g.keep_ids, g.kept_vecs, m.vec_id, m.nvec,
           len(list_filter(g.kept_vecs,
                           kv -> round(list_dot_product(kv, m.nvec), 9) >= {t})) > 0 AS cov
    FROM greedy g JOIN mem m ON m.cluster = g.cluster AND m.idx = g.idx + 1
  ) s
),
final AS (
  SELECT cluster, keep_ids FROM (
    SELECT cluster, keep_ids,
           row_number() OVER (PARTITION BY cluster ORDER BY idx DESC) AS rk
    FROM greedy
  ) r WHERE rk = 1
)
SELECT m.vec_id, CAST(m.cluster AS BIGINT) AS cluster,
       list_contains(f.keep_ids, m.vec_id) AS keep
FROM mem m JOIN final f USING (cluster)"""


# ------------------------------- graph diversity sample (r11 candidate)

#: gate threshold for sql_graph_diversity: the isotropic corpus has no
#: 0.95-near-dups, so the gate thins at a low threshold where the
#: thresholded graph has real edges and the independent-set rule does
#: real work; production-threshold clique behavior is pinned in
#: tests/test_ann_graph.py
DIVERSITY_GATE_THRESHOLD = 0.2


def sql_graph_diversity(threshold: float = DIVERSITY_GATE_THRESHOLD) -> str:
    """DuckDB twin of ann_graph.graph_diversity_sample over the gate
    k-NN graph (sql_knn_graph nested verbatim): one round of Luby's
    algorithm under the md5_long('ds:' || id) priority — keep v iff no
    cos >= threshold neighbor has a smaller (priority, id); the
    lexicographic struct compare replays as explicit OR terms."""
    t = float(threshold)
    pr = _md5_long("'ds:' || CAST({c} AS VARCHAR)")
    return f"""
WITH g AS MATERIALIZED ({sql_knn_graph()}),
e AS (SELECT src, dst FROM g WHERE cos_sim >= {t}),
sym AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e
  ) u
),
best AS (
  SELECT src, p AS np, i AS ni FROM (
    SELECT s.src, {pr.format(c='s.dst')} AS p, s.dst AS i,
           row_number() OVER (PARTITION BY s.src
                              ORDER BY {pr.format(c='s.dst')} ASC, s.dst ASC) AS rk
    FROM sym s
  ) r WHERE rk = 1
),
nodes AS (SELECT DISTINCT src FROM g)
SELECT n.src AS vec_id,
       (b.ni IS NULL
        OR {pr.format(c='n.src')} < b.np
        OR ({pr.format(c='n.src')} = b.np AND n.src < b.ni)) AS keep
FROM nodes n LEFT JOIN best b ON b.src = n.src"""


#: sql_knn_graph_search gate geometry: every 50th-ish vector (vec_id %
#: 50 = 7) queries the served gate graph — 10 queries at sf0.001, 40 at
#: sf0.01 — through a beam-16, 3-hop walk from the 8 lowest node ids
SEARCH_GATE_PRED = "vec_id % 50 = 7"
SEARCH_K = 5
SEARCH_BEAM = 16
SEARCH_HOPS = 3
SEARCH_SEEDS = 8


def sql_knn_graph_search(
    k: int = SEARCH_K,
    beam: int = SEARCH_BEAM,
    n_hops: int = SEARCH_HOPS,
    n_seeds: int = SEARCH_SEEDS,
    query_pred: str = SEARCH_GATE_PRED,
) -> str:
    """DuckDB twin of ann_graph.knn_graph_search over the gate k-NN
    graph (sql_knn_graph nested verbatim, the sql_graph_diversity /
    sql_knn_graph_insert precedent): the batched best-first beam walk
    unrolled hop-by-hop as CTEs. Seeds are the n_seeds lowest distinct
    edge sources; visited_0 scores every query against every seed
    (round-9 cosine, zero-norm -> 0.0, the shared kernel shape); each
    hop takes the per-query top-``beam`` of visited by (cos DESC, node
    ASC), expands through the graph's ranked edges, drops already-
    visited (query, node) pairs via NOT EXISTS (the Spark side's
    left_anti — a visited pair is NEVER re-scored), scores the fresh
    candidates, and unions them in. Final: per-query top-k of visited
    as (query_id, rank, target_id, cos_sim)."""
    cos = (
        "round(CASE WHEN sqrt(list_dot_product({a}, {a})) = 0 "
        "OR sqrt(list_dot_product({b}, {b})) = 0 THEN 0.0 "
        "ELSE list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
        "* sqrt(list_dot_product({b}, {b}))) END, 9) + 0.0"
    )
    score = cos.format(a="q.qvec", b="nv.vec")
    ctes = [
        f"graph AS MATERIALIZED ({sql_knn_graph()})",
        "edges_s AS (SELECT src, dst FROM graph)",
        "vs AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings)",
        f"""qv AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
  FROM embeddings WHERE {query_pred}
)""",
        f"""seeds_s AS (
  SELECT DISTINCT src AS node FROM edges_s ORDER BY node LIMIT {n_seeds}
)""",
        f"""visited_0 AS (
  SELECT q.query_id, s.node, {score} AS cos_sim
  FROM qv q CROSS JOIN seeds_s s JOIN vs nv ON nv.vec_id = s.node
)""",
    ]
    prev = "visited_0"
    for h in range(1, n_hops + 1):
        ctes.append(
            f"""frontier_{h} AS (
  SELECT query_id, node FROM (
    SELECT query_id, node,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, node ASC) AS rk
    FROM {prev}
  ) r WHERE rk <= {beam}
)"""
        )
        ctes.append(
            f"""cand_{h} AS (
  SELECT DISTINCT f.query_id, e.dst AS node
  FROM frontier_{h} f JOIN edges_s e ON e.src = f.node
  WHERE NOT EXISTS (SELECT 1 FROM {prev} v
                    WHERE v.query_id = f.query_id AND v.node = e.dst)
)"""
        )
        ctes.append(
            f"""visited_{h} AS (
  SELECT query_id, node, cos_sim FROM {prev}
  UNION ALL
  SELECT c.query_id, c.node, {score} AS cos_sim
  FROM cand_{h} c JOIN vs nv ON nv.vec_id = c.node
  JOIN qv q ON q.query_id = c.query_id
)"""
        )
        prev = f"visited_{h}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT query_id, CAST(rk AS INT) AS rank, node AS target_id, cos_sim FROM (
  SELECT query_id, node, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, node ASC) AS rk
  FROM {prev}
) r WHERE rk <= {k}"""
    )


# ------------------------------------------------- blocklist / density ops

def _phrase_values() -> tuple[str, str]:
    """VALUES literals for the gate blocklist: (phrases, needs) — the
    exact relations ``pipeline.filters.phrase_blocklist_matches`` builds
    driver-side, shared through BLOCKLIST_GATE_PHRASES so the Spark
    fixture and this twin cannot drift."""
    from ccm_spark.pipeline.filters import BLOCKLIST_GATE_PHRASES, normalize_phrases

    plist = normalize_phrases(BLOCKLIST_GATE_PHRASES)

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    phrases = ", ".join(
        f"({q(' '.join(t))}, {q(t[0])}, {len(t)})" for t in plist
    )
    needs = ", ".join(
        f"({q(' '.join(t))}, {off}, {q(tok)})"
        for t in plist
        for off, tok in enumerate(t)
    )
    return phrases, needs


def sql_phrase_blocklist() -> str:
    """DuckDB twin of filters.phrase_blocklist_matches on the gate
    fixture: identical relational shape — positional token relation,
    anchor join, required-cell join, HAVING COUNT(*) = plen verify,
    per-doc rollup with sorted '|'-joined distinct phrases."""
    phrases, needs = _phrase_values()
    return f"""
WITH t AS (SELECT doc_id, {TOKENS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tok, unnest(range(0, len(toks))) AS pos FROM t),
phrases(phrase, anchor, plen) AS (VALUES {phrases}),
needs(phrase, off, need_tok) AS (VALUES {needs}),
cand AS (
  SELECT k.doc_id, k.pos AS match_pos, p.phrase, p.plen
  FROM tok k JOIN phrases p ON k.tok = p.anchor
),
cells AS (
  SELECT c.doc_id, c.phrase, c.match_pos, c.plen,
         c.match_pos + n.off AS pos, n.need_tok
  FROM cand c JOIN needs n USING (phrase)
),
verified AS (
  SELECT c.doc_id, c.phrase, c.match_pos
  FROM cells c
  JOIN tok k ON k.doc_id = c.doc_id AND k.pos = c.pos AND k.tok = c.need_tok
  GROUP BY c.doc_id, c.phrase, c.match_pos, c.plen
  HAVING COUNT(*) = c.plen
),
per_doc AS (
  SELECT doc_id,
         COUNT(*) AS n_matches,
         COUNT(DISTINCT phrase) AS n_phrases,
         string_agg(DISTINCT phrase, '|' ORDER BY phrase) AS phrases_hit
  FROM verified GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_matches, 0) AS BIGINT) AS n_matches,
       CAST(COALESCE(p.n_phrases, 0) AS BIGINT) AS n_phrases,
       COALESCE(p.phrases_hit, '') AS phrases_hit,
       COALESCE(p.n_matches, 0) > 0 AS blocked
FROM documents d LEFT JOIN per_doc p USING (doc_id)"""


def sql_char_entropy() -> str:
    """DuckDB twin of filters.char_entropy_signals: per-codepoint
    explosion via zipped range+substr (O(len^2) is fine at oracle
    scale; the Spark side uses the linear split('') explode), same
    one-pass entropy identity H = log2(N) - sum(c*log2 c)/N, round6 at
    the boundary."""
    return """
WITH t AS (SELECT doc_id, text FROM documents),
i AS (SELECT doc_id, text, unnest(range(0, length(text))) AS i FROM t),
c AS (SELECT doc_id, substr(text, CAST(i + 1 AS INT), 1) AS ch FROM i),
counts AS (SELECT doc_id, ch, COUNT(*) AS c FROM c GROUP BY 1, 2),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_chars,
         COUNT(*) AS n_distinct_chars,
         log2(CAST(SUM(c) AS DOUBLE))
           - SUM(c * log2(CAST(c AS DOUBLE))) / CAST(SUM(c) AS DOUBLE) AS h
  FROM counts GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_chars, 0) AS BIGINT) AS n_chars,
       CAST(COALESCE(p.n_distinct_chars, 0) AS BIGINT) AS n_distinct_chars,
       round(COALESCE(p.h, 0.0), 6) + 0.0 AS entropy_bits
FROM documents d LEFT JOIN per_doc p USING (doc_id)"""


def sql_collocations_pmi(min_count: int = 5, k: int = 50) -> str:
    """DuckDB twin of text.collocations_pmi: identical PMI expression
    tree (log2 of the same nested double divisions, so both engines feed
    libm the same bits), identical (pmi DESC, x, y) rank order."""
    return f"""
WITH t AS (SELECT {TOKENS} AS toks FROM documents),
p AS (SELECT toks, unnest(range(1, len(toks))) AS i FROM t WHERE len(toks) >= 2),
big AS (
  SELECT toks[CAST(i AS INT)] AS x, toks[CAST(i + 1 AS INT)] AS y,
         COUNT(*) AS c_xy
  FROM p GROUP BY 1, 2
),
uni AS (
  SELECT u.t AS t, COUNT(*) AS c
  FROM (SELECT unnest(toks) AS t FROM t) u GROUP BY 1
),
tot AS (
  SELECT (SELECT CAST(SUM(c) AS DOUBLE) FROM uni) AS n_tok,
         (SELECT CAST(SUM(c_xy) AS DOUBLE) FROM big) AS n_big
),
scored AS (
  SELECT b.x, b.y, b.c_xy,
         log2((b.c_xy / tot.n_big)
              / ((ux.c / tot.n_tok) * (uy.c / tot.n_tok))) AS pmi_raw
  FROM big b
  JOIN uni ux ON ux.t = b.x
  JOIN uni uy ON uy.t = b.y
  CROSS JOIN tot
  WHERE b.c_xy >= {min_count}
),
r AS (
  SELECT *, row_number() OVER (ORDER BY pmi_raw DESC, x ASC, y ASC) AS rank
  FROM scored
)
SELECT CAST(rank AS INT) AS rank,
       x || ' ' || y AS bigram,
       CAST(c_xy AS BIGINT) AS c_xy,
       round(pmi_raw, 6) + 0.0 AS pmi
FROM r WHERE rank <= {k}"""


def sql_tfidf_terms(k: int = 5) -> str:
    """DuckDB twin of text.tfidf_terms: smoothed sklearn idf, same
    double expression tree, same (score DESC, term ASC) per-doc rank."""
    return f"""
WITH t AS (SELECT doc_id, {TOKENS} AS toks FROM documents),
occ AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM occ GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT f.doc_id, f.term, f.tf,
         f.tf * (ln((1.0 + nd.n_docs) / (1.0 + d.df)) + 1.0) AS s
  FROM tf f JOIN dfreq d USING (term) CROSS JOIN nd
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY s DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS INT) AS rank, term,
       CAST(tf AS BIGINT) AS tf, round(s, 6) + 0.0 AS score
FROM r WHERE rank <= {k}"""


def sql_corpus_divergence(alpha: float = 0.5) -> str:
    """DuckDB twin of dsir.corpus_divergence over the parity-fixture
    split (doc_id even = corpus A, odd = corpus B): same smoothed
    union-vocabulary probabilities, same log2 expression tree, round6
    at the boundary."""
    return f"""
WITH a AS (SELECT {TOKENS} AS toks FROM documents WHERE doc_id % 2 = 0),
b AS (SELECT {TOKENS} AS toks FROM documents WHERE doc_id % 2 = 1),
ca AS (SELECT u.t AS token, COUNT(*) AS ca
       FROM (SELECT unnest(toks) AS t FROM a) u GROUP BY 1),
cb AS (SELECT u.t AS token, COUNT(*) AS cb
       FROM (SELECT unnest(toks) AS t FROM b) u GROUP BY 1),
j AS (
  SELECT CAST(COALESCE(ca.ca, 0) AS DOUBLE) AS ca,
         CAST(COALESCE(cb.cb, 0) AS DOUBLE) AS cb
  FROM ca FULL OUTER JOIN cb USING (token)
),
tot AS (
  SELECT SUM(ca) AS na, SUM(cb) AS nb, CAST(COUNT(*) AS DOUBLE) AS v,
         CAST(SUM(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_a,
         CAST(SUM(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_b,
         CAST(SUM(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS vocab_shared,
         COUNT(*) AS vocab_union
  FROM j
),
terms AS (
  SELECT ((j.ca + {alpha}) / (tot.na + {alpha} * tot.v)) AS pa,
         ((j.cb + {alpha}) / (tot.nb + {alpha} * tot.v)) AS pb
  FROM j CROSS JOIN tot
),
sums AS (
  SELECT SUM(pa * log2(pa / pb)) AS kl_ab,
         SUM(pb * log2(pb / pa)) AS kl_ba,
         SUM(0.5 * pa * log2(pa / ((pa + pb) / 2.0))
             + 0.5 * pb * log2(pb / ((pa + pb) / 2.0))) AS js
  FROM terms
)
SELECT CAST(tot.na AS BIGINT) AS n_tokens_a,
       CAST(tot.nb AS BIGINT) AS n_tokens_b,
       tot.vocab_a, tot.vocab_b, tot.vocab_shared,
       CAST(tot.vocab_union AS BIGINT) AS vocab_union,
       round(sums.kl_ab, 6) + 0.0 AS kl_ab_bits,
       round(sums.kl_ba, 6) + 0.0 AS kl_ba_bits,
       round(sums.js, 6) + 0.0 AS js_bits
FROM sums CROSS JOIN tot"""


def sql_corpus_diff() -> str:
    """DuckDB twin of dedup.corpus_diff (the NULL-safe original: NULL
    text hashes NULL, two NULLs compare 'unchanged' via IS NOT DISTINCT
    FROM, and both hashes are emitted) over the parity fixture: old =
    doc_id % 7 != 0, new = doc_id % 5 != 0 with doc_id % 11 == 0 texts
    mutated — exercises all four statuses."""
    return f"""
WITH o AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
n AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 5 <> 0
),
oh AS (SELECT doc_id, {_md5_long('text')} AS old_hash FROM o),
nh AS (SELECT doc_id, {_md5_long('text')} AS new_hash FROM n)
SELECT COALESCE(oh.doc_id, nh.doc_id) AS doc_id,
       CASE WHEN oh.doc_id IS NULL THEN 'added'
            WHEN nh.doc_id IS NULL THEN 'removed'
            WHEN old_hash IS NOT DISTINCT FROM new_hash THEN 'unchanged'
            ELSE 'changed' END AS status,
       old_hash, new_hash
FROM oh FULL OUTER JOIN nh ON oh.doc_id = nh.doc_id"""


def sql_shipping_priority(
    segment: str = "BUILDING", cutoff: str = "1998-06-30", k: int = 10
) -> str:
    """DuckDB twin of relational.shipping_priority: same 3-way join +
    revenue rollup, same round6-then-rank discipline (ties by
    orderkey)."""
    return f"""
WITH c AS (SELECT c_custkey FROM customer WHERE c_mktsegment = '{segment}'),
o AS (
  SELECT o_orderkey, o_custkey, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderdate < TIMESTAMP '{cutoff} 00:00:00'
),
l AS (
  SELECT l_orderkey, l_extendedprice * (1 - l_discount) AS rev
  FROM lineitem WHERE l_shipdate > TIMESTAMP '{cutoff} 00:00:00'
),
agg AS (
  SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
         SUM(l.rev) AS revenue
  FROM l JOIN o ON l.l_orderkey = o.o_orderkey
         JOIN c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, 3
),
r AS (
  SELECT *, row_number() OVER (
      ORDER BY round(revenue, 6) DESC, o_orderkey ASC) AS rank
  FROM agg
)
SELECT CAST(rank AS INT) AS rank, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority, round(revenue, 6) + 0.0 AS revenue
FROM r WHERE rank <= {k}"""


def sql_hourly_anomalies(
    window_hours: int = 24, min_hours: int = 6, z_threshold: float = 3.0
) -> str:
    """DuckDB twin of events_ops.hourly_anomalies: same rows-based
    trailing window (current hour excluded), same warm-up and
    zero-variance guards, round6 at every double boundary. Mean/std
    re-derived from the SAME exact integer window sums (count, Σn,
    Σn²) through the SAME double expression tree as the Spark side —
    built-in AVG/STDDEV_POP accumulate in engine-specific order
    (Welford vs naive) and the last-bit drift survives round6 at
    window_hours=24."""
    z = (
        f"CASE WHEN nb >= {min_hours} AND s > 0 "
        f"THEN (n_events - m) / s ELSE 0.0 END"
    )
    return f"""
WITH hourly AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_idx,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
sums AS (
  SELECT event_type, hour_idx, n_events,
         COUNT(*) OVER w AS nb,
         SUM(n_events) OVER w AS s1,
         SUM(n_events * n_events) OVER w AS s2
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_idx
               ROWS BETWEEN {window_hours} PRECEDING AND 1 PRECEDING)
),
base AS (
  SELECT event_type, hour_idx, n_events, nb,
         s1 / CAST(nb AS DOUBLE) AS m,
         sqrt(greatest(
           s2 / CAST(nb AS DOUBLE)
             - (s1 / CAST(nb AS DOUBLE)) * (s1 / CAST(nb AS DOUBLE)),
           0.0)) AS s
  FROM sums
)
SELECT event_type, hour_idx, CAST(n_events AS BIGINT) AS n_events,
       round(COALESCE(m, 0.0), 6) + 0.0 AS baseline_mean,
       round(COALESCE(s, 0.0), 6) + 0.0 AS baseline_std,
       round({z}, 6) + 0.0 AS zscore,
       (nb >= {min_hours} AND s > 0
        AND abs({z}) >= {z_threshold}) AS anomaly
FROM base"""


def sql_hourly_anomalies_watermarked(
    window_hours: int = 24,
    min_hours: int = 6,
    late_hours: int = 2,
) -> str:
    """DuckDB twin of streaming.stateful.hourly_anomalies_watermarked_replay
    (the append-mode watermark-buffer gate candidate): by
    append-exactly-once semantics the emission multiset is
    SPLIT-INVARIANT — each (event_type, hour) below the key's FINAL
    per-key watermark ``(max_ts − late_us) DIV hour`` emits exactly
    once, scored against its final trailing baseline — so the oracle
    is the batch anomalies relation (``sql_hourly_anomalies`` nested
    verbatim) restricted by the watermark cut, independent of the
    replay's micro-batch schedule and its injected bounded disorder."""
    late_us = int(late_hours) * 3_600_000_000
    return f"""
WITH anoms AS MATERIALIZED ({sql_hourly_anomalies(window_hours, min_hours)}),
wm AS (
  SELECT event_type,
         (max(epoch_us(ts)) - {late_us}) // 3600000000 AS closed_before
  FROM events GROUP BY 1
)
SELECT a.event_type, a.hour_idx, a.n_events, a.baseline_mean,
       a.baseline_std, a.zscore, a.anomaly
FROM anoms a JOIN wm USING (event_type)
WHERE a.hour_idx < wm.closed_before"""


def sql_detect_gaps(min_gap_us: int = 3_600_000_000) -> str:
    """DuckDB twin of events_ops.detect_gaps over the events table:
    same (ts, event_id) lag ordering, same inclusive >= threshold —
    exact integer arithmetic end to end."""
    return f"""
WITH s AS (
  SELECT event_type AS key, epoch_us(ts) AS ts_us, event_id,
         LAG(epoch_us(ts)) OVER (
           PARTITION BY event_type ORDER BY epoch_us(ts), event_id
         ) AS prev
  FROM events
)
SELECT key, prev AS gap_start_us, ts_us AS gap_end_us,
       ts_us - prev AS gap_us
FROM s WHERE ts_us - prev >= {int(min_gap_us)}"""


def sql_detect_gaps_watermarked(
    min_gap_us: int = 14_400_000_000,
    late_us: int = 7_200_000_000,
    n_batches: int = 3,
) -> str:
    """DuckDB twin of streaming.stateful.detect_gaps_watermarked_replay
    (the r15 staged gap-monitor gate candidate): for the deterministic
    time-tercile split, the realized watermarks are
    ``w_j = (floor(max_us(terciles <= j) / 1000) - delay_ms) * 1000``
    (Spark floors event times to ms before subtracting the delay).
    CLOSED rows are split-invariant — the batch detect_gaps relation
    (consecutive pairs, delta >= min_gap) with the later endpoint
    strictly below the FINAL watermark (append-exactly-once: a gap
    emits when its end finalizes). OPEN markers are the distinct
    (key, L) pairs where some realized watermark w certifies silence:
    L = max event time of the key strictly below w (every other event
    of the key is then >= w by construction, so L is exactly the
    operator's last-finalized cursor at that point) and
    w - L >= min_gap — the flagged_start dedup in the operator is the
    DISTINCT here."""
    g = int(min_gap_us)
    delay_ms = int(late_us) // 1000
    n = int(n_batches)
    return f"""
WITH bounds AS (
  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
),
t AS (
  SELECT event_type AS key, epoch_us(ts) AS us,
         least({n - 1}, (epoch_us(ts) - lo) * {n} // (hi - lo + 1)) AS terc
  FROM events, bounds
),
wms AS (
  SELECT j, (max(CASE WHEN terc <= j THEN us END) // 1000 - {delay_ms})
            * 1000 AS wm_us
  FROM t, (SELECT unnest(range({n})) AS j)
  GROUP BY j
),
final_wm AS (SELECT max(wm_us) AS wm_us FROM wms),
lagged AS (
  SELECT key, us,
         LAG(us) OVER (PARTITION BY key ORDER BY us) AS prev
  FROM t
),
closed AS (
  SELECT key, prev AS gap_start_us, us AS gap_end_us,
         us - prev AS gap_us, false AS open
  FROM lagged, final_wm
  WHERE us - prev >= {g} AND us < final_wm.wm_us
),
marks AS (
  SELECT DISTINCT key, L AS gap_start_us,
         CAST(NULL AS BIGINT) AS gap_end_us,
         CAST(NULL AS BIGINT) AS gap_us, true AS open
  FROM (
    SELECT w.wm_us, s.key, max(s.us) AS L
    FROM wms w JOIN t s ON s.us < w.wm_us
    GROUP BY w.wm_us, s.key
  )
  WHERE wm_us - L >= {g}
)
SELECT * FROM closed UNION ALL SELECT * FROM marks"""


def sql_local_supplier_volume(
    region: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> str:
    """DuckDB twin of relational.local_supplier_volume: same snowflake
    join with the customer-nation == supplier-nation condition applied
    as a join predicate, revenue round6 at the boundary."""
    return f"""
WITH nations AS (
  SELECT n.n_nationkey, n.n_name
  FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = '{region}'
),
cust AS (
  SELECT c.c_custkey, na.n_nationkey AS c_nat
  FROM customer c JOIN nations na ON c.c_nationkey = na.n_nationkey
),
supp AS (
  SELECT s.s_suppkey, na.n_nationkey AS s_nat, na.n_name
  FROM supplier s JOIN nations na ON s.s_nationkey = na.n_nationkey
),
o AS (
  SELECT o_orderkey, o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '{date_from} 00:00:00'
    AND o_orderdate < TIMESTAMP '{date_to} 00:00:00'
),
l AS (
  SELECT l_orderkey, l_suppkey,
         l_extendedprice * (1 - l_discount) AS rev
  FROM lineitem
)
SELECT supp.n_name AS nation,
       round(SUM(l.rev), 6) + 0.0 AS revenue
FROM l
JOIN o ON l.l_orderkey = o.o_orderkey
JOIN cust ON o.o_custkey = cust.c_custkey
JOIN supp ON l.l_suppkey = supp.s_suppkey AND cust.c_nat = supp.s_nat
GROUP BY 1"""


def sql_top_fraction(frac: float = 0.25) -> str:
    """DuckDB twin of mixing.top_fraction over the quality_score gate
    arithmetic (the still-gated text_quality chain nested as the score
    source): same round6-then-rank order, same ceil(frac * n) cutoff."""
    return f"""
WITH t AS (SELECT doc_id, {TOKENS} AS toks FROM documents),
base AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n_tokens,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_unique,
         CAST(len(list_filter(toks, x -> regexp_full_match(x, '[a-z]+')))
              AS DOUBLE) AS n_alpha
  FROM t
),
scored AS (
  SELECT doc_id,
         least(1.0, n_tokens / 100.0)
           * (0.5 + 0.5 * (CASE WHEN n_tokens = 0 THEN 0.0
                                ELSE n_unique / n_tokens END))
           * (CASE WHEN n_tokens = 0 THEN 0.0
                   ELSE n_alpha / n_tokens END) AS quality
  FROM base
),
r AS (
  SELECT doc_id, quality,
         row_number() OVER (ORDER BY round(quality, 6) + 0.0 DESC,
                            doc_id ASC) AS rank,
         COUNT(*) OVER () AS n
  FROM scored
)
SELECT doc_id, round(quality, 6) + 0.0 AS quality, CAST(rank AS INT) AS rank
FROM r WHERE rank <= GREATEST(1, CAST(ceil({frac} * n) AS BIGINT))"""


def sql_packing_efficiency(seq_lens: tuple = (128, 256, 512)) -> str:
    """DuckDB twin of mixing.packing_efficiency: same token counts
    (shared splitter), same ceil arithmetic, round6 waste fraction."""
    ls = ", ".join(f"({int(x)})" for x in sorted(set(int(x) for x in seq_lens)))
    return f"""
WITH t AS (SELECT CAST(len({TOKENS}) AS BIGINT) AS n_tokens FROM documents),
ls(seq_len) AS (VALUES {ls}),
per AS (
  SELECT ls.seq_len, t.n_tokens,
         CAST(ceil(CAST(t.n_tokens AS DOUBLE) / ls.seq_len) AS BIGINT) AS n_seq
  FROM t CROSS JOIN ls
)
SELECT CAST(seq_len AS INT) AS seq_len,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_seq) AS BIGINT) AS n_sequences,
       CAST(SUM(n_seq * seq_len) - SUM(n_tokens) AS BIGINT) AS padded_tokens,
       round((SUM(n_seq * seq_len) - SUM(n_tokens))
             / CAST(SUM(n_seq * seq_len) AS DOUBLE), 6) + 0.0 AS waste_frac
FROM per GROUP BY seq_len"""


def sql_chunk_documents(max_tokens: int = 128, stride: int = 96) -> str:
    """DuckDB twin of chunking.chunk_documents: same chunk-count identity
    (ceil((n − max)/stride) via integer //, the repo DIV convention),
    same 1-based inclusive token slice, same space re-join."""
    return f"""
WITH t AS (SELECT doc_id, {TOKENS} AS toks FROM documents),
n AS (
  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_t
  FROM t WHERE len(toks) > 0
),
kk AS (
  SELECT doc_id, toks, n_t,
         unnest(range(0, 1 + CASE WHEN n_t <= {max_tokens} THEN 0
                ELSE (n_t - {max_tokens} + {stride} - 1) // {stride} END)) AS k
  FROM n
)
SELECT doc_id,
       CAST(k AS INT) AS chunk_idx,
       CAST(k * {stride} AS INT) AS start_tok,
       CAST(LEAST({max_tokens}, n_t - k * {stride}) AS INT) AS n_tokens,
       array_to_string(
         toks[CAST(k * {stride} + 1 AS INT):CAST(k * {stride} + {max_tokens} AS INT)],
         ' '
       ) AS chunk_text
FROM kk"""


def sql_winnow_fingerprints(k: int = 5, w: int = 4) -> str:
    """DuckDB twin of chunking.winnow_fingerprints: same 30-bit gram
    hash, same packed-integer rolling min (hash·2³² + (2³²−1−pos), so
    the rightmost-min tie rule is plain BIGINT arithmetic), same
    short-single-window rule for docs with fewer than w grams."""
    gram_txt = (
        f"array_to_string(toks[CAST(pos + 1 AS INT):CAST(pos + {k} AS INT)], ' ')"
    )
    return f"""
WITH t AS (SELECT doc_id, {TOKENS} AS toks FROM documents),
n AS (
  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_t
  FROM t WHERE len(toks) >= {k}
),
g AS (
  SELECT doc_id, toks, n_t - {k} + 1 AS n_grams,
         unnest(range(0, n_t - {k} + 1)) AS pos
  FROM n
),
h AS (
  SELECT doc_id, n_grams, pos,
         ({_md5_long(gram_txt)}) % {1 << 30} AS gh
  FROM g
),
wmin AS (
  SELECT doc_id, n_grams, pos,
         min(gh * {1 << 32} + ({(1 << 32) - 1} - pos)) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING
         ) AS wm
  FROM h
)
SELECT DISTINCT doc_id,
       CAST({(1 << 32) - 1} - (wm % {1 << 32}) AS BIGINT) AS pos,
       CAST(wm // {1 << 32} AS BIGINT) AS gram_hash
FROM wmin
WHERE pos <= GREATEST(0, n_grams - {w})"""


def sql_select_within_token_budget(
    budget: int, score_expr: str | None = None
) -> str:
    """DuckDB twin of mixing.select_within_token_budget: one global
    ordered cumulative sum (oracle scale — the Spark side's
    range-partition + broadcast-offset two-phase form exists precisely
    to avoid this single-ordering plan), same strict inclusive-prefix
    keep rule, same (round6(score) DESC, doc_id) order."""
    score_sel = (
        f", round({score_expr}, 6) + 0.0 AS _score" if score_expr else ""
    )
    order = "_score DESC, doc_id" if score_expr else "doc_id"
    return f"""
WITH t AS (
  SELECT doc_id, CAST(len({TOKENS}) AS BIGINT) AS n_tokens{score_sel}
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         ROW_NUMBER() OVER (ORDER BY {order}) AS sel_rank,
         SUM(n_tokens) OVER (
           ORDER BY {order} ROWS UNBOUNDED PRECEDING
         ) AS cum_tokens
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(sel_rank AS BIGINT) AS sel_rank,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c WHERE cum_tokens <= {budget}"""


def sql_hits_hosts(n_iters: int = 5, quant: int = 9) -> str:
    """Unrolled replay of pipeline.graph.hits over the same
    documents-derived host graph as ``sql_pagerank_hosts`` (weights
    dropped — HITS counts parallel edges additively, and many doc_ids
    map to the same (src, dst) here, so both engines sum the same
    multiplicities). L1 normalisation after every half-step, each value
    rounded to ``quant`` decimals so both engines restart every
    half-step from identical state.

    Every iteration CTE is ``AS MATERIALIZED``: DuckDB INLINES CTEs by
    default, and HITS references each half-step relation several times
    (ar twice via the total, a twice via hr and the final select...),
    compounding to ~16× expression blowup PER iteration — the inlined
    form at 5 iterations planned ~1e6 copies of the base scan and hung;
    materialized it runs in ~0.1 s (pagerank's twin survives inlining
    only because its per-iteration fan-out is 2×)."""
    smod, dmod = PAGERANK_GATE_SRC_MOD, PAGERANK_GATE_DST_MOD
    parts = [
        f"""e AS MATERIALIZED (
  SELECT 'h' || CAST(doc_id % {smod} AS VARCHAR) AS src,
         'h' || CAST((doc_id * 13 + 5) % {dmod} AS VARCHAR) AS dst
  FROM documents
  WHERE 'h' || CAST(doc_id % {smod} AS VARCHAR)
        != 'h' || CAST((doc_id * 13 + 5) % {dmod} AS VARCHAR)
)""",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "ncnt AS (SELECT COUNT(*) AS n FROM nodes)",
        "h0 AS (SELECT node, 1.0 / n.n AS s FROM nodes CROSS JOIN ncnt n)",
    ]
    for i in range(n_iters):
        parts += [
            f"""ar{i} AS MATERIALIZED (
  SELECT e.dst AS node, SUM(h.s) AS raw
  FROM e JOIN h{i} h ON h.node = e.src GROUP BY 1
)""",
            f"at{i} AS MATERIALIZED (SELECT SUM(raw) AS tot FROM ar{i})",
            f"""a{i} AS MATERIALIZED (
  SELECT nodes.node,
         round(CASE WHEN t.tot > 0
               THEN COALESCE(r.raw, 0.0) / t.tot ELSE 0.0 END, {quant}) AS s
  FROM nodes LEFT JOIN ar{i} r ON r.node = nodes.node CROSS JOIN at{i} t
)""",
            f"""hr{i} AS MATERIALIZED (
  SELECT e.src AS node, SUM(a.s) AS raw
  FROM e JOIN a{i} a ON a.node = e.dst GROUP BY 1
)""",
            f"ht{i} AS MATERIALIZED (SELECT SUM(raw) AS tot FROM hr{i})",
            f"""h{i + 1} AS MATERIALIZED (
  SELECT nodes.node,
         round(CASE WHEN t.tot > 0
               THEN COALESCE(r.raw, 0.0) / t.tot ELSE 0.0 END, {quant}) AS s
  FROM nodes LEFT JOIN hr{i} r ON r.node = nodes.node CROSS JOIN ht{i} t
)""",
        ]
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT nodes.node,
       round(COALESCE(h.s, 0.0), {quant}) + 0.0 AS hub,
       round(COALESCE(a.s, 0.0), {quant}) + 0.0 AS authority
FROM nodes
LEFT JOIN h{n_iters} h ON h.node = nodes.node
LEFT JOIN a{n_iters - 1} a ON a.node = nodes.node"""
    )


def sql_interval_join(n_intervals: int = 12) -> str:
    """DuckDB twin of events_ops.interval_join over a deterministic
    events-derived interval fixture (n 5-hour-spaced windows of 2.5 h
    each, anchored at the corpus min ts): a plain theta join — correct
    at oracle scale; the Spark side's bucketed equi-join exists because
    a theta join plans a nested-loop cartesian at corpus scale."""
    h = 3_600_000_000
    return f"""
WITH t0 AS (SELECT MIN(epoch_us(ts)) AS t0 FROM events),
iv AS (
  SELECT CAST(k AS BIGINT) AS interval_id,
         t0.t0 + k * {5 * h} AS lo_us,
         t0.t0 + k * {5 * h} + {5 * h // 2} AS hi_us
  FROM t0, unnest(range(0, {n_intervals})) AS r(k)
)
SELECT iv.interval_id, iv.lo_us, iv.hi_us,
       e.event_id, epoch_us(e.ts) AS ts_us
FROM iv JOIN events e
  ON epoch_us(e.ts) >= iv.lo_us AND epoch_us(e.ts) <= iv.hi_us"""


def sql_winnow_matches(
    k: int = 5, w: int = 4, min_shared: int = 2, max_df: int = 50
) -> str:
    """DuckDB twin of chunking.winnow_matches: nests the fingerprint
    twin verbatim (MATERIALIZED — it is referenced by both join sides),
    the same document-frequency valve, the same (doc_a < doc_b,
    n_shared >= min_shared) pair rule."""
    return f"""
WITH fp AS MATERIALIZED ({sql_winnow_fingerprints(k, w)}),
d AS (SELECT DISTINCT doc_id, gram_hash FROM fp),
keep AS (
  SELECT gram_hash FROM d GROUP BY 1 HAVING COUNT(*) <= {max_df}
),
kept AS MATERIALIZED (SELECT d.doc_id, d.gram_hash FROM d JOIN keep USING (gram_hash))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM kept a JOIN kept b USING (gram_hash)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= {min_shared}"""


def sql_split_sentences(source: str = "documents") -> str:
    """DuckDB twin of text.split_sentences: the SAME lookaround-free
    pattern (imported constant — the two can never drift), group-0
    extract_all, original match positions kept through the
    whitespace-only filter, space trim both sides. ``source`` is the
    sql_knn_graph-style source hook so consumers (chunk_by_sentences)
    can nest this twin over a derived (doc_id, text) relation."""
    from ccm_spark.pipeline.text import SENTENCE_RE

    return f"""
WITH m AS (
  SELECT doc_id, regexp_extract_all(text, '{SENTENCE_RE}', 0) AS ss
  FROM {source}
),
u AS (
  SELECT doc_id,
         CAST(generate_subscripts(ss, 1) - 1 AS INT) AS sent_idx,
         trim(unnest(ss)) AS sentence
  FROM m
)
SELECT doc_id, sent_idx, sentence, CAST(length(sentence) AS INT) AS n_chars
FROM u WHERE sentence != ''"""


#: deterministic file manifest derived from the documents table for the
#: compaction-planner fixture: partition = doc_id % 8, zero-padded path
#: so lexicographic order == numeric order in both engines, size =
#: codepoint length of text (Spark F.length == DuckDB length)
SQL_COMPACTION_MANIFEST = """
SELECT CAST(doc_id % 8 AS VARCHAR) AS partition,
       'part-' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS path,
       CAST(length(text) AS BIGINT) AS size_bytes
FROM documents"""


def sql_salted_join() -> str:
    """DuckDB twin of the salted_join gate fixture (r15 staged
    candidate): the oracle IS the plain join — salting is a pure
    shuffle-layout transform, so the correct answer is stated entirely
    without the salt arithmetic (algorithm-independent evidence, the
    series_topk discipline). Fixture: every document joined to its
    language's corpus-level stats — the canonical hot-key join (the
    lang column is the key_skew_report gate's own skewed key)."""
    return """
WITH probe AS (
  SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS doc_len
  FROM documents
),
build AS (
  SELECT lang, COUNT(*) AS lang_docs,
         CAST(SUM(length(text)) AS BIGINT) AS lang_bytes
  FROM documents GROUP BY 1
)
SELECT p.doc_id, p.lang, p.doc_len, b.lang_docs, b.lang_bytes
FROM probe p JOIN build b USING (lang)"""


def sql_key_skew_report(key: str = "lang", top_n: int = 20) -> str:
    """DuckDB twin of skew.key_skew_report over a documents column:
    same NULL-as-'<NULL>' keying, same (count DESC, key ASC) rank, same
    exact-integer-count entropy tree (log2(N) − Σc·log2 c / N) with the
    SAME order-deterministic Σc·log2(c) reduction — a left fold from
    0.0 over the value-sorted term list (list_reduce/list_sort here,
    aggregate/sort_array/collect_list on the Spark side), so neither
    engine's parallel-sum accumulation order can drift the hash — same
    round6 share/cum_share boundaries. Integer sums cast to BIGINT
    (the parity gate rejects HUGEINT)."""
    n = int(top_n)
    return f"""
WITH keyed AS (
  SELECT COALESCE(CAST({key} AS VARCHAR), '<NULL>') AS key FROM documents
),
counts AS (SELECT key, COUNT(*) AS n_rows FROM keyed GROUP BY key),
summary AS (
  SELECT CAST(SUM(n_rows) AS BIGINT) AS total_rows,
         COUNT(*) AS n_keys,
         log2(CAST(SUM(n_rows) AS DOUBLE))
           - list_reduce(
               list_prepend(0.0, list_sort(
                 list(n_rows * log2(CAST(n_rows AS DOUBLE))))),
               (acc, x) -> acc + x)
             / CAST(SUM(n_rows) AS DOUBLE) AS h
  FROM counts
),
top AS (
  SELECT key, n_rows,
         CAST(ROW_NUMBER() OVER (ORDER BY n_rows DESC, key ASC) AS INT)
           AS rank
  FROM counts QUALIFY rank <= {n}
)
SELECT rank, key, n_rows,
       round(n_rows / CAST(total_rows AS DOUBLE), 6) + 0.0 AS share,
       round(CAST(SUM(n_rows) OVER (ORDER BY rank
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) / CAST(total_rows AS DOUBLE), 6) + 0.0 AS cum_share,
       total_rows, n_keys,
       round(h, 6) + 0.0 AS entropy_bits,
       round(log2(CAST(n_keys AS DOUBLE)), 6) + 0.0 AS uniform_bits
FROM top CROSS JOIN summary"""


def sql_plan_compaction(target_bytes: int = 500) -> str:
    """DuckDB twin of layout.plan_compaction over the deterministic
    documents-derived manifest: same path-ordered small-file running
    sum (big files contribute 0 and take task −1), same
    ``cum_before // target`` bucket rule, same task stats windows and
    the singleton-task compact=false rule."""
    t = int(target_bytes)
    return f"""
WITH manifest AS ({SQL_COMPACTION_MANIFEST}),
cum AS (
  SELECT partition, path, size_bytes,
         COALESCE(SUM(CASE WHEN size_bytes < {t} THEN size_bytes ELSE 0 END)
           OVER (PARTITION BY partition ORDER BY path
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM manifest
),
tasks AS (
  SELECT partition, path, size_bytes,
         CAST(CASE WHEN size_bytes < {t} THEN cum_before // {t}
              ELSE -1 END AS BIGINT) AS task_id,
         size_bytes < {t} AS small
  FROM cum
)
SELECT partition, path, size_bytes, task_id,
       CAST(CASE WHEN small THEN COUNT(*) OVER wt ELSE 1 END AS INT)
         AS task_files,
       CAST(CASE WHEN small THEN SUM(size_bytes) OVER wt
            ELSE size_bytes END AS BIGINT) AS task_bytes,
       (small AND COUNT(*) OVER wt >= 2) AS compact
FROM tasks
WINDOW wt AS (PARTITION BY partition, task_id)"""


def sql_dedup_events_replay() -> str:
    """DuckDB twin of streaming.dedup_stream.dedup_events_replay (staged
    r16 gate candidate): a two-delivery at-least-once replay through
    dropDuplicatesWithinWatermark emits exactly one copy of each
    byte-identical input row (event_id unique, asserted Spark-side), so
    the oracle is the events table itself — schedule-invariant, stated
    entirely without the streaming machinery."""
    return """
SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props
FROM events"""


def sql_compact_roundtrip() -> str:
    """DuckDB twin of layout.compact_roundtrip (staged r16 gate
    candidate): the compacted tree read back must equal, as a multiset,
    the input documents keyed by their planned Hive partition — no
    file-size knowledge needed, because the fixture makes every file
    compactable and every partition a single merge task, so the rewrite
    is certified content-complete (nothing lost to the tag join,
    nothing duplicated, every row in its planned partition)."""
    return """
SELECT 'p=' || CAST(doc_id % 3 AS VARCHAR) AS partition,
       doc_id,
       md5(COALESCE(text, '')) AS text_md5
FROM documents"""


def sql_chunk_by_sentences(max_tokens: int = 32) -> str:
    """DuckDB twin of chunking.chunk_by_sentences over the
    punctuation-injected documents view: sql_split_sentences nested
    verbatim via its source hook, the SHARED injection pattern constant
    (text.SENT_INJECT_RE — the engines cannot drift), same whitespace
    tokenizer, same cumulative-tokens-before window, same
    ``cum_before // max_tokens`` bucket rule, sentences re-joined in
    sent_idx order."""
    from ccm_spark.pipeline.text import SENT_INJECT_RE

    toks = _sql_tokens("sentence")
    return f"""
WITH sdocs AS (
  SELECT doc_id,
         regexp_replace(text, '{SENT_INJECT_RE}', '\\1. ', 'g') AS text
  FROM documents
),
sents AS ({sql_split_sentences(source="sdocs")}),
tok AS (
  SELECT doc_id, sent_idx, sentence,
         CAST(len({toks}) AS BIGINT) AS n_tok
  FROM sents
),
cum AS (
  SELECT doc_id, sent_idx, sentence, n_tok,
         COALESCE(SUM(n_tok) OVER (
           PARTITION BY doc_id ORDER BY sent_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM tok
)
SELECT doc_id,
       CAST(cum_before // {max_tokens} AS INT) AS chunk_idx,
       CAST(COUNT(*) AS INT) AS n_sentences,
       CAST(SUM(n_tok) AS INT) AS n_tokens,
       string_agg(sentence, ' ' ORDER BY sent_idx) AS chunk_text
FROM cum
GROUP BY doc_id, cum_before // {max_tokens}"""


def sql_merge_upsert() -> str:
    """DuckDB twin of cdc.merge_upsert_gate (staged gate candidate):
    the latest-record-wins merge restated as one ranked CTE — base at
    version 0, a delta carrying a re-crawl (version 1), a takedown
    tombstone (version 1, the key must vanish), and a same-version
    amendment (the delta-wins-ties rule), rank by (version DESC,
    src DESC), winners filtered by tombstone AFTER the rank so a
    delete can never resurrect the stale base row."""
    return """
WITH base AS (
  SELECT doc_id, text, lang, source, n_chars,
         CAST(0 AS BIGINT) AS version, false AS deleted, 0 AS src
  FROM documents
),
delta AS (
  SELECT doc_id, text || ' [v1]' AS text, lang, source,
         n_chars + 5 AS n_chars, CAST(1 AS BIGINT) AS version,
         false AS deleted, 1 AS src
  FROM documents WHERE doc_id % 7 = 3
  UNION ALL
  SELECT doc_id, text, lang, source, n_chars,
         CAST(1 AS BIGINT), true, 1
  FROM documents WHERE doc_id % 7 = 5
  UNION ALL
  SELECT doc_id, text || ' [dup]', lang, source, n_chars + 6,
         CAST(0 AS BIGINT), false, 1
  FROM documents WHERE doc_id % 7 = 1
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY version DESC, src DESC) AS rn
  FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
)
SELECT doc_id, version, lang, source, n_chars,
       md5(COALESCE(text, '')) AS text_md5
FROM ranked WHERE rn = 1 AND NOT deleted"""


def sql_profile_columns() -> str:
    """DuckDB twin of profile.profile_documents_gate (staged gate
    candidate): the per-column profile restated over the same stacked
    (col_name, value-as-VARCHAR, is_num) relation — same null-bearing
    ``sig`` derivation, same non-null semantics for distinct/top/
    min/max, and the SAME value-aware ordering: numeric source
    columns compare via TRY_CAST back to DOUBLE (arg_min/arg_max and
    the tiebreak), string columns compare codepoint-wise; the CASE
    ordering key is constant-NULL inside a string column's partition,
    so its engine-specific NULL placement can never reorder anything
    there. Counts cast to BIGINT (the parity gate rejects HUGEINT);
    the twice-referenced CTEs are MATERIALIZED (the r12 inlining
    lesson — and the Spark side localCheckpoints ``counts`` for the
    same two-subtree fan-out)."""
    cols = [
        ("doc_id", True),
        ("lang", False),
        ("source", False),
        ("n_chars", True),
        ("sig", False),
    ]
    stacked = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS value, "
        f"{'TRUE' if num else 'FALSE'} AS is_num FROM src"
        for c, num in cols
    )
    return f"""
WITH src AS MATERIALIZED (
  SELECT doc_id, lang, source, n_chars,
         CASE WHEN doc_id % 11 = 0 THEN NULL ELSE source END AS sig
  FROM documents
),
stacked AS (
{stacked}
),
counts AS MATERIALIZED (
  SELECT col_name, value, CAST(COUNT(*) AS BIGINT) AS cnt,
         any_value(is_num) AS is_num
  FROM stacked GROUP BY col_name, value
),
base AS (
  SELECT col_name,
         CAST(SUM(cnt) AS BIGINT) AS n_rows,
         CAST(COALESCE(SUM(CASE WHEN value IS NULL THEN cnt END), 0)
              AS BIGINT) AS n_nulls,
         CAST(SUM(CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_distinct,
         CASE WHEN any_value(is_num)
              THEN arg_min(value, TRY_CAST(value AS DOUBLE))
              ELSE MIN(value) END AS min_value,
         CASE WHEN any_value(is_num)
              THEN arg_max(value, TRY_CAST(value AS DOUBLE))
              ELSE MAX(value) END AS max_value
  FROM counts GROUP BY col_name
),
top AS (
  SELECT col_name, value AS top_value, cnt AS top_count
  FROM counts
  WHERE value IS NOT NULL
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY col_name ORDER BY cnt DESC,
      CASE WHEN is_num THEN TRY_CAST(value AS DOUBLE) END ASC,
      value ASC) = 1
)
SELECT b.col_name, b.n_rows, b.n_nulls, b.n_distinct,
       t.top_value,
       CAST(COALESCE(t.top_count, 0) AS BIGINT) AS top_count,
       b.min_value, b.max_value
FROM base b LEFT JOIN top t USING (col_name)"""


def sql_promo_revenue(
    date_from: str = "1996-09-01", date_to: str = "1996-10-01"
) -> str:
    """DuckDB twin of relational.promo_revenue (TPC-H Q14-shaped):
    same one-month shipdate window, same equality test on the
    synthetic single-word p_type, revenue ratio round6 at the
    boundary, item count as the non-vacuity witness."""
    return f"""
SELECT round(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0.0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 6) + 0.0
         AS promo_pct,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '{date_from} 00:00:00'
  AND l.l_shipdate < TIMESTAMP '{date_to} 00:00:00'"""


def sql_large_volume_customers(min_qty: int = 300) -> str:
    """DuckDB twin of relational.large_volume_customers (TPC-H
    Q18-shaped): per-order quantity rollup, HAVING on the RAW double
    sum before any join, the qualified set joined to orders and
    customer. total_qty converts via FLOOR then BIGINT exactly like
    the Spark side (a bare double->BIGINT CAST rounds in DuckDB but
    truncates in Spark — floor removes the divergence; the sum is
    drift-free because every l_quantity is integral)."""
    return f"""
WITH big AS (
  SELECT l_orderkey, CAST(FLOOR(SUM(l_quantity)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > {int(min_qty)}
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
       o.o_totalprice, b.total_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey"""


def sql_heavy_hitters(col: str = "lang", k: int = 5, capacity: int = 64) -> str:
    """DuckDB twin of sketches.heavy_hitters over a documents column in
    the exact regime (true cardinality <= capacity, so the Misra-Gries
    pass retains every value and the result is plain exact top-k): the
    oracle is stated entirely without the sketch machinery — the
    salted_join discipline — same '<NULL>' keying, same (cnt DESC,
    value ASC) rank, same MG guarantee bound derivation."""
    n = int(k)
    cap = int(capacity)
    return f"""
WITH vals AS (
  SELECT COALESCE(CAST({col} AS VARCHAR), '<NULL>') AS value FROM documents
),
counts AS (
  SELECT value, CAST(COUNT(*) AS BIGINT) AS cnt FROM vals GROUP BY value
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_rows FROM vals)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, value ASC) AS INT)
         AS rank,
       value, cnt, total_rows,
       CAST(total_rows // {cap + 1} + 1 AS BIGINT) AS guarantee_min
FROM counts CROSS JOIN tot
QUALIFY rank <= {n}"""
