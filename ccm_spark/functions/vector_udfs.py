"""Arrow-batched vector kernels (pandas UDFs).

NOTE: no ``from __future__ import annotations`` here — pandas_udf resolves
the type hints at definition time, and postponed (string) annotations from
that future import break its signature inspection.
"""

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

# the shared Python-side tokenizer lives in hashing (a module with no
# pandas_udf at import time: UDF closures reference it by module, and the
# executor imports that module WITHOUT an active session — importing THIS
# module there would re-run the decorators below and crash)
from ccm_spark.functions.hashing import py_token_spans, py_tokens

_P31 = 2_147_483_647


def simhash_udf(bits: int):
    """Arrow-batched SimHash: text -> sign-sum fingerprint over token md5
    hashes (with multiplicity), None for token-less docs (they vanish from
    the fingerprint relation, matching the explode-based formulation and
    the oracle). Bit-identical to the former tokens x bits explode+join
    plan, which materialised 56 rows per token before aggregating."""

    shifts = np.arange(bits, dtype=np.uint64)

    @pandas_udf("long")
    def _simhash(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            toks = py_tokens(t)
            if not toks:
                out.append(None)
                continue
            hs = np.array(
                [
                    int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16)
                    % (1 << bits)
                    for w in toks
                ],
                dtype=np.uint64,
            )
            set_counts = ((hs[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
            # bit b is set iff sign-sum > 0 iff strictly more ones than zeros
            fp = int(((2 * set_counts > len(hs)) * (np.uint64(1) << shifts)).sum())
            out.append(fp)
        return pd.Series(out, dtype="object")

    return _simhash


def shingle_hash_udf(width: int):
    """Arrow-batched shingler: text -> sorted distinct hashed token
    w-grams, one array<long> per document.

    Replaces the interpreted HOF chain (transform + slice + concat_ws +
    md5 at ~25 us/element) with plain Python at ~1 us/shingle. Hash
    parity with the JVM/DuckDB formulation is bit-exact: md5 of the
    space-joined lowercase tokens, first 15 hex chars as a 60-bit int,
    mod 2^31-1 (functions.hashing.md5_long % P31).
    """

    @pandas_udf("array<long>")
    def _shingle_hashes(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            toks = py_tokens(t)
            if len(toks) < width:
                out.append([])
                continue
            hashes = {
                int(
                    hashlib.md5(
                        " ".join(toks[i : i + width]).encode("utf-8")
                    ).hexdigest()[:15],
                    16,
                )
                % _P31
                for i in range(len(toks) - width + 1)
            }
            out.append(sorted(hashes))
        return pd.Series(out)

    return _shingle_hashes


def shingle_seq_udf(width: int):
    """Arrow-batched POSITIONAL shingler: text -> hashed token w-grams in
    document order, duplicates kept — one array<long> per document (the
    i-th element is the shingle starting at token i). The substring-level
    dedup needs the sequence (run detection is positional); the set-based
    families use :func:`shingle_hash_udf`, which dedups and sorts. Same
    tokenizer and hash as shingle_hash_udf (md5 60-bit % P31), so the two
    relations are join-compatible. Docs shorter than ``width`` tokens
    produce an empty array."""

    @pandas_udf("array<long>")
    def _shingle_seq(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            toks = py_tokens(t)
            if len(toks) < width:
                out.append([])
                continue
            out.append(
                [
                    int(
                        hashlib.md5(
                            " ".join(toks[i : i + width]).encode("utf-8")
                        ).hexdigest()[:15],
                        16,
                    )
                    % _P31
                    for i in range(len(toks) - width + 1)
                ]
            )
        return pd.Series(out)

    return _shingle_seq


def minhash_sig_udf(perm_params):
    """Arrow-batched per-document MinHash signature: array<long> shingle
    hashes -> array<long> of min((a*h + b) mod P31) per permutation, None
    for empty shingle sets (docs under the shingle width vanish, matching
    the aggregate formulation). One numpy (S x P) broadcast per doc; all
    values < 2^62, exact in int64.

    Computing the signature per row (instead of explode + groupBy(doc_id))
    removes the signature exchange from every batch consumer and — because
    no stateful aggregation remains — makes the signature computable on a
    STREAMING increment, which is what the stream index probe needs.
    ``perm_params`` is the (perm_id, a, b) list from
    ``dedup.minhash_perm_params`` (passed in to keep this module free of
    session-dependent imports)."""

    a_arr = np.array([a for _, a, _ in perm_params], dtype=np.int64)
    b_arr = np.array([b for _, _, b in perm_params], dtype=np.int64)

    @pandas_udf("array<long>")
    def _sig(shingle_hashes: pd.Series) -> pd.Series:
        out = []
        for arr in shingle_hashes:
            if arr is None or len(arr) == 0:
                out.append(None)
                continue
            h = np.asarray(arr, dtype=np.int64)[:, None]
            out.append(((a_arr * h + b_arr) % _P31).min(axis=0).tolist())
        return pd.Series(out)

    return _sig


def shingle_hits_udf(eval_shingles):
    """Arrow-batched contamination counter: array<long> shingle hashes ->
    how many are in the eval set. ``eval_shingles`` is either a plain
    set/frozenset (pickled into every task closure — fine for tests) or a
    ``SparkContext.broadcast`` handle (resolved lazily via ``.value``, so
    the set ships ONCE per executor instead of once per task — the right
    form for production callers; decontaminate_stream uses it). Defined
    here because pandas_udf cannot resolve postponed annotations (see
    module note)."""

    @pandas_udf("long")
    def _n_hits(shingle_hashes: pd.Series) -> pd.Series:
        s = (
            eval_shingles.value
            if hasattr(eval_shingles, "value")
            else eval_shingles
        )
        return pd.Series(
            [
                0 if arr is None else sum(1 for h in arr if h in s)
                for arr in shingle_hashes
            ],
            dtype="int64",
        )

    return _n_hits


@pandas_udf("double")
def cosine_sim(a: pd.Series, b: pd.Series) -> pd.Series:
    """Row-wise cosine similarity of two array<double> columns, vectorised
    with numpy per Arrow batch (~100x the interpreted expression fold).
    Zero-norm inputs score 0.0."""
    ma = np.stack(a.to_numpy())
    mb = np.stack(b.to_numpy())
    dots = np.einsum("ij,ij->i", ma, mb)
    na = np.sqrt(np.einsum("ij,ij->i", ma, ma))
    nb = np.sqrt(np.einsum("ij,ij->i", mb, mb))
    denom = na * nb
    out = np.where(denom == 0.0, 0.0, dots / np.where(denom == 0.0, 1.0, denom))
    return pd.Series(out)


@pandas_udf("long")
def fingerprint_udf(text: pd.Series) -> pd.Series:
    """Arrow-batched positional rolling fingerprint:
    fp = sum_i ((md5_60bit(token_i) mod P31) * (i+1)) mod P31, reduced
    mod P31 every step (exact arbitrary-precision ints — the JVM
    explode+sum formulation this replaces overflows int64 around 92k
    tokens per document, a real length in web corpora under ANSI mode).
    Token-less docs return None (they vanish from the relation, matching
    the explode semantics and the DuckDB oracle). Zero shuffle: one
    narrow projection instead of explode -> groupBy(doc_id)."""
    out = []
    for t in text:
        toks = py_tokens(t)
        if not toks:
            out.append(None)
            continue
        fp = 0
        for i, w in enumerate(toks):
            h = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16) % _P31
            fp = (fp + h * (i + 1)) % _P31
        out.append(fp)
    return pd.Series(out, dtype="object")


def shingle_text_udf(width: int):
    """Arrow-batched shingler keeping the gram TEXT: text -> sorted
    distinct token w-grams (space-joined), one array<string> per doc.
    Same tokenizer as shingle_hash_udf; used where the gram itself is the
    output (boilerplate/template detection), not a join key."""

    @pandas_udf("array<string>")
    def _shingle_texts(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            toks = py_tokens(t)
            if len(toks) < width:
                out.append([])
                continue
            out.append(
                sorted({" ".join(toks[i : i + width]) for i in range(len(toks) - width + 1)})
            )
        return pd.Series(out)

    return _shingle_texts


def gram_stats_udf(width: int):
    """Arrow-batched per-doc w-gram repetition stats (Gopher-style):
    (n_grams, top_count, dup_occ) where dup_occ counts occurrences of
    grams appearing more than once. Raw gram strings (no hashing), so the
    oracle's unnest+count formulation matches without collision caveats."""

    from collections import Counter

    @pandas_udf("struct<n_grams:long, top_count:long, dup_occ:long>")
    def _gram_stats(text: pd.Series) -> pd.DataFrame:
        rows = []
        for t in text:
            toks = py_tokens(t)
            if len(toks) < width:
                rows.append((0, 0, 0))
                continue
            counts = Counter(
                " ".join(toks[i : i + width]) for i in range(len(toks) - width + 1)
            )
            n = sum(counts.values())
            top = max(counts.values())
            dup = sum(c for c in counts.values() if c > 1)
            rows.append((n, top, dup))
        return pd.DataFrame(rows, columns=["n_grams", "top_count", "dup_occ"])

    return _gram_stats


def span_cut_udf():
    """Arrow-batched byte-faithful span removal: (text, sorted token
    positions to cut) -> text with those tokens excised from the ORIGINAL
    string — original case, punctuation, and whitespace outside the cut
    ranges are untouched (token offsets from
    :func:`hashing.py_token_spans`, which is position-exact on the raw
    text). Each maximal run of consecutive cut positions deletes from the
    run's first token start to the next kept token's start (to end of
    string for a trailing run), so the whitespace that glued the removed
    span to its successor goes with it. Positions beyond the token count
    are ignored (a doc shortened upstream cannot crash the cutter)."""

    @pandas_udf("string")
    def _cut(text: pd.Series, cut_pos: pd.Series) -> pd.Series:
        out = []
        for t, cuts in zip(text, cut_pos):
            if t is None:
                out.append(None)
                continue
            spans = py_token_spans(t)
            n = len(spans)
            pos = sorted({int(p) for p in cuts if 0 <= int(p) < n}) if cuts is not None else []
            if not pos:
                out.append(t)
                continue
            # maximal runs of consecutive positions -> char deletion ranges
            dels = []
            i = 0
            while i < len(pos):
                j = i
                while j + 1 < len(pos) and pos[j + 1] == pos[j] + 1:
                    j += 1
                start = spans[pos[i]][0]
                end = spans[pos[j] + 1][0] if pos[j] + 1 < n else len(t)
                dels.append((start, end))
                i = j + 1
            pieces, prev = [], 0
            for s, e in dels:
                pieces.append(t[prev:s])
                prev = e
            pieces.append(t[prev:])
            out.append("".join(pieces))
        return pd.Series(out)

    return _cut


def pq_encode_udf(codebooks):
    """Arrow-batched PQ encoder: array<double> vector -> array<int> of
    per-subspace nearest-codebook-row indices (L2 on the L2-normalised
    vector, ties -> lowest code). ``codebooks`` is the list of (ksub x
    dim/m) float64 arrays from ``similarity.pq_codebooks``; it rides the
    closure (a few KB). None vectors encode to None."""

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    dsub = books[0].shape[1]

    @pandas_udf("array<int>")
    def _encode(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            if v is None:
                out.append(None)
                continue
            a = np.asarray(v, dtype=np.float64)
            nrm = np.sqrt((a * a).sum())
            if nrm != 0.0:
                a = a / nrm
            out.append(
                [
                    int(
                        np.argmin(
                            ((books[s] - a[s * dsub : (s + 1) * dsub]) ** 2).sum(
                                axis=1
                            )
                        )
                    )
                    for s in range(m)
                ]
            )
        return pd.Series(out)

    return _encode


def pq_adc_udf(bc_query_tables):
    """Arrow-batched ADC scorer for candidate-restricted PQ search:
    (query_id, codes) -> sum of per-subspace table lookups.
    ``bc_query_tables`` is a ``SparkContext.broadcast`` of
    ``(q_index, tables)`` where ``q_index`` maps query_id -> row in
    ``tables``, a (n_queries x m x ksub) float64 array of precomputed
    query-vs-codebook inner products — shipped once per executor, not
    re-pickled into every task binary (at production query counts the
    stack is hundreds of MB). One fancy-index gather per batch;
    per-candidate cost is m lookups, independent of embedding dim.
    Emits RAW scores — the caller rounds at the query boundary with
    ``F.round`` (np.round's binary banker's tie rule diverges from the
    Spark/DuckDB shortest-decimal HALF_UP on decimal ties)."""

    @pandas_udf("double")
    def _adc(query_id: pd.Series, codes: pd.Series) -> pd.Series:
        q_index, tables = bc_query_tables.value
        tbl = np.asarray(tables, dtype=np.float64)
        sub_idx = np.arange(tbl.shape[1])
        qi = np.array([q_index[q] for q in query_id], dtype=np.int64)
        cm = np.stack(codes.to_numpy()).astype(np.int64)
        return pd.Series(tbl[qi[:, None], sub_idx, cm].sum(axis=1))

    return _adc


def bloom_hits_udf(bc_words, n_hashes: int, log2_m: int):
    """Arrow-batched Bloom membership counter: array<long> shingle hashes
    -> how many MAY be in the filter (no false negatives; false positives
    at the filter's designed rate). ``bc_words`` is a
    ``SparkContext.broadcast`` of the uint64 word array (2**log2_m bits as
    2**(log2_m-6) words) — shipped once per executor, megabytes even for
    billion-shingle eval corpora, which is the whole point vs shipping the
    shingle set itself (``shingle_hits_udf``)."""
    from ccm_spark.functions.hashing import bloom_positions

    @pandas_udf("long")
    def _n_maybe(shingle_hashes: pd.Series) -> pd.Series:
        words = bc_words.value
        out = np.zeros(len(shingle_hashes), dtype=np.int64)
        for i, arr in enumerate(shingle_hashes):
            if arr is None or len(arr) == 0:
                continue
            pos = bloom_positions(arr, n_hashes, log2_m)
            w = words[(pos >> np.uint64(6)).astype(np.int64)]
            bits = (w >> (pos & np.uint64(63))) & np.uint64(1)
            out[i] = int(np.count_nonzero(bits.all(axis=1)))
        return pd.Series(out)

    return _n_maybe


def linear_score_udf(bc_weights, log2_f: int, bias: float, bigrams: bool):
    """Arrow-batched hashed-linear-model scorer: text -> sigmoid(mean of
    the weights at the doc's hashed unigram+bigram features + bias) — the
    serving path of a fasttext-style quality classifier (mean-pooled bag
    of hashed n-grams through a linear head). ``bc_weights`` is a
    ``SparkContext.broadcast`` float64 array of size 2**log2_f (or a plain
    array for tests). None for token-less docs."""
    from ccm_spark.functions.hashing import py_hashed_features

    @pandas_udf("double")
    def _score(text: pd.Series) -> pd.Series:
        w = bc_weights.value if hasattr(bc_weights, "value") else bc_weights
        out = []
        for t in text:
            toks = py_tokens(t)
            if not toks:
                out.append(None)
                continue
            idx = py_hashed_features(toks, log2_f, bigrams)
            z = float(w[idx].mean()) + bias
            out.append(1.0 / (1.0 + np.exp(-z)))
        return pd.Series(out, dtype="float64")

    return _score


def srp_bucket_udf(plane_values, planes: int, dim: int):
    """Arrow-batched SRP bucketing against FIXED plane values (the
    persisted-index probe path): dot each raw vector with the plane
    matrix, sign bits -> bucket id. ``plane_values`` is the
    [(plane, dim_idx, comp), ...] list ``srp_plane_values`` emits /
    ``sources.sinks.read_srp_planes`` loads. Bit semantics match
    ``pipeline.similarity.srp_buckets`` exactly (dot >= 0 -> bit set;
    the explode plan also dots the raw vector). Bit sums run in uint64 —
    a float accumulation would lose exactness past 2^53 at high plane
    counts. A pure narrow kernel — no explode, no aggregate — so it runs
    on a STREAMING increment in append mode."""
    mat = np.zeros((planes, dim), dtype=np.float64)
    for pl, d, comp in plane_values:
        mat[pl, d] = comp
    pows = np.uint64(1) << np.arange(planes, dtype=np.uint64)

    @pandas_udf("long")
    def _bucket(embedding: pd.Series) -> pd.Series:
        if len(embedding) == 0:
            return pd.Series([], dtype="int64")
        # one batch matmul (the kmeans_assign_udf shape), not a per-row
        # Python loop — this kernel sits on the streaming ingestion-probe
        # hot path; bit packing stays in uint64 for exactness
        x = np.stack(embedding.to_numpy()).astype(np.float64)
        dots = x @ mat.T  # (batch, planes)
        buckets = ((dots >= 0.0).astype(np.uint64) * pows[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        return pd.Series(buckets.astype(np.int64))

    return _bucket


def kmeans_assign_udf(bc_centroids):
    """Arrow-batched nearest-centroid assignment for the distributed
    Lloyd trainer (pipeline.clustering): argmin squared-L2 against the
    broadcast (k x dim) centroid matrix — batch matmul, ties -> lowest
    cluster id (np.argmin first-occurrence). Input vectors must ALREADY
    be L2-normalised (every caller feeds ``_normalized_vec`` output);
    re-normalising here would both waste a pass and diverge from the
    DuckDB parity oracle, which normalises exactly once. Centroids
    arrive via SparkContext.broadcast (once per executor, the
    plan-shape discipline test_ann_query_payloads pins elsewhere)."""

    @pandas_udf("long")
    def _assign(embedding: pd.Series) -> pd.Series:
        cents = bc_centroids.value
        x = np.stack(embedding.to_numpy()).astype(np.float64)
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 is constant
        # per row, so the argmin needs only the last two terms
        d2 = (np.einsum("ij,ij->i", cents, cents))[None, :] - 2.0 * (x @ cents.T)
        return pd.Series(np.argmin(d2, axis=1).astype(np.int64))

    return _assign


def cosine_pairs_udf(bc_index):
    """Arrow-batched cosine for ID PAIRS against a broadcast corpus
    matrix — the k-NN graph's small-corpus scoring fast path: instead
    of equi-joining two dim-length arrays onto every candidate pair
    (shipping ~2·dim·8 bytes per pair through the shuffle AND the
    Arrow boundary), only the two int64 ids cross, and the rows are
    gathered executor-side from ``bc_index.value = (idmap, matrix)``.
    Numerics are EXACTLY :func:`cosine_sim`'s (same gathered float64
    rows, same einsum, same zero-norm -> 0.0), so the two paths are
    bit-interchangeable (test-pinned); returns the RAW cosine — the
    caller applies the engine's boundary rounding identically in both
    paths.

    An id ABSENT from the broadcast index scores NaN (not a KeyError):
    the join path silently drops such pairs (the equi-join finds no
    vector row), so the caller filters NaN scores out to keep the two
    paths behavior-identical — e.g. knn_graph_insert handed a served
    graph referencing vectors no longer in ``embeddings``.

    The id->row lookup is FULLY vectorized (sorted-key ``searchsorted``
    built once per Python worker from the broadcast dict, then pure
    numpy per batch): the r11 ``np.fromiter(dict.get(...))`` form ran a
    Python-level call per candidate id — tens of millions per descent
    round — and cost the bench's knn_graph_2k ~2s/run (the r11->r12
    bisect)."""

    # per-worker lazy cache: (sorted key array, row-index permutation).
    # bc_index.value is hit once per worker; batches reuse the arrays.
    _lk: list = []

    def _lookup_arrays():
        if not _lk:
            idmap, mat = bc_index.value
            keys = np.fromiter(idmap.keys(), dtype=np.int64, count=len(idmap))
            vals = np.fromiter(idmap.values(), dtype=np.int64, count=len(idmap))
            order = np.argsort(keys, kind="stable")
            # per-row norms ONCE per worker (r16): recomputing both
            # gathered rows' norms per pair per batch was 2 of the 3
            # einsums; the per-row reduction here is the IDENTICAL
            # float64 operation on the identical row bytes, so gathered
            # norms are bit-equal to the per-pair recompute
            norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
            _lk.append((keys[order], vals[order], mat, norms))
        return _lk[0]

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        skeys, srows, mat, norms = _lookup_arrays()

        def gather(ids: pd.Series) -> np.ndarray:
            x = ids.to_numpy(dtype=np.int64, copy=False)
            if skeys.size == 0:
                return np.full(len(x), -1, dtype=np.int64)
            pos = np.searchsorted(skeys, x)
            pos_c = np.minimum(pos, len(skeys) - 1)
            hit = skeys[pos_c] == x
            return np.where(hit, srows[pos_c], -1)

        ia = gather(a)
        ib = gather(b)
        known = (ia >= 0) & (ib >= 0)
        ra = np.where(known, ia, 0)
        rb = np.where(known, ib, 0)
        ma = mat[ra]
        mb = mat[rb]
        dots = np.einsum("ij,ij->i", ma, mb)
        denom = norms[ra] * norms[rb]
        out = np.where(denom == 0.0, 0.0, dots / np.where(denom == 0.0, 1.0, denom))
        return pd.Series(np.where(known, out, np.nan))

    return _cos


def kmeans_assign_topn_udf(bc_centroids, n: int):
    """Arrow-batched top-``n`` nearest-centroid assignment (ascending
    squared-L2, ties -> lowest cluster id via stable mergesort) — the
    multi-probe sibling of :func:`kmeans_assign_udf` for SemDeDup's
    boundary-recall knob (``semantic_dedup(n_probe=2)``): a vector near
    a cluster boundary is blocked into BOTH nearest cells so a near-dup
    pair straddling the boundary still meets. Returns array<long> of
    length min(n, k); same batch-matmul shape as the argmin kernel."""

    @pandas_udf("array<long>")
    def _assign(embedding: pd.Series) -> pd.Series:
        cents = bc_centroids.value
        x = np.stack(embedding.to_numpy()).astype(np.float64)
        d2 = (np.einsum("ij,ij->i", cents, cents))[None, :] - 2.0 * (x @ cents.T)
        m = min(n, cents.shape[0])
        order = np.argsort(d2, axis=1, kind="mergesort")[:, :m].astype(np.int64)
        return pd.Series([row.tolist() for row in order])

    return _assign


def pca_project_udf(bc_model):
    """Arrow-batched PCA projection: (x - mean) @ components.T per batch
    matmul. ``bc_model`` is a SparkContext.broadcast of (components
    (k x dim), mean (dim,)); returns array<double> of length k."""

    @pandas_udf("array<double>")
    def _project(embedding: pd.Series) -> pd.Series:
        comps, mu = bc_model.value
        x = np.stack(embedding.to_numpy()).astype(np.float64) - mu
        out = x @ comps.T
        return pd.Series([row.tolist() for row in out])

    return _project
