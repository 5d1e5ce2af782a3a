"""Property-based tests (hypothesis) for the pure-python kernels — no Spark.

Covers the reference-parity invariants that must hold for ANY input:
the C2 ladder rule (lib/ccm.ex:86-97), the LCG rank determinism/range, the
R1/R3 guard semantics, and the sampling split partition property.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ccm_spark.config import generate_lib_sizes
from ccm_spark.oracle import library_split, ols_slope, pearson
from ccm_spark.rng import M31, lcg_rank_key


@given(st.integers(min_value=1, max_value=100_000))
def test_ladder_rule(max_lib):
    ladder = generate_lib_sizes(max_lib)
    assert ladder, "ladder never empty"
    assert all(1 <= v <= max_lib for v in ladder)
    if max_lib < 10:
        assert ladder == [max_lib]
    else:
        start = max(max_lib // 10, 5)
        step = max(2, max_lib // 20)
        assert ladder[0] == start
        assert all(b - a == step for a, b in zip(ladder, ladder[1:]))
        # maximal: one more step would exceed max_lib
        assert ladder[-1] + step > max_lib


@given(
    st.integers(min_value=0, max_value=1_000_000),
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=0, max_value=1_000_000),
    st.integers(min_value=0, max_value=1),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_lcg_key_range_and_determinism(idx, sample, lib, dirid, seed):
    k1 = lcg_rank_key(idx, sample, lib, dirid, seed)
    k2 = lcg_rank_key(idx, sample, lib, dirid, seed)
    assert k1 == k2
    assert 0 <= k1 < M31


@given(
    st.integers(min_value=1, max_value=400),
    st.integers(min_value=0, max_value=400),
    st.integers(min_value=0, max_value=50),
    st.integers(min_value=0, max_value=1000),
)
@settings(max_examples=50)
def test_library_split_partitions(p, lib_size, sample_id, seed):
    lib, pred = library_split(p, min(lib_size, p), sample_id, 0, seed)
    assert len(lib) + len(pred) == p
    assert len(set(lib.tolist()) | set(pred.tolist())) == p
    assert len(lib) == min(lib_size, p)


@given(st.lists(st.floats(-1e6, 1e6), min_size=0, max_size=50))
def test_pearson_guards(vals):
    a = np.array(vals)
    # constant second series -> zero variance -> 0.0, never NaN/inf
    r = pearson(a, np.zeros_like(a))
    assert r == 0.0
    if len(a) >= 2:
        r2 = pearson(a, a.copy())
        assert np.isfinite(r2)
        if np.ptp(a) > 1e-3 and np.max(np.abs(a)) < 1e5:
            assert abs(r2 - 1.0) < 1e-6  # perfectly correlated with itself


@given(st.lists(st.floats(-100, 100), min_size=0, max_size=20))
def test_slope_guards(ys):
    y = np.array(ys)
    x = np.arange(len(y), dtype=float)
    slope, convergent = ols_slope(x, y)
    if len(y) < 3:
        assert (slope, convergent) == (0.0, False)
    else:
        assert np.isfinite(slope)
        assert convergent == (slope > 0.001)
    # zero x-variance: guard fires regardless of n
    slope0, conv0 = ols_slope(np.ones(5), np.arange(5.0))
    assert (slope0, conv0) == (0.0, False)


# --- cross-engine tokenizer parity (the hash-parity spine of text/dedup) ---

# quote/backslash excluded (SQL literal escaping artifacts, not split
# semantics); NUL excluded because DuckDB VARCHARs cannot carry \x00 at
# all — a parquet column could never deliver one to the oracle either.
# Cased characters with non-trivial lower() are excluded too: Spark/Python
# do FULL Unicode case mapping while DuckDB's utf8proc does SIMPLE mapping
# (U+0130, word-final Σ diverge — measured; documented in hashing.py), so
# parity is only CLAIMED for the simple-mapping domain this strategy
# generates: any uncased character plus ASCII letters.
_TOKEN_TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="'\\\x00"
    ).filter(lambda c: ord(c) < 128 or c.lower() == c),
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(_TOKEN_TEXT)
def test_py_tokens_matches_duckdb_tokenizer(text):
    """hashing.py_tokens (the UDF-side tokenizer) must agree token-for-token
    with the DuckDB oracle tokenizer (sql_tokens) on arbitrary input — the
    shingle/simhash hash parity silently breaks anywhere they diverge.
    (Quote/backslash excluded: they'd need SQL literal escaping, and the
    split semantics don't depend on them.)"""
    import duckdb

    from ccm_spark.functions.hashing import py_tokens, sql_tokens

    got = py_tokens(text)
    literal = "'" + text + "'"
    want = duckdb.sql(f"SELECT {sql_tokens(literal)} AS t").fetchone()[0]
    assert got == list(want)


@given(
    st.lists(st.integers(min_value=0, max_value=2**31 - 1), min_size=1, max_size=50),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=8, max_value=30),
)
@settings(deadline=None)
def test_bloom_positions_bounds_and_determinism(hashes, k, log2_m):
    from ccm_spark.functions.hashing import bloom_positions

    a = bloom_positions(hashes, k, log2_m)
    b = bloom_positions(hashes, k, log2_m)
    assert a.shape == (len(hashes), k)
    assert (a == b).all()
    assert (a < (1 << log2_m)).all()
    # equal inputs map to equal rows (membership testing relies on it)
    if len(hashes) >= 2 and hashes[0] == hashes[1]:
        assert (a[0] == a[1]).all()


_WP_ALPHA = "ab"


@given(st.text(alphabet=_WP_ALPHA, min_size=1, max_size=24))
@settings(deadline=None)
def test_wordpiece_char_vocab_reconstructs(word):
    """With a full character vocab, segmentation never UNKs and the
    pieces (## stripped) concatenate back to the word; with the word
    itself in vocab, greedy takes it whole."""
    from ccm_spark.functions.hashing import py_wordpiece

    vocab = {}
    for ch in _WP_ALPHA:
        vocab[ch] = len(vocab) + 1
        vocab["##" + ch] = len(vocab) + 1
    ids = py_wordpiece(word, vocab, 0)
    assert 0 not in ids
    inv = {v: k for k, v in vocab.items()}
    rebuilt = "".join(inv[i].removeprefix("##") for i in ids)
    assert rebuilt == word
    vocab2 = dict(vocab)
    vocab2[word] = 999
    assert py_wordpiece(word, vocab2, 0) == [999]


@given(
    st.integers(min_value=30, max_value=5000),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**20),
)
@settings(deadline=None)
def test_surrogate_offsets_properties(n, k, seed):
    from ccm_spark.significance import surrogate_offsets

    offs = surrogate_offsets(n, k, seed)
    assert len(offs) == k
    ms = max(1, n // 10)
    assert all(ms <= o <= n - ms for o in offs)
    assert offs == surrogate_offsets(n, k, seed)


@given(
    st.integers(min_value=30, max_value=2000),
    st.integers(min_value=1, max_value=200),
)
@settings(deadline=None)
def test_holdout_lib_size_leaves_holdout(n, holdout):
    from ccm_spark.config import CCMConfig
    from ccm_spark.significance import holdout_lib_size

    cfg = CCMConfig()
    lib = holdout_lib_size(cfg, n, min_holdout=holdout)
    ladder = cfg.resolved_lib_sizes(n)
    assert lib in ladder
    n_emb = n - (cfg.embedding_dim - 1) * cfg.tau
    if any(n_emb - v >= holdout for v in ladder):
        assert n_emb - lib >= holdout
        # maximal: no larger ladder entry also satisfies the holdout
        assert all(v <= lib or n_emb - v < holdout for v in ladder)
    else:
        assert lib == ladder[-1]


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=2,
                max_size=200, unique=True))
@settings(deadline=None)
def test_splitmix64_injective_and_dispersed(xs):
    from ccm_spark.functions.hashing import splitmix64

    out = [splitmix64(x) for x in xs]
    # splitmix64 is a bijection on 64-bit ints: distinct in -> distinct out
    assert len(set(out)) == len(xs)
    assert out == [splitmix64(x) for x in xs]  # deterministic
    assert all(0 <= o < 2**64 for o in out)


@given(
    st.lists(st.sampled_from(["a", "b", "c", "dd", "eee"]), max_size=40),
    st.floats(min_value=0.01, max_value=2.0),
)
@settings(deadline=None)
def test_lm_score_model_invariants(tokens, alpha):
    """Perplexity is always >= 1 (every smoothed probability <= 1),
    2**cross_entropy == perplexity, and the kernel is deterministic."""
    import math

    from ccm_spark.pipeline.lm import UNK, score_model

    model = {
        "alpha": alpha,
        "vocab": {"a": 10, "b": 5, "c": 3},
        "unk_count": 2,
        "total": 20,
        "n_classes": 4,
        "bigrams": {("a", "b"): 4, ("b", "a"): 2, (UNK, "a"): 1},
    }
    n, h, ppl = score_model(model, tokens)
    assert n == len(tokens)
    if not tokens:
        assert math.isnan(h) and math.isnan(ppl)
    else:
        assert ppl >= 1.0 - 1e-12
        assert abs(2.0**h - ppl) < 1e-9 * max(1.0, ppl)
        assert score_model(model, tokens) == (n, h, ppl)


@given(st.lists(st.text(alphabet="ab c\tD.", min_size=1, max_size=20), min_size=1, max_size=10))
def test_normalize_phrases_properties(raw):
    """For any phrase list with at least one tokenizable entry:
    normalization is idempotent (on the joined forms), order-preserving
    on first occurrences, and duplicate-free."""
    from ccm_spark.pipeline.filters import normalize_phrases

    tokenizable = [p for p in raw if any(ch not in " \t" for ch in p)]
    if len(tokenizable) < len(raw):
        # lists containing whitespace-only phrases must be rejected
        import pytest

        with pytest.raises(ValueError):
            normalize_phrases(raw)
        return
    out = normalize_phrases(raw)
    joined = [" ".join(t) for t in out]
    assert len(set(joined)) == len(joined)  # no duplicates survive
    assert normalize_phrases(joined) == out  # idempotent
    # every output is some input's tokenization, in first-seen order
    seen = []
    for p in raw:
        key = " ".join(w for w in p.lower().split() if w)
        if key and key not in seen:
            seen.append(key)
    assert joined == seen


@given(st.text(max_size=400), st.integers(min_value=1, max_value=9))
def test_compression_ratio_kernel_properties(text, level):
    """Deterministic, guard at empty, ratio consistent with stdlib."""
    import zlib

    from ccm_spark.pipeline.filters import py_compression_ratio

    a = py_compression_ratio(text, level)
    assert a == py_compression_ratio(text, level)
    nb, nc, ratio = a
    b = (text or "").encode("utf-8")
    assert nb == len(b)
    assert nc == len(zlib.compress(b, level))
    if nb == 0:
        assert ratio == 0.0
    else:
        assert ratio == nc / nb
