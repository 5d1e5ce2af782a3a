"""Substring-level dedup: shared_span_pairs vs a brute-force
longest-common-run oracle over the same positional shingle sequences.

The fixture is built so document-level families CANNOT catch it: two long
documents sharing one verbatim 24-token span, with overall Jaccard far
below any dedup threshold — plus a periodic-repeat case and a no-span
control pair.
"""

from __future__ import annotations

import hashlib

from ccm_spark.functions.hashing import py_tokens
from ccm_spark.pipeline.dedup import SHINGLE_WIDTH, shared_span_pairs

P31 = 2_147_483_647


def _shingle_seq(text: str, width: int) -> list[int]:
    toks = py_tokens(text)
    return [
        int(hashlib.md5(" ".join(toks[i : i + width]).encode()).hexdigest()[:15], 16)
        % P31
        for i in range(max(0, len(toks) - width + 1))
    ]


def _brute_runs(a: list[int], b: list[int], min_run: int):
    """All maximal runs of consecutive matches per alignment diagonal."""
    runs = []
    for diag in range(-len(b) + 1, len(a)):
        i = max(0, diag)
        run = 0
        while i < len(a) and i - diag < len(b):
            if a[i] == b[i - diag]:
                run += 1
            else:
                if run >= min_run:
                    runs.append(run)
                run = 0
            i += 1
        if run >= min_run:
            runs.append(run)
    return runs


def _words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


SHARED = _words("shared", 24)
DOCS = [
    # pair (1,2): same 24-token span inside distinct 80-token docs
    (1, _words("alpha", 40) + " " + SHARED + " " + _words("omega", 40)),
    (2, _words("beta", 55) + " " + SHARED + " " + _words("gamma", 25)),
    # 3: control — no long overlap with anyone
    (3, _words("delta", 90)),
    # pair (4,5): the shared span occurs TWICE in doc 4 (periodic text)
    (4, SHARED + " " + _words("mid", 30) + " " + SHARED),
    (5, _words("eta", 20) + " " + SHARED + " " + _words("theta", 20)),
]


def test_shared_span_pairs_matches_bruteforce(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    min_run = 8
    got = {
        (r.doc_a, r.doc_b): (r.max_run, r.span_tokens, r.n_spans)
        for r in shared_span_pairs(docs, min_run=min_run).collect()
    }

    seqs = {d: _shingle_seq(t, SHINGLE_WIDTH) for d, t in DOCS}
    want = {}
    ids = sorted(seqs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            runs = _brute_runs(seqs[a], seqs[b], min_run)
            if runs:
                want[(a, b)] = (max(runs), max(runs) + SHINGLE_WIDTH - 1, len(runs))

    assert got == want
    # the scenario the document-level families miss is actually present:
    assert (1, 2) in got and got[(1, 2)][0] >= 20
    # periodic repeat in doc 4 yields two qualifying spans against doc 5
    assert got[(4, 5)][2] == 2
    # the control doc pairs with nobody
    assert not any(3 in pair for pair in got)


def test_shared_span_pairs_respects_min_run(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    # a min_run longer than the shared span: nothing qualifies
    n_shingles = 24 - SHINGLE_WIDTH + 1  # shingles inside SHARED alone
    out = shared_span_pairs(docs, min_run=n_shingles + 10).collect()
    assert out == []
