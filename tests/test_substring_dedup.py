"""Substring-level dedup: shared_span_pairs vs a brute-force
longest-common-run oracle over the same positional shingle sequences.

The fixture is built so document-level families CANNOT catch it: two long
documents sharing one verbatim 24-token span, with overall Jaccard far
below any dedup threshold — plus a periodic-repeat case and a no-span
control pair.
"""

from __future__ import annotations

import hashlib
import re

from ccm_spark.functions.hashing import py_tokens
from ccm_spark.pipeline.dedup import (
    SHINGLE_WIDTH,
    remove_shared_spans,
    shared_span_pairs,
)

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


# --- remove_shared_spans: independent brute-force cut oracle ---------------

_NONWS = re.compile(r"[^ \t\n\x0b\f\r]+")


def _brute_runs_pos(a: list[int], b: list[int], min_run: int):
    """Maximal qualifying runs as (start_in_b, run_len) per diagonal."""
    runs = []
    for diag in range(-len(b) + 1, len(a)):
        i = max(0, diag)
        run = 0
        while i < len(a) and i - diag < len(b):
            if a[i] == b[i - diag]:
                run += 1
            else:
                if run >= min_run:
                    runs.append((i - diag - run, run))
                run = 0
            i += 1
        if run >= min_run:
            runs.append((i - diag - run, run))
    return runs


def _brute_cut(text: str, cut_positions: set[int]) -> str:
    """Delete each maximal run of cut token positions from the run's first
    token start to the next kept token's start (end of string for a
    trailing run)."""
    spans = [(m.start(), m.end()) for m in _NONWS.finditer(text)]
    pos = sorted(p for p in cut_positions if 0 <= p < len(spans))
    pieces, prev, i = [], 0, 0
    while i < len(pos):
        j = i
        while j + 1 < len(pos) and pos[j + 1] == pos[j] + 1:
            j += 1
        start = spans[pos[i]][0]
        end = spans[pos[j] + 1][0] if pos[j] + 1 < len(spans) else len(text)
        pieces.append(text[prev:start])
        prev = end
        i = j + 1
    pieces.append(text[prev:])
    return "".join(pieces)


def test_remove_shared_spans_matches_bruteforce(spark):
    # add a sub-shingle-width doc: must pass through verbatim
    docs_rows = DOCS + [(6, "tiny doc")]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    min_run = 8
    got = {
        r.doc_id: (r.text, r.n_tokens_removed)
        for r in remove_shared_spans(docs, min_run=min_run).collect()
    }

    seqs = {d: _shingle_seq(t, SHINGLE_WIDTH) for d, t in docs_rows}
    cuts: dict[int, set[int]] = {d: set() for d, _ in docs_rows}
    ids = sorted(seqs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            for start_b, run_len in _brute_runs_pos(seqs[a], seqs[b], min_run):
                cuts[b].update(
                    range(start_b, start_b + run_len + SHINGLE_WIDTH - 1)
                )
    want = {
        d: (_brute_cut(t, cuts[d]), len(cuts[d])) for d, t in docs_rows
    }

    assert got == want
    # untouched docs pass through byte-identically
    assert got[1][0] == docs_rows[0][1] and got[1][1] == 0
    assert got[3][0] == DOCS[2][1]
    assert got[6] == ("tiny doc", 0)
    # exactly ONE occurrence of the shared span survives corpus-wide
    survivors = sum(t.count("shared0 shared1") for t, _ in got.values())
    assert survivors == 1 and "shared0" in got[1][0]
    # the cut is real: doc 2 lost exactly the 24 span tokens
    assert got[2][1] == 24
    assert "shared0" not in got[2][0]
    # everything outside the cut is byte-faithful (case/punct preserved):
    # doc 2 = its beta prefix + single space + gamma suffix
    assert got[2][0] == _words("beta", 55) + " " + _words("gamma", 25)


# ---------------------------------------------------------- exact refinement

def _brute_token_runs(ta: str, tb: str, min_tokens: int):
    """Independent oracle for shared_span_pairs_exact: maximal common token
    runs with char offsets, straight O(diagonals x length) scan."""
    A = [m.group().lower() for m in re.finditer(r"[^ \t\n\x0b\f\r]+", ta)]
    B = [m.group().lower() for m in re.finditer(r"[^ \t\n\x0b\f\r]+", tb)]
    sa = [(m.start(), m.end()) for m in re.finditer(r"[^ \t\n\x0b\f\r]+", ta)]
    sb = [(m.start(), m.end()) for m in re.finditer(r"[^ \t\n\x0b\f\r]+", tb)]
    out = []

    def emit(end_i, d, run):
        i0, j0 = end_i - run, end_i - run - d
        out.append(
            (run, sa[i0][0], sa[i0 + run - 1][1], sb[j0][0], sb[j0 + run - 1][1])
        )

    for d in range(-len(B) + 1, len(A)):
        i, run = max(0, d), 0
        while i < len(A) and i - d < len(B):
            if A[i] == B[i - d]:
                run += 1
            else:
                if run >= min_tokens:
                    emit(i, d, run)
                run = 0
            i += 1
        if run >= min_tokens:
            emit(i, d, run)
    return sorted(out)


def test_shared_span_pairs_exact_matches_bruteforce(spark):
    """Every emitted span must equal the brute-force token alignment —
    offsets, lengths, and the doc_a-verbatim span text."""
    from ccm_spark.pipeline.dedup import shared_span_pairs_exact

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    min_run = 8
    min_tokens = min_run + SHINGLE_WIDTH - 1
    rows = shared_span_pairs_exact(docs, min_run=min_run).collect()
    texts = dict(DOCS)
    by_pair = {}
    for r in rows:
        assert r.span_text == texts[r.doc_a][r.a_start:r.a_end]
        # the two sides hold the same tokens (case/ws-insensitive match)
        assert (
            py_tokens(r.span_text)
            == py_tokens(texts[r.doc_b][r.b_start:r.b_end])
        )
        by_pair.setdefault((r.doc_a, r.doc_b), []).append(
            (r.span_tokens, r.a_start, r.a_end, r.b_start, r.b_end)
        )
    for (a, b), got in by_pair.items():
        assert sorted(got) == _brute_token_runs(texts[a], texts[b], min_tokens)
    # the control doc shares no span with anyone
    assert all(3 not in pair for pair in by_pair)
    # pair (4,5): the periodic doc matches the span at BOTH positions
    assert len(by_pair[(4, 5)]) == 2


def test_shared_span_pairs_exact_recovers_df_hot_span(spark):
    """The df-hot blind spot: a span whose MIDDLE is boilerplate hot
    enough to be df-capped splits (or vanishes) in the shingle detector,
    but the exact pass — seeded by the span's rare edges — recovers the
    FULL span with exact offsets."""
    from ccm_spark.pipeline.dedup import shared_span_pairs, shared_span_pairs_exact

    hot = _words("hot", 12)  # the boilerplate middle, shared by many docs
    span = _words("rare", 6) + " " + hot + " " + _words("edge", 6)
    fixture = [
        (101, _words("pre", 30) + " " + span + " " + _words("post", 30)),
        (102, _words("left", 25) + " " + span + " " + _words("right", 35)),
        # 10 unrelated docs carrying ONLY the hot middle -> its shingles
        # exceed max_doc_freq=3 and are excluded from detection
        *[(200 + i, _words(f"f{i}", 20) + " " + hot) for i in range(10)],
    ]
    docs = spark.createDataFrame(fixture, "doc_id long, text string")
    min_run = 8
    min_tokens = min_run + SHINGLE_WIDTH - 1  # 10
    # shingle-level detector: hot middle capped away -> no run of >= 8
    # consecutive sub-cap shingles survives for the pair
    got_shingle = {
        (r.doc_a, r.doc_b)
        for r in shared_span_pairs(docs, min_run=min_run, max_doc_freq=3).collect()
    }
    assert (101, 102) not in got_shingle
    # exact pass: seeded by the rare edges, the WHOLE span comes back
    rows = [
        r
        for r in shared_span_pairs_exact(
            docs, min_run=min_run, max_doc_freq=3
        ).collect()
        if (r.doc_a, r.doc_b) == (101, 102)
    ]
    texts = dict(fixture)
    want = _brute_token_runs(texts[101], texts[102], min_tokens)
    assert sorted(
        (r.span_tokens, r.a_start, r.a_end, r.b_start, r.b_end) for r in rows
    ) == want
    full = max(rows, key=lambda r: r.span_tokens)
    assert full.span_tokens == 24  # rare6 + hot12 + edge6, nothing split
    assert full.span_text == span
