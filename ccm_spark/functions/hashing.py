"""Cross-engine deterministic scalar functions (hashing, tokenisation).

Spark's ``xxhash64``/``hash`` and DuckDB's ``hash`` are different functions,
so every operator whose results must hash-match across engines (dedup,
minhash, simhash, fingerprinting) derives integers from ``md5`` hex digests,
which both engines compute identically: the first 15 hex chars (60 bits)
parsed as a BIGINT. Spark: ``conv(substr(md5(s),1,15),16,10)``; DuckDB:
``CAST('0x' || substr(md5(s),1,15) AS BIGINT)``.

Tokenisation is a lowercase whitespace split with empties dropped — the one
tokenizer both engines' regex dialects agree on.

Case-mapping caveat (measured, not assumed): Spark and Python lower() do
FULL Unicode case mapping (U+0130 'İ' -> 'i' + combining dot, Greek final
sigma), DuckDB's utf8proc does SIMPLE mapping ('İ' -> 'i', 'Σ' -> 'σ'
always). Cross-engine token parity is therefore guaranteed only for text
whose cased characters have simple 1:1 mappings — all ASCII and almost all
scripts; known divergent inputs are U+0130 and word-final 'Σ'. The
property test pins parity over the guaranteed domain; a corpus carrying
such characters needs a case-fold preprocessing step before the DuckDB
oracle can replay it.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column

M61 = 2_305_843_009_213_693_951  # 2^61 - 1, Mersenne prime for mixing
P31 = 2_147_483_647  # 2^31 - 1

# THE whitespace class, written out explicitly because the engines' \s
# shorthands disagree: Java \s includes \x0b (vertical tab), DuckDB's RE2
# \s does NOT, and Python's \s additionally eats unicode spaces. A
# hypothesis sweep found the \x0b divergence (test_properties.py); every
# tokenizer below uses this literal class so all three engines split
# identically on any input.
WS_CLASS = "[ \\t\\n\\x0b\\f\\r]"
# compiled from THE class so the two can never drift (the escape syntax is
# shared by Python re, Java regex, and RE2)
_PY_WS = re.compile(WS_CLASS + "+")


def py_tokens(text: str | None) -> list[str]:
    """THE Python-side tokenizer: lowercase, explicit-whitespace split,
    empties dropped. Must stay semantically identical to :func:`tokens_col`
    (Spark) and :func:`sql_tokens` (DuckDB) — the hash-parity operators
    (shingles, simhash) assume the three agree token-for-token, so change
    them together or not at all."""
    if text is None:
        return []
    return [w for w in _PY_WS.split(text.lower()) if w]


def py_round_half_up(x: float, ndigits: int) -> float:
    """THE Python twin of Spark's ``F.round`` on doubles (and DuckDB's
    ``round``): both round the value's SHORTEST DECIMAL representation
    half-away-from-zero (JVM ``BigDecimal.valueOf`` goes through
    ``Double.toString``; DuckDB formats likewise), where Python's builtin
    ``round``/``np.round`` apply banker's rounding to the exact binary
    value. The three agree on generic reals but diverge on exact decimal
    ties (e.g. sums of 6-decimal weights times power-of-two count
    ratios — observed in the classifier margins), so any Arrow kernel
    whose rounded output is hash-compared cross-engine must round
    through THIS function, not the builtin. Pinned against DuckDB on
    20k randoms + known ties in tests/test_rounding.py."""
    import math as _math
    from decimal import ROUND_HALF_UP, Context, Decimal

    # +/-inf passes through like NaN does: Decimal.quantize raises
    # InvalidOperation on infinities, while the F.round / DuckDB round
    # semantics this twins simply propagate them — an inf reaching a
    # rounding kernel must not crash the task
    if _math.isinf(x):
        return x
    # explicit wide context: the default 28-digit context raises
    # InvalidOperation quantizing huge magnitudes (|x| ~ 1e300), where
    # rounding is a no-op for doubles anyway (no fractional part above
    # 2^53) — F.round passes them through and so must the twin
    return float(
        Decimal(repr(x)).quantize(
            Decimal(1).scaleb(-ndigits),
            rounding=ROUND_HALF_UP,
            context=Context(prec=400),
        )
    )


def np_round_half_up(arr, ndigits: int):
    """:func:`py_round_half_up` over a numpy array — for DRIVER-SIDE
    trainer artifacts (centroids, codebooks: at most a few thousand
    values), where ``np.round``'s binary banker's rounding could flip a
    decimal tie against the DuckDB replay and poison everything trained
    downstream. Deliberately a per-element Decimal loop: exactness over
    speed — large hash-compared relations should instead emit RAW
    doubles from their kernels and round at the query boundary with
    ``F.round`` (JVM shortest-decimal HALF_UP, codegen-fast, same rule).
    Pinned in tests/test_rounding.py."""
    import numpy as np

    a = np.asarray(arr, dtype=np.float64)
    out = np.fromiter(
        (py_round_half_up(float(v), ndigits) for v in a.ravel()),
        dtype=np.float64,
        count=a.size,
    )
    return out.reshape(a.shape)


_PY_NONWS = re.compile("[^ \\t\\n\\x0b\\f\\r]+")


def py_token_spans(text: str | None) -> list[tuple[int, int]]:
    """Character (start, end) offsets of each token in the ORIGINAL text.

    The i-th span is the i-th token of :func:`py_tokens`: lowercasing
    never maps a character into or out of the ASCII whitespace class
    (WS_CLASS), so whitespace structure — and therefore token count and
    order — is identical on the original and lowered text even when
    ``str.lower()`` changes a token's length. Used by byte-faithful text
    surgery (span removal) that must cut the user's original text, not a
    normalised reconstruction."""
    if text is None:
        return []
    return [(m.start(), m.end()) for m in _PY_NONWS.finditer(text)]


def md5_long(col: Column | str) -> Column:
    """60-bit integer from md5 — identical in Spark and DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_md5_long(expr: str) -> str:
    """DuckDB SQL for the same 60-bit md5 integer."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def tokens_col(text_col: Column | str) -> Column:
    """Lowercased whitespace tokens, empties removed.

    Python mirror: :func:`py_tokens` (this module) — the UDF-side
    operators (shingles, simhash) depend on the tokenizers agreeing
    token-for-token; change them together."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(c), WS_CLASS + "+"), lambda t: t != "")


def sql_tokens(expr: str) -> str:
    """DuckDB equivalent of :func:`tokens_col`."""
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), '{WS_CLASS}+'), t -> t != '')"
    )


def splitmix64(x: int) -> int:
    """Scalar splitmix64 finalizer (Steele et al., public domain) — full
    avalanche over a 64-bit input, pure Python ints. The driver-side twin
    of the vectorised mix in :func:`bloom_positions`; used where a
    sequence of draws keyed on (seed, k) must be decorrelated in k (an
    LCG applied to consecutive k values is affine in k, so raw draws form
    an arithmetic progression modulo the reduction span)."""
    mask = 0xFFFFFFFFFFFFFFFF
    x = (x + 0x9E3779B97F4A7C15) & mask
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & mask
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & mask
    return x ^ (x >> 31)


def bloom_positions(hashes, n_hashes: int, log2_m: int):
    """(n, n_hashes) Bloom-filter bit positions for int64 hash values.

    A splitmix64 finalizer over ``hash + (i+1)*golden`` per probe — the
    standard avalanche mix (public domain, Steele et al. "Fast Splittable
    PRNGs"), vectorised in numpy. Engine-internal (never replayed in SQL):
    the Bloom operators' correctness contract is no-false-negatives +
    exact verify, not cross-engine hash parity, so the mix only needs to
    be deterministic and well-spread. Returns uint64 positions in
    [0, 2**log2_m). Lives in this module (not vector_udfs) because UDF
    closures must reference executor-importable modules only — importing
    vector_udfs on an executor re-runs its pandas_udf decorators.
    """
    import numpy as np

    mask = np.uint64((1 << log2_m) - 1)
    h = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
    out = np.empty((h.shape[0], n_hashes), dtype=np.uint64)
    golden = 0x9E3779B97F4A7C15
    for i in range(n_hashes):
        # the per-probe offset wraps in Python-int space (numpy scalar
        # uint64 multiply warns on intended overflow)
        x = h + np.uint64(((i + 1) * golden) & 0xFFFFFFFFFFFFFFFF)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
        out[:, i] = x & mask
    return out


def py_hashed_features(tokens: list[str], log2_f: int, bigrams: bool = True):
    """Hashing-trick feature indices for a token list: md5-derived 60-bit
    integers of each unigram (and each space-joined bigram) reduced mod
    2**log2_f. The Python mirror of the engine's md5 hashing (same 15-hex
    parse as :func:`md5_long`), so feature identity is reproducible
    anywhere. Returns an int64 numpy array, one index per feature
    occurrence (with multiplicity — term frequency is the caller's
    pooling choice)."""
    import hashlib

    import numpy as np

    mask = (1 << log2_f) - 1
    feats = list(tokens)
    if bigrams:
        feats += [a + " " + b for a, b in zip(tokens, tokens[1:])]
    return np.array(
        [
            int(hashlib.md5(f.encode("utf-8")).hexdigest()[:15], 16) & mask
            for f in feats
        ],
        dtype=np.int64,
    )


def py_wordpiece(word: str, vocab: dict, unk_id: int = 0, max_piece: int = 32):
    """Greedy longest-match-first wordpiece segmentation of ONE whitespace
    word (the BERT-style serving algorithm): repeatedly take the longest
    vocab piece matching at the cursor — continuation pieces are looked up
    with a '##' prefix — and emit ``unk_id`` for the WHOLE word if any
    position has no match. Pure function of (word, vocab); the Spark UDF
    and tests share it."""
    ids = []
    pos = 0
    n = len(word)
    first = True
    while pos < n:
        end = min(n, pos + max_piece)
        piece_id = None
        while end > pos:
            piece = word[pos:end] if first else "##" + word[pos:end]
            if piece in vocab:
                piece_id = vocab[piece]
                break
            end -= 1
        if piece_id is None:
            return [unk_id]
        ids.append(piece_id)
        pos = end
        first = False
    return ids
