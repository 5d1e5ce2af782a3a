"""Vocabulary-based subword tokenization — the tokenize step of an LLM
training pipeline, as a serving-path operator.

Real pipelines train a tokenizer offline and APPLY it at corpus scale;
this module is that apply step: a greedy longest-match wordpiece
segmenter (the BERT-family serving algorithm — public domain knowledge,
Wu et al. 2016) whose vocabulary ships once per executor as a Spark
broadcast and runs in one narrow Arrow pass — no shuffle, identical on a
streaming source. :func:`build_wordpiece_vocab` derives a deterministic
demo vocabulary from the corpus itself (top words + suffix pieces +
character fallback) so the operator is runnable and testable without an
external artifact; production callers pass their trained vocab dict.

The reference engine has no text surface at all (SURVEY.md §2.1); the
greedy-merge loop is inherently sequential per WORD, so it belongs in an
Arrow kernel (`mapInPandas`), not SQL — there is deliberately no DuckDB
oracle here; the segmentation is pinned against the shared pure-Python
function instead (`tests/test_tokenize.py`).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ccm_spark.functions.partitioning import spread

UNK_ID = 0

TOKENIZED_SCHEMA = (
    "doc_id long, token_ids array<int>, n_words long, n_pieces long, "
    "n_oov_words long, oov_frac double"
)


def build_wordpiece_vocab(
    docs: DataFrame, size: int = 2000, charset: str = "abcdefghijklmnopqrstuvwxyz0123456789'"
) -> dict:
    """Deterministic demo vocabulary: the corpus's top-``size`` whole
    words (via the two-phase :func:`~ccm_spark.pipeline.text.vocab_topk`),
    plus every charset character as BOTH a word-initial and a '##'
    continuation piece so any in-charset word decomposes (true OOV only
    for out-of-charset characters). Ids are assigned by sorted piece
    string, starting at 1 (0 = unk) — a pure function of the piece set,
    so the same corpus yields the same vocab on any cluster. NOTE: runs
    the top-k aggregation eagerly (one Spark job); the collected vocab is
    bounded by ``size`` + 2*len(charset)."""
    from ccm_spark.pipeline.text import vocab_topk

    words = [r.token for r in vocab_topk(docs, k=size).collect()]
    pieces = set(words)
    for ch in charset:
        pieces.add(ch)
        pieces.add("##" + ch)
    return {p: i + 1 for i, p in enumerate(sorted(pieces))}


def tokenize_docs(docs: DataFrame, vocab: dict) -> DataFrame:
    """(doc_id, token_ids, n_words, n_pieces, n_oov_words, oov_frac):
    greedy wordpiece
    ids per document. The vocab dict broadcasts once per executor; the
    pass is narrow (streaming-safe) and Arrow-batched, with the
    per-word greedy loop in :func:`ccm_spark.functions.hashing.py_wordpiece`
    — the same function the tests replay driver-side."""
    import pandas as pd

    bc = docs.sparkSession.sparkContext.broadcast(dict(vocab))

    def run(batches):
        from ccm_spark.functions.hashing import py_tokens, py_wordpiece

        v = bc.value
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = py_tokens(text)
                ids: list[int] = []
                n_oov = 0
                for w in words:
                    piece_ids = py_wordpiece(w, v, UNK_ID)
                    if piece_ids == [UNK_ID]:
                        n_oov += 1
                    ids.extend(piece_ids)
                out.append(
                    (
                        int(doc_id),
                        ids,
                        len(words),
                        len(ids),
                        n_oov,
                        round(n_oov / len(words), 6) if words else 0.0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "token_ids", "n_words", "n_pieces",
                    "n_oov_words", "oov_frac",
                ],
            )

    src = docs if docs.isStreaming else spread(docs, "doc_id")
    return src.select("doc_id", "text").mapInPandas(run, TOKENIZED_SCHEMA)


def detokenize_docs(tokenized: DataFrame, vocab: dict) -> DataFrame:
    """(doc_id, text): the inverse pass for shard AUDITING — ids back to
    pieces (the reversed vocab broadcasts once), '##' continuations
    merged into their word, words joined by single spaces, unknown ids
    rendered '[UNK]'. Round-trips :func:`tokenize_docs` exactly on
    whitespace-normalised lowercase text whenever ``oov_frac == 0``
    (test-pinned) — the check a training job runs on a sample of every
    shard before burning compute on it. Narrow, Arrow-batched,
    streaming-safe like the forward pass."""
    import pandas as pd

    rev = {i: p for p, i in dict(vocab).items()}
    bc = tokenized.sparkSession.sparkContext.broadcast(rev)

    def run(batches):
        r = bc.value
        for pdf in batches:
            out = []
            for doc_id, ids in zip(pdf["doc_id"], pdf["token_ids"]):
                words: list[str] = []
                for i in ids:
                    piece = r.get(int(i), "[UNK]")
                    if piece.startswith("##") and words:
                        words[-1] += piece[2:]
                    else:
                        words.append(piece)
                out.append((int(doc_id), " ".join(words)))
            yield pd.DataFrame(out, columns=["doc_id", "text"])

    return tokenized.select("doc_id", "token_ids").mapInPandas(
        run, "doc_id long, text string"
    )


CHUNKED_SCHEMA = (
    "doc_id long, chunk_idx long, chunk_text string, n_tokens long, "
    "char_start long, char_end long"
)


def chunk_docs(
    docs: DataFrame, max_tokens: int = 128, overlap: int = 16
) -> DataFrame:
    """Split long documents into token-bounded chunks with overlap — the
    pretraining/RAG chunker: each chunk holds at most ``max_tokens``
    whitespace tokens, consecutive chunks share ``overlap`` tokens, and
    ``chunk_text`` is a byte-faithful slice of the ORIGINAL text (cut at
    token boundaries via the shared span tokenizer, never re-joined from
    normalised tokens — the
    :func:`~ccm_spark.functions.hashing.py_token_spans` guarantee).
    Emits (doc_id, chunk_idx, chunk_text, n_tokens, char_start,
    char_end); token-less docs produce no chunks, docs at or under the
    budget produce exactly one.

    One narrow Arrow pass (streaming-safe); the fan-out is a per-row
    explode, so output rows ~ corpus_tokens / (max_tokens - overlap) —
    no shuffle at any scale.
    """
    import pandas as pd

    if max_tokens < 1 or not 0 <= overlap < max_tokens:
        raise ValueError(
            f"chunk_docs: need max_tokens >= 1 and 0 <= overlap < "
            f"max_tokens (got {max_tokens}, {overlap})"
        )
    stride = max_tokens - overlap

    def run(batches):
        from ccm_spark.functions.hashing import py_token_spans

        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                spans = py_token_spans(text)
                n = len(spans)
                if n == 0:
                    continue
                idx = 0
                start_tok = 0
                while True:
                    end_tok = min(n, start_tok + max_tokens)
                    cs = spans[start_tok][0]
                    ce = spans[end_tok - 1][1]
                    out.append(
                        (
                            int(doc_id),
                            idx,
                            text[cs:ce],
                            end_tok - start_tok,
                            cs,
                            ce,
                        )
                    )
                    if end_tok >= n:
                        break
                    idx += 1
                    start_tok += stride
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "chunk_idx",
                    "chunk_text",
                    "n_tokens",
                    "char_start",
                    "char_end",
                ],
            )

    src = docs if docs.isStreaming else spread(docs, "doc_id")
    return src.select("doc_id", "text").mapInPandas(run, CHUNKED_SCHEMA)


def train_bpe(
    docs: DataFrame,
    n_merges: int = 1000,
    max_words: int = 1_000_000,
    end_marker: str = "</w>",
    overflow: str = "error",
) -> dict:
    """Train a byte-pair-encoding merge table on the corpus — the
    TRAINING half of subword tokenization (Sennrich et al. 2016),
    complementing the wordpiece APPLY path above.

    The industry-standard scale trick (HF tokenizers do the same):
    BPE statistics depend only on the WORD HISTOGRAM, not on word order
    or document boundaries — so the distributed part is ONE
    map-side-combined word count, and the merge loop runs driver-side
    over that bounded histogram (each merge touches only the words
    containing its pair, tracked by an index). The corpus is read once
    however many merges are trained.

    Determinism: merge choice = (count desc, pair lexicographic asc);
    the histogram itself is exact integer counts. The word-count collect
    is guarded like every bounded-artifact trainer: a distributed count
    runs first, and a corpus with more than ``max_words`` DISTINCT words
    either raises with the fix (``overflow="error"``, the default) or —
    the 100 TB path — keeps only the top ``max_words`` words by
    (count desc, word asc) via a distributed TakeOrdered
    (``overflow="truncate"``), so the driver-side training set stays
    bounded no matter how large the corpus tail is. Truncation is a
    FREQUENCY FLOOR: every dropped word is rarer than every kept word,
    so a merge statistics error is bounded by the dropped token mass,
    reported as ``1 - coverage`` (standard practice — production BPE
    trainers train on capped/pruned histograms for the same reason).

    Returns {"merges": [(a, b), ...] in training order,
    "vocab": {piece: rank}, "end_marker": ...,
    "coverage": kept-token-mass fraction (1.0 when nothing dropped)} —
    feed to :func:`bpe_encode`.
    """
    from ccm_spark.functions.hashing import tokens_col

    if n_merges < 1:
        raise ValueError(f"train_bpe: n_merges must be >= 1, got {n_merges}")
    if overflow not in ("error", "truncate"):
        raise ValueError(
            f"train_bpe: overflow must be 'error' or 'truncate', got {overflow!r}"
        )
    wc = (
        docs.select(F.explode(tokens_col("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        # persisted: the guard count and the collect otherwise each pay
        # a full corpus scan + shuffle (train_unigram's wh discipline)
        .persist()
    )
    n_distinct = wc.count()
    if n_distinct == 0:
        wc.unpersist()
        raise ValueError("train_bpe: corpus has no tokens")
    coverage = 1.0
    if n_distinct > max_words:
        if overflow == "error":
            wc.unpersist()
            raise ValueError(
                f"train_bpe: corpus has {n_distinct} distinct words > max_words="
                f"{max_words}; raise the cap (the histogram is the driver-side "
                "training set), pre-filter rare words upstream, or pass "
                "overflow='truncate' for the frequency-floor top-max_words "
                "histogram"
            )
        # distributed TakeOrdered: only max_words rows ever leave the
        # executors; ties at the floor break on word asc so the kept
        # set is a pure function of the corpus
        total = wc.agg(F.sum("n").alias("t")).collect()[0].t
        rows = wc.orderBy(F.col("n").desc(), F.col("w").asc()).limit(max_words).collect()
        coverage = float(sum(int(r.n) for r in rows)) / float(total)
    else:
        rows = wc.collect()
    wc.unpersist()
    # word -> (symbol tuple, count); end marker closes the last symbol so
    # merges cannot cross word boundaries when decoded
    words: dict[int, tuple[tuple[str, ...], int]] = {}
    for i, r in enumerate(sorted(rows, key=lambda r: r.w)):
        words[i] = (tuple(r.w) + (end_marker,), int(r.n))
    merges = _train_merges(words, n_merges)
    vocab_set: set[str] = set()
    for syms, _ in words.values():
        vocab_set.update(syms)
    return {
        "merges": merges,
        "vocab": {p: i for i, p in enumerate(sorted(vocab_set))},
        "end_marker": end_marker,
        "coverage": coverage,
    }


def _train_merges(
    words: dict[int, tuple[tuple[str, ...], int]], n_merges: int
) -> list[tuple[str, str]]:
    """The pure driver-side BPE merge loop over a word histogram
    (mutates ``words`` in place to the post-merge symbol sequences).
    Split out so the heap bookkeeping can be pinned against a naive
    rescan oracle without a Spark relation in the loop."""
    import heapq

    stats: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[int]] = {}
    heap: list[tuple[int, tuple[str, str]]] = []

    def bump(pair: tuple[str, str], delta: int, wid: int | None) -> None:
        c = stats.get(pair, 0) + delta
        if c <= 0:
            stats.pop(pair, None)
        else:
            stats[pair] = c
            # push on EVERY move, decrements included: lazy invalidation
            # only works if the heap always holds an entry at the live
            # count — a pair whose count only ever decreased would
            # otherwise become unselectable (its stale higher-count
            # entries never match) and merges would diverge from the
            # (count desc, pair asc) rule
            heapq.heappush(heap, (-c, pair))
        if wid is not None:
            if delta > 0:
                index.setdefault(pair, set()).add(wid)
            else:
                index.get(pair, set()).discard(wid)

    for wid, (syms, n) in words.items():
        for a, b in zip(syms, syms[1:]):
            bump((a, b), n, wid)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        # lazy-invalidation max-heap: entries go stale when counts move;
        # pop until the top matches the live count (ties break
        # lexicographic via the tuple ordering of equal -count entries)
        best = None
        while heap:
            c, pair = heap[0]
            if stats.get(pair) == -c:
                best = pair
                break
            heapq.heappop(heap)
        if best is None or stats[best] < 2:
            break  # nothing left worth merging
        merges.append(best)
        new_sym = best[0] + best[1]
        for wid in list(index.get(best, ())):
            syms, n = words[wid]
            # retract the word's old pairs, rewrite, re-add the new ones
            for a, b in zip(syms, syms[1:]):
                bump((a, b), -n, wid)
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = tuple(out)
            words[wid] = (syms, n)
            for a, b in zip(syms, syms[1:]):
                bump((a, b), n, wid)
    return merges


def py_bpe_encode(word: str, merges_rank: dict, end_marker: str) -> list[str]:
    """Pure-Python BPE segmentation of one word — lowest-rank merge
    first, the canonical apply algorithm; shared by the Arrow kernel and
    the tests' driver replay so the two are identical by construction."""
    syms = list(word) + [end_marker]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = merges_rank.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(docs: DataFrame, model: dict) -> DataFrame:
    """(doc_id, pieces, n_pieces): every document segmented by the
    trained merge table — one narrow Arrow pass with the model in the
    closure (merge tables are KBs), no shuffle, streaming-safe like
    tokenize_docs. Token-less docs emit empty arrays."""
    import pandas as pd

    merges_rank = {tuple(m): i for i, m in enumerate(model["merges"])}
    end_marker = model["end_marker"]

    vocab = model["vocab"]

    def run(batches):
        from ccm_spark.functions.hashing import py_tokens
        from ccm_spark.pipeline.tokenize import py_bpe_encode

        for pdf in batches:
            pieces_out, ids_out, n_out = [], [], []
            for text in pdf["text"]:
                pieces: list[str] = []
                for w in py_tokens(text):
                    pieces.extend(py_bpe_encode(w, merges_rank, end_marker))
                pieces_out.append(pieces)
                # -1 marks a piece outside the trained vocab (an unseen
                # character survives as its own symbol) — the trainer
                # hand-off can count/replace these explicitly
                ids_out.append([vocab.get(p, -1) for p in pieces])
                n_out.append(len(pieces))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pieces": pieces_out,
                    "piece_ids": ids_out,
                    "n_pieces": pd.Series(n_out, dtype="int64"),
                }
            )

    out = docs.select("doc_id", "text")
    if not docs.isStreaming:
        out = spread(out, "doc_id")
    return out.mapInPandas(
        run, "doc_id long, pieces array<string>, piece_ids array<int>, n_pieces long"
    )


# ------------------------------------------------ unigram LM (Kudo 2018)

#: ec values are float sums aggregated distributed; rounding before any
#: rank/prune decision absorbs partitioning-order float drift (the
#: kmeans/PQ trainers' 6-decimal discipline)
UNIGRAM_EC_ROUND = 6
#: per-character log-penalty for vocabulary fallback at encode time
UNIGRAM_UNK_LOGP = -20.0


def py_unigram_expected_counts(
    word: str, n: int, logp: dict, max_piece_len: int
) -> tuple[dict, float]:
    """Forward-backward over one word's segmentation lattice: expected
    count of every piece under the current unigram LM, scaled by the
    word's corpus frequency ``n``; also returns the word's total
    log-likelihood contribution (n * log Z). Pure Python on a ≤~30-char
    lattice — shared by the Arrow E-step kernel and the tests' driver
    replay so the two are identical by construction. Unsegmentable
    words (an uncovered character) contribute nothing."""
    import math

    L = len(word)
    NEG = float("-inf")
    alpha = [NEG] * (L + 1)
    alpha[0] = 0.0
    spans: list[tuple[int, int, float]] = []
    for j in range(1, L + 1):
        terms = []
        for i in range(max(0, j - max_piece_len), j):
            lp = logp.get(word[i:j])
            if lp is not None and alpha[i] != NEG:
                spans.append((i, j, lp))
                terms.append(alpha[i] + lp)
        if terms:
            m = max(terms)
            alpha[j] = m + math.log(sum(math.exp(t - m) for t in terms))
    if alpha[L] == NEG:
        return {}, 0.0
    beta = [NEG] * (L + 1)
    beta[L] = 0.0
    for i in range(L - 1, -1, -1):
        terms = []
        for j in range(i + 1, min(L, i + max_piece_len) + 1):
            lp = logp.get(word[i:j])
            if lp is not None and beta[j] != NEG:
                terms.append(lp + beta[j])
        if terms:
            m = max(terms)
            beta[i] = m + math.log(sum(math.exp(t - m) for t in terms))
    z = alpha[L]
    ec: dict = {}
    for i, j, lp in spans:
        if beta[j] == NEG:
            continue
        piece = word[i:j]
        ec[piece] = ec.get(piece, 0.0) + math.exp(alpha[i] + lp + beta[j] - z) * n
    return ec, z * n


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 500,
    n_em_iters: int = 3,
    max_piece_len: int = 8,
    seed_multiplier: int = 4,
    max_seed_pieces: int = 1_000_000,
    overflow: str = "error",
) -> dict:
    """Train a unigram-LM subword vocabulary (SentencePiece's model;
    Kudo 2018) — the third tokenizer family next to wordpiece (apply)
    and BPE (merge-table training).

    Scale shape — one step FURTHER distributed than ``train_bpe``: the
    corpus is read once into the word histogram; seed candidates (all
    substrings ≤ ``max_piece_len``, scored count x length) come from a
    pure-codegen explode + two-phase top-k over that histogram; and
    every EM iteration is a mapInPandas forward-backward over the
    DISTRIBUTED histogram with the current piece table broadcast —
    map-side-combined inside the kernel, hash-aggregated, and only the
    vocab-sized expected-count relation ever reaches the driver. The
    driver holds piece tables, never words.

    Determinism: expected counts round at ``UNIGRAM_EC_ROUND`` decimals
    after the global sum (absorbing partition-order float drift), every
    rank/prune uses (value desc, piece asc), and single characters are
    never pruned (coverage guarantee). Same corpus + params =>
    bit-identical model on any partitioning.

    Bounded-artifact guard (``train_bpe``'s contract, mirrored r10):
    the seed collect is the trainer's one driver-side artifact, and
    while ``top`` is already capped at ``vocab_size *
    seed_multiplier``, the single-character union is alphabet-sized —
    unbounded on garbage-unicode corpora. A seed relation larger than
    ``max_seed_pieces`` either raises with the fix
    (``overflow="error"``, the default) or — the 100 TB path — keeps
    the top ``max_seed_pieces`` seed pieces by (count desc, piece asc)
    via a distributed TakeOrdered (``overflow="truncate"``), a
    frequency floor: every dropped piece is rarer than every kept one,
    the dropped mass is reported as ``1 - seed_coverage``, and — the
    one way this path relaxes the coverage guarantee — a dropped rare
    CHARACTER encodes as ``<unk>`` downstream (the alphabet itself is
    what overflowed).

    Returns ``{"pieces": {piece: [id, logp]}, "max_piece_len": ...,
    "seed_coverage": kept-seed-mass fraction (1.0 when nothing
    dropped)}`` with ids dense from 1 (0 = <unk>); feed to
    :func:`unigram_encode`.
    """
    import math

    from ccm_spark.functions.hashing import tokens_col

    if vocab_size < 1 or n_em_iters < 1 or max_piece_len < 1:
        raise ValueError(
            "train_unigram: vocab_size, n_em_iters, max_piece_len must be >= 1 "
            f"(got {vocab_size}, {n_em_iters}, {max_piece_len})"
        )
    if overflow not in ("error", "truncate"):
        raise ValueError(
            f"train_unigram: overflow must be 'error' or 'truncate', got {overflow!r}"
        )
    if max_seed_pieces < vocab_size:
        raise ValueError(
            f"train_unigram: max_seed_pieces ({max_seed_pieces}) must be >= "
            f"vocab_size ({vocab_size})"
        )
    wh = (
        docs.select(F.explode(tokens_col("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .persist()
    )
    if wh.count() == 0:
        wh.unpersist()
        raise ValueError("train_unigram: corpus has no tokens")

    # seed: every substring ≤ max_piece_len, weighted by word freq — a
    # codegen flatten/transform explode, no UDF; two-phase top-k via
    # TakeOrdered (bounded result, distributed sort)
    subs = (
        wh.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, length(w) - 1), i -> "
                    f"transform(sequence(1, least({max_piece_len}, length(w) - i)), "
                    "l -> substring(w, i + 1, l))))"
                )
            ).alias("piece"),
            F.col("n"),
        )
        .groupBy("piece")
        .agg(F.sum("n").alias("cnt"))
    )
    seed_k = vocab_size * seed_multiplier
    top = subs.orderBy(
        F.desc(F.col("cnt") * F.length("piece")), "piece"
    ).limit(seed_k)
    chars = subs.filter(F.length("piece") == 1)
    seed_rel = top.unionByName(chars).dropDuplicates(["piece"]).persist()
    seed_n = seed_rel.count()
    seed_coverage = 1.0
    if seed_n > max_seed_pieces:
        if overflow == "error":
            seed_rel.unpersist()
            raise ValueError(
                f"train_unigram: seed relation has {seed_n} pieces > "
                f"max_seed_pieces={max_seed_pieces} (the alphabet union is "
                "corpus-unbounded); raise the cap, pre-filter garbage "
                "characters upstream, or pass overflow='truncate' for the "
                "frequency-floor top-max_seed_pieces seed"
            )
        # distributed TakeOrdered frequency floor (train_bpe's rule):
        # only max_seed_pieces rows ever leave the executors; ties at
        # the floor break on piece asc so the kept set is a pure
        # function of the corpus
        seed_total = seed_rel.agg(F.sum("cnt").alias("t")).collect()[0].t
        seed_rows = (
            seed_rel.orderBy(F.col("cnt").desc(), F.col("piece").asc())
            .limit(max_seed_pieces)
            .collect()
        )
        seed_coverage = float(sum(int(r.cnt) for r in seed_rows)) / float(
            seed_total
        )
    else:
        seed_rows = seed_rel.collect()
    seed_rel.unpersist()

    total = float(sum(r.cnt for r in seed_rows))
    logp = {r.piece: math.log(r.cnt / total) for r in seed_rows}
    n_chars = sum(1 for p in logp if len(p) == 1)

    sc = docs.sparkSession.sparkContext
    ll_history: list[float] = []
    for it in range(n_em_iters):
        bc = sc.broadcast((logp, max_piece_len))

        def estep(batches):
            import pandas as pd

            from ccm_spark.pipeline.tokenize import py_unigram_expected_counts

            lp, mpl = bc.value
            agg: dict = {}
            ll = 0.0
            for pdf in batches:
                for w, n in zip(pdf["w"], pdf["n"]):
                    ec, wll = py_unigram_expected_counts(w, int(n), lp, mpl)
                    ll += wll
                    for p, v in ec.items():
                        agg[p] = agg.get(p, 0.0) + v
            agg[" ll "] = ll  # tokens are whitespace-split, so no real
            # piece can contain a space: the key cannot collide
            yield pd.DataFrame({"piece": list(agg), "ec": list(agg.values())})

        rows = (
            wh.mapInPandas(estep, "piece string, ec double")
            .groupBy("piece")
            .agg(F.round(F.sum("ec"), UNIGRAM_EC_ROUND).alias("ec"))
            .collect()
        )
        bc.destroy()
        ec = {r.piece: r.ec for r in rows}
        ll_history.append(ec.pop(" ll ", 0.0))

        # prune toward vocab_size geometrically; single chars immune
        n_now = len(ec)
        target = max(vocab_size, int(n_now * 0.75))
        if it == n_em_iters - 1:
            target = vocab_size
        floor = 10.0 ** -UNIGRAM_EC_ROUND
        # ec rounds at 6 decimals: a multi-char piece rounded to 0 is
        # dead weight (prune it outright); a single char rounded to 0
        # keeps the floor so coverage survives
        multi = sorted(
            ((p, v) for p, v in ec.items() if len(p) > 1 and v > 0),
            key=lambda kv: (-kv[1], kv[0]),
        )
        keep_multi = multi[: max(0, target - n_chars)]
        kept = {p: v for p, v in keep_multi}
        kept.update({p: max(v, floor) for p, v in ec.items() if len(p) == 1})
        # chars the EM round never saw (rare chars in uncovered words)
        for p in list(logp):
            if len(p) == 1 and p not in kept:
                kept[p] = floor
        tot = sum(kept.values())
        logp = {p: math.log(v / tot) for p, v in kept.items()}

    wh.unpersist()
    final = sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
    pieces = {p: [i + 1, lp] for i, (p, lp) in enumerate(final)}
    return {
        "pieces": pieces,
        "max_piece_len": max_piece_len,
        "ll_history": ll_history,
        "seed_coverage": seed_coverage,
    }


def py_unigram_encode(word: str, pieces: dict, max_piece_len: int) -> list[str]:
    """Viterbi segmentation of one word under the trained unigram LM —
    ties prefer the longer piece, then lexicographic; characters outside
    the vocabulary become single-char pieces at ``UNIGRAM_UNK_LOGP``
    (id 0 downstream). Shared by the Arrow kernel and the tests' driver
    replay."""
    L = len(word)
    NEG = float("-inf")
    best = [NEG] * (L + 1)
    back: list[tuple[int, str] | None] = [None] * (L + 1)
    best[0] = 0.0
    for j in range(1, L + 1):
        for i in range(max(0, j - max_piece_len), j):
            piece = word[i:j]
            ent = pieces.get(piece)
            lp = ent[1] if ent is not None else (
                UNIGRAM_UNK_LOGP if j - i == 1 else None
            )
            if lp is None or best[i] == NEG:
                continue
            s = best[i] + lp
            # strict > with i ascending => on ties the SMALLEST i
            # (longest piece) wins, matching the documented rule
            if s > best[j]:
                best[j] = s
                back[j] = (i, piece)
    out: list[str] = []
    j = L
    while j > 0:
        i, piece = back[j]
        out.append(piece)
        j = i
    out.reverse()
    return out


def unigram_encode(docs: DataFrame, model: dict) -> DataFrame:
    """(doc_id, pieces, piece_ids, n_pieces): every document segmented
    by the trained unigram LM — one narrow Arrow pass (model in the
    closure, KB-scale), no shuffle, streaming-safe; the same output
    contract as :func:`bpe_encode` so the shard writer takes either."""
    import pandas as pd

    pieces_tbl = model["pieces"]
    mpl = model["max_piece_len"]

    def run(batches):
        from ccm_spark.functions.hashing import py_tokens
        from ccm_spark.pipeline.tokenize import py_unigram_encode

        for pdf in batches:
            pieces_out, ids_out, n_out = [], [], []
            for text in pdf["text"]:
                ps: list[str] = []
                for w in py_tokens(text):
                    ps.extend(py_unigram_encode(w, pieces_tbl, mpl))
                pieces_out.append(ps)
                ids_out.append(
                    [pieces_tbl[p][0] if p in pieces_tbl else UNK_ID for p in ps]
                )
                n_out.append(len(ps))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pieces": pieces_out,
                    "piece_ids": ids_out,
                    "n_pieces": pd.Series(n_out, dtype="int64"),
                }
            )

    out = docs.select("doc_id", "text")
    if not docs.isStreaming:
        out = spread(out, "doc_id")
    return out.mapInPandas(
        run, "doc_id long, pieces array<string>, piece_ids array<int>, n_pieces long"
    )


def fertility_report(
    docs: DataFrame, vocab: dict, by: str | None = None
) -> DataFrame:
    """Tokenizer FERTILITY evaluation over a corpus — the standard
    metric for judging how well a (wordpiece) vocabulary fits a data
    mix (Rust et al. 2021, "How Good is Your Tokenizer?"): pieces per
    whitespace word (1.0 = every word is one piece), UTF-8 bytes per
    piece (compression the context window actually sees), and the OOV
    word fraction. One :func:`tokenize_docs` pass + one
    map-side-combined aggregate — per corpus, or per ``by`` group (e.g.
    ``source``/language) to find the slices a candidate vocabulary
    under-serves before committing a 100 TB tokenization run to it.

    Returns one row per group:
    (``by``?, n_docs, n_words, n_pieces, fertility, bytes_per_piece,
    oov_word_frac); token-less docs count in n_docs only. Ratios round
    at 6 from exact integer sums, so the DuckDB twin
    (``sql_tokenizer_fertility``) replays the report bit-for-bit."""
    enc = tokenize_docs(docs, vocab).select(
        "doc_id", "n_words", "n_pieces", "n_oov_words"
    )
    base = docs.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        *([F.col(by)] if by else []),
    ).join(enc, "doc_id")
    keys = [by] if by else []
    oov = F.col("n_oov_words")
    agg = base.groupBy(*keys).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("n_words"),
        F.sum("n_pieces").alias("n_pieces"),
        F.sum("n_bytes").alias("n_bytes"),
        F.sum(oov).alias("n_oov_words"),
    )
    r6 = lambda c: F.round(c, 6) + F.lit(0.0)  # noqa: E731
    nw, np_, nb = F.col("n_words"), F.col("n_pieces"), F.col("n_bytes")
    return agg.select(
        *keys,
        "n_docs",
        "n_words",
        "n_pieces",
        F.when(nw > 0, r6(np_ / nw)).otherwise(F.lit(0.0)).alias("fertility"),
        F.when(np_ > 0, r6(nb / np_)).otherwise(F.lit(0.0)).alias("bytes_per_piece"),
        F.when(nw > 0, r6(F.col("n_oov_words") / nw)).otherwise(F.lit(0.0)).alias(
            "oov_word_frac"
        ),
    )
