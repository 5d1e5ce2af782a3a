"""Decontamination, repetition signals, boilerplate detection — value
parity is pinned by check_parity/CORRECTNESS; these pin the semantics on
hand-built corpora."""

from __future__ import annotations

from ccm_spark.pipeline.dedup import decontaminate
from ccm_spark.pipeline.text import boilerplate_ngrams, repetition_signals

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows], DOCS_SCHEMA
    )


def test_decontaminate_flags_overlap(spark):
    train = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon unrelated words here", "s"),
            (2, "totally different content with no overlap at all", "s"),
        ],
    )
    ev = _docs(spark, [(100, "x alpha beta gamma delta y", "s")])
    got = {r.doc_id: r for r in decontaminate(train, ev, width=4).collect()}
    # doc 1 shares 'alpha beta gamma delta' (two 4-grams incl. epsilon? only
    # the one aligned 4-gram 'alpha beta gamma delta' appears in both)
    assert got[1].contaminated and got[1].n_contaminated_shingles == 1
    assert not got[2].contaminated and got[2].n_contaminated_shingles == 0


def test_repetition_signals_exact(spark):
    df = _docs(spark, [(1, "a b a b a", "s"), (2, "w x y z", "s"), (3, "q", "s")])
    got = {r.doc_id: r for r in repetition_signals(df).collect()}
    # doc 1: grams ab,ba,ab,ba -> n=4, top=2, dup=4
    assert (got[1].n_2grams, got[1].top2_count, got[1].dup2_occ) == (4, 2, 4)
    assert (got[1].top2_frac, got[1].dup2_frac) == (0.5, 1.0)
    # doc 2: all distinct -> dup 0
    assert (got[2].n_2grams, got[2].top2_count, got[2].dup2_occ) == (3, 1, 0)
    # doc 3: too short -> zeros, fracs 0.0
    assert (got[3].n_2grams, got[3].top2_frac, got[3].dup2_frac) == (0, 0.0, 0.0)


def test_boilerplate_ngrams_finds_shared_template(spark):
    template = "click here to subscribe"
    df = _docs(
        spark,
        [
            (1, f"{template} news about spark", "a"),
            (2, f"other text {template} more", "a"),
            (3, f"unique document body one", "a"),
            (4, f"{template} in another source", "b"),
        ],
    )
    got = boilerplate_ngrams(df, width=3, min_docs=2, k=5).collect()
    by_source = {}
    for r in got:
        by_source.setdefault(r.source, []).append(r)
    # source a: the template's two 3-grams appear in docs 1 and 2
    grams_a = {r.gram for r in by_source["a"]}
    assert "click here to" in grams_a and "here to subscribe" in grams_a
    assert all(r.n_docs == 2 for r in by_source["a"])
    # source b has no repeated gram (single doc) -> absent
    assert "b" not in by_source
    # ranks are 1..k contiguous and ordered deterministically
    ranks = sorted(r.rank for r in by_source["a"])
    assert ranks == list(range(1, len(ranks) + 1))


def test_classifier_score_matches_numpy_replay(spark, sf_small):
    """The Arrow-batched serving path must equal a driver-side numpy
    replay of the same model (tokens -> hashed features -> mean-pooled
    weights -> sigmoid) on the real corpus."""
    import numpy as np

    from ccm_spark.functions.hashing import py_hashed_features, py_tokens
    from ccm_spark.pipeline.text import classifier_score, classifier_weights
    from ccm_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    got = {r.doc_id: r.model_score for r in classifier_score(docs).collect()}
    w = classifier_weights()
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert set(got) == set(texts)
    n_mid = 0
    for doc_id, text in texts.items():
        toks = py_tokens(text)
        if not toks:
            assert got[doc_id] is None
            continue
        z = float(w[py_hashed_features(toks, 18)].mean())
        want = 1.0 / (1.0 + np.exp(-z))
        assert abs(got[doc_id] - want) < 1e-12
        if 0.4 < want < 0.6:
            n_mid += 1
    # zero-mean random weights: scores concentrate near 0.5 (sanity that
    # the pooling is a mean, not a sum that saturates the sigmoid)
    assert n_mid > len(texts) // 2


def test_classifier_score_custom_weights_and_empty_docs(spark):
    import pytest

    from ccm_spark.pipeline.text import classifier_score

    df = _docs(spark, [(1, "alpha beta", "s"), (2, "   ", "s")])
    out = {
        r.doc_id: r.model_score
        for r in classifier_score(df, weights=[0.0] * (1 << 10), log2_features=10).collect()
    }
    assert out[1] == 0.5  # zero weights -> sigmoid(0)
    assert out[2] is None  # token-less doc
    with pytest.raises(ValueError, match="weights shape"):
        classifier_score(df, weights=[0.0] * 7, log2_features=10)


def test_classifier_score_streaming_matches_batch(spark, sf_small, tmp_path):
    """classifier_score is a narrow projection, so it runs unchanged on a
    streaming source and emits the batch scores."""
    from ccm_spark.pipeline.text import classifier_score
    from ccm_spark.sources.jsonl import (
        documents_jsonl_stream,
        write_documents_jsonl,
    )
    from ccm_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").where("doc_id % 11 = 0")
    expected = {
        (r.doc_id, r.model_score) for r in classifier_score(docs).collect()
    }
    path = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, path, n_files=2)
    stream = documents_jsonl_stream(spark, path)
    scored = classifier_score(stream)
    assert scored.isStreaming
    q = (
        scored.writeStream.format("memory")
        .queryName("clf_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_clf"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.model_score)
        for r in spark.sql("SELECT doc_id, model_score FROM clf_stream").collect()
    }
    assert got == expected


def test_corpus_report_numbers(spark):
    """The one-pass health report: every scalar verified against a
    hand-computed fixture (dups, empties, mojibake, language mix)."""
    from ccm_spark.pipeline.text import corpus_report

    rows = [
        (0, "the quick brown fox", "en"),
        (1, "the quick brown fox", "en"),       # exact dup of 0
        (2, "el perro grande", "es"),
        (3, "", "en"),                          # empty
        (4, "brokÃ©n encoding here", "en"),  # mojibake
        (5, None, "es"),                        # NULL text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    rep = corpus_report(df)
    assert rep["n_docs"] == 6
    assert rep["n_tokens"] == 4 + 4 + 3 + 0 + 3 + 0
    assert rep["n_empty_docs"] == 2  # "" and NULL both tokenless
    assert rep["n_mojibake_docs"] == 1
    assert rep["languages"] == {"en": 4, "es": 2}
    # distinct texts: fox, perro, "", broken -> "" and NULL share the hash
    assert rep["n_distinct_texts"] == 4
    assert rep["exact_dup_rate"] == round(1.0 - 4 / 6, 6)
    assert rep["chars_min_median_max"][0] == 0
    assert rep["chars_min_median_max"][2] == max(len(t or "") for _, t, _ in rows)


def test_train_classifier_separates_and_is_partitioning_invariant(spark):
    """Distributed logistic training on hashed features: a separable
    synthetic corpus (English prose vs gibberish) trains to a model
    whose serving scores separate the classes; training is bit-identical
    under repartitioning (the engine's trainer determinism discipline);
    degenerate args raise."""
    import numpy as np
    import pytest

    from ccm_spark.pipeline.text import classifier_score, train_classifier

    good = [
        "the quick brown fox jumps over the lazy dog and runs far away",
        "this is a perfectly normal english sentence about the weather today",
        "we went to the market and bought some fresh bread and cheese",
        "the children played in the park until the sun went down slowly",
    ]
    bad = [
        "zxq vbn mlkj qwerty asdf zxcv plm okn ijb uhv ygc tfx",
        "qqq www eee rrr ttt yyy uuu iii ooo ppp aaa sss",
        "kfj dhs lqo wmx bzn ytr vcp qus eid jgh rkl wpz",
        "xoxo zzz qpw eirut ylkj mnbv cxza qsed rfgt hyju kilo",
    ]
    rows = [(i, t, 1) for i, t in enumerate(good)] + [
        (100 + i, t, 0) for i, t in enumerate(bad)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w, b = train_classifier(docs, log2_features=14, n_iters=15, lr=1.0)
    assert w.shape == (1 << 14,) and np.isfinite(w).all()

    scores = {
        r.doc_id: r.model_score
        for r in classifier_score(
            docs, weights=w, log2_features=14, bias=b
        ).collect()
    }
    good_scores = [scores[i] for i in range(4)]
    bad_scores = [scores[100 + i] for i in range(4)]
    assert min(good_scores) > max(bad_scores)

    w2, b2 = train_classifier(docs.repartition(9), log2_features=14, n_iters=15, lr=1.0)
    assert b2 == b and (w2 == w).all()

    with pytest.raises(ValueError, match="n_iters"):
        train_classifier(docs, n_iters=0)
    with pytest.raises(ValueError, match="empty"):
        train_classifier(docs.where("doc_id > 9999"))


def test_classifier_metrics_match_bruteforce_auc(spark):
    """Histogram AUC equals the brute-force pairwise definition
    (half credit on ties), confusion counts check out, NULL-scored docs
    are excluded and reported."""
    rows = [
        # (doc_id, score, label)
        (0, 0.9, 1), (1, 0.8, 1), (2, 0.8, 0), (3, 0.6, 1),
        (4, 0.4, 0), (5, 0.4, 1), (6, 0.2, 0), (7, 0.1, 0),
        (8, None, 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, model_score double, label int")
    from ccm_spark.pipeline.text import classifier_metrics

    m = classifier_metrics(df)
    scored = [(s, y) for _, s, y in rows if s is not None]
    pos = [s for s, y in scored if y == 1]
    neg = [s for s, y in scored if y == 0]
    brute = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    ) / (len(pos) * len(neg))
    assert m["auc"] == round(brute, 6)
    assert m["n_scored"] == 8 and m["n_unscored"] == 1
    assert m["confusion"] == {"tp": 3, "fp": 1, "fn": 1, "tn": 3}
    assert m["accuracy"] == round(6 / 8, 6)
    assert m["precision"] == round(3 / 4, 6)
    assert m["recall"] == round(3 / 4, 6)


def test_classifier_metrics_close_the_training_loop(spark):
    """End-to-end: train on the separable fixture, score, evaluate —
    the loop a real curation pipeline runs (train -> serve -> audit)."""
    from ccm_spark.pipeline.text import (
        classifier_metrics,
        classifier_score,
        train_classifier,
    )

    good = [
        "the quick brown fox jumps over the lazy dog and runs far away",
        "this is a perfectly normal english sentence about the weather today",
        "we went to the market and bought some fresh bread and cheese",
    ]
    bad = [
        "zxq vbn mlkj qwerty asdf zxcv plm okn ijb uhv ygc tfx",
        "qqq www eee rrr ttt yyy uuu iii ooo ppp aaa sss",
        "kfj dhs lqo wmx bzn ytr vcp qus eid jgh rkl wpz",
    ]
    rows = [(i, t, 1) for i, t in enumerate(good)] + [
        (100 + i, t, 0) for i, t in enumerate(bad)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w, b = train_classifier(docs, log2_features=14, n_iters=15, lr=1.0)
    scored = classifier_score(docs, weights=w, log2_features=14, bias=b).join(
        docs.select("doc_id", "label"), "doc_id"
    )
    m = classifier_metrics(scored)
    assert m["auc"] == 1.0  # fully separable fixture
    assert m["recall"] == 1.0


# ---------------------------------------------- unicode normalisation


def test_clean_text_col_matches_duckdb_replay(spark):
    """The regex half is engine-portable; DuckDB replays it byte for
    byte on a fixture covering every cleanup class."""
    import duckdb
    import pandas as pd
    import pyspark.sql.functions as F

    from ccm_spark.pipeline.text import _UNICODE_CLEANUP, clean_text_col

    fixture = [
        (0, "plain ascii stays"),
        (1, "ctrl\x01chars\x0bdie"),
        (2, "zero​width﻿gone­"),
        (3, "“smart” ‘quotes’ — fold"),
        (4, "non breaking spaces"),
        (5, None),
    ]
    pdf = pd.DataFrame(fixture, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf.astype({"doc_id": "int64"}))
    got = {
        r.doc_id: r.c
        for r in df.select("doc_id", clean_text_col("text").alias("c")).collect()
    }
    expr = "text"
    for pat, repl in _UNICODE_CLEANUP:
        lit = repl.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat}', '{lit}', 'g')"
    duckdb.register("uc_fixture", pdf)
    want = {
        int(d): t
        for d, t in duckdb.sql(
            f"SELECT doc_id, {expr} FROM uc_fixture"
        ).fetchall()
    }
    assert got == want
    assert got[3] == "\"smart\" 'quotes' - fold"
    assert got[2] == "zerowidthgone"
    assert got[5] is None


def test_normalize_unicode_folds_equivalent_strings(spark):
    import pyspark.sql.functions as F

    from ccm_spark.pipeline.text import normalize_unicode

    docs = spark.createDataFrame(
        [
            (0, "café"),  # composed e-acute
            (1, "café"),  # decomposed: e + combining acute
            (2, "Ｆullｗidth １２"),  # fullwidth F, w, digits
            (3, "already clean"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.text_norm, r.changed) for r in normalize_unicode(docs).collect()}
    # visually identical accents hash together after normalisation
    assert out[0][0] == out[1][0] == "café"
    assert out[1][1] is True and out[0][1] is False
    assert out[2][0] == "Fullwidth 12"
    assert out[3] == ("already clean", False)
    assert out[4] == (None, False)

    # idempotent: a second pass changes nothing
    again = normalize_unicode(
        normalize_unicode(docs).select("doc_id", F.col("text_norm").alias("text"))
    )
    assert again.filter("changed").count() == 0


def test_normalize_unicode_rejects_unknown_form(spark):
    import pytest as _pytest

    from ccm_spark.pipeline.text import normalize_unicode

    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="unknown form"):
        normalize_unicode(docs, form="NFX")


def test_classifier_metrics_null_and_nonbinary_labels(spark):
    """NULL labels (e.g. an unmatched left join) are excluded and
    counted, never a crash; -1/+1 encodings raise instead of silently
    counting negatives as positives via Python negative indexing."""
    import pytest

    from ccm_spark.pipeline.text import classifier_metrics

    rows = [
        (0, 0.9, 1), (1, 0.8, 0), (2, 0.7, 1), (3, 0.2, 0),
        (4, 0.6, None), (5, None, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, model_score double, label int")
    m = classifier_metrics(df)
    assert m["n_scored"] == 4
    assert m["n_unlabelled"] == 1
    assert m["n_unscored"] == 1
    assert m["auc"] == 0.75  # 3 of 4 (pos, neg) pairs ordered correctly

    pm = spark.createDataFrame(
        [(0, 0.9, 1), (1, 0.2, -1)], "doc_id long, model_score double, label int"
    )
    with pytest.raises(ValueError, match="labels must be 0/1"):
        classifier_metrics(pm)


def test_script_profile_routes_writing_systems(spark):
    """Per-script code-point counts + dominant script: the routing
    complement to language_id (Cyrillic vs Greek vs Han is a code-point
    property, not a vocabulary one)."""
    from ccm_spark.pipeline.text import script_profile

    docs = spark.createDataFrame(
        [
            (0, "hello latin world"),
            (1, "привет мир"),
            (2, "你好世界你好 hi"),
            (3, "γεια σου κόσμε"),
            (4, "مرحبا بالعالم"),
            (5, "1234 !!! ..."),  # no letters at all
            (6, None),
            (7, "abcабв"),  # 3 latin vs 3 cyrillic: alphabetical tie-break
            (8, "გამარჯობა მსოფლიო"),  # Georgian: letters, unprofiled script
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in script_profile(docs).collect()}
    assert got[0].dominant_script == "latin" and got[0].latin_chars == 15
    assert got[1].dominant_script == "cyrillic"
    assert got[2].dominant_script == "han" and got[2].latin_chars == 2
    assert got[3].dominant_script == "greek"
    assert got[4].dominant_script == "arabic"
    assert got[5].dominant_script == "und" and got[5].n_letters == 0
    assert got[6].dominant_script == "und"
    assert got[7].dominant_script == "cyrillic"  # 'cyrillic' < 'latin'
    # unprofiled writing system: letters present, no profiled hit
    assert got[8].dominant_script == "other" and got[8].n_letters > 0


def test_script_profile_matches_duckdb_replay(spark):
    """Engine portability: Java \\p{IsX} and RE2 \\p{X} count the same
    code points — the whole counts relation replays in DuckDB."""
    import duckdb
    import pandas as pd

    from ccm_spark.pipeline.text import SCRIPTS, script_profile

    docs = spark.createDataFrame(
        [
            (0, "mixed текст with ελληνικά and 汉字 and かな and 한글"),
            (1, "देवनागरी ไทย עברית عربى"),
            (2, ""),
        ],
        "doc_id long, text string",
    )
    cols = [f"{s.lower()}_chars" for s in SCRIPTS]
    got = sorted(
        tuple(int(r[c]) for c in cols) + (int(r.n_letters), r.dominant_script)
        for r in script_profile(docs).collect()
    )
    duckdb.register("sp_fixture", pd.DataFrame(docs.toPandas()))
    count_exprs = ", ".join(
        f"len(regexp_extract_all(text, '\\p{{{s}}}')) AS {s.lower()}_chars"
        for s in SCRIPTS
    )
    rows = duckdb.sql(
        f"SELECT {count_exprs}, len(regexp_extract_all(text, '\\p{{L}}')) AS nl"
        " FROM sp_fixture ORDER BY doc_id"
    ).fetchall()
    want = []
    for row in sorted(rows):
        counts = row[:-1]
        nl = row[-1]
        best_hits, best = 0, "und"
        for s, c in zip(SCRIPTS, counts):
            if c > best_hits:
                best_hits, best = c, s.lower()
        if best_hits == 0 and nl > 0:
            best = "other"
        want.append(tuple(int(c) for c in counts) + (int(nl), best))
    assert got == sorted(want)


def test_redact_pii_extended_matches_duckdb_replay(spark, sf_small):
    """Validated PII redaction (emails + Luhn-gated cards + IPv4 +
    phones + digit runs) replayed stage-for-stage in SQL — checksum
    fold included — on the documents table with deterministic injected
    PII (Luhn-valid card for even doc_ids, Luhn-INVALID for odd: the
    invalid one must fall through to <NUM> in BOTH engines)."""
    import duckdb
    import pyspark.sql.functions as F

    from ccm_spark.pipeline.text import redact_pii_extended
    from ccm_spark.plans.oracle_sql_ext import sql_redact_pii_extended
    from ccm_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    d = F.col("doc_id")
    aug = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" mail user"), d.cast("string"), F.lit("@example.com card "),
            F.when(d % 2 == 0, F.lit("4111 1111 1111 1111")).otherwise(
                F.lit("4111 1111 1111 1112")
            ),
            F.lit(" ip 10."), (d % 200).cast("string"), F.lit(".0."),
            (d % 250).cast("string"),
            F.lit(" tel +1-555-0"), (100 + d % 900).cast("string"),
            F.lit("-"), (1000 + d % 9000).cast("string"),
            F.lit(" ref "), (d * 1000003 + 123456).cast("string"),
        ),
    )
    got = {
        r.doc_id: (
            r.n_emails, r.n_cards, r.n_ips, r.n_phones, r.n_numbers,
            r.red_len, r.red_fp,
        )
        for r in redact_pii_extended(aug).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = {
        int(row[0]): tuple(int(v) for v in row[1:])
        for row in con.sql(sql_redact_pii_extended()).fetchall()
    }
    assert len(got) == len(want) == 500
    # every even doc redacted exactly one verified card; odd docs none
    assert all(v[1] == (1 if k % 2 == 0 else 0) for k, v in got.items())
    assert all(v[2] == 1 and v[3] == 1 for v in got.values())  # ip + phone
    mism = {k: (got[k], want[k]) for k in got if got[k] != want[k]}
    assert not mism, dict(list(mism.items())[:3])


def test_luhn_column_matches_independent_python_luhn(spark):
    """The codegen Luhn predicate vs a textbook Python implementation
    over 300 seeded random candidates (contiguous + separated forms,
    valid and off-by-one check digits): agreement must be exact — the
    checksum gate is what keeps a random 16-digit run out of <CARD>."""
    import random

    import pyspark.sql.functions as F

    from ccm_spark.pipeline.text import _luhn_ok

    def py_luhn(s: str) -> bool:
        ds = [int(c) for c in s if c.isdigit()]
        if not 13 <= len(ds) <= 19:
            return False
        total = 0
        for i, d in enumerate(reversed(ds)):
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    rng = random.Random(20260815)
    cands = []
    for _ in range(150):
        n = rng.randint(13, 19)
        digits = [rng.randint(0, 9) for _ in range(n)]
        s = "".join(map(str, digits))
        cands.append(s)
        # the same number with a corrected final digit (forced valid)
        body = s[:-1]
        for check in range(10):
            if py_luhn(body + str(check)):
                cands.append(body + str(check))
                break
    sep = [
        f"{c[:4]} {c[4:8]} {c[8:12]} {c[12:]}" for c in cands if len(c) >= 13
    ][:50]
    cands += sep
    df = spark.createDataFrame([(c,) for c in cands], "cand string")
    got = {
        r.cand: r.ok for r in df.select("cand", _luhn_ok(F.col("cand")).alias("ok")).collect()
    }
    mism = {c: (got[c], py_luhn(c)) for c in got if got[c] != py_luhn(c)}
    assert not mism, dict(list(mism.items())[:5])
    assert sum(got.values()) >= 150  # every forced-valid candidate passes


# ------------------------------------------------ collocations / tf-idf


def test_collocations_pmi_hand_built(spark):
    """'new york' appears 6x as a glued pair while both tokens are rare
    elsewhere -> top PMI; 'the the' is frequent but both unigrams are
    everywhere -> lower PMI despite higher count."""
    import math

    from ccm_spark.pipeline.text import collocations_pmi

    filler = "the a of to " * 3                      # common unigrams
    rows = [f"new york {filler}" for _ in range(6)] + [
        "the the the the a of to a of to" for _ in range(4)
    ]
    d = _docs(spark, [(i, t, "src0") for i, t in enumerate(rows)])
    out = collocations_pmi(d, min_count=3, k=5).collect()
    assert out[0].bigram == "new york" and out[0].rank == 1
    assert out[0].c_xy == 6
    # replay the expected PMI exactly
    n_tok = sum(len(t.split()) for t in rows)
    n_big = sum(len(t.split()) - 1 for t in rows)
    want = math.log2((6 / n_big) / ((6 / n_tok) * (6 / n_tok)))
    assert abs(out[0].pmi - want) < 1e-6
    # ranks are dense from 1 and scores non-increasing
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    assert all(a.pmi >= b.pmi for a, b in zip(out, out[1:]))


def test_collocations_pmi_min_count_prunes(spark):
    from ccm_spark.pipeline.text import collocations_pmi

    d = _docs(spark, [(0, "rare pair here", "s"), (1, "other text now", "s")])
    assert collocations_pmi(d, min_count=2, k=10).count() == 0
    assert collocations_pmi(d, min_count=1, k=10).count() > 0


def test_collocations_pmi_matches_duckdb_twin(spark, sf_small):
    import duckdb

    from ccm_spark.pipeline.text import collocations_pmi
    from ccm_spark.plans.oracle_sql_ext import sql_collocations_pmi

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    got = sorted(
        (r.rank, r.bigram, r.c_xy, r.pmi)
        for r in collocations_pmi(docs, min_count=5, k=50).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = sorted(
        (int(a), str(b), int(c), float(d))
        for a, b, c, d in con.sql(sql_collocations_pmi(5, 50)).fetchall()
    )
    assert len(got) == len(want) == 50
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, mism[:5]


def test_tfidf_terms_hand_built(spark):
    """A term unique to one doc outranks corpus-wide terms there."""
    from ccm_spark.pipeline.text import tfidf_terms

    d = _docs(
        spark,
        [
            (0, "shared words here plus unique zebra zebra", "s"),
            (1, "shared words here plus other stuff", "s"),
            (2, "shared words here plus more stuff", "s"),
        ],
    )
    out = {
        (r.doc_id, r.rank): r for r in tfidf_terms(d, k=3).collect()
    }
    assert out[(0, 1)].term == "zebra" and out[(0, 1)].tf == 2
    # every doc gets exactly k rows when it has >= k distinct terms
    assert len([1 for (doc, _) in out if doc == 0]) == 3


def test_tfidf_terms_matches_duckdb_twin(spark, sf_small):
    import duckdb

    from ccm_spark.pipeline.text import tfidf_terms
    from ccm_spark.plans.oracle_sql_ext import sql_tfidf_terms

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    got = sorted(
        (r.doc_id, r.rank, r.term, r.tf, r.score)
        for r in tfidf_terms(docs, k=5).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = sorted(
        (int(a), int(b), str(c), int(d), float(e))
        for a, b, c, d, e in con.sql(sql_tfidf_terms(5)).fetchall()
    )
    assert len(got) == len(want)
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, mism[:5]


def test_tfidf_terms_persist_handle_released(spark, sf_small):
    """r16: the (doc, term) tf aggregate is persisted (it feeds both the
    df rollup and the scoring join — the dsir recipe) and must be
    releasable via the standard _ccm_persisted handle so a long-lived
    session does not accumulate executor cache."""
    from ccm_spark.pipeline.text import tfidf_terms
    from ccm_spark.plans.cross_map import release_cached

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    out = tfidf_terms(docs, k=5)
    handles = getattr(out, "_ccm_persisted", [])
    assert handles, "tf persist handle missing"
    out.count()
    assert all(h.storageLevel.useMemory or h.storageLevel.useDisk for h in handles)
    release_cached(out)
    assert all(
        not (h.storageLevel.useMemory or h.storageLevel.useDisk) for h in handles
    )


# -------------------------------------------------------------- sentences


def test_split_sentences_hand_built(spark):
    from ccm_spark.pipeline.text import split_sentences

    texts = [
        "First sentence. Second one! Third? No terminator tail",
        "Dr. Smith went home... Then what?!  Multiple   spaces. ",
        "",
        "...",
        "one",
    ]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {}
    for r in split_sentences(d).collect():
        got.setdefault(r.doc_id, []).append((r.sent_idx, r.sentence, r.n_chars))
    for v in got.values():
        v.sort()
    assert [s for _, s, _ in got[0]] == [
        "First sentence.", "Second one!", "Third?", "No terminator tail",
    ]
    # the naive rule splits at 'Dr.' (documented tradeoff) and the
    # trailing whitespace-only match is dropped with its index gap kept
    assert [s for _, s, _ in got[1]] == [
        "Dr.", "Smith went home...", "Then what?!", "Multiple   spaces.",
    ]
    assert [i for i, _, _ in got[1]] == [0, 1, 2, 3]  # idx 4 was blank
    assert 2 not in got and 3 not in got  # empty / terminators-only
    assert got[4] == [(0, "one", 3)]


def test_split_sentences_matches_duckdb_twin(spark, sf_small):
    import duckdb
    import pandas as pd

    from ccm_spark.pipeline.text import split_sentences
    from ccm_spark.plans.oracle_sql_ext import sql_split_sentences

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    # append a non-BMP doc so the codepoint-unit agreement is pinned too
    extra = spark.createDataFrame(
        [(100_000, "a\U0001F600b. emoji sentence! ok")],
        "doc_id long, text string",
    )
    both = docs.select("doc_id", "text").unionByName(extra)
    got = sorted(
        (r.doc_id, r.sent_idx, r.sentence, r.n_chars)
        for r in split_sentences(both).collect()
    )
    con = duckdb.connect()
    pdf = both.toPandas()
    con.register("documents", pd.DataFrame(pdf))
    want = sorted(
        (int(a), int(b), c, int(d))
        for a, b, c, d in con.sql(sql_split_sentences()).fetchall()
    )
    assert got and got == want
