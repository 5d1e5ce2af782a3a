"""Trainable quality classifier (pipeline/classify.py) — extension
surface (the reference has no classifier, SURVEY.md §2.1).

Pins: the hashing-trick feature twin (hashlib == md5_long), learnability
of a token-separable rule, loss monotonicity, bit-determinism across
partitionings, serving == one narrow pass, and streaming scoring."""

from __future__ import annotations

import pytest

from ccm_spark.pipeline.classify import (
    FEAT_DIM,
    hashed_features,
    score_quality,
    train_quality_classifier,
)


def _corpus(spark, n=60):
    """Separable toy corpus: 'good' docs carry the token 'signal',
    'bad' docs carry 'noise'; shared filler tokens in both."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            rows.append((i, f"the quick signal doc number{i % 7} end", 1))
        else:
            rows.append((i, f"the quick noise doc number{i % 7} end", 0))
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in rows], "doc_id long, label int"
    )
    return docs, labels


def test_hashed_features_match_hashlib_twin(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(0, "alpha beta alpha")], "doc_id long, text string"
    )
    got = {(r.feat_idx, round(r.x, 9)) for r in hashed_features(docs).collect()}

    def h(tok):
        return int(hashlib.md5(("qf:" + tok).encode()).hexdigest()[:15], 16) % FEAT_DIM

    want = {(h("alpha"), round(2 / 3, 9)), (h("beta"), round(1 / 3, 9))}
    assert got == want


def test_classifier_learns_separable_rule_and_is_deterministic(spark):
    docs, labels = _corpus(spark)
    model = train_quality_classifier(docs, labels, n_iters=25)
    # loss decreases and the rule is learned
    assert model["loss_history"][-1] < model["loss_history"][0]
    scored = {r.doc_id: r.prob for r in score_quality(docs, model).collect()}
    acc = sum(
        1 for i, p in scored.items() if (p >= 0.5) == (i % 2 == 0)
    ) / len(scored)
    assert acc >= 0.95, acc

    # bit-identical model on any partitioning (the W_ROUND discipline)
    model2 = train_quality_classifier(
        docs.repartition(7), labels.repartition(3), n_iters=25
    )
    assert model2["weights"] == model["weights"]
    assert model2["bias"] == model["bias"]

    # serving is deterministic too
    scored2 = {r.doc_id: r.prob for r in score_quality(docs.repartition(5), model).collect()}
    assert scored2 == scored


def test_classifier_guards_and_empty_docs(spark):
    docs, labels = _corpus(spark, n=8)
    with pytest.raises(ValueError, match="n_iters"):
        train_quality_classifier(docs, labels, n_iters=0)
    with pytest.raises(ValueError, match="no labelled"):
        train_quality_classifier(
            docs, labels.where("doc_id < 0"), n_iters=2
        )
    model = train_quality_classifier(docs, labels, n_iters=5)
    # a token-less doc scores exactly the bias
    empty = spark.createDataFrame([(99, "")], "doc_id long, text string")
    r = score_quality(empty, model).collect()[0]
    assert r.score == round(model["bias"], 9)


def test_score_quality_stream_equals_batch(spark, tmp_path):
    docs, labels = _corpus(spark, n=20)
    model = train_quality_classifier(docs, labels, n_iters=5)
    batch = {r.doc_id: (r.score, r.prob) for r in score_quality(docs, model).collect()}

    src = tmp_path / "cls_src"
    src.mkdir()
    docs.coalesce(1).write.parquet(str(src / "p0"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src / "p0")
    )
    out = score_quality(stream, model)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("cls_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cls_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.score, r.prob)
        for r in spark.sql("SELECT * FROM cls_stream").collect()
    }
    assert got == batch


def test_classifier_training_matches_duckdb_replay(spark, sf_small):
    """The distributed trainer replayed in SQL: unrolled full-batch GD
    over the hashed count-ratio features (the kmeans-oracle pattern) —
    per-iteration gradient/weight/bias rounding means both engines
    restart every iteration from identical state, so the final per-doc
    scores match exactly. This is the twin a future gate rotation would
    use."""
    import duckdb
    import pyspark.sql.functions as F

    from ccm_spark.plans.oracle_sql_ext import (
        CLS_DIM,
        CLS_ITERS,
        CLS_LR,
        sql_quality_classifier_scores,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    labels = docs.select(
        "doc_id", (F.col("doc_id") % 3 == 0).cast("int").alias("label")
    )
    model = train_quality_classifier(
        docs, labels, dim=CLS_DIM, n_iters=CLS_ITERS, lr=CLS_LR
    )
    got = {r.doc_id: r.score for r in score_quality(docs, model).collect()}

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = {
        int(d): float(s)
        for d, s in con.sql(sql_quality_classifier_scores()).fetchall()
    }
    assert len(got) == len(want) == 500
    mism = {d: (got[d], want[d]) for d in got if got[d] != want[d]}
    assert not mism, dict(list(mism.items())[:5])
