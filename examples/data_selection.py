"""Model-based data selection — the r08 selection stages composed into
one curation pass, runnable documentation (the reference has no text
surface, SURVEY.md §2.1; this is the "choose WHICH clean data to train
on" workflow that follows the hygiene pipeline in
examples/corpus_pipeline.py).

    python examples/data_selection.py [sf_dir]

Stages (each operator individually replay-pinned in tests):
  1. target-domain weighting  (DSIR: hashed-n-gram importance
                               log-weights toward a target split)
  2. quality classifier       (hashed-feature logistic regression
                               trained on weak labels derived from the
                               rule filter, scored in one narrow pass)
  3. semantic dedup           (SemDeDup: cluster-blocked greedy
                               epsilon-cover over the embeddings)
  4. selection                (deterministic Gumbel top-k importance
                               resample of the surviving pool)

The composition points the operators at each other the way a real
curation run would: classifier labels come from the engine's own rule
filter (weak supervision), the DSIR target is a held-out split, the
dedup verdict joins on doc_id, and the final sample is a pure function
of the corpus + seeds.
"""

from __future__ import annotations


def run(spark, sf_dir: str) -> dict:
    import pyspark.sql.functions as F

    from ccm_spark.pipeline.classify import score_quality, train_quality_classifier
    from ccm_spark.pipeline.clustering import semantic_dedup
    from ccm_spark.pipeline.dsir import dsir_log_weights, dsir_resample
    from ccm_spark.pipeline.text import quality_filter
    from ccm_spark.sources.tables import load_table

    out: dict = {}
    docs = load_table(spark, sf_dir, "documents")
    out["input"] = docs.count()

    # 1. DSIR weights toward a target split (docs % 10 == 0 plays the
    # curated domain sample; production passes a real target corpus)
    target = docs.where(F.col("doc_id") % 10 == 0)
    raw = docs.where(F.col("doc_id") % 10 != 0)
    weights = dsir_log_weights(raw, target).localCheckpoint(eager=True)
    out["weighted"] = weights.count()

    # 2. classifier on weak labels from the rule filter: the model
    # generalises the hand rules into a smooth score
    labels = quality_filter(raw).select(
        "doc_id", F.col("keep").cast("int").alias("label")
    )
    model = train_quality_classifier(raw, labels, n_iters=10)
    out["classifier_loss_first"] = model["loss_history"][0]
    out["classifier_loss_last"] = model["loss_history"][-1]
    scored = score_quality(raw, model)

    # 3. semantic dedup over the embeddings table (vec_id == doc_id in
    # the synthetic corpus); keep only cluster representatives
    embs = load_table(spark, sf_dir, "embeddings")
    sem = semantic_dedup(embs, k=8, threshold=0.95, n_iters=2)
    out["sem_kept"] = sem.where("keep").count()

    # 4. the surviving pool: classifier top-25% (an absolute 0.5 cut is
    # wrong under the rule filter's skewed base rate — ~7% positives
    # calibrate every prob low; rank, don't threshold), semantically
    # unique, resampled toward the target by importance. top_fraction
    # is the two-phase exact selector — the percent_rank global window
    # this replaced planned ONE partition for the whole relation.
    from ccm_spark.pipeline.mixing import top_fraction

    top = top_fraction(scored, "prob", 0.25).select("doc_id")
    pool = (
        weights.join(top, "doc_id")
        .join(
            sem.where("keep").select(F.col("vec_id").alias("doc_id")),
            "doc_id",
        )
        .select("doc_id", "log_w")
    )
    out["pool"] = pool.count()
    k = max(1, out["pool"] // 2)
    selected = dsir_resample(pool, k=k, seed=7)
    out["selected"] = selected.count()
    out["selected_ids_head"] = [
        r.doc_id for r in selected.orderBy("doc_id").limit(5).collect()
    ]

    # 5. selection audit (r11): did the resample actually move the
    # corpus toward the target? Corpus-level JS divergence of the
    # SELECTED set vs the target, compared against the RAW pool's —
    # the one-number check a curator reads before shipping the mix.
    from ccm_spark.pipeline.dsir import corpus_divergence

    sel_docs = docs.join(selected.select("doc_id"), "doc_id")
    js_raw = corpus_divergence(raw, target).collect()[0].js_bits
    js_sel = corpus_divergence(sel_docs, target).collect()[0].js_bits
    out["js_raw_vs_target"] = js_raw
    out["js_selected_vs_target"] = js_sel

    # 6. compute-budget cut (r12): the selected pool is still sized in
    # DOCS; a training run is sized in TOKENS. Keep the best
    # classifier-scored prefix that fits the token budget —
    # quality-ordered, so the cut drops the worst docs, not random ones
    # (budget_select's random-order cut is for per-group quotas).
    from ccm_spark.pipeline.mixing import select_within_token_budget

    sel_scored = sel_docs.join(scored.select("doc_id", "prob"), "doc_id")
    budget = 10_000
    fitted = select_within_token_budget(
        sel_scored, budget=budget, score_col="prob"
    )
    out["budget_tokens"] = budget
    out["budget_kept_docs"] = fitted.count()
    out["budget_used_tokens"] = (
        fitted.agg(F.max("cum_tokens")).collect()[0][0] or 0
    )
    return out


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from ccm_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("data-selection-example", master="local[8]", shuffle_partitions=8)
    for key, val in run(spark, sf_dir).items():
        print(f"{key}: {val}")
