"""Unit tests for the training-data-pipeline operators on tiny literal
corpora with hand-computable expectations. (Cross-engine parity vs DuckDB is
covered separately by tools/check_parity.py.)"""

from __future__ import annotations

import hashlib

import pytest
import pyspark.sql.functions as F

from ccm_spark.pipeline import dedup, multimodal, similarity, text


def docs_df(spark, texts: list[str]):
    return spark.createDataFrame(
        [(i, t, "xx", f"src{i}", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_exact_duplicates(spark):
    d = docs_df(spark, ["a b c", "a b c", "x y z", "a b c"])
    rows = {r.keep_doc_id: r for r in dedup.exact_duplicates(d).collect()}
    assert rows[0].n_copies == 3 and rows[0].n_sources == 3
    assert rows[2].n_copies == 1


def test_shingles_width_guard(spark):
    d = docs_df(spark, ["one two", "one two three four"])
    sh = dedup.shingles(d).collect()
    by_doc = {}
    for r in sh:
        by_doc.setdefault(r.doc_id, []).append(r.shingle_hash)
    assert 0 not in by_doc  # 2 tokens < width 3 -> no shingles
    assert len(by_doc[1]) == 2  # 4 tokens -> 2 trigrams


def test_minhash_lsh_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words with nothing shared at all here now ok"
    d = docs_df(spark, [base, near, far])
    pairs = dedup.minhash_lsh_duplicates(d, threshold=0.3).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(0, 1)}
    assert 0.3 <= pairs[0].jaccard < 1.0


def test_ngram_jaccard_identical_pair(spark):
    d = docs_df(spark, ["a b c d e", "a b c d e", "p q r s t"])
    pairs = dedup.ngram_jaccard_duplicates(d, threshold=0.99).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(0, 1)}
    assert pairs[0].jaccard == 1.0


def test_ngram_jaccard_posting_list_cap(spark):
    """A hot shingle above the df cap must not generate candidate pairs;
    pairs still found via sub-cap shingles keep their exact full-set
    Jaccard (the cap gates candidates only, not the measure)."""
    # every doc contains the hot trigram "x y z"; docs 0/1 also share "a b c"
    d = docs_df(spark, ["a b c x y z", "a b c x y z", "p q x y z", "m n x y z"])
    uncapped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_duplicates(d, threshold=0.01).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_duplicates(d, threshold=0.01, max_doc_freq=3).collect()
    }
    # "x y z" has df=4 > 3 -> pairs sharing ONLY it disappear
    assert (0, 1) in capped and (2, 3) not in capped and (2, 3) in uncapped
    # surviving pair keeps the exact full-set Jaccard
    assert capped[(0, 1)] == uncapped[(0, 1)]


def test_duplicate_components_transitive_chain(spark):
    """a~b and b~c must land in ONE component even if a~c alone would not
    pass the threshold; unrelated docs stay singletons."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu"
    d = docs_df(
        spark,
        [
            base,                                   # 0
            base.replace("mu", "nu"),               # 1: near 0
            base.replace("mu", "nu").replace("alpha", "omega"),  # 2: near 1
            "totally different content here with no shared trigrams at all",  # 3
        ],
    )
    comp = {r.doc_id: r.component for r in dedup.duplicate_components(d, threshold=0.3).collect()}
    assert comp[0] == comp[1] == comp[2] == 0
    assert comp[3] == 3
    reps = {
        r.keep_doc_id: r.n_members
        for r in dedup.dedup_representatives(d, threshold=0.3).collect()
    }
    assert reps == {0: 3, 3: 1}


def test_simhash_identical_docs_equal_fingerprints(spark):
    d = docs_df(spark, ["alpha beta gamma", "alpha beta gamma", "delta eps zeta"])
    fp = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(d).collect()}
    assert fp[0] == fp[1] != fp[2]
    assert 0 <= fp[0] < 2**dedup.SIMHASH_BITS
    pairs = dedup.simhash_near_duplicates(d, max_hamming=0).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(0, 1)}


def test_simhash_fingerprints_match_duckdb_replay(spark):
    """Hash-parity pin for the fingerprint relation itself (the gated
    query rotated to series_topk in r07; the still-gated
    dedup_simhash_pairs consumes these fingerprints, and this test keeps
    their per-doc values cross-engine-checked at full resolution)."""
    import duckdb

    from ccm_spark.plans.oracle_sql_ext import sql_dedup_simhash

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(docs).collect()}
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = {int(d): int(s) for d, s in con.sql(sql_dedup_simhash()).fetchall()}
    assert got == want and len(got) == 500


def test_simhash_banding_recall_exact_vs_bruteforce(spark):
    """7 bands x 8 bits is pigeonhole-exact for max_hamming=6: the banded
    candidate set (uncapped) must reproduce brute-force all-pairs Hamming."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fps = dedup.simhash_fingerprints(docs).collect()
    want = set()
    for i, ri in enumerate(fps):
        for rj in fps[i + 1:]:
            a, b = sorted((ri.doc_id, rj.doc_id))
            if bin(ri.simhash ^ rj.simhash).count("1") <= 6:
                want.add((a, b))
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.simhash_near_duplicates(docs, max_hamming=6).collect()
    }
    assert got == want and want  # non-trivial corpus: expect >=1 true pair


def test_simhash_bucket_cap_prunes_hot_bucket(spark):
    """With the cap below the duplicate-group size, identical docs land in
    over-full buckets in every band and produce no candidate pairs."""
    d = docs_df(spark, ["same text here ok", "same text here ok", "same text here ok"])
    assert dedup.simhash_near_duplicates(d, max_hamming=6).count() == 3
    assert dedup.simhash_near_duplicates(d, max_hamming=6, max_bucket_size=2).count() == 0


def test_token_stats_and_quality(spark):
    d = docs_df(spark, ["a a b", ""])
    st = {r.doc_id: r for r in text.token_stats(d).collect()}
    assert st[0].n_tokens == 3 and st[0].n_unique == 2
    assert st[0].ttr == pytest.approx(2 / 3)
    assert st[1].n_tokens == 0 and st[1].ttr == 0.0
    q = {r.doc_id: r.quality for r in text.quality_score(d).collect()}
    # 3 tokens: saturation .03, diversity 2/3, purity 1 -> .03*(0.5+1/3)
    assert q[0] == pytest.approx(0.03 * (0.5 + 0.5 * 2 / 3))
    assert q[1] == 0.0


def test_quality_filter_rules(spark):
    good = "the cat and the dog sat in that house for many days together"
    short = "the cat sat"  # < 10 tokens
    numeric = "111 222 333 444 555 666 777 888 999 000 123 456"  # alpha_frac 0
    nostop = "cat dog bird fish lion tiger bear wolf fox deer goat mole"  # no stopwords
    rows = {r.doc_id: r for r in text.quality_filter(docs_df(spark, [good, short, numeric, nostop])).collect()}
    assert rows[0].keep is True
    assert rows[1].keep is False and rows[1].n_tokens == 3
    assert rows[2].keep is False and rows[2].alpha_frac == 0.0
    assert rows[3].keep is False and rows[3].stopword_frac == 0.0
    assert rows[0].mean_token_len == pytest.approx(
        sum(map(len, good.split())) / len(good.split())
    )


def test_language_id(spark):
    d = docs_df(spark, ["the cat and the dog", "el gato en la casa", "zzz qqq"])
    out = {r.doc_id: r.predicted_lang for r in text.language_id(d).collect()}
    assert out[0] == "en"
    assert out[1] == "es"
    assert out[2] == "und"


def test_vocab_topk_counts_and_order(spark):
    d = docs_df(spark, ["a a b c", "a b", "b z"])
    rows = [(r.rank, r.token, r.n_docs, r.n_total) for r in text.vocab_topk(d, k=3).collect()]
    # totals: a=3 (2 docs), b=3 (3 docs), c=1, z=1 -> tie a/b by token asc
    assert rows == [(1, "a", 2, 3), (2, "b", 3, 3), (3, "c", 1, 1)]


def test_fingerprint_order_sensitive(spark):
    d = docs_df(spark, ["a b", "b a"])
    fp = {r.doc_id: r.fingerprint for r in text.fingerprint(d).collect()}
    assert fp[0] != fp[1]


def test_token_counts(spark):
    d = docs_df(spark, ["hello world99 abcdefgh"])
    r = text.token_counts(d).collect()[0]
    assert r.ws_tokens == 3
    assert r.regex_tokens == 4  # hello, world, 99, abcdefgh
    assert r.bpe_est_tokens == 2 + 2 + 2  # ceil(5/4)+ceil(7/4)+ceil(8/4)


def embs_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(v) for v in vec], 0) for i, vec in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


def test_cosine_topk_exact(spark):
    vecs = [[1, 0, 0, 0], [0.9, 0.1, 0, 0], [0, 1, 0, 0], [-1, 0, 0, 0]]
    out = similarity.cosine_topk(embs_df(spark, vecs), n_queries=1, k=3).collect()
    assert [r.target_id for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3]


def test_srp_bucket_identical_vectors_collide(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    base = rng.normal(size=64)
    vecs = [base, base, rng.normal(size=64)]
    b = {r.vec_id: r.bucket for r in similarity.srp_buckets(embs_df(spark, vecs)).collect()}
    assert b[0] == b[1]
    nd = similarity.embedding_near_duplicates(embs_df(spark, vecs), threshold=0.99).collect()
    assert {(r.id_a, r.id_b) for r in nd} == {(0, 1)}


def test_ivf_kmeans_converges_to_cluster_means(spark):
    """Two separable clusters, strided init picking one seed in each:
    Lloyd iterations must land each centroid on its cluster's mean."""
    import numpy as np

    a = np.zeros(64); a[0] = 1.0
    b = np.zeros(64); b[1] = 1.0
    cluster_a = [a, a * 0.8, a * 1.2]          # ids 0,1,2
    cluster_b = [b, b * 0.9, b * 1.1]          # ids 3,4,5
    cents = similarity.ivf_kmeans_centroids(
        embs_df(spark, cluster_a + cluster_b), stride=3, n_iters=2
    ).collect()
    got = {}
    for r in cents:
        got.setdefault(r.centroid_id, {})[r.dim_idx] = r.comp
    assert set(got) == {0, 3}
    assert got[0][0] == pytest.approx(1.0, abs=1e-6)   # mean of 1, .8, 1.2
    assert got[0][1] == pytest.approx(0.0, abs=1e-6)
    assert got[3][1] == pytest.approx(1.0, abs=1e-6)   # mean of 1, .9, 1.1
    assert got[3][0] == pytest.approx(0.0, abs=1e-6)


def test_random_projection_known_vectors(spark):
    """One-hot input e_i projects to plane column i (scaled by 1/||v||=1);
    a zero vector maps to all-zero components."""
    import numpy as np

    one_hot = np.zeros(64)
    one_hot[3] = 1.0
    out = similarity.random_projection(
        embs_df(spark, [one_hot, np.zeros(64)]), out_dim=4
    ).collect()
    comps = {(r.vec_id, r.dim_idx): r.comp for r in out}
    planes = dict(
        ((pl, d), c) for pl, d, c in similarity.srp_plane_values(4, 64, 177)
    )
    for j in range(4):
        assert comps[(0, j)] == pytest.approx(planes[(j, 3)], abs=1e-6)
        assert comps[(1, j)] == 0.0
    assert len(out) == 8


def test_multimodal_features_match_hashlib(spark):
    d = docs_df(spark, ["hello", "world"])
    feats = {
        r.doc_id: r
        for r in multimodal.extract_payload_features(
            multimodal.with_binary_payload(d)
        ).collect()
    }
    assert feats[0].payload_md5 == hashlib.md5(b"hello").hexdigest()
    assert feats[0].byte_len == 5
    assert feats[0].sniffed_format == "unknown"


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal._decode_image_stub(b"\x89PNG")


def test_frame_sample_plan(spark):
    d = docs_df(spark, ["x" * 250])  # 250 bytes -> 2 fake frames, step 10
    out = multimodal.frame_sample_plan(
        multimodal.with_binary_payload(d), every_n=1
    ).collect()
    assert [r.frame_idx for r in out] == [0, 1]


def test_quality_filter_uses_doc_language(spark):
    """Same Spanish text: scored against es markers when lang='es' (kept),
    against en markers when lang='en' (no hits -> dropped); an unknown
    lang falls back to the union of all languages' markers (kept)."""
    es_text = "el gato de la casa que corre en los campos por una senda verde"
    rows = spark.createDataFrame(
        [(0, es_text, "es"), (1, es_text, "en"), (2, es_text, "xx")],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in text.quality_filter(rows).collect()}
    assert out[0].stopword_frac > 0 and out[0].keep is True
    assert out[1].stopword_frac == 0.0 and out[1].keep is False
    assert out[2].stopword_frac == out[0].stopword_frac and out[2].keep is True


def test_dedup_against_index_incremental(spark, tmp_path):
    """The production incremental shape: index a base corpus once, probe an
    ingestion increment against the parquet round-trip of the index."""
    base = docs_df(
        spark,
        [
            "the quick brown fox jumps over the lazy dog again and again today",
            "completely different words with nothing shared at all here now ok",
        ],
    )
    index = dedup.minhash_index(base)
    path = str(tmp_path / "mh_index")
    index.write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)

    increment = spark.createDataFrame(
        [
            # near-dup of base doc 0 (one token changed)
            (100, "the quick brown fox jumps over the lazy dog again and again tomorrow",
             "xx", "inc", 70),
            # novel document
            (101, "unrelated fresh text about completely novel topics entirely elsewhere",
             "xx", "inc", 70),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    hits = dedup.dedup_against_index(increment, stored, threshold=0.3).collect()
    assert {(r.new_doc_id, r.index_doc_id) for r in hits} == {(100, 0)}
    assert 0.3 <= hits[0].est_jaccard <= 1.0

    # an exact copy agrees on every permutation -> estimate exactly 1.0
    copy = spark.createDataFrame(
        [(200, "the quick brown fox jumps over the lazy dog again and again today",
          "xx", "inc", 66)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    exact = dedup.dedup_against_index(copy, stored, threshold=0.99).collect()
    assert [(r.new_doc_id, r.index_doc_id, r.est_jaccard) for r in exact] == [
        (200, 0, 1.0)
    ]


def test_fingerprint_long_document_no_overflow(spark):
    """A document past the int64-sum overflow point (~92k tokens in the old
    explode formulation) must fingerprint exactly; pinned against a direct
    bignum computation of the same definition."""
    n = 100_000
    toks = [f"w{i % 997}" for i in range(n)]
    d = docs_df(spark, [" ".join(toks)])
    got = {r.doc_id: r.fingerprint for r in text.fingerprint(d).collect()}
    P31 = 2_147_483_647
    fp = 0
    for i, w in enumerate(toks):
        h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % P31
        fp = (fp + h * (i + 1)) % P31
    assert got == {0: fp}


def test_minhash_lsh_bucket_cap(spark):
    """Identical docs collapse into one band bucket per band; over the cap
    the bucket is dropped from candidate generation (the quadratic-blowup
    safety valve shared with the SimHash and embedding families)."""
    same = "the quick brown fox jumps over the lazy dog again and again today"
    d = docs_df(spark, [same] * 4)
    assert dedup.minhash_lsh_duplicates(d, threshold=0.9).count() == 6
    assert (
        dedup.minhash_lsh_duplicates(d, threshold=0.9, max_bucket_size=3).count()
        == 0
    )


def test_minhash_signature_narrow_equals_aggregate(spark):
    """The per-doc UDF signature (narrow path) must be bit-identical to the
    wide-aggregation form over exploded shingles — the invariant that lets
    batch and streaming consumers share one index."""
    d = docs_df(
        spark,
        [
            "the quick brown fox jumps over the lazy dog again and again",
            "a completely different document with its own words here",
            "short",  # under shingle width -> no signature in either form
            "the quick brown fox jumps over the lazy dog again and again",
        ],
    )
    arrays = dedup.shingle_arrays(d)
    narrow = sorted(
        dedup.minhash_signatures_narrow(arrays).collect(), key=lambda r: r.doc_id
    )
    agg = sorted(
        dedup.minhash_signatures(dedup.shingles(d)).collect(), key=lambda r: r.doc_id
    )
    assert [tuple(r) for r in narrow] == [tuple(r) for r in agg]
    assert {r.doc_id for r in narrow} == {0, 1, 3}


def test_corpus_profile_matches_duckdb_cube(spark, sf_small):
    """Every cell and margin of the report card must equal a DuckDB
    GROUP BY CUBE replay — exact ints, avg at 1e-6."""
    import duckdb

    from ccm_spark.functions.hashing import sql_tokens
    from ccm_spark.pipeline.text import corpus_profile
    from ccm_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    got = {
        (r.lang, r.source, r.is_total): (
            r.n_docs, r.n_tokens, r.avg_tokens, r.min_tokens, r.max_tokens
        )
        for r in corpus_profile(docs).collect()
    }
    want = {
        (lang, source, int(tot)): (
            int(nd), int(nt), float(avg), int(mn), int(mx)
        )
        for lang, source, tot, nd, nt, avg, mn, mx in duckdb.sql(
            f"""
WITH t AS (SELECT lang, source, len({sql_tokens('text')}) AS n
           FROM read_parquet('{sf_small}/documents.parquet'))
SELECT lang, source,
       (CASE WHEN GROUPING(lang) = 1 THEN 1 ELSE 0 END
        + CASE WHEN GROUPING(source) = 1 THEN 1 ELSE 0 END) AS is_total,
       count(*), sum(n), round(avg(n), 6), min(n), max(n)
FROM t GROUP BY CUBE (lang, source)"""
        ).fetchall()
    }
    assert got == want
    # the grand total row exists and sums the corpus
    grand = got[(None, None, 2)]
    assert grand[0] == docs.count()


def test_decode_images_real_formats_and_honest_failures(spark):
    """The r07 decode upgrade: binary PPM and 24-bit BMP decode for REAL
    (dims + per-channel means verified against the synthesized pixels);
    codec formats and garbage report decode_ok=false with the reason
    instead of dying."""
    import struct

    import numpy as np

    from ccm_spark.pipeline.multimodal import decode_images, py_decode_image

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)  # H=5 W=4

    ppm = b"P6\n# a comment\n4 5\n255\n" + img.tobytes()

    # 24-bit bottom-up BMP with row padding
    row_bytes = ((4 * 3 + 3) // 4) * 4
    bmp_rows = b""
    for r in range(4, -1, -1):  # bottom-up
        row = img[r][:, [2, 1, 0]].tobytes()  # BGR
        bmp_rows += row + b"\x00" * (row_bytes - len(row))
    data_off = 14 + 40
    bmp = (
        b"BM" + struct.pack("<IHHI", data_off + len(bmp_rows), 0, 0, data_off)
        + struct.pack("<Iii", 40, 4, 5)
        + struct.pack("<HH", 1, 24)
        + struct.pack("<IIiiII", 0, len(bmp_rows), 2835, 2835, 0, 0)
        + bmp_rows
    )

    # driver-side kernel checks pixels exactly
    for blob in (ppm, bmp):
        h, w, c, decoded = py_decode_image(blob)
        assert (h, w, c) == (5, 4, 3)
        np.testing.assert_array_equal(decoded, img)

    rows = [
        (0, bytearray(ppm)),
        (1, bytearray(bmp)),
        (2, bytearray(b"\xff\xd8\xff\xe0 fake jpeg body")),
        (3, bytearray(b"not an image at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_images(df).collect()}
    for i in (0, 1):
        assert got[i].decode_ok
        assert (got[i].height, got[i].width, got[i].channels) == (5, 4, 3)
        want_means = [round(float(img[:, :, ch].mean()), 6) for ch in range(3)]
        assert list(got[i].mean_channel) == want_means
    assert not got[2].decode_ok and "NotImplementedError" in got[2].decode_error
    assert not got[3].decode_ok


def test_r08_rotated_rows_match_duckdb_replay(spark, sf_small):
    """r08 rotation pins (QUERIES.md ledger): ann_srp_buckets /
    embedding_projection / ann_ivf_topk / text_token_counts /
    events_asof_tolerance lost their driver gate slots to the PQ /
    pagerank / BPE / CMS / WARC families; each rotated-out relation
    stays cross-engine hash-checked here at sf0.001, exactly the way
    the driver would check it."""
    import duckdb

    from ccm_spark import entry
    from ccm_spark.plans import oracle_sql_ext as oe
    from ccm_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_small}/{t}.parquet')"
        )
    cases = {
        "ann_srp_buckets": (entry.q_ann_srp_buckets, oe.sql_ann_srp_buckets()),
        "embedding_projection": (
            entry.q_embedding_projection,
            oe.sql_embedding_projection(),
        ),
        "ann_ivf_topk": (entry.q_ann_ivf_topk, oe.sql_ann_ivf_topk()),
        "text_token_counts": (entry.q_text_token_counts, oe.sql_text_token_counts()),
        "events_asof_tolerance": (
            entry.q_events_asof_tolerance,
            oe.sql_events_asof_tolerance(),
        ),
    }
    def _key(t):  # None-safe total order (tolerance rows carry NULLs)
        return tuple((v is None, str(v)) for v in t)

    for name, (q, sql) in cases.items():
        sdf = q(spark, sf_small)
        cols = sorted(sdf.columns)
        got = sorted((tuple(r[c] for c in cols) for r in sdf.collect()), key=_key)
        rel = con.sql(sql)
        d_cols = rel.columns
        assert sorted(d_cols) == cols, (name, d_cols, cols)
        # Arrow fetch: NULLs stay None, no NaN coercion (the driver's path)
        d_rows = rel.fetch_arrow_table().to_pylist()
        want = sorted((tuple(row[c] for c in cols) for row in d_rows), key=_key)
        assert got == want, f"{name}: {len(got)} spark rows != {len(want)} oracle rows or values differ"


def test_r09_rotated_rows_match_duckdb_replay(spark, sf_small):
    """r09 rotation pins (QUERIES.md ledger): ccm_lib_ladder /
    text_fingerprint / ann_ivf_recall / multimodal_frames /
    events_quantiles / customers_no_urgent_orders lost their driver
    gate slots to the classifier / DSIR / wordpiece / HLL / streaming /
    robots families; each rotated-out relation stays cross-engine
    hash-checked here at sf0.001, exactly the way the driver would
    check it."""
    import duckdb

    from ccm_spark import entry
    from ccm_spark.plans import oracle_sql as osql
    from ccm_spark.plans import oracle_sql_ext as oe
    from ccm_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_small}/{t}.parquet')"
        )
    cases = {
        "ccm_lib_ladder": (entry.q_ccm_lib_ladder, osql.sql_ccm_lib_ladder()),
        "text_fingerprint": (entry.q_text_fingerprint, oe.sql_text_fingerprint()),
        "ann_ivf_recall": (entry.q_ann_ivf_recall, oe.sql_ann_ivf_recall()),
        "multimodal_frames": (
            entry.q_multimodal_frames,
            oe.sql_multimodal_frames(),
        ),
        "events_quantiles": (entry.q_events_quantiles, oe.sql_events_quantiles()),
        "customers_no_urgent_orders": (
            entry.q_customers_no_urgent_orders,
            oe.sql_customers_no_urgent_orders(),
        ),
    }

    def _key(t):  # None-safe total order
        return tuple((v is None, str(v)) for v in t)

    for name, (q, sql) in cases.items():
        sdf = q(spark, sf_small)
        cols = sorted(sdf.columns)
        got = sorted((tuple(r[c] for c in cols) for r in sdf.collect()), key=_key)
        rel = con.sql(sql)
        d_cols = rel.columns
        assert sorted(d_cols) == cols, (name, d_cols, cols)
        d_rows = rel.fetch_arrow_table().to_pylist()
        want = sorted((tuple(row[c] for c in cols) for row in d_rows), key=_key)
        assert got == want, (
            f"{name}: {len(got)} spark rows != {len(want)} oracle rows "
            "or values differ"
        )


def test_r10_rotated_rows_match_duckdb_replay(spark, sf_small):
    """r10 rotation pins (QUERIES.md ledger): dedup_incremental /
    gen_coupled_series_noisy / text_quality_filter / text_redact_pii /
    lm_perplexity lost their driver gate slots to the sessionize /
    quantize / fertility / validated-PII / Kneser-Ney families; each
    rotated-out relation stays cross-engine hash-checked here at
    sf0.001, exactly the way the driver would check it."""
    import duckdb

    from ccm_spark import entry
    from ccm_spark.plans import oracle_sql_ext as oe
    from ccm_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_small}/{t}.parquet')"
        )
    cases = {
        "dedup_incremental": (
            entry.q_dedup_incremental,
            oe.sql_dedup_against_index(),
        ),
        "gen_coupled_series_noisy": (
            entry.q_gen_coupled_series_noisy,
            oe.sql_gen_coupled_series_noisy(),
        ),
        "text_quality_filter": (
            entry.q_text_quality_filter,
            oe.sql_text_quality_filter(),
        ),
        "text_redact_pii": (entry.q_text_redact_pii, oe.sql_text_redact_pii()),
        "lm_perplexity": (entry.q_lm_perplexity, oe.sql_lm_perplexity()),
    }

    def _key(t):  # None-safe total order (token-less LM rows carry NULLs)
        return tuple((v is None, str(v)) for v in t)

    for name, (q, sql) in cases.items():
        sdf = q(spark, sf_small)
        cols = sorted(sdf.columns)
        got = sorted((tuple(r[c] for c in cols) for r in sdf.collect()), key=_key)
        rel = con.sql(sql)
        d_cols = rel.columns
        assert sorted(d_cols) == cols, (name, d_cols, cols)
        d_rows = rel.fetch_arrow_table().to_pylist()
        want = sorted((tuple(row[c] for c in cols) for row in d_rows), key=_key)
        assert got == want, (
            f"{name}: {len(got)} spark rows != {len(want)} oracle rows "
            "or values differ"
        )


def test_r11_rotated_rows_match_duckdb_replay(spark, sf_small):
    """r11 rotation pins (QUERIES.md ledger): events_sessionize /
    dedup_ngram_jaccard / kmeans_clusters / decontaminate /
    text_vocab_topk lost their driver gate slots to the knn_graph /
    graph_diversity / semantic_dedup / eval_contamination /
    bottomk_quantiles families; each rotated-out relation stays
    cross-engine hash-checked here at sf0.001, exactly the way the
    driver would check it."""
    import duckdb

    from ccm_spark import entry
    from ccm_spark.plans import oracle_sql_ext as oe
    from ccm_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_small}/{t}.parquet')"
        )
    cases = {
        "events_sessionize": (
            entry.q_events_sessionize,
            oe.sql_events_sessionize(),
        ),
        "dedup_ngram_jaccard": (
            entry.q_dedup_ngram_jaccard,
            oe.sql_dedup_ngram_jaccard(),
        ),
        "kmeans_clusters": (entry.q_kmeans_clusters, oe.sql_kmeans_clusters()),
        "decontaminate": (entry.q_decontaminate, oe.sql_decontaminate()),
        "text_vocab_topk": (entry.q_text_vocab_topk, oe.sql_text_vocab_topk()),
    }

    def _key(t):
        return tuple((v is None, str(v)) for v in t)

    for name, (q, sql) in cases.items():
        sdf = q(spark, sf_small)
        cols = sorted(sdf.columns)
        got = sorted((tuple(r[c] for c in cols) for r in sdf.collect()), key=_key)
        rel = con.sql(sql)
        d_cols = rel.columns
        assert sorted(d_cols) == cols, (name, d_cols, cols)
        d_rows = rel.fetch_arrow_table().to_pylist()
        want = sorted((tuple(row[c] for c in cols) for row in d_rows), key=_key)
        assert got == want, (
            f"{name}: {len(got)} spark rows != {len(want)} oracle rows "
            "or values differ"
        )


def test_r12_rotated_rows_match_duckdb_replay(spark, sf_small):
    """r12 rotation pins (QUERIES.md ledger): dedup_simhash_pairs /
    events_hourly_stats / wordpiece_encode / dedup_minhash_lsh lost
    their driver gate slots to knn_graph_insert / shipping_priority /
    corpus_divergence / phrase_blocklist; each rotated-out relation
    stays cross-engine hash-checked here at sf0.001, exactly the way
    the driver would check it (the outgoing rows' oracles also remain
    nested verbatim inside still-gated siblings — dedup_components
    embeds the LSH chain, tokenizer_fertility embeds wordpiece — so
    this is the direct pin on top of that transitive evidence)."""
    import duckdb

    from ccm_spark import entry
    from ccm_spark.plans import oracle_sql_ext as oe
    from ccm_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_small}/{t}.parquet')"
        )
    cases = {
        "dedup_simhash_pairs": (
            entry.q_dedup_simhash_pairs,
            oe.sql_dedup_simhash_pairs(),
        ),
        "events_hourly_stats": (
            entry.q_events_hourly_stats,
            oe.sql_events_hourly_stats(),
        ),
        "wordpiece_encode": (
            entry.q_wordpiece_encode,
            oe.sql_wordpiece_encode(),
        ),
        "dedup_minhash_lsh": (
            entry.q_dedup_minhash_lsh,
            oe.sql_dedup_minhash_lsh(),
        ),
    }

    def _key(t):
        return tuple((v is None, str(v)) for v in t)

    for name, (q, sql) in cases.items():
        sdf = q(spark, sf_small)
        cols = sorted(sdf.columns)
        got = sorted((tuple(r[c] for c in cols) for r in sdf.collect()), key=_key)
        rel = con.sql(sql)
        d_cols = rel.columns
        assert sorted(d_cols) == cols, (name, d_cols, cols)
        d_rows = rel.fetch_arrow_table().to_pylist()
        want = sorted((tuple(row[c] for c in cols) for row in d_rows), key=_key)
        assert got == want, (
            f"{name}: {len(got)} spark rows != {len(want)} oracle rows "
            "or values differ"
        )


def test_r13_rotated_rows_match_duckdb_replay(spark, sf_small):
    """r13 rotation pins (QUERIES.md ledger): hll_vocab / cms_sketch /
    text_langid / warc_extract lost their driver gate slots to
    knn_graph_search / chunk_documents / char_entropy /
    hourly_anomalies; each rotated-out relation stays cross-engine
    hash-checked here at sf0.001 exactly the way the driver would
    check it (both sketch relations also remain joined verbatim inside
    the still-gated bottomk_quantiles twin, and the WARC chain's HTML
    stage inside the still-gated html_extract — this is the direct pin
    on top of that transitive evidence)."""
    import duckdb

    from ccm_spark import entry
    from ccm_spark.plans import oracle_sql_ext as oe
    from ccm_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_small}/{t}.parquet')"
        )
    cases = {
        "hll_vocab": (entry.q_hll_vocab, oe.sql_hll_registers()),
        "cms_sketch": (entry.q_cms_sketch, oe.sql_cms_sketch()),
        "text_langid": (entry.q_text_langid, oe.sql_text_langid()),
        "warc_extract": (entry.q_warc_extract, oe.sql_warc_extract()),
    }

    def _key(t):
        return tuple((v is None, str(v)) for v in t)

    for name, (q, sql) in cases.items():
        sdf = q(spark, sf_small)
        cols = sorted(sdf.columns)
        got = sorted((tuple(r[c] for c in cols) for r in sdf.collect()), key=_key)
        rel = con.sql(sql)
        d_cols = rel.columns
        assert sorted(d_cols) == cols, (name, d_cols, cols)
        d_rows = rel.fetch_arrow_table().to_pylist()
        want = sorted((tuple(row[c] for c in cols) for row in d_rows), key=_key)
        assert got == want, (
            f"{name}: {len(got)} spark rows != {len(want)} oracle rows "
            "or values differ"
        )


def test_r14_rotated_rows_match_duckdb_replay(spark, sf_small):
    """r14 rotation pins (QUERIES.md ledger): text_quality /
    text_repetition / url_dedup / top_customers_by_nation lost their
    driver gate slots to chunk_by_sentences / winnow_fingerprints /
    plan_compaction / hourly_anomalies_watermarked; each rotated-out
    relation stays cross-engine hash-checked here at sf0.001 exactly
    the way the driver would check it (the text rows' splitter/signal
    relations also stay gated through text_token_stats /
    boilerplate_ngrams, the crawl family through html_extract /
    robots_rules / pagerank_hosts, and the fact-dim top-k plan shape
    through shipping_priority — this is the direct pin on top of that
    transitive evidence)."""
    import duckdb

    from ccm_spark import entry
    from ccm_spark.plans import oracle_sql_ext as oe
    from ccm_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_small}/{t}.parquet')"
        )
    cases = {
        "text_quality": (entry.q_text_quality, oe.sql_text_quality()),
        "text_repetition": (
            entry.q_text_repetition,
            oe.sql_text_repetition(),
        ),
        "url_dedup": (entry.q_url_dedup, oe.sql_url_dedup()),
        "top_customers_by_nation": (
            entry.q_top_customers_by_nation,
            oe.sql_top_customers_by_nation(),
        ),
    }

    def _key(t):
        return tuple((v is None, str(v)) for v in t)

    for name, (q, sql) in cases.items():
        sdf = q(spark, sf_small)
        cols = sorted(sdf.columns)
        got = sorted((tuple(r[c] for c in cols) for r in sdf.collect()), key=_key)
        rel = con.sql(sql)
        d_cols = rel.columns
        assert sorted(d_cols) == cols, (name, d_cols, cols)
        d_rows = rel.fetch_arrow_table().to_pylist()
        want = sorted((tuple(row[c] for c in cols) for row in d_rows), key=_key)
        assert len(got) > 0
        assert got == want, (
            f"{name}: {len(got)} spark rows != {len(want)} oracle rows "
            "or values differ"
        )


def test_corpus_diff_matches_duckdb_twin(spark, sf_small):
    """Parity-fixture diff (r12 gate candidate, QUERIES.md): the full
    4-column output (status + both hashes) of the NULL-safe operator —
    whose hand-built semantics are already pinned in
    test_line_dedup.py::test_corpus_diff_statuses — hash-matched
    against the DuckDB twin on real testdata, all four statuses
    exercised."""
    import duckdb
    import pyspark.sql.functions as F

    from ccm_spark.pipeline.dedup import corpus_diff

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    old = docs.where("doc_id % 7 != 0").select("doc_id", "text")
    new = docs.where("doc_id % 5 != 0").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat("text", F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    got = sorted(
        (r.doc_id, r.status, r.old_hash, r.new_hash)
        for r in corpus_diff(old, new).collect()
    )
    from ccm_spark.plans.oracle_sql_ext import sql_corpus_diff

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = sorted(
        (int(a), str(b), None if c is None else int(c), None if d is None else int(d))
        for a, b, c, d in con.sql(sql_corpus_diff()).fetchall()
    )
    assert got == want
    statuses = {s for _, s, _, _ in got}
    assert statuses == {"added", "removed", "changed", "unchanged"}


def test_r15_rotated_rows_match_duckdb_replay(spark, sf_small):
    """r15 rotation pins (QUERIES.md ledger): text_token_stats /
    pricing_summary / events_asof_join / hourly_anomalies lost their
    driver gate slots to detect_gaps / key_skew_report /
    local_supplier_volume / hits_hosts; each rotated-out relation stays
    cross-engine hash-checked here at sf0.001 exactly the way the
    driver would check it (transitive evidence on top of this direct
    pin: the splitter/signal relations stay gated through char_entropy
    / boilerplate_ngrams / the chunking rows, scan->filter->agg
    pushdown through parts_no_bulk_returns / shipping_priority, and
    the hourly anomaly tree is nested VERBATIM — same SQL generator —
    inside the still-gated hourly_anomalies_watermarked; the as-of
    union-tag + last-value window keeps its stage pins in
    tests/test_events_ops.py)."""
    import duckdb

    from ccm_spark import entry
    from ccm_spark.plans import oracle_sql_ext as oe
    from ccm_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_small}/{t}.parquet')"
        )
    cases = {
        "text_token_stats": (
            entry.q_text_token_stats,
            oe.sql_text_token_stats(),
        ),
        "pricing_summary": (entry.q_pricing_summary, oe.sql_pricing_summary()),
        "events_asof_join": (
            entry.q_events_asof_join,
            oe.sql_events_asof_join(),
        ),
        "hourly_anomalies": (
            entry.q_hourly_anomalies,
            oe.sql_hourly_anomalies(),
        ),
    }

    def _key(t):
        return tuple((v is None, str(v)) for v in t)

    for name, (q, sql) in cases.items():
        sdf = q(spark, sf_small)
        cols = sorted(sdf.columns)
        got = sorted((tuple(r[c] for c in cols) for r in sdf.collect()), key=_key)
        rel = con.sql(sql)
        d_cols = rel.columns
        assert sorted(d_cols) == cols, (name, d_cols, cols)
        d_rows = rel.fetch_arrow_table().to_pylist()
        want = sorted((tuple(row[c] for c in cols) for row in d_rows), key=_key)
        assert len(got) > 0
        assert got == want, (
            f"{name}: {len(got)} spark rows != {len(want)} oracle rows "
            "or values differ"
        )


def test_r16_rotated_rows_match_duckdb_replay(spark, sf_small):
    """r16 rotation pins (QUERIES.md ledger): detect_gaps /
    ann_cosine_topk / knn_graph lose their driver gate slots to
    gap_monitor / hybrid_search_rrf / salted_join; each rotated-out
    relation stays cross-engine hash-checked here at its GATE CONFIG
    exactly the way the driver would check it. Transitive evidence on
    top of this direct pin: sql_detect_gaps is nested verbatim inside
    the incoming gap_monitor twin (closed rows = the batch relation cut
    at the final watermark), sql_ann_cosine_topk verbatim inside the
    incoming hybrid twin's vector arm, and sql_knn_graph MATERIALIZED
    inside BOTH the still-gated knn_graph_insert and graph_diversity
    twins."""
    import duckdb

    from ccm_spark import entry
    from ccm_spark.plans import oracle_sql_ext as oe
    from ccm_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_small}/{t}.parquet')"
        )
    cases = {
        "detect_gaps": (entry.q_detect_gaps, oe.sql_detect_gaps()),
        "ann_cosine_topk": (
            entry.q_ann_cosine_topk,
            oe.sql_ann_cosine_topk(),
        ),
        "knn_graph": (entry.q_knn_graph, oe.sql_knn_graph()),
    }

    def _key(t):
        return tuple((v is None, str(v)) for v in t)

    for name, (q, sql) in cases.items():
        sdf = q(spark, sf_small)
        cols = sorted(sdf.columns)
        got = sorted((tuple(r[c] for c in cols) for r in sdf.collect()), key=_key)
        rel = con.sql(sql)
        d_cols = rel.columns
        assert sorted(d_cols) == cols, (name, d_cols, cols)
        d_rows = rel.fetch_arrow_table().to_pylist()
        want = sorted((tuple(row[c] for c in cols) for row in d_rows), key=_key)
        assert len(got) > 0
        assert got == want, (
            f"{name}: {len(got)} spark rows != {len(want)} oracle rows "
            "or values differ"
        )
