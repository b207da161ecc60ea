"""Training-data pipeline ops vs ground truth (DuckDB / numpy)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.ops import dedup, multimodal, similarity, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    return con


def test_exact_dedup(spark, docs):
    # inject known duplicates
    d0 = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 100000)
    with_dupes = docs.unionByName(d0)
    groups = dedup.exact_duplicate_groups(with_dupes).collect()
    assert len(groups) == 5
    for g in groups:
        assert g["n_dupes"] == 2
        assert g["keep_id"] == min(g["dup_ids"])
    kept = dedup.dedup_exact(with_dupes)
    assert kept.count() == docs.count()


def test_ngram_jaccard_vs_duckdb(docs, duck):
    got = dedup.ngram_jaccard_pairs(docs.limit(80), k=2, threshold=0.15).collect()
    want = duck.execute("""
        WITH d AS (SELECT * FROM documents WHERE doc_id < 1e18 LIMIT 80),
        tok AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM d),
        sh AS (
          SELECT DISTINCT doc_id, unnest(
            list_transform(generate_series(1, len(ts) - 1),
                           i -> array_to_string(ts[i:i+1], ' '))) AS shingle
          FROM tok WHERE len(ts) >= 2),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b,
               round(common * 1.0 / (sa.sz + sb.sz - common), 6) AS jaccard
        FROM pairs JOIN sizes sa ON sa.doc_id = id_a
                   JOIN sizes sb ON sb.doc_id = id_b
        WHERE common * 1.0 / (sa.sz + sb.sz - common) >= 0.15
    """).fetchall()
    got_set = {(r["id_a"], r["id_b"]) for r in got}
    want_set = {(w[0], w[1]) for w in want}
    assert got_set == want_set
    got_j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in got}
    for w in want:
        assert math.isclose(got_j[(w[0], w[1])], w[2], abs_tol=2e-6)


def test_minhash_lsh_finds_near_dupes(spark, docs):
    # near-dup: copy docs and append a couple of tokens
    base = docs.limit(20)
    near = base.withColumn("doc_id", F.col("doc_id") + 100000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" extra token"))
    )
    both = base.unionByName(near)
    pairs = dedup.minhash_lsh_pairs(both, k=3, n_hashes=64, bands=16)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    expected = {(r["doc_id"], r["doc_id"] + 100000) for r in base.collect()}
    # banded LSH at 16 bands x 4 rows: P(detect) ~ 1-(1-s^4)^16, s~0.9+
    found = sum(1 for e in expected if e in got)
    assert found >= len(expected) * 0.9


def test_simhash_near_dupes(spark, docs):
    base = docs.limit(15)
    near = base.withColumn("doc_id", F.col("doc_id") + 100000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zz"))
    )
    both = base.unionByName(near)
    pairs = dedup.simhash_pairs(both, max_hamming=3).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    expected = {(r["doc_id"], r["doc_id"] + 100000) for r in base.collect()}
    found = sum(1 for e in expected if e in got)
    assert found >= len(expected) * 0.8
    for r in pairs:
        assert r["hamming"] <= 3


def test_simhash_values_deterministic(docs):
    a = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs.limit(30)).collect()}
    b = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs.limit(30).repartition(7)).collect()}
    assert a == b


def test_cosine_topk_vs_numpy(emb):
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q = m[0]
    sims = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -sims))[:10]
    want = [(int(ids[i]), float(sims[i])) for i in order]
    got = similarity.cosine_topk(emb, list(q), k=10).collect()
    assert [r["vec_id"] for r in got] == [w[0] for w in want]
    for r, w in zip(got, want):
        assert math.isclose(r["cosine"], w[1], rel_tol=1e-9)


def test_cosine_topk_batch(emb):
    qdf = emb.limit(3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = similarity.cosine_topk_batch(emb, qdf, k=5).collect()
    assert len(out) == 15
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    for q_id, rs in by_q.items():
        # self is the nearest neighbour
        assert rs[0]["vec_id"] == q_id
        assert math.isclose(rs[0]["cosine"], 1.0, rel_tol=1e-9)


def test_ann_self_join_recall(emb):
    exact = similarity.cosine_topk_batch(
        emb,
        emb.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")),
        k=4,
    ).filter(F.col("vec_id") != F.col("q_id"))
    approx = similarity.ann_self_join(emb, dim=64, k=3, n_planes=6, n_tables=16)
    e = {(r["q_id"], r["vec_id"]) for r in exact.filter(F.col("rank") <= 2).collect()}
    a = {(r["id_a"], r["id_b"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall > 0.4  # 8 tables x 6 planes multi-table LSH


def test_minhash_array_variant_identical(spark, docs):
    a = dedup.minhash_signatures(docs, k=2, n_hashes=16, use_arrays=False)
    b = dedup.minhash_signatures(docs, k=2, n_hashes=16, use_arrays=True)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb


def test_ann_degenerate_bucket_is_capped(spark):
    """All-identical vectors land in ONE bucket in every table; the
    max_bucket cap + chunked matmul must keep that O(cap^2 / chunks),
    not O(n^2), and still return k neighbours per retained id."""
    import numpy as np

    n = 3000
    vec = [float(x) for x in np.arange(8)]
    rows = [(i, vec) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.ann_self_join(
        emb, dim=8, k=2, n_planes=4, n_tables=2, max_bucket=200,
        chunk_rows=64,
    ).collect()
    ids_a = {r["id_a"] for r in out}
    # only the cap's smallest ids emit pairs; each has exactly k
    assert ids_a == set(range(200))
    per = {}
    for r in out:
        per.setdefault(r["id_a"], []).append(r)
        assert math.isclose(r["cosine"], 1.0, rel_tol=1e-9)
    assert all(len(v) == 2 for v in per.values())


def test_token_count_and_fingerprint_vs_duckdb(docs, duck):
    got = {r["doc_id"]: r["n_tokens"] for r in text.token_count(docs).select("doc_id", "n_tokens").collect()}
    want = dict(duck.execute(text.token_count_sql()).fetchall())
    assert got == want
    gotf = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(docs).select("doc_id", "fingerprint").collect()}
    wantf = dict(duck.execute(text.fingerprint_sql()).fetchall())
    assert gotf == wantf


def test_language_id_accuracy(docs):
    out = text.language_id(docs).select("lang", "lang_pred").collect()
    known = [r for r in out if r["lang"] in text.STOPWORDS]
    acc = sum(1 for r in known if r["lang_pred"] == r["lang"]) / len(known)
    # documents text is synthetic English-ish; just assert determinism + range
    assert all(r["lang_pred"] in (*text.STOPWORDS, "unk") for r in out)
    assert 0.0 <= acc <= 1.0


def test_quality_score_range(docs):
    out = text.quality_score(docs).select("quality").collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in out)


def test_multimodal_image_features(spark):
    media = multimodal.generate_media(spark, n=30)
    imgs = media.filter(F.col("kind") == "image")
    feats = multimodal.image_features(imgs).collect()
    assert len(feats) == imgs.count()
    for r in feats:
        assert 0 <= r["mean_r"] <= 255
        assert len(r["thumb"]) == 64
    # determinism
    again = multimodal.image_features(imgs).collect()
    assert {r["media_id"]: r["mean_r"] for r in feats} == {
        r["media_id"]: r["mean_r"] for r in again
    }


def test_multimodal_real_decoder_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.real_decode_image(b"x", 4, 4)


def test_multimodal_audio_features(spark):
    import numpy as np

    media = multimodal.generate_media(spark, n=30)
    auds = media.filter(F.col("kind") == "audio")
    feats = multimodal.audio_features(auds).collect()
    assert len(feats) == auds.count()
    for r in feats:
        assert len(r["band_energy"]) == 8
        assert r["rms"] > 0 and 0 <= r["zcr"] <= 1
    # vectorized path == a direct per-sample recomputation
    one = auds.orderBy("media_id").first()
    x = multimodal.fake_decode_audio(bytes(one["payload"]),
                                     one["duration_ms"])
    want_rms = float(np.sqrt((x * x).mean()))
    got = {r["media_id"]: r["rms"] for r in feats}[one["media_id"]]
    assert abs(got - want_rms) < 1e-9


def test_frame_sample(spark):
    media = multimodal.generate_media(spark, n=30)
    frames = multimodal.frame_sample(media, every_ms=1000)
    rows = frames.groupBy("media_id").count().collect()
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    for r in rows:
        assert r["count"] == max(durations[r["media_id"]] // 1000, 1)


def test_minhash_lsh_strategy_parity(spark):
    """Every (strategy, use_arrays) combination emits EXACTLY the same
    candidate set — same bands, same cap semantics, identical
    signatures (the array path is bit-equal to the explode path)."""
    from elasticsearch_spark.ops import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    default = set(map(tuple, dedup.minhash_lsh_pairs(docs).collect()))
    assert len(default) > 0
    for strategy in ("join", "bucketed"):
        for arrays in (True, False):
            got = set(map(tuple, dedup.minhash_lsh_pairs(
                docs, strategy=strategy, use_arrays=arrays).collect()))
            assert got == default, (strategy, arrays)


def test_ivf_exact_when_probing_all(spark):
    """nprobe == n_clusters must reproduce brute force exactly."""
    from elasticsearch_spark.ops import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in emb.first()["embedding"]]
    brute = [r["vec_id"] for r in
             similarity.cosine_topk(emb, qv, k=5).collect()]
    ivf = [r["vec_id"] for r in
           similarity.ivf_topk(emb, qv, k=5, n_clusters=4, nprobe=4,
                               iters=1).collect()]
    assert ivf == brute


def test_ivf_recall_at_partial_probe(spark):
    """nprobe = half the clusters keeps recall@5 high on the synthetic
    embeddings (clustered corpus -> the S-curve IVF relies on)."""
    from elasticsearch_spark.ops import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    asg, cent = similarity.ivf_build(emb, n_clusters=8, iters=2)
    asg = asg.cache()
    hits = total = 0
    for qid in (0, 7, 21):
        qv = [float(x) for x in
              emb.filter(emb.vec_id == qid).first()["embedding"]]
        brute = {r["vec_id"] for r in
                 similarity.cosine_topk(emb, qv, k=5).collect()}
        ivf = {r["vec_id"] for r in
               similarity.ivf_topk(emb, qv, k=5, n_clusters=8, nprobe=4,
                                   assignments=asg, centroids=cent).collect()}
        hits += len(brute & ivf)
        total += len(brute)
    assert hits / total >= 0.6, f"recall {hits}/{total}"


def test_pii_scrub(spark):
    from elasticsearch_spark.ops.text import pii_scrub

    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-corp.io, ip 10.1.2.3, card 4111 1111 1111 1111,"
             " tel +44 20 7946 0958, clean 42")],
        "doc_id long, text string")
    out = pii_scrub(df).first()["text_scrubbed"]
    assert "<EMAIL>" in out and "<IP>" in out and "<CARD>" in out \
        and "<PHONE>" in out
    assert "clean 42" in out  # short digits untouched


# --- knn search section + embedding-cosine near-dup (round 4) --------


def _emb_matrix(emb):
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return rows, ids, m


def test_knn_search_cosine_matches_numpy(emb):
    rows, ids, m = _emb_matrix(emb)
    q = m[3]
    scores = (1 + (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))) / 2
    order = np.lexsort((ids, -scores))[:10]
    got = similarity.knn_search(emb, list(q), k=10).collect()
    assert [r["vec_id"] for r in got] == [int(ids[i]) for i in order]
    for r, i in zip(got, order):
        assert math.isclose(r["score"], scores[i], rel_tol=1e-9)


def test_knn_search_filter_prunes_candidates(emb):
    # pre-filter semantics: the k slots are contested ONLY by rows
    # passing the filter (not a post-filter of the unfiltered top-k)
    rows, ids, m = _emb_matrix(emb)
    q = m[3]
    labels = np.array([r["label"] for r in rows])
    keep = labels % 2 == 0
    d2 = ((m - q) ** 2).sum(axis=1)
    scores = np.where(keep, 1.0 / (1.0 + d2), -np.inf)
    order = np.lexsort((ids, -scores))[:5]
    got = similarity.knn_search(
        emb, list(q), k=5, similarity="l2_norm",
        filter_cond=F.pmod(F.col("label"), F.lit(2)) == 0).collect()
    assert [r["vec_id"] for r in got] == [int(ids[i]) for i in order]
    assert all(labels[np.where(ids == r["vec_id"])[0][0]] % 2 == 0
               for r in got)


def test_knn_search_similarity_transforms(emb):
    rows, ids, m = _emb_matrix(emb)
    q = m[0]
    for sim, fn in [
        ("dot_product", lambda s: (1 + s) / 2),
        ("max_inner_product",
         lambda s: np.where(s < 0, 1.0 / (1.0 - s), s + 1.0)),
    ]:
        dots = m @ q
        scores = fn(dots)
        order = np.lexsort((ids, -scores))[:5]
        got = similarity.knn_search(emb, list(q), k=5, similarity=sim).collect()
        assert [r["vec_id"] for r in got] == [int(ids[i]) for i in order], sim


def test_knn_search_ivf_full_probe_exact(emb):
    exact = similarity.knn_search(emb.limit(100), [1.0] * 64, k=5).collect()
    ivf = similarity.knn_search(
        emb.limit(100), [1.0] * 64, k=5, strategy="ivf",
        num_candidates=100, n_clusters=4).collect()
    # num_candidates >= n rows forces nprobe == n_clusters == exact
    assert [r["vec_id"] for r in ivf] == [r["vec_id"] for r in exact]


def test_combine_knn_query_sums_scores(spark):
    a = spark.createDataFrame(
        [(1, 5.0), (2, 3.0), (3, 1.0)], "doc_id int, score double")
    b = spark.createDataFrame(
        [(2, 0.9), (4, 0.8)], "doc_id int, score double")
    got = {r["doc_id"]: r["score"]
           for r in similarity.combine_knn_query(a, b, k=10).collect()}
    assert got == {1: 5.0, 2: 3.9, 3: 1.0, 4: 0.8}


def test_embedding_cosine_pairs_vs_numpy(emb):
    sub = emb.filter(F.col("vec_id") < 120)
    rows, ids, m = _emb_matrix(sub)
    labels = np.array([r["label"] for r in rows])
    n = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = n @ n.T
    want = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if (ids[i] < ids[j] and labels[i] == labels[j]
                    and sims[i, j] >= 0.2):
                want.add((int(ids[i]), int(ids[j])))
    got = dedup.embedding_cosine_pairs(
        sub, threshold=0.2, block_col="label").collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == want
    for r in got:
        i = np.where(ids == r["id_a"])[0][0]
        j = np.where(ids == r["id_b"])[0][0]
        assert math.isclose(r["cosine"], sims[i, j], rel_tol=1e-9)


def test_embedding_cosine_pairs_refuses_unblocked_cartesian(spark):
    big = spark.range(25_000).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"))
    with pytest.raises(ValueError, match="cartesian"):
        dedup.embedding_cosine_pairs(big)


def test_version_sort_key_semver_order(spark):
    import duckdb

    vs = ["1.2.0", "1.10.0", "1.2.0-alpha", "1.2.0-beta", "0.9.9",
          "2.0.0", "1.2.0-alpha-2", "10.0.0", "1.2.x"]
    df = spark.createDataFrame([(v,) for v in vs], "version string")
    got = [r["version"] for r in df.orderBy(
        F.asc(text.version_sort_key("version"))).collect()]
    # prereleases before their release; numeric segments numeric;
    # non-numeric segment ('x') after numerics
    assert got.index("1.2.0-alpha") < got.index("1.2.0")
    assert got.index("1.2.0") < got.index("1.10.0") < got.index("2.0.0")
    assert got.index("2.0.0") < got.index("10.0.0")
    # non-numeric segment sorts after any numeric AT THE SAME position
    # (1.2.x > 1.2.0); earlier segments still dominate (1.2.x < 1.10.0)
    assert got.index("1.2.0") < got.index("1.2.x") < got.index("1.10.0")
    # DuckDB twin produces the identical total order
    con = duckdb.connect()
    con.execute("CREATE TABLE v(version VARCHAR)")
    con.executemany("INSERT INTO v VALUES (?)", [(v,) for v in vs])
    want = [r[0] for r in con.execute(
        "SELECT version FROM v ORDER BY "
        + text.version_sort_key_sql("version") + " ASC").fetchall()]
    assert got == want


def test_quantized_topk_recall_and_rescore_exactness(emb):
    """int8 two-phase knn: rescored cosines are EXACT (same float math
    as brute force) and recall@10 vs exact top-10 is high at 3x
    oversample on real embeddings."""
    q = list(emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    exact = similarity.cosine_topk(emb, q, k=10).collect()
    quant = similarity.quantized_topk(emb, q, k=10, oversample=3).collect()
    exact_map = {r["vec_id"]: r["cosine"] for r in exact}
    hits = [r for r in quant if r["vec_id"] in exact_map]
    assert len(hits) >= 8  # recall@10 >= 0.8
    for r in hits:  # any overlap scores bit-identically (exact rescore)
        assert math.isclose(r["cosine"], exact_map[r["vec_id"]],
                            rel_tol=1e-12)


def test_quantize_int8_codes_in_range(emb):
    d = similarity.quantize_int8(emb)
    bounds = d.select(
        F.min(F.array_min("_codes")).alias("lo"),
        F.max(F.array_max("_codes")).alias("hi")).first()
    assert bounds["lo"] >= 0 and bounds["hi"] <= 255


def test_knn_similarity_cutoff(emb):
    """knn `similarity` cutoff prunes in METRIC space below the top-k:
    cosine keeps metric >= t, l2 keeps distance <= t."""
    q = list(emb.filter(F.col("vec_id") == 1).collect()[0]["embedding"])
    full = similarity.knn_search(emb, q, k=500)
    # pick a cutoff between the 5th and 6th cosine so exactly 5 survive
    cos = sorted(((2 * r["score"]) - 1 for r in full.collect()),
                 reverse=True)
    t = (cos[4] + cos[5]) / 2
    cut = similarity.knn_search(emb, q, k=500, min_similarity=t).collect()
    assert len(cut) == 5
    assert all((2 * r["score"]) - 1 >= t for r in cut)
    # l2: cutoff is a DISTANCE bound; distance from score = sqrt(1/s - 1)
    l2 = similarity.knn_search(emb, q, k=500, similarity="l2_norm",
                               min_similarity=2.0).collect()
    assert l2, "some vectors within distance 2"
    for r in l2:
        assert math.sqrt(1.0 / r["score"] - 1.0) <= 2.0 + 1e-9
    with pytest.raises(ValueError, match="exact-path"):
        similarity.knn_search(emb, q, strategy="ivf", min_similarity=0.5)


def test_substring_spans_known_dup(spark):
    # two docs sharing an exact 20-token run; one unique doc
    shared = " ".join(f"tok{i}" for i in range(20))
    rows = [
        (1, "alpha beta " + shared + " gamma"),
        (2, shared + " delta epsilon zeta"),
        (3, " ".join(f"uniq{i}" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["n_windows"])
        for r in dedup.duplicate_substring_spans(df, k=15).collect()
    }
    # doc 1: shared run occupies tokens 3..22 -> windows at pos 3..8
    assert spans[1] == (3, 22, 6)
    # doc 2: shared run occupies tokens 1..20 -> windows at pos 1..6
    assert spans[2] == (1, 20, 6)
    assert 3 not in spans


def test_substring_spans_merges_islands(spark):
    # duplicated run + a 40-token unique gap + another duplicated run:
    # must come out as TWO spans, not one
    run_a = " ".join(f"a{i}" for i in range(16))
    run_b = " ".join(f"b{i}" for i in range(16))
    gap = " ".join(f"gap{i}" for i in range(40))
    rows = [
        (1, run_a + " " + gap + " " + run_b),
        (2, run_a + " elsewhere entirely " + run_b),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dedup.duplicate_substring_spans(df, k=15).collect()
    )
    doc1 = [g for g in got if g[0] == 1]
    assert len(doc1) == 2
    assert doc1[0] == (1, 1, 16) and doc1[1] == (1, 57, 72)


def test_substring_stats_vs_duckdb(docs, duck):
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_frac"])
        for r in dedup.substring_dup_stats(docs, k=15).collect()
    }
    want = duck.execute("""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts
  FROM documents),
sized AS (SELECT doc_id, ts FROM tok WHERE len(ts) >= 15),
wins AS (
  SELECT doc_id, unnest(generate_series(1, len(ts) - 14)) AS pos, ts
  FROM sized),
hashed AS (
  SELECT doc_id, pos, md5(array_to_string(ts[pos:pos+14], ' ')) AS h
  FROM wins),
dup AS (SELECT h FROM hashed GROUP BY h HAVING count(*) >= 2),
marked AS (SELECT doc_id, pos FROM hashed WHERE h IN (SELECT h FROM dup)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                    <= 15 THEN 0 ELSE 1 END AS brk
  FROM marked),
grp AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g
  FROM isl),
spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + 14 AS e FROM grp GROUP BY doc_id, g),
cover AS (SELECT doc_id, sum(e - s + 1) AS dup_tokens FROM spans GROUP BY doc_id)
SELECT t.doc_id, len(t.ts) AS n_tokens, coalesce(c.dup_tokens, 0) AS dup_tokens,
       CASE WHEN len(t.ts) > 0
            THEN round(coalesce(c.dup_tokens, 0) * 1.0 / len(t.ts), 6)
            ELSE 0.0 END AS dup_frac
FROM tok t LEFT JOIN cover c USING (doc_id)
""").fetchall()
    assert len(want) == len(got)
    for doc_id, n_tokens, dup_tokens, dup_frac in want:
        g = got[doc_id]
        assert g[0] == n_tokens and g[1] == dup_tokens
        assert abs(g[2] - dup_frac) < 1e-9


def test_semantic_dedup_greedy_keep(spark, emb):
    got = dedup.semantic_dedup(emb, n_clusters=8, threshold=0.35).collect()
    assert len(got) == emb.count()
    by_cluster = {}
    for r in got:
        by_cluster.setdefault(r["cluster"], []).append(r)
    # the lowest id in every cluster has no smaller-id neighbor -> kept
    for rows in by_cluster.values():
        lowest = min(rows, key=lambda r: r["vec_id"])
        assert lowest["keep"]
    # injecting an exact copy of an existing vector under a HIGHER id
    # must mark the copy as a drop (cosine 1.0 with its original)
    src = emb.orderBy("vec_id").limit(1)
    copy = src.withColumn("vec_id", F.col("vec_id") + 10_000_000)
    out = dedup.semantic_dedup(
        emb.unionByName(copy), n_clusters=8, threshold=0.35
    )
    dup_row = out.filter(F.col("vec_id") >= 10_000_000).collect()[0]
    assert not dup_row["keep"]


def test_text_embedding_model_and_builder(spark):
    """text_embedding inference model + knn query_vector_builder
    (KnnSearchBuilder.queryVectorBuilder / x-pack ml
    TextEmbeddingQueryVectorBuilder): doc-side codegen embedding ==
    driver-side query embedding, and a doc queried by its own text
    ranks first with cosine score 1."""
    from elasticsearch_spark.ops.similarity import (
        embed_texts,
        knn_search,
        register_text_embedding_model,
        text_embedding_vector,
    )

    register_text_embedding_model("mini-embed", dims=8, max_tokens=64)
    rows = [
        (1, "merge sorted posting lists into a term dictionary"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "vectorized arrow batches tokenize source code content"),
        (4, "merge posting lists with delta compression"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = embed_texts(docs, "text", model_id="mini-embed")

    # codegen embedding == driver twin, bit for bit
    got = {r["doc_id"]: list(r["embedding"]) for r in emb.collect()}
    for i, text in rows:
        assert got[i] == text_embedding_vector(text, model_id="mini-embed")

    hits = knn_search(
        emb, None, k=2, id_col="doc_id",
        query_vector_builder={"text_embedding": {
            "model_id": "mini-embed", "model_text": rows[0][1]}},
    ).collect()
    assert hits[0]["doc_id"] == 1
    assert abs(hits[0]["score"] - 1.0) < 1e-12  # (1 + cos 1)/2
    # the near-duplicate phrasing beats the unrelated sentences
    assert hits[1]["doc_id"] == 4

    import pytest as _pytest
    with _pytest.raises(ValueError, match="query_vector"):
        knn_search(emb, None, k=2, id_col="doc_id")
    with _pytest.raises(ValueError, match="unsupported query_vector"):
        knn_search(emb, None, k=2, id_col="doc_id",
                   query_vector_builder={"nope": {}})


def test_semantic_text_field_and_query(spark):
    """semantic_text mapping + semantic query (x-pack inference
    SemanticTextFieldMapper / SemanticQueryBuilder): index-time
    embedding column + query-time same-model knn."""
    from elasticsearch_spark.ops.similarity import (
        map_semantic_text,
        register_text_embedding_model,
        semantic_query,
    )

    register_text_embedding_model("mini-embed", dims=8, max_tokens=64)
    docs = spark.createDataFrame(
        [(1, "posting lists merge into a term dictionary"),
         (2, "quick brown fox jumps again"),
         (3, "posting lists merge into one dictionary")],
        "doc_id long, body string")
    indexed = map_semantic_text(docs, "body", model_id="mini-embed")
    assert "body__inference" in indexed.columns

    hits = semantic_query(indexed, "body",
                          "posting lists merge into a term dictionary",
                          model_id="mini-embed", k=2).collect()
    assert hits[0]["doc_id"] == 1 and abs(hits[0]["score"] - 1.0) < 1e-12
    assert hits[1]["doc_id"] == 3  # near-paraphrase beats the fox

    import pytest as _pytest
    with _pytest.raises(ValueError, match="not mapped as semantic_text"):
        semantic_query(docs, "body", "x", model_id="mini-embed")
