"""Dedup / similarity / textstats / multimodal over the driver-generated
documents + embeddings tables (TESTDATA.md) plus synthetic near-dups."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spatial.datapipe.dedup import (
    embedding_dup_pairs,
    exact_dedup,
    exact_dup_groups,
    make_jaccard_udf,
    minhash_candidates,
    minhash_dedup_pairs,
    simhash_pairs,
)
from spatial.datapipe.multimodal import extract_features, synth_media
from spatial.datapipe.similarity import (
    assign_clusters,
    cosine_topk_bruteforce,
    ivf_topk,
    train_centroids,
)
from spatial.datapipe.textstats import with_textstats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    """Docs with planted exact dups + near dups + distinct rows."""
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest to find food and water")
    rows = [
        (0, base), (1, base),                       # exact dup pair
        (2, base + " extra trailing clause here"),  # near dup of 0/1
        (3, base.replace("quick", "rapid")),        # near dup
        (4, "completely different text about spark query engines and "
            "columnar execution with arrow batches and vectorized kernels"),
        (5, "yet another unrelated document mentioning tiling geocoding "
            "and web mercator projections for map rendering pipelines"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(near_dup_docs):
    kept = exact_dedup(near_dup_docs)
    ids = {r["doc_id"] for r in kept.collect()}
    assert 0 in ids and 1 not in ids  # keeps lowest id of the dup group
    assert {2, 3, 4, 5} <= ids
    groups = exact_dup_groups(near_dup_docs).collect()
    assert len(groups) == 1 and groups[0]["n_dups"] == 2


def test_minhash_finds_near_dups(near_dup_docs):
    pairs = minhash_dedup_pairs(near_dup_docs, threshold=0.5,
                                num_perm=64, bands=16)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got          # exact dup: jaccard 1.0
    assert (0, 2) in got or (1, 2) in got
    # unrelated docs must not pair
    assert not any(4 in p or 5 in p for p in got)


def test_minhash_exact_dup_jaccard_one(near_dup_docs):
    jac = make_jaccard_udf(5)
    df = near_dup_docs.alias("a").join(near_dup_docs.alias("b"),
                                       F.col("a.doc_id") < F.col("b.doc_id"))
    row = (df.where((F.col("a.doc_id") == 0) & (F.col("b.doc_id") == 1))
           .select(jac(F.col("a.text"), F.col("b.text")).alias("j")).first())
    assert row["j"] == 1.0


def test_simhash_pairs(near_dup_docs):
    pairs = simhash_pairs(near_dup_docs, max_hamming=6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert not any((a in (4, 5)) ^ (b in (4, 5)) for a, b in got
                   if (a, b) != (4, 5))


def test_empty_docs_oracle_parity(spark):
    """Planted empty/null docs: engine and SQL oracle must agree (VERDICT r2
    task #5). The engine filters length==0/null at the pairs level; the
    oracle's shingle CTE naturally yields no rows for them -- without the
    filter every empty doc pairs with every other via the zero signature."""
    import duckdb

    from spatial.datapipe.dedup import (minhash_pairs_oracle_sql,
                                        simhash_pairs_oracle_sql)

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest to find food and water")
    rows = [(0, base), (1, base + " tail"), (2, ""), (3, None), (4, ""),
            (5, "tiny"),
            (6, "a wholly different text on columnar execution engines and "
                "vectorized arrow kernels for distributed queries")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vals = ", ".join(
        f"({i}, {'CAST(NULL AS VARCHAR)' if t is None else t.__repr__()})"
        for i, t in rows)
    cte = f"SELECT id, text FROM (VALUES {vals}) AS t(id, text)"
    con = duckdb.connect()

    eng = sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in
                 minhash_dedup_pairs(df, id_col="doc_id", threshold=0.7,
                                     num_perm=64, bands=16).collect())
    ora = sorted(con.sql(minhash_pairs_oracle_sql(
        cte, threshold=0.7, num_perm=64, bands=16)).fetchall())
    assert eng == ora
    assert eng, "the planted near-dup pair must survive"
    assert not any(a in (2, 3, 4) or b in (2, 3, 4) for a, b, _ in eng)

    eng2 = sorted((r["id_a"], r["id_b"], r["hamming"]) for r in
                  simhash_pairs(df, id_col="doc_id").collect())
    ora2 = sorted(con.sql(simhash_pairs_oracle_sql(cte)).fetchall())
    assert eng2 == ora2
    assert not any(a in (2, 3, 4) or b in (2, 3, 4) for a, b, _ in eng2)


def test_lsh_candidates_subset_property(docs):
    """LSH candidates on real documents: every verified pair the full n^2
    Jaccard finds above 0.9 must be produced by the candidate generator."""
    sample = docs.limit(120).select("doc_id", "text")
    pdf = sample.toPandas()
    from spatial.datapipe.dedup import _hash_shingles

    sets = {r.doc_id: set(_hash_shingles(r.text, 5).tolist())
            for r in pdf.itertuples()}
    want = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            u = sets[a] | sets[b]
            if u and len(sets[a] & sets[b]) / len(u) >= 0.9:
                want.add((a, b))
    got = {(r["id_a"], r["id_b"])
           for r in minhash_dedup_pairs(sample, threshold=0.9,
                                        num_perm=128, bands=32).collect()}
    assert want <= got


def test_embedding_dup_pairs(spark):
    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, v.tolist()))
    # plant near-dups: 100..103 are tiny perturbations of 0..3
    for j in range(4):
        rows.append((100 + j, (base[j] + rng.normal(scale=0.01, size=16)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_dup_pairs(df, threshold=0.98, n_planes=12, n_tables=6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(j, 100 + j) for j in range(4)} <= got


def test_similarity_bruteforce_vs_numpy(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pdf = emb.toPandas()
    V = np.asarray(pdf.embedding.tolist(), dtype=np.float64)
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    rng = np.random.default_rng(9)
    Q = rng.normal(size=(5, V.shape[1]))
    got = cosine_topk_bruteforce(emb, Q, k=7)
    gm = {}
    for r in got.collect():
        gm.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    S = V @ Qn.T
    for q in range(5):
        order = np.lexsort((pdf.vec_id.to_numpy(), -S[:, q]))[:7]
        want = [int(pdf.vec_id.iloc[i]) for i in order]
        assert [v for _, v in sorted(gm[q])] == want


def test_ivf_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    C = train_centroids(emb, n_clusters=8, sample_rows=500)
    clustered = assign_clusters(emb, C).persist()
    rng = np.random.default_rng(10)
    # queries near actual corpus points => well-inside clusters
    pdf = emb.limit(10).toPandas()
    Q = np.asarray(pdf.embedding.tolist(), dtype=np.float64) + rng.normal(
        scale=0.01, size=(10, len(pdf.embedding[0])))
    exact = cosine_topk_bruteforce(emb, Q, k=5)
    # synthetic embeddings are near-uniform (no real cluster structure), so
    # probe 6/8 clusters; real corpora cluster and need far fewer probes
    approx = ivf_topk(clustered, C, Q, k=5, nprobe=6)
    em, am = {}, {}
    for r in exact.collect():
        em.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx.collect():
        am.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(em[q] & am.get(q, set())) / len(em[q]) for q in em]
    assert np.mean(recalls) >= 0.8


def test_textstats(docs):
    out = with_textstats(docs).select(
        "doc_id", "n_tokens", "quality", "lang_pred", "fp64").limit(200).collect()
    assert all(r["n_tokens"] > 0 for r in out)
    assert all(0.0 <= r["quality"] <= 1.0 for r in out)
    assert all(r["fp64"] is not None for r in out)


def test_textstats_langid(spark):
    rows = [
        (1, "the cat sat on the mat and it was happy with the day"),
        (2, "der hund ist gross und das haus ist nicht klein von der stadt"),
        (3, "le chat est dans la maison et les enfants sont pour le jardin"),
        (4, "el perro es grande y la casa que es de los vecinos en madrid"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["lang_pred"] for r in with_textstats(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es"}


def test_textstats_stays_jvm_side(docs):
    plan = with_textstats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_multimodal_plumbing(spark):
    media = synth_media(spark, 60)
    feats = extract_features(media, fake_decode=True)
    rows = feats.collect()
    assert len(rows) == 60
    assert all(r["decode_ok"] for r in rows)
    assert all(len(r["feat"]) == 16 for r in rows)
    assert all(abs(sum(r["feat"]) - 1.0) < 1e-9 for r in rows)
    # determinism
    again = extract_features(media, fake_decode=True).collect()
    assert [r["feat"] for r in again] == [r["feat"] for r in rows]
    # compressed formats remain an explicit stub without fake=True
    with pytest.raises(NotImplementedError):
        from spatial.datapipe.multimodal import decode_image
        decode_image(b"xx", {"width": 4, "height": 4})


def test_multimodal_real_decode(spark):
    """ALL kinds decode for REAL (no codec lib, no fake flag): BMP images,
    AU01 PCM audio, VI01 frame-sequence video; undecodable payloads fail
    into decode_ok=false rows instead of killing the job."""
    media = synth_media(spark, 30)
    rows = extract_features(media, fake_decode=False).collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r)
    for kind in ("image", "audio", "video"):
        assert all(r["decode_ok"] for r in by_kind[kind]), kind
        assert all(abs(sum(r["feat"]) - 1.0) < 1e-9 for r in by_kind[kind]), kind
    # garbage payload -> error row
    bad = spark.createDataFrame(
        [(99, "image", b"\x00garbage", {"mime": "x", "width": 4, "height": 4,
                                        "duration_ms": None})],
        "media_id long, kind string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:int>")
    r = extract_features(bad, fake_decode=False).first()
    assert r["decode_ok"] is False and r["feat"] is None


def test_audio_video_containers_roundtrip():
    import numpy as np

    from spatial.datapipe.multimodal import (decode_audio, decode_bmp,
                                             decode_video_frames, encode_audio,
                                             encode_bmp, encode_video,
                                             frame_sample, resize_gray)
    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32768, 500).astype("<i2")
    back = decode_audio(encode_audio(s))
    assert len(back) == 500
    assert (back == (s.astype(np.float64) + 32768.0) / 256.0).all()
    frames = [encode_bmp(rng.integers(0, 256, (12, 12), dtype=np.uint8))
              for _ in range(5)]
    payload = encode_video(frames)
    got = decode_video_frames(payload)
    assert got == frames
    sampled = frame_sample(payload, 3)
    assert len(sampled) == 3 and all(f.shape == (8, 8) for f in sampled)
    # resize picks nearest-neighbor source pixels
    img = np.arange(16, dtype=np.float64).reshape(4, 4)
    rz = resize_gray(img, 2, 2)
    assert rz.shape == (2, 2) and rz[0, 0] == img[0, 0]


def test_bmp_roundtrip():
    import numpy as np

    from spatial.datapipe.multimodal import decode_bmp, encode_bmp
    rng = np.random.default_rng(7)
    for h, w in [(16, 16), (5, 7), (1, 3)]:  # odd widths exercise row padding
        gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
        out = decode_bmp(encode_bmp(gray))
        assert out.shape == (h, w)
        # gray written to all 3 channels: luma(g,g,g) == g exactly
        assert (out == gray.astype(np.float64)).all()


def test_ppm_decode():
    import numpy as np

    from spatial.datapipe.multimodal import decode_ppm
    rng = np.random.default_rng(9)
    w, h = 6, 4
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    payload = b"P6\n# comment\n6 4\n255\n" + rgb.tobytes()
    out = decode_ppm(payload)
    expect = np.floor(0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
                      + 0.114 * rgb[:, :, 2] + 0.5)
    assert (out == expect).all()


def test_ivf_partition_pruning(spark, tmp_path):
    """IVF over cluster-partitioned storage: the nprobe IN-list reaches the
    scan as a PartitionFilter (reads nprobe/n_clusters of the files), and
    results equal IVF over the unpartitioned frame."""
    import numpy as np
    from pyspark.sql import functions as F

    from spatial.datapipe.similarity import (assign_clusters, ivf_topk,
                                             read_clustered, train_centroids,
                                             write_clustered)

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    C = train_centroids(emb, n_clusters=8, seed=42)
    clustered = assign_clusters(emb, C)
    store = str(tmp_path / "ivf_store")
    write_clustered(clustered, store)
    stored = read_clustered(spark, store)

    rng = np.random.default_rng(5)
    Q = rng.normal(size=(4, 64))
    got = ivf_topk(stored, C, Q, k=5, nprobe=2)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan.split("PartitionFilters")[1][:200]
    a = sorted((r["query_id"], r["rank"], r["vec_id"]) for r in got.collect())
    b = sorted((r["query_id"], r["rank"], r["vec_id"])
               for r in ivf_topk(clustered, C, Q, k=5, nprobe=2).collect())
    assert a == b


def test_top_ngrams(spark, docs):
    from spatial.datapipe.textstats import top_ngrams

    tiny = spark.createDataFrame(
        [(0, "the cat sat on the cat mat"), (1, "the cat sat"),
         (2, ""), (3, None), (4, "one")],
        "doc_id long, text string")
    out = top_ngrams(tiny, n=2, k=3).collect()
    assert [(r["ngram"], r["n_occurrences"], r["rank"]) for r in out] == [
        ("the cat", 3, 1), ("cat sat", 2, 2), ("cat mat", 1, 3)]
    # scale shape: global top-k must compile to TakeOrderedAndProject
    # (per-partition partial top-k), not a full sort of all distinct ngrams
    plan = top_ngrams(docs, n=2, k=20)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# -- round-3 curation / clustering / temporal operators ----------------------

def test_connected_components_hand_graph(spark):
    """Chain + separate pair + triangle: labels must be component minima,
    and a long chain must converge well inside max_rounds (pointer jumping
    gives O(log diameter))."""
    from spatial.datapipe.cluster import connected_components

    chain = [(i, i + 1) for i in range(100, 120)]          # diameter 20
    extra = [(5, 7), (7, 9), (9, 5), (1, 2)]               # triangle + pair
    pairs = spark.createDataFrame(chain + extra, ["id_a", "id_b"])
    got = {r["id"]: r["cluster_id"]
           for r in connected_components(pairs, max_rounds=10).collect()}
    for i in range(100, 121):
        assert got[i] == 100
    assert got[5] == got[7] == got[9] == 5
    assert got[1] == got[2] == 1


def test_dedup_assign_one_keep_per_cluster(spark, near_dup_docs):
    from spatial.datapipe.cluster import dedup_assign

    pairs = minhash_dedup_pairs(near_dup_docs, threshold=0.5)
    out = dedup_assign(near_dup_docs, pairs).collect()
    # every row labeled; exactly one keep per cluster; keeps are minima
    clusters = {}
    for r in out:
        clusters.setdefault(r["cluster_id"], []).append(r)
    for cid, members in clusters.items():
        keeps = [m for m in members if m["keep"]]
        assert len(keeps) == 1 and keeps[0]["doc_id"] == cid
        assert cid == min(m["doc_id"] for m in members)
    assert len(out) == near_dup_docs.count()


def test_asof_join_semantics(spark):
    """Inclusive match at equal ts, largest-tiebreak right row wins,
    no-prior-row -> null, tolerance nulls stale matches."""
    from datetime import datetime as dt

    from spatial.asof import asof_join

    right = spark.createDataFrame(
        [(1, dt(2024, 1, 1, 10, 0, 0), 100, 1.0),
         (1, dt(2024, 1, 1, 10, 0, 0), 101, 2.0),   # same ts: 101 wins
         (1, dt(2024, 1, 1, 12, 0, 0), 102, 3.0),
         (2, dt(2024, 1, 1, 9, 0, 0), 200, 9.0)],
        ["user_id", "ts", "event_id", "value"])
    left = spark.createDataFrame(
        [(1, dt(2024, 1, 1, 10, 0, 0), 1),    # equal ts -> inclusive, id 101
         (1, dt(2024, 1, 1, 11, 0, 0), 2),    # between -> id 101
         (1, dt(2024, 1, 1, 13, 0, 0), 3),    # after -> id 102
         (2, dt(2024, 1, 1, 8, 0, 0), 4),     # before any -> null
         (3, dt(2024, 1, 1, 8, 0, 0), 5)],    # no right rows -> null
        ["user_id", "ts", "lid"])
    out = {r["lid"]: r for r in
           asof_join(left, right, on=["user_id"],
                     value_cols=["event_id", "value"],
                     right_tiebreak="event_id").collect()}
    assert out[1]["asof_event_id"] == 101 and out[1]["asof_value"] == 2.0
    assert out[2]["asof_event_id"] == 101
    assert out[3]["asof_event_id"] == 102 and out[3]["asof_value"] == 3.0
    assert out[4]["asof_event_id"] is None
    assert out[5]["asof_event_id"] is None
    # tolerance: the 13:00 click is 1h after the 12:00 purchase; 30min tol
    tol = {r["lid"]: r for r in
           asof_join(left, right, on=["user_id"],
                     value_cols=["event_id"], right_tiebreak="event_id",
                     tolerance_s=1800).collect()}
    assert tol[1]["asof_event_id"] == 101      # 0s old: kept
    assert tol[3]["asof_event_id"] is None     # 3600s old: nulled


def test_pack_by_budget_properties(spark, docs):
    from spatial.datapipe.curation import pack_by_budget

    out = pack_by_budget(docs, budget=200).orderBy("lang", "doc_id").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["lang"], []).append(r)
    for lang, rows in by_group.items():
        cum = 0
        for r in rows:
            assert r["shard_id"] == cum // 200   # exclusive-cumsum contract
            cum += r["n_tokens"]
        shard_ids = [r["shard_id"] for r in rows]
        assert shard_ids == sorted(shard_ids)    # monotone within group


def test_hash_sample_deterministic_and_nested(spark, docs):
    """The 10%% sample is a strict superset of the 5%% sample, and the
    sampled id set is invariant under repartitioning (pure function of id
    -- the property df.sample() does NOT have)."""
    from spatial.datapipe.curation import hash_sample

    ids5 = {r["doc_id"] for r in
            hash_sample(docs, {}, default_rate=500).select("doc_id").collect()}
    ids10 = {r["doc_id"] for r in
             hash_sample(docs, {}, default_rate=1000).select("doc_id").collect()}
    assert ids5 <= ids10 and len(ids10) > len(ids5) > 0
    again = {r["doc_id"] for r in
             hash_sample(docs.repartition(7), {}, default_rate=1000)
             .select("doc_id").collect()}
    assert again == ids10


def test_tfidf_topk_contract(spark, docs):
    from spatial.datapipe.textstats import tfidf_topk

    out = tfidf_topk(docs, k=3).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in per_doc.items():
        assert len(rows) <= 3
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
        for r in rows:
            num = r["tf"] * (2 * len(per_doc) - 2 * r["doc_freq"] + 1)
            assert r["score"] == num / (2 * r["doc_freq"] + 1)


def test_contamination_pairs_planted(spark):
    """Planted contamination: a benchmark doc embedded in a longer train
    page is caught by containment (would be missed by symmetric Jaccard at
    the same threshold); disjoint docs produce no pair; the max_df guard
    drops ubiquitous shingles from candidate generation."""
    from spatial.datapipe.decontam import contamination_pairs

    bench = ("which planet in our solar system has the most moons and "
             "what is its largest moon called by astronomers")
    test = spark.createDataFrame(
        [(1, bench),
         (2, "completely unrelated text about cooking pasta at home "
             "with garlic and olive oil for dinner tonight")],
        ["doc_id", "text"])
    train = spark.createDataFrame(
        [(10, "crawled page header junk " + bench + " crawled page "
              "footer junk with more boilerplate"),
         (11, "another page about gardening tips for spring flowers "
              "and vegetable beds in cold climates")],
        ["doc_id", "text"])
    out = contamination_pairs(test, train, threshold=0.8, shingle_k=8,
                              max_df=100).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["test_id"], r["train_id"]) == (1, 10)
    assert r["ratio"] >= 0.99  # fully embedded -> near-total containment
    # symmetric check: train doc is NOT >=80% contained in the test doc,
    # so direction matters (containment, not Jaccard)
    rev = contamination_pairs(
        train, test, threshold=0.8, shingle_k=8, max_df=100).collect()
    assert rev == []


def test_approx_distinct_sketch(spark):
    """Deterministic HLL: estimate within the raw-estimator error band,
    bit-identical across partitionings, and invariant under duplication
    (a sketch property no sampling-based estimator has)."""
    from pyspark.sql import functions as F

    from spatial.datapipe.sketches import approx_count_distinct

    n = 5000
    df = (spark.range(n)
          .select(F.lit("a").alias("g"), F.col("id").alias("v")))
    out = approx_count_distinct(df, "v", ["g"], p=8).collect()[0]
    assert abs(out["approx_distinct"] - n) / n < 0.2  # ~3 sigma at m=256
    out2 = approx_count_distinct(df.repartition(13), "v", ["g"],
                                 p=8).collect()[0]
    assert (out["harmonic_sum"], out["approx_distinct"]) == \
        (out2["harmonic_sum"], out2["approx_distinct"])
    out3 = approx_count_distinct(df.union(df), "v", ["g"], p=8).collect()[0]
    assert out3["harmonic_sum"] == out["harmonic_sum"]


def test_repetition_signals_hand_cases(spark):
    """Hand-checked Gopher-style repetition metrics, incl. the degenerate
    shapes (empty text, NULL text, fewer tokens than the gram width, an
    all-repeats doc) and the zero-shuffle plan claim."""
    from spatial.datapipe.textstats import repetition_signals

    tiny = spark.createDataFrame(
        [(0, "the cat sat the cat sat the cat sat"),
         (1, "a b c d e f g"),
         (2, "x x x x x x"),
         (3, ""), (4, None), (5, "one two"), (6, "one")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_signals(tiny).collect()}
    # doc 0: tokens 9x3 chars = 27; bigrams: "the cat"x3 (6 chars, the
    # separator space excluded), "cat sat"x3, "sat the"x2 -> top2 = 3*6
    assert got[0]["word_chars"] == 27
    assert got[0]["top2_char_frac"] == 18 / 27
    # trigrams: "the cat sat"x3 (9), "cat sat the"x2, "sat the cat"x2 ->
    # dup = 3*9 + 2*9 + 2*9 = 63 = all -> frac 1.0
    assert got[0]["dup3_char_frac"] == 1.0
    # doc 1: no repeats at all
    assert got[1]["top2_char_frac"] == 2 / 7  # every bigram once: 1*2 / 7
    assert got[1]["dup3_char_frac"] == 0.0
    # doc 2: "x x" occurs 5x (3 chars each, minus separator -> 2*... ) ->
    # top2 = 5 * 2 = 10 over 6 word chars (frac may exceed 1: overlapping
    # occurrences -- same as Gopher's definition, a filter signal not a
    # probability)
    assert got[2]["top2_char_frac"] == 10 / 6
    assert got[2]["dup3_char_frac"] == 1.0
    for d in (3, 4):
        assert got[d]["word_chars"] == 0
        assert got[d]["top2_char_frac"] == 0.0
        assert got[d]["dup3_char_frac"] == 0.0
    assert got[5]["top2_char_frac"] == (1 * 6) / 6  # single bigram "one two"
    assert got[6]["top2_char_frac"] == 0.0  # one token: no bigram
    # zero-shuffle claim: the physical plan must contain NO exchange
    plan = repetition_signals(tiny)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_incremental_dedup_equals_cross_slice(spark, near_dup_docs):
    """incremental_dup_pairs(corpus, batch) must equal the cross-corpus
    slice of full minhash_dedup_pairs over the union -- the identity the
    driver oracle also pins (same union bucket cap on both paths)."""
    from pyspark.sql import functions as F

    from spatial.datapipe.dedup import (incremental_dup_pairs,
                                        minhash_dedup_pairs)

    corpus = near_dup_docs
    batch = (corpus.where(F.col("doc_id") % 3 == 0)
             .withColumn("doc_id", F.col("doc_id") + 500_000)
             .withColumn("text", F.concat(F.col("text"), F.lit(" zz"))))
    inc = {(r["id_a"], r["id_b"], r["jaccard"]) for r in
           incremental_dup_pairs(corpus, batch, threshold=0.6,
                                 num_perm=64, bands=16).collect()}
    full = {(r["id_a"], r["id_b"], r["jaccard"]) for r in
            minhash_dedup_pairs(corpus.union(batch), threshold=0.6,
                                num_perm=64, bands=16).collect()
            if r["id_a"] < 500_000 <= r["id_b"]}
    assert inc == full
    assert len(inc) > 0  # planted mutations must actually fire


def test_cap_per_key_partition_invariant_and_exact(spark):
    """Two-stage capped top-k == single-window global rank, identical at
    different partition counts, incl. a hot key 100x the others."""
    from pyspark.sql import Window

    from spatial.datapipe.curation import cap_per_key, mix_hash

    rows = [(i, "hot" if i < 1000 else f"k{i % 7}") for i in range(1300)]
    base = spark.createDataFrame(rows, "doc_id long, key string")

    def run(df):
        return {(r["doc_id"], r["key"], r["rank"])
                for r in cap_per_key(df, "key", 4).collect()}

    got2 = run(base.repartition(2))
    got16 = run(base.repartition(16))
    assert got2 == got16
    w = Window.partitionBy("key").orderBy(mix_hash(F.col("doc_id")).asc(),
                                          F.col("doc_id").asc())
    want = {(r["doc_id"], r["key"], r["rank"]) for r in
            base.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= 4).collect()}
    assert got2 == want
    assert sum(1 for _, k, _ in want if k == "hot") == 4


def test_inverted_index_partition_invariant_and_capped(spark):
    """Two-stage posting cap == global rank; stats stay full counts even
    where the list truncates; max_df guard drops stopword terms."""
    from spatial.datapipe.index import inverted_index

    def wd(prefix, n):  # digit-free words: the tokenizer is [a-z]-only
        return prefix + "".join(chr(97 + int(c)) for c in str(n))

    rows = [(i, ("stop " * 3 + f"{wd('cyc', i % 5)} {wd('rare', i)}")
             if i % 2 == 0 else f"stop {wd('cyc', i % 5)}")
            for i in range(200)]
    base = spark.createDataFrame(rows, "doc_id long, text string")

    def run(df):
        return {r["term"]: (r["doc_freq"], r["n_occurrences"],
                            tuple(r["postings"]))
                for r in inverted_index(df, max_df=150,
                                        max_postings=8).collect()}

    got2 = run(base.repartition(2))
    got16 = run(base.repartition(16))
    assert got2 == got16
    assert "stop" not in got2                  # df=200 > max_df=150
    df_c0, n_occ_c0, post_c0 = got2[wd("cyc", 0)]
    assert df_c0 == 40 and n_occ_c0 == 40      # full counts kept
    assert len(post_c0) == 8                   # capped
    assert post_c0 == (0, 5, 10, 15, 20, 25, 30, 35)
    assert got2[wd("rare", 4)] == (1, 1, (4,))


def test_pmi_bigrams_partition_invariant(spark):
    """PMI ranking is bit-identical at different partition counts and the
    planted collocation wins rank 1."""
    from spatial.datapipe.textstats import pmi_bigrams

    rows = [(i, "alpha beta " + " ".join(f"w{(i * 7 + j) % 11}"
                                         for j in range(6)))
            for i in range(300)]
    base = spark.createDataFrame(rows, "doc_id long, text string")

    def run(df):
        return [(r["w1"], r["w2"], r["n_pair"], r["rank"], r["score"])
                for r in pmi_bigrams(df, k=10, min_count=3).collect()]

    got2 = run(base.repartition(2))
    got16 = run(base.repartition(16))
    assert got2 == got16
    assert (got2[0][0], got2[0][1]) == ("alpha", "beta")
    assert got2[0][3] == 1


def test_triangle_counts_hand_case(spark):
    """K4 minus one edge has exactly two triangles sharing an edge; counts
    per node follow; direction/duplicates/self-loops must not matter."""
    from spatial.datapipe.graph import triangle_counts

    edges = [(1, 2), (2, 1), (1, 3), (2, 3), (4, 1), (2, 4), (3, 3),
             (5, 6)]  # K4 minus (3,4); dup (1,2); self-loop (3,3)
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(e).collect()}
    # triangles: {1,2,3} and {1,2,4}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_similarity_join_equals_bruteforce(spark):
    """Prefix-filtered join == brute-force all-pairs Jaccard (no false
    negatives), partition-invariant, and the prefix actually prunes."""
    import itertools

    from spatial.datapipe.setjoin import similarity_join

    words = [f"w{chr(97 + i)}{chr(97 + j)}" for i in range(8)
             for j in range(8)]
    rows = []
    for i in range(60):
        base = [words[(i * 3 + k) % 64] for k in range(12)]
        rows.append((i, " ".join(base)))
        if i % 10 == 0:  # plant a 11/13-overlap near-dup
            rows.append((1000 + i, " ".join(base[:11] + [words[(i + 40) % 64],
                                                         words[(i + 41) % 64]])))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {(r["id_a"], r["id_b"]): (r["n_inter"], r["n_union"])
           for r in similarity_join(df.repartition(7), 7, 10).collect()}
    # brute force in Python
    sets = {i: set(t.split()) for i, t in rows}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        uni = len(sets[a] | sets[b])
        if inter / uni >= 0.7:
            want[(a, b)] = (inter, uni)
    assert got == want
    assert len(want) >= 6  # planted near-dups must fire


def test_image_ahash_scale_invariance(spark):
    """Exact copies and nearest-neighbor upscales hash identically; a
    genuinely different image does not; corrupt payloads yield null."""
    import numpy as np

    from spatial.datapipe.multimodal import (ahash_limbs, encode_bmp,
                                             image_ahash)

    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    b = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    up = np.repeat(np.repeat(a, 2, axis=0), 2, axis=1)
    meta = {"mime": "image/bmp", "width": 16, "height": 16,
            "duration_ms": None}
    rows = [(0, "image", encode_bmp(a), meta),
            (1, "image", encode_bmp(a), meta),          # exact copy
            (2, "image", encode_bmp(up), dict(meta, width=32, height=32)),
            (3, "image", encode_bmp(b), meta),
            (4, "image", b"garbage-not-a-bmp", meta)]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, "
              "meta struct<mime:string,width:int,height:int,duration_ms:int>")
    got = {r["media_id"]: (r["ahash_hi"], r["ahash_lo"], r["decode_ok"])
           for r in image_ahash(df).collect()}
    assert got[0] == got[1] == got[2]
    assert got[0][:2] != got[3][:2]
    assert got[4] == (None, None, False)
    assert got[0][:2] == ahash_limbs(a.astype(float))


def test_weighted_sample_monotone_and_stable(spark):
    """Kept set at weight w is a subset of the kept set at any w' >= w
    (nested samples by construction) and partition-invariant."""
    from spatial.datapipe.curation import weighted_sample

    base = spark.range(0, 5000).withColumnRenamed("id", "doc_id")

    def keep(df, w):
        return {r["doc_id"] for r in
                weighted_sample(df, F.lit(w)).collect()}

    k2000 = keep(base.repartition(3), 2000)
    k5000 = keep(base.repartition(11), 5000)
    assert k2000 <= k5000
    assert keep(base.repartition(16), 2000) == k2000
    # rates land near the nominal probabilities
    assert abs(len(k2000) / 5000 - 0.2) < 0.03
    assert abs(len(k5000) / 5000 - 0.5) < 0.03
