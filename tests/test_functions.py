"""Tests for the training-data-pipeline operators: dedup (exact, MinHash,
SimHash), similarity search, text analysis, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from search_ingest_ray.functions.dedup import (
    exact_dedup, hamming64, jaccard, minhash_candidate_pairs,
    minhash_signature, _perm_params, simhash64, simhash_candidates,
)
from search_ingest_ray.functions.similarity import ann_lsh, knn_cosine
from search_ingest_ray.functions.textstats import (
    LangId, fingerprint_batch, quality_batch, token_count_batch,
)
from search_ingest_ray.functions.multimodal import (
    FrameSampleStage, ImageFeatureStage,
)


@pytest.fixture
def rd(ray_session):
    import ray.data as rd
    return rd


def test_exact_dedup_first_wins(rd):
    ds = rd.from_items([
        {"doc_id": 3, "text": "same text"},
        {"doc_id": 1, "text": "same text"},
        {"doc_id": 2, "text": "other"},
    ])
    out = exact_dedup(ds).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 2]


def test_minhash_similar_docs_are_candidates(rd):
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy")
    far = "completely different content about ray data pipelines " * 6
    ds = rd.from_items([
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": near},
        {"doc_id": 3, "text": far},
    ])
    pairs = minhash_candidate_pairs(ds, num_perm=32, bands=16).to_pandas()
    got = {tuple(r) for r in pairs[["a", "b"]].values.tolist()}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got
    # verification step: jaccard agrees
    assert jaccard(base, near) > 0.5
    assert jaccard(base, far) < 0.1


def test_minhash_signature_deterministic():
    a, b = _perm_params(16)
    s1 = minhash_signature("hello world foo bar", a, b)
    s2 = minhash_signature("hello world foo bar", a, b)
    assert np.array_equal(s1, s2)


def test_simhash_near_dup(rd):
    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    near = base.replace("theta", "thota")
    far = "totally unrelated words here about something else " * 8
    assert hamming64(simhash64(base), simhash64(near)) <= 12
    assert hamming64(simhash64(base), simhash64(far)) > 20
    ds = rd.from_items([
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": near},
        {"doc_id": 3, "text": far},
    ])
    pairs = simhash_candidates(ds, max_hamming=12, chunks=16).to_pandas()
    got = {tuple(r) for r in pairs[["a", "b"]].values.tolist()}
    assert (1, 2) in got


def test_knn_cosine_exact(rd):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(50), pa.int64()),
        "embedding": pa.array([v for v in vecs], pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl)
    out = knn_cosine(ds, [vecs[7]], k=5).to_pandas()
    # brute force oracle
    m = vecs.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    q = m[7]
    cos = m @ q
    expect = np.lexsort((np.arange(50), -cos))[:5]
    assert out.sort_values("rank")["vec_id"].tolist() == expect.tolist()
    assert out.sort_values("rank")["vec_id"].iloc[0] == 7


def test_ann_ivf_full_probe_equals_brute_force(rd):
    from search_ingest_ray.functions.similarity import ann_ivf
    rng = np.random.default_rng(8)
    vecs = rng.standard_normal((80, 12)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(80), pa.int64()),
        "embedding": pa.array([v for v in vecs], pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl)
    exact = knn_cosine(ds, [vecs[5], vecs[17]], k=7).to_pandas()
    ivf = ann_ivf(rd.from_arrow(tbl), [vecs[5], vecs[17]], k=7,
                  nlist=8, nprobe=8).to_pandas()
    for qi in (0, 1):
        e = exact[exact.query_id == qi].sort_values("rank")
        a = ivf[ivf.query_id == qi].sort_values("rank")
        assert e["vec_id"].tolist() == a["vec_id"].tolist()
        assert np.allclose(e["cos"].to_numpy(), a["cos"].to_numpy())


def test_ann_ivf_clustered_recall(rd):
    """Well-separated clusters: nprobe=1 finds the query's own cluster."""
    from search_ingest_ray.functions.similarity import ann_ivf
    rng = np.random.default_rng(9)
    centers = np.eye(4, 16) * 10.0
    vecs = np.concatenate([
        centers[c] + 0.05 * rng.standard_normal((25, 16))
        for c in range(4)]).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(100), pa.int64()),
        "embedding": pa.array([v for v in vecs], pa.list_(pa.float32())),
    })
    out = ann_ivf(rd.from_arrow(tbl), [vecs[3]], k=5,
                  nlist=4, nprobe=1).to_pandas()
    assert out.sort_values("rank")["vec_id"].iloc[0] == 3  # finds itself
    # all 5 hits come from the query's own cluster (ids 0..24)
    assert (out["vec_id"] < 25).all()


def test_ann_lsh_finds_self(rd):
    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((100, 16)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(100), pa.int64()),
        "embedding": pa.array([v for v in vecs], pa.list_(pa.float32())),
    })
    out = ann_lsh(rd.from_arrow(tbl), [vecs[3]], k=5, nbits=4).to_pandas()
    assert 3 in out["vec_id"].tolist()  # the query's own bucket contains it


def test_token_count_and_quality():
    batch = pa.table({"doc_id": [1, 2], "text": ["The quick fox", ""]})
    out = token_count_batch(batch)
    assert out["n_tokens"].to_pylist() == [3, 0]
    q = quality_batch(batch)
    assert q["text_len"].to_pylist() == [13, 0]
    assert q["stopword_ratio_micro"][0].as_py() == int(np.floor(1 / 3 * 1e6))


def test_langid_heuristic():
    batch = pa.table({"text": [
        "the quick brown fox jumps over the lazy dog",
        "der hund und die katze ist nicht schön für straße",
        "el niño y la música es para los años",
    ]})
    out = LangId()(batch)
    assert out["lang_pred"].to_pylist() == ["en", "de", "es"]


def test_fingerprint_whitespace_insensitive():
    b1 = pa.table({"text": ["Hello,  World! Foo"]})
    b2 = pa.table({"text": ["hello world foo"]})
    f1 = fingerprint_batch(b1)["fingerprint"][0].as_py()
    f2 = fingerprint_batch(b2)["fingerprint"][0].as_py()
    assert f1 == f2
    f3 = fingerprint_batch(pa.table({"text": ["hello world bar"]}))["fingerprint"][0].as_py()
    assert f1 != f3


def test_image_feature_stage_plumbing(rd):
    ds = rd.from_items([{"media_id": str(i), "data": bytes([i]) * 100}
                        for i in range(10)])
    out = ds.map_batches(ImageFeatureStage, batch_format="pyarrow",
                         batch_size=4, concurrency=2).to_pandas()
    assert len(out) == 10
    assert set(out.columns) == {"media_id", "width", "height", "n_bytes",
                                "sha", "feature"}
    assert (out["n_bytes"] == 100).all()
    # deterministic across runs
    out2 = ds.map_batches(ImageFeatureStage, batch_format="pyarrow",
                          batch_size=4, concurrency=2).to_pandas()
    assert out.sort_values("media_id")["sha"].tolist() == \
        out2.sort_values("media_id")["sha"].tolist()


def test_frame_sample_stage_explodes(rd):
    ds = rd.from_items([{"media_id": "v1", "data": b"xyz" * 50}])
    out = ds.map_batches(FrameSampleStage, batch_format="pyarrow",
                         concurrency=2,
                         fn_constructor_kwargs={"frames": 3}).to_pandas()
    assert len(out) == 3
    assert out["frame"].tolist() == [0, 1, 2]
