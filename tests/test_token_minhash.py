"""Payload-native token MinHash LSH (stages/tokens.py) — signature
brute-force equality, recall on injected clusters, refactored bucket stage."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from getml_community_ray.kernels.hashing import perm_seeds, splitmix64
from getml_community_ray.stages.tokens import _TOK_B, _token_gram_hashes


def brute_sig(tokens: np.ndarray, num_perm: int, n: int) -> np.ndarray:
    grams = []
    for i in range(len(tokens) - n + 1):
        h = 0
        for j in range(n):
            h = (h + int(tokens[i + j]) * pow(_TOK_B, n - 1 - j, 1 << 64)) % (
                1 << 64
            )
        grams.append(h)
    g = np.array(grams, dtype=np.uint64)
    seeds = perm_seeds(num_perm)
    return np.array(
        [splitmix64(g ^ s).min() for s in seeds], dtype=np.uint64
    )


def test_token_gram_hashes_match_brute():
    rng = np.random.default_rng(3)
    lens = [8, 9, 30, 8]
    rows = [rng.integers(0, 32000, size=m).astype(np.int64) for m in lens]
    flat = np.concatenate(rows)
    off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    h, doc = _token_gram_hashes(flat, off, 8)
    exp_h, exp_d = [], []
    for d, r in enumerate(rows):
        for i in range(len(r) - 7):
            v = 0
            for j in range(8):
                v = (v + int(r[i + j]) * pow(_TOK_B, 7 - j, 1 << 64)) % (1 << 64)
            exp_h.append(v)
            exp_d.append(d)
    assert h.tolist() == exp_h
    assert doc.tolist() == exp_d


@pytest.mark.usefixtures("ray_session")
def test_token_minhash_recall_and_precision(tmp_path):
    import ray.data as rd

    from getml_community_ray.sources.synth import ensure_neardup_token_corpus
    from getml_community_ray.stages.tokens import token_minhash_lsh_candidates

    d = ensure_neardup_token_corpus(
        str(tmp_path / "corpus"), n_base=400, n_clusters=25
    )
    ds = rd.read_parquet(d, columns=["doc_id", "tokens"])
    out = token_minhash_lsh_candidates(
        ds, tokens_col="tokens", id_col="doc_id",
        num_perm=32, bands=8, n=8, num_partitions=4,
    ).to_pandas()

    # every bucket member list is sorted and sizes agree
    assert (out["ids"].map(len) == out["group_size"]).all()
    # collect candidate pairs
    pairs = set()
    for ids in out["ids"]:
        ids = list(ids)
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                pairs.add((ids[a], ids[b]))
    same_cluster = [
        p for p in pairs
        if p[0].startswith("dup-") and p[1].startswith("dup-")
        and p[0][:8] == p[1][:8]
    ]
    # exact verbatim copies collide with their base doc by construction
    copy_pairs = [p for p in pairs if p[0].startswith("copy-")
                  or p[1].startswith("copy-")]
    cross = [p for p in pairs
             if p not in set(same_cluster) and p not in set(copy_pairs)]
    # recall: most of the 25 * 3 intra-cluster pairs surface
    clusters_hit = {p[0][:8] for p in same_cluster}
    assert len(clusters_hit) >= 20
    assert len(copy_pairs) >= 8  # 10 injected copies, LSH recall ~1 at J=1
    # precision: independent random docs practically never collide
    assert len(cross) <= 2


@pytest.mark.usefixtures("ray_session")
def test_text_minhash_unchanged_after_refactor():
    """band_bucket_groups extraction must not change the text lane."""
    import ray.data as rd

    from getml_community_ray.stages.dedup import minhash_lsh_candidates

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": pa.array(
                ["the quick brown fox jumps over the lazy dog",
                 "the quick brown fox jumps over the lazy dot",
                 "completely different content here entirely",
                 "another unrelated string of words goes here"]
            ),
        }
    )
    out = minhash_lsh_candidates(
        rd.from_arrow(docs), text_col="text", id_col="doc_id",
        num_perm=64, bands=16, shingle=5,
    ).to_pandas()
    flat = {i for ids in out["ids"] for i in ids}
    assert flat == {1, 2}


@pytest.mark.usefixtures("ray_session")
def test_token_near_dedup_lanes_agree(tmp_path):
    """Union-find lane == forced-distributed label-propagation lane, and
    clusters recover the injected membership."""
    import ray.data as rd

    from getml_community_ray.sources.synth import ensure_neardup_token_corpus
    from getml_community_ray.stages.tokens import token_near_dedup_clusters

    d = ensure_neardup_token_corpus(
        str(tmp_path / "c"), n_base=300, n_clusters=15
    )
    ds = rd.read_parquet(d, columns=["doc_key", "doc_id", "tokens"])
    kw = dict(tokens_col="tokens", id_col="doc_key",
              num_perm=32, bands=8, n=8, threshold=0.5)
    a = (
        token_near_dedup_clusters(ds, **kw)
        .to_pandas().sort_values("doc_key").reset_index(drop=True)
    )
    b = (
        token_near_dedup_clusters(ds, driver_max_edges=0, **kw)
        .to_pandas().sort_values("doc_key").reset_index(drop=True)
    )
    assert a.equals(b)
    # injected clusters: members contiguous doc_keys (written together);
    # most clusters collapse onto one canonical id of size >= 2
    big = a[a["cluster_size"] > 1]
    assert big["doc_key"].nunique() >= 15 * 2  # most of 15*3 members
    assert (a[a["cluster_size"] == 1]["canonical_id"]
            == a[a["cluster_size"] == 1]["doc_key"]).all()
