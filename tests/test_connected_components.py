"""Distributed connected components (stages/dedup.connected_components)
vs a driver union-find oracle, and the forced-distributed lane of
near_dedup_clusters vs the union-find lane."""

import numpy as np
import pyarrow as pa
import pytest


def _union_find_labels(a: np.ndarray, b: np.ndarray) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        parent.setdefault(x, x)
        parent.setdefault(y, y)
        rx, ry = find(x), find(y)
        if rx != ry:
            if ry < rx:
                rx, ry = ry, rx
            parent[ry] = rx
    return {x: find(x) for x in parent}


def _cc_to_dict(labels_ds) -> dict[int, int]:
    df = labels_ds.to_pandas()
    return dict(zip(df["node"].astype(int), df["label"].astype(int)))


@pytest.mark.parametrize("seed", [0, 7])
def test_cc_random_graph_vs_union_find(ray_session, seed):
    import ray.data as rd

    from getml_community_ray.stages.dedup import connected_components

    rng = np.random.default_rng(seed)
    n_nodes, n_edges = 5_000, 12_000
    a = rng.integers(0, n_nodes, n_edges, dtype=np.int64)
    b = rng.integers(0, n_nodes, n_edges, dtype=np.int64)
    pairs = rd.from_arrow(pa.table({"id_a": pa.array(a), "id_b": pa.array(b)}))
    got = _cc_to_dict(connected_components(pairs, num_partitions=8))
    want = _union_find_labels(a, b)
    assert got == want


def test_cc_long_path_pointer_jumping(ray_session):
    """A pure path graph has diameter = n; pointer jumping must converge
    in far fewer than max_rounds (O(log n)) rounds — the correctness side
    of that is exact equality with union-find."""
    import ray.data as rd

    from getml_community_ray.stages.dedup import connected_components

    n = 4_000  # path 0-1-2-...-3999, diameter ~n >> max_rounds=64
    a = np.arange(n - 1, dtype=np.int64)
    b = a + 1
    # shuffle edge order so labels can't ride a convenient ordering
    rng = np.random.default_rng(3)
    perm = rng.permutation(n - 1)
    pairs = rd.from_arrow(
        pa.table({"id_a": pa.array(a[perm]), "id_b": pa.array(b[perm])})
    )
    got = _cc_to_dict(connected_components(pairs, num_partitions=8))
    assert len(got) == n
    assert set(got.values()) == {0}


@pytest.mark.slow
def test_cc_million_edge_graph(ray_session):
    """The verdict's done-criterion: the distributed path on a synthetic
    million-edge graph, exact vs union-find."""
    import ray.data as rd

    from getml_community_ray.stages.dedup import connected_components

    rng = np.random.default_rng(42)
    n_nodes, n_edges = 300_000, 1_000_000
    a = rng.integers(0, n_nodes, n_edges, dtype=np.int64)
    b = rng.integers(0, n_nodes, n_edges, dtype=np.int64)
    pairs = rd.from_arrow(pa.table({"id_a": pa.array(a), "id_b": pa.array(b)}))
    got = _cc_to_dict(connected_components(pairs, num_partitions=16))
    want = _union_find_labels(a, b)
    assert got == want


def test_near_dedup_forced_distributed_equals_union_find(ray_session):
    """near_dedup_clusters with driver_max_edges=0 (forces label
    propagation + hash-join assignment) must be bit-identical to the
    union-find lane on the same corpus."""
    import pandas as pd
    import ray.data as rd

    from getml_community_ray.stages.dedup import near_dedup_clusters

    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs for the journey home",
        "sphinx of black quartz judge my vow before the winter comes",
        "completely unrelated text about nothing at all in particular",
    ]
    rows, i = [], 0
    for b in base:
        for suffix in ["", " extra", " and more", " overall"]:
            rows.append((i, b + suffix))
            i += 1
    df = pd.DataFrame(rows, columns=["doc_id", "text"])

    def run(**kw):
        out = near_dedup_clusters(
            rd.from_pandas(df), text_col="text", id_col="doc_id",
            threshold=0.5, **kw
        ).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    base = run()
    dist = run(driver_max_edges=0)
    assert base.equals(dist)
