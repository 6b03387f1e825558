"""grouped_centroids vs DuckDB unnest twin and brute-force numpy."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def _emb_table(rng, n=300, d=16, labels=5):
    m = rng.normal(0, 1, (n, d)).astype(np.float32)
    lab = rng.integers(0, labels, n).astype(np.int32)
    return pa.table(
        {
            "label": pa.array(lab),
            "embedding": pa.array(
                [row.tolist() for row in m], type=pa.list_(pa.float32())
            ),
        }
    ), m, lab


def test_centroids_vs_duckdb(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.similarity import grouped_centroids

    rng = np.random.default_rng(2)
    tbl, m, lab = _emb_table(rng)
    got = (
        grouped_centroids(
            rd.from_arrow(tbl).repartition(6),
            group_col="label", emb_col="embedding",
        )
        .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("embeddings", tbl)
    want = con.execute("""
        WITH flat AS (
          SELECT CAST(label AS BIGINT) AS label,
                 CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
                 CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0
                      + 0.5) AS BIGINT) AS x_fp
          FROM embeddings
        )
        SELECT label, dim, CAST(SUM(x_fp) AS BIGINT) AS sum_fp,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(SUM(x_fp) AS DOUBLE) / count(*) / 1000000.0 AS mean
        FROM flat GROUP BY label, dim ORDER BY label, dim
    """).df()
    assert len(got) == len(want)
    for c in ["label", "dim", "sum_fp", "cnt"]:
        assert (got[c].to_numpy(dtype=np.int64)
                == want[c].to_numpy(dtype=np.int64)).all(), c
    assert (got["mean"].to_numpy() == want["mean"].to_numpy()).all()

    # and against plain numpy (fixed-point brute force)
    for k in np.unique(lab):
        sub = np.floor(m[lab == k].astype(np.float64) * 1e6 + 0.5).astype(
            np.int64
        )
        g = got[got["label"] == k].sort_values("dim")
        assert (g["sum_fp"].to_numpy() == sub.sum(axis=0)).all()
        assert (g["cnt"].to_numpy() == (lab == k).sum()).all()


def test_centroids_partition_invariance(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.similarity import grouped_centroids

    tbl, _, _ = _emb_table(np.random.default_rng(4), n=120, d=8)
    outs = [
        grouped_centroids(
            rd.from_arrow(tbl).repartition(b),
            group_col="label", emb_col="embedding",
        )
        .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True)
        for b in (1, 7)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])
