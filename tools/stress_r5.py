"""Bench-scale stress for the round-4 operators (r4 verdict item 6):

1. `deterministic_shuffle` at 200M rows, shard-count sweep {256, 1024,
   4096}: wall/throughput per shard count, plus the SCALE INVARIANT —
   positions are a pure function of row identity, so the order-invariant
   checksum over (id, shuffle_pos) must be identical at every shard count
   (shard = top bits of h, so shard-major order == h-major order).
2. `stratified_sample` at 200M rows, 997 strata + one hot stratum holding
   ~30% of all rows (skew path): wall, rows kept, and an independent
   recount asserting kept == sum(floor(n_k * num / den)) exactly.
3. `token_incremental_dedup` with a 10x standing corpus (2M base rows vs
   200k incoming, ~128 tokens/row): half the batch is verbatim base
   copies, half novel — survivors must be EXACTLY the novel half (ids
   checked via order-invariant checksum), proving the Bloom screen has no
   false negatives and the confirm join no false positives at this scale.

Usage: RAY_GRAFT_CPUS=32 python tools/stress_r5.py [--json PATH]
Scratch under /tmp. Each section prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def _checksum(ds, cols):
    from getml_community_ray.stages.integrity import dataset_checksum

    t = dataset_checksum(ds, int_cols=cols).to_pandas()
    return int(t["checksum"].iloc[0]), int(t["n_rows"].iloc[0])


def stress_shuffle(n_rows: int) -> dict:
    import ray.data as rd

    from getml_community_ray.stages.packing import deterministic_shuffle

    res = {"op": "deterministic_shuffle", "rows": n_rows, "sweep": {}}
    sums = set()
    for shards in (256, 1024, 4096):
        ds = rd.range(n_rows)
        t0 = time.perf_counter()
        out = deterministic_shuffle(ds, id_col="id", seed=17,
                                    num_shards=shards)
        ck, nrows = _checksum(out, ["id", "shuffle_pos"])
        wall = time.perf_counter() - t0
        assert nrows == n_rows, (shards, nrows)
        sums.add(ck)
        res["sweep"][str(shards)] = {
            "wall_s": round(wall, 2),
            "rows_per_s": round(n_rows / wall),
            "checksum": ck,
        }
    res["shard_invariant_checksums_equal"] = len(sums) == 1
    assert len(sums) == 1, f"positions differ across shard counts: {sums}"
    return res


def stress_stratified(n_rows: int) -> dict:
    import ray.data as rd
    from ray.data.aggregate import Count

    from getml_community_ray.stages.packing import stratified_sample

    def add_key(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["id"], dtype=np.int64)
        key = np.where(ids % 10 < 3, 0, ids % 997)  # hot stratum 0: ~30%
        return b.append_column("key", pa.array(key, type=pa.int64()))

    def make():
        return rd.range(n_rows).map_batches(
            add_key, batch_format="pyarrow", zero_copy_batch=True
        )

    t0 = time.perf_counter()
    out = stratified_sample(make(), key_col="key", id_col="id",
                            num=1, den=10, num_partitions=64)
    kept_ck, kept = _checksum(out, ["id"])
    wall = time.perf_counter() - t0

    # independent quota recount
    counts = (
        make().groupby("key").aggregate(Count(alias_name="n")).to_pandas()
    )
    expect = int(sum((int(n) * 1) // 10 for n in counts["n"]))
    assert kept == expect, (kept, expect)
    hot = int(counts.loc[counts["key"] == 0, "n"].iloc[0])
    return {
        "op": "stratified_sample", "rows": n_rows, "strata": len(counts),
        "hot_stratum_rows": hot, "kept": kept, "expected": expect,
        "exact_quota": kept == expect, "wall_s": round(wall, 2),
        "rows_per_s": round(n_rows / wall), "kept_checksum": kept_ck,
    }


# ---- incremental dedup corpus: deterministic per-shard synth ------------

TOK_LEN = 128


def _base_tokens(keys: np.ndarray, seed: int) -> np.ndarray:
    """(len(keys), TOK_LEN) int32 — pure function of (seed, key)."""
    out = np.empty((len(keys), TOK_LEN), dtype=np.int32)
    for i, k in enumerate(keys):
        rng = np.random.default_rng(np.random.SeedSequence([seed, int(k)]))
        out[i] = rng.integers(0, 32000, size=TOK_LEN, dtype=np.int32)
    return out


def _mk_shard(out_dir: str, name: str, keys: np.ndarray, toks: np.ndarray):
    import pyarrow.parquet as pq

    flat = pa.array(toks.reshape(-1), type=pa.int32())
    off = pa.array(
        np.arange(0, (len(keys) + 1) * TOK_LEN, TOK_LEN, dtype=np.int32)
    )
    tbl = pa.table(
        {
            "doc_key": pa.array(keys, type=pa.int64()),
            "tokens": pa.ListArray.from_arrays(off, flat),
        }
    )
    path = os.path.join(out_dir, name)
    if not os.path.exists(path):
        pq.write_table(tbl, path + ".tmp", row_group_size=50_000)
        os.replace(path + ".tmp", path)


def stress_incremental_dedup(n_base: int, n_new: int) -> dict:
    import ray
    import ray.data as rd

    from getml_community_ray.stages.tokens import token_incremental_dedup

    base_dir = f"/tmp/stress_incdedup_base_{n_base}"
    new_dir = f"/tmp/stress_incdedup_new_{n_base}_{n_new}"
    os.makedirs(base_dir, exist_ok=True)
    os.makedirs(new_dir, exist_ok=True)

    n_shards = max(8, n_base // 100_000)

    @ray.remote(num_cpus=1)
    def write_base(s: int):
        lo, hi = n_base * s // n_shards, n_base * (s + 1) // n_shards
        keys = np.arange(lo, hi, dtype=np.int64)
        _mk_shard(base_dir, f"shard-{s:05d}.parquet", keys,
                  _base_tokens(keys, seed=5))

    @ray.remote(num_cpus=1)
    def write_new(s: int):
        nsh = max(2, n_new // 100_000)
        lo, hi = n_new * s // nsh, n_new * (s + 1) // nsh
        keys = np.arange(n_base + lo, n_base + hi, dtype=np.int64)
        i = keys - n_base
        toks = np.empty((len(keys), TOK_LEN), dtype=np.int32)
        even = (i % 2 == 0)
        # even rows: verbatim copies of base rows (true dups)
        toks[even] = _base_tokens((i[even] * 7) % n_base, seed=5)
        # odd rows: novel content from a disjoint seed-space
        toks[~even] = _base_tokens(i[~even], seed=6)
        _mk_shard(new_dir, f"shard-{s:05d}.parquet", keys, toks)

    t0 = time.perf_counter()
    ray.get([write_base.remote(s) for s in range(n_shards)])
    ray.get([write_new.remote(s)
             for s in range(max(2, n_new // 100_000))])
    gen_wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = token_incremental_dedup(
        rd.read_parquet(new_dir), rd.read_parquet(base_dir),
        tokens_col="tokens", id_col="doc_key",
    )
    got_ck, got_n = _checksum(out, ["doc_key"])
    wall = time.perf_counter() - t0

    # expected survivors: exactly the odd incoming rows
    exp_keys = n_base + np.arange(1, n_new, 2, dtype=np.int64)
    exp = rd.from_arrow(pa.table({"doc_key": pa.array(exp_keys)}))
    exp_ck, exp_n = _checksum(exp, ["doc_key"])
    assert (got_n, got_ck) == (exp_n, exp_ck), (got_n, exp_n)
    return {
        "op": "token_incremental_dedup", "base_rows": n_base,
        "new_rows": n_new, "ratio": round(n_base / n_new, 1),
        "tokens_per_row": TOK_LEN, "survivors": got_n,
        "expected": exp_n, "exact": True,
        "gen_wall_s": round(gen_wall, 2), "wall_s": round(wall, 2),
        "new_rows_per_s": round(n_new / wall),
    }


def stress_heavy_hitters(n_rows: int) -> dict:
    import ray.data as rd

    from getml_community_ray.stages.groupby import heavy_hitters

    def add_key(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["id"], dtype=np.int64)
        key = np.where(ids % 10 < 3, 0, ids % 997)  # key 0 holds ~30%
        return pa.table({"key": pa.array(key)})

    def make():
        return rd.range(n_rows).map_batches(
            add_key, batch_format="pyarrow", zero_copy_batch=True
        )

    t0 = time.perf_counter()
    out = heavy_hitters(make, key_col="key", k=50).to_pandas()
    wall = time.perf_counter() - t0
    # exactly one heavy key: key 0 = {id % 10 < 3} plus the multiples of
    # 997 whose id % 10 >= 3 (every other key holds ~0.07%). Closed-form
    # recount:
    head = np.arange(10, dtype=np.int64)
    base = (int(np.count_nonzero(head < 3)) * (n_rows // 10)
            + int(np.count_nonzero(head[: n_rows % 10] < 3)))
    mult = np.arange(0, n_rows, 997, dtype=np.int64)
    extra = int(np.count_nonzero(mult % 10 >= 3))
    exp_n0 = base + extra
    assert out["key"].tolist() == [0], out
    assert int(out["n"].iloc[0]) * 50 > n_rows
    assert int(out["n"].iloc[0]) == exp_n0, (int(out["n"].iloc[0]), exp_n0)
    return {
        "op": "heavy_hitters", "rows": n_rows, "k": 50,
        "heavy_keys": 1, "hot_count": int(out["n"].iloc[0]),
        "wall_s": round(wall, 2), "rows_per_s": round(n_rows / wall),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000_000)
    ap.add_argument("--base", type=int, default=2_000_000)
    ap.add_argument("--new", type=int, default=200_000)
    ap.add_argument("--json", default="")
    ap.add_argument("--only", default="",
                    help="comma-separated op names to run (default all)")
    args = ap.parse_args()

    import ray
    import ray.data as rd

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    from ray.data.context import ShuffleStrategy

    rd.DataContext.get_current().shuffle_strategy = (
        ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    )

    known = {"shuffle", "stratified", "incremental_dedup", "heavy_hitters"}
    only = set(args.only.split(",")) if args.only else None
    if only and not only <= known:
        ap.error(f"unknown --only names {sorted(only - known)}; known: {sorted(known)}")
    report = {"num_cpus": ncpu}
    for fn, kw in (
        (stress_shuffle, {"n_rows": args.rows}),
        (stress_stratified, {"n_rows": args.rows}),
        (stress_incremental_dedup, {"n_base": args.base, "n_new": args.new}),
        (stress_heavy_hitters, {"n_rows": args.rows}),
    ):
        if only and fn.__name__.removeprefix("stress_") not in only:
            continue
        r = fn(**kw)
        report[r["op"]] = r
        print(json.dumps(r))
    ray.shutdown()
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(report, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
