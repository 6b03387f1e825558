"""Deterministic synthetic corpus of pre-tokenized training sequences.

Materializes the input table mandated by BASELINE.json input_hint /
FIXTURES.md F1:

    doc_id:string, tokens:list<int32>, n_tok:int32, source:string,
    event_ts:timestamp[us]

Properties (all seeded — identical output at any parallelism):
- ~`n_sources` sources with Zipf(1.2) row allocation (intentional skew,
  exercises salting);
- per-source regular time grid (1s..60s period per source) with ~2% dropped
  ticks (gap-fill targets) and 0.5% jitter;
- token lengths ~ LogNormal(mu=5, sigma=0.7) clipped to [8, 4096], token ids
  Uniform[0, 50257).

Sharded: shard k of a source covers that source's tick range
[k*n/K, (k+1)*n/K), seeded by (seed, shard) — generation parallelizes over
shards with deterministic content.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

VOCAB = 50257
EPOCH_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, arbitrary fixed origin


def sequences_schema() -> pa.Schema:
    return pa.schema(
        [
            pa.field("doc_id", pa.string()),
            pa.field("tokens", pa.list_(pa.int32())),
            pa.field("n_tok", pa.int32()),
            pa.field("source", pa.string()),
            pa.field("event_ts", pa.timestamp("us")),
        ]
    )


def _zipf_allocation(n_rows: int, n_sources: int, alpha: float = 1.2) -> np.ndarray:
    w = 1.0 / np.arange(1, n_sources + 1, dtype=np.float64) ** alpha
    w /= w.sum()
    alloc = np.floor(w * n_rows).astype(np.int64)
    alloc[0] += n_rows - alloc.sum()  # remainder to the hottest source
    return alloc


def _source_period_s(source_ix: int) -> int:
    """Deterministic per-source grid period in [1, 60] seconds."""
    # simple splitmix-style hash; stable across runs and processes
    x = (source_ix + 1) * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 31
    return 1 + int(x % 60)


def generate_shard(
    shard: int,
    n_shards: int,
    n_rows: int,
    n_sources: int = 50,
    seed: int = 42,
    with_tokens: bool = True,
) -> pa.Table:
    """Rows of shard `shard` as one Arrow table (deterministic)."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, shard]))
    alloc = _zipf_allocation(n_rows, n_sources)

    src_arrs, ts_arrs, tick_arrs = [], [], []
    for s in range(n_sources):
        n = int(alloc[s])
        lo = n * shard // n_shards
        hi = n * (shard + 1) // n_shards
        cnt = hi - lo
        if cnt <= 0:
            continue
        period_us = _source_period_s(s) * 1_000_000
        ticks = np.arange(lo, hi, dtype=np.int64)
        keep = rng.random(cnt) >= 0.02  # ~2% dropped ticks -> gaps
        ticks = ticks[keep]
        jitter = (rng.random(len(ticks)) * 0.005 * period_us).astype(np.int64)
        ts = EPOCH_US + ticks * period_us + jitter
        src_arrs.append(np.full(len(ticks), s, dtype=np.int32))
        ts_arrs.append(ts)
        tick_arrs.append(ticks)

    if not src_arrs:
        return sequences_schema().empty_table()

    src = np.concatenate(src_arrs)
    ts = np.concatenate(ts_arrs)
    tick = np.concatenate(tick_arrs)
    m = len(src)

    n_tok = np.clip(
        np.exp(rng.normal(5.0, 0.7, m)), 8, 4096
    ).astype(np.int32)

    source_names = np.array([f"src{s:03d}" for s in range(n_sources)])
    doc_id = pa.array(
        [f"src{s:03d}-{t:012d}" for s, t in zip(src, tick)], type=pa.string()
    )

    if with_tokens:
        offsets = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(n_tok, out=offsets[1:])
        values = rng.integers(0, VOCAB, int(offsets[-1]), dtype=np.int32)
        tokens = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32() if offsets[-1] < 2**31 else pa.int64()),
            pa.array(values, type=pa.int32()),
        )
        if offsets[-1] >= 2**31:  # keep list<int32> type stable
            tokens = tokens.cast(pa.list_(pa.int32()))
    else:
        tokens = pa.nulls(m, pa.list_(pa.int32()))

    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": pa.array(n_tok, type=pa.int32()),
            "source": pa.array(source_names[src], type=pa.string()),
            "event_ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )


def generate_sequences(
    out_dir: str,
    n_rows: int,
    n_shards: int = 16,
    n_sources: int = 50,
    seed: int = 42,
    with_tokens: bool = True,
) -> str:
    """Write the corpus as `out_dir/shard-XXXXX.parquet` via Ray tasks.

    Deterministic for a given (n_rows, n_shards, n_sources, seed) regardless
    of parallelism; resumable (existing shard files are kept — content is
    deterministic so a partial rerun converges to the same corpus).
    """
    import os

    import ray

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote(num_cpus=1)
    def _write(shard: int) -> str:
        import pyarrow.parquet as pq

        path = os.path.join(out_dir, f"shard-{shard:05d}.parquet")
        if os.path.exists(path):
            return path
        tbl = generate_shard(shard, n_shards, n_rows, n_sources, seed, with_tokens)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=100_000)
        os.replace(tmp, path)  # atomic -> resumable
        return path

    ray.get([_write.remote(k) for k in range(n_shards)])
    return out_dir


def ensure_local_corpus(
    out_dir: str,
    n_rows: int,
    n_shards: int = 4,
    n_sources: int = 50,
    seed: int = 42,
    with_tokens: bool = True,
) -> str:
    """`generate_sequences` without a Ray session: writes the same
    deterministic shard files inline. Used where a corpus must exist before
    any Dataset is built (oracle-SQL construction, tests without Ray)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for shard in range(n_shards):
        path = os.path.join(out_dir, f"shard-{shard:05d}.parquet")
        if os.path.exists(path):
            continue
        tbl = generate_shard(shard, n_shards, n_rows, n_sources, seed, with_tokens)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=100_000)
        os.replace(tmp, path)
    return out_dir


# ---------------------------------------------------------------------------
# Deterministic TEXT corpus (documents-table shape) for benchmarking the
# LLM-pipeline lanes (dedup / quality / packing) at scale. Same contract as
# generate_sequences: shard content depends only on (shard, params, seed),
# shards are written atomically and reruns converge.
# ---------------------------------------------------------------------------

_GLUE = [
    "the", "and", "of", "to", "in", "is", "that", "for", "with", "on",
    "as", "by", "at", "from", "or", "an", "be", "this", "are", "it",
]

_VOCAB = None


def _text_vocab() -> "pa.Array":
    """20 glue words + 20k random 3-9 char a-z words (fixed seed).

    Byte diversity matters: sequential words like w00123/w00124 share
    almost all their 5-byte shingles (common prefix), which keeps
    random-pair shingle Jaccard high enough that LSH coincidental
    candidates grow superlinearly with corpus size — measured first with
    a 1k vocab (1 pair/doc at 100k docs, 4 at 300k), still present with
    20k zero-padded numeric words (1.4 pairs/doc at 1M)."""
    global _VOCAB
    if _VOCAB is None:
        r = np.random.default_rng(12345)
        lens = r.integers(3, 10, size=20000)
        letters = r.integers(0, 26, size=int(lens.sum())).astype(np.uint8) + 97
        offs = np.concatenate([[0], np.cumsum(lens)])
        words = [
            letters.tobytes()[s:e].decode("ascii")
            for s, e in zip(offs[:-1], offs[1:])
        ]
        _VOCAB = pa.array(_GLUE + words)
    return _VOCAB


def generate_text_shard(
    shard: int,
    n_shards: int,
    n_docs: int,
    n_sources: int,
    seed: int,
    dup_frac: float,
) -> pa.Table:
    """One shard of the text corpus: (doc_id, text, source). Texts are
    20-80 words from a 1020-word vocabulary (zipf-ish via squared
    uniform); the last `dup_frac` of each shard's docs are near-dups of
    its first docs (same text + one extra word) so the dedup lanes have
    real positives. Fully vectorized (one take + one binary_join)."""
    import pyarrow.compute as pc

    lo = shard * n_docs // n_shards
    hi = (shard + 1) * n_docs // n_shards
    n = hi - lo
    if n <= 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
                "source": pa.array([], type=pa.string()),
            }
        )
    rng = np.random.default_rng(seed * 1_000_003 + shard)
    vocab = _text_vocab()
    V = len(vocab)

    n_dup = int(n * dup_frac)
    n_base = n - n_dup
    lens = rng.integers(20, 81, size=n_base).astype(np.int64)
    total = int(lens.sum())
    # squared uniform -> low ids (glue words) much more frequent
    codes = (rng.random(total) ** 2 * V).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    lists = pa.ListArray.from_arrays(
        pa.array(offs, type=pa.int32()), vocab.take(pa.array(codes))
    )
    base = pc.binary_join(lists, " ")
    if n_dup:
        dup = pc.binary_join_element_wise(
            base.slice(0, n_dup), "w000", " "
        )
        text = pa.concat_arrays([base, dup])
    else:
        text = base
    doc_id = pa.array(np.arange(lo, hi, dtype=np.int64))
    src = pa.array(
        np.char.add(
            "src", (np.arange(lo, hi) % n_sources).astype(str)
        )
    )
    return pa.table({"doc_id": doc_id, "text": text, "source": src})


def generate_text_corpus(
    out_dir: str,
    n_docs: int,
    n_shards: int = 32,
    n_sources: int = 16,
    seed: int = 42,
    dup_frac: float = 0.03,
) -> str:
    """Write the deterministic text corpus via Ray tasks (resumable)."""
    import os

    import ray

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote(num_cpus=1)
    def _write(k: int) -> str:
        import pyarrow.parquet as pq

        path = os.path.join(out_dir, f"shard-{k:05d}.parquet")
        if os.path.exists(path):
            return path
        tbl = generate_text_shard(k, n_shards, n_docs, n_sources, seed,
                                  dup_frac)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=100_000)
        os.replace(tmp, path)
        return path

    ray.get([_write.remote(k) for k in range(n_shards)])
    return out_dir


def ensure_neardup_token_corpus(
    out_dir: str,
    *,
    n_base: int = 1500,
    n_clusters: int = 60,
    cluster_size: int = 3,
    perturb_frac: float = 0.01,
    vocab: int = 32000,
    seed: int = 777,
) -> str:
    """Deterministic token corpus WITH injected near-duplicate clusters,
    for the payload-native (token-n-gram) near-dedup lanes: `n_base`
    independent random sequences plus `n_clusters` clusters whose members
    share a base sequence with ~perturb_frac of positions resampled —
    high token-n-gram Jaccard within a cluster, ~0 across. Single shard
    set, atomic writes, content a pure function of the parameters."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "shard-00000.parquet")
    if os.path.exists(path):
        return out_dir
    rng = np.random.default_rng(seed)
    rows_tokens: list[np.ndarray] = []
    doc_ids: list[str] = []
    lens = rng.integers(64, 512, size=n_base)
    for i in range(n_base):
        rows_tokens.append(
            rng.integers(0, vocab, size=int(lens[i]), dtype=np.int32)
        )
        doc_ids.append(f"base-{i:06d}")
    for c in range(n_clusters):
        proto = rng.integers(
            0, vocab, size=int(rng.integers(96, 384)), dtype=np.int32
        )
        for m in range(cluster_size):
            t = proto.copy()
            k = max(1, int(len(t) * perturb_frac))
            pos = rng.choice(len(t), size=k, replace=False)
            t[pos] = rng.integers(0, vocab, size=k, dtype=np.int32)
            rows_tokens.append(t)
            doc_ids.append(f"dup-{c:04d}-{m}")
    # verbatim copies of base docs — EXACT-dup signal for token_exact_dedup
    n_exact = max(1, n_base // 40)
    for i, src_ix in enumerate(
        rng.choice(n_base, size=n_exact, replace=False)
    ):
        rows_tokens.append(rows_tokens[int(src_ix)].copy())
        doc_ids.append(f"copy-{i:04d}")
    off = np.zeros(len(rows_tokens) + 1, dtype=np.int32)
    np.cumsum([len(t) for t in rows_tokens], out=off[1:])
    tokens = pa.ListArray.from_arrays(
        pa.array(off, type=pa.int32()),
        pa.array(np.concatenate(rows_tokens), type=pa.int32()),
    )
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            # int64 surrogate key for the pair/cluster machinery (the
            # pair exchange hashes int64 ids); row order is deterministic
            "doc_key": pa.array(
                np.arange(len(doc_ids), dtype=np.int64)
            ),
            "tokens": tokens,
            "n_tok": pa.array(np.diff(off).astype(np.int32)),
            "source": pa.array(
                [d.split("-")[0] for d in doc_ids],
                type=pa.string(),
            ),
        }
    )
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp, row_group_size=100_000)
    os.replace(tmp, path)
    return out_dir
