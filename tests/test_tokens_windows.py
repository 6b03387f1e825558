"""Token-array analytics + hopping windows vs brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _tok_table(rng, n_docs=200, vocab=50):
    lens = rng.integers(0, 12, size=n_docs)
    toks = [rng.integers(0, vocab, size=ln).astype(np.int32) for ln in lens]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs)),
            "tokens": pa.array([t.tolist() for t in toks],
                               type=pa.list_(pa.int32())),
        }
    ), toks


@pytest.mark.parametrize("seed", [0, 1])
def test_token_histogram_vs_brute(ray_session, seed):
    import ray.data as rd

    from getml_community_ray.stages.tokens import token_histogram

    rng = np.random.default_rng(seed)
    tbl, toks = _tok_table(rng)
    got = (
        token_histogram(rd.from_arrow(tbl), tokens_col="tokens")
        .to_pandas()
        .sort_values("token_id")
        .reset_index(drop=True)
    )
    flat = np.concatenate([t for t in toks if len(t)]) if any(
        len(t) for t in toks
    ) else np.zeros(0, np.int64)
    acc = np.bincount(flat.astype(np.int64))
    nz = np.flatnonzero(acc)
    want = pd.DataFrame({"token_id": nz, "cnt": acc[nz]})
    pd.testing.assert_frame_equal(
        got.astype({"token_id": np.int64, "cnt": np.int64}),
        want.astype({"token_id": np.int64, "cnt": np.int64}),
    )


def test_token_histogram_sliced_block(ray_session):
    """flatten() must honor the slice window — a sliced ListArray's raw
    .values would leak sibling rows."""
    import ray.data as rd

    from getml_community_ray.stages.tokens import token_histogram

    tbl = pa.table(
        {"tokens": pa.array([[1, 1], [2], [3, 3, 3]],
                            type=pa.list_(pa.int32()))}
    ).slice(1, 2)
    got = (
        token_histogram(rd.from_arrow(tbl), tokens_col="tokens")
        .to_pandas().sort_values("token_id").reset_index(drop=True)
    )
    assert got["token_id"].tolist() == [2, 3]
    assert got["cnt"].tolist() == [1, 3]


@pytest.mark.parametrize("seed", [0, 1])
def test_token_bigrams_vs_brute(ray_session, seed):
    import ray.data as rd

    from getml_community_ray.stages.tokens import token_bigram_counts

    rng = np.random.default_rng(10 + seed)
    tbl, toks = _tok_table(rng, n_docs=300, vocab=8)
    got = token_bigram_counts(
        rd.from_arrow(tbl), tokens_col="tokens", top_k=20
    ).to_pandas()
    from collections import Counter

    c = Counter()
    for t in toks:
        for a, b in zip(t[:-1], t[1:]):
            c[(int(a), int(b))] += 1
    want = (
        pd.DataFrame(
            [(a, b, n) for (a, b), n in c.items()],
            columns=["t0", "t1", "cnt"],
        )
        .sort_values(["cnt", "t0", "t1"], ascending=[False, True, True])
        .head(20)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype(np.int64), want.astype(np.int64)
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_hopping_window_vs_brute(ray_session, seed):
    import ray.data as rd

    from getml_community_ray.stages.windows import hopping_window

    rng = np.random.default_rng(20 + seed)
    n = 500
    t0 = 1_600_000_000_000_000
    ts = t0 + rng.integers(0, 3 * 86_400_000_000, size=n)
    key = rng.choice(["a", "b", "c"], size=n)
    val = rng.integers(-50, 500, size=n)
    tbl = pa.table(
        {
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "k": pa.array(key),
            "v": pa.array(val.astype(np.float64)),
        }
    )
    W, S = 3600, 900
    got = (
        hopping_window(
            rd.from_arrow(tbl), ts_col="ts", key_col="k", value_col="v",
            width_s=W, slide_s=S,
        )
        .to_pandas()
        .sort_values(["key", "window_start_us"])
        .reset_index(drop=True)
    )
    rows = []
    for kk in ("a", "b", "c"):
        m = key == kk
        tt, vv = ts[m], val[m]
        starts = np.unique((tt // (S * 1_000_000)))
        cand = np.unique(
            np.concatenate([starts - j for j in range(W // S)])
        )
        for w in cand:
            w_us = w * S * 1_000_000
            sel = (tt >= w_us) & (tt < w_us + W * 1_000_000)
            if sel.any():
                rows.append(
                    (kk, w_us, int(sel.sum()), int(vv[sel].sum()),
                     int(vv[sel].min()), int(vv[sel].max()))
                )
    want = (
        pd.DataFrame(
            rows, columns=["key", "window_start_us", "n", "sum", "min", "max"]
        )
        .sort_values(["key", "window_start_us"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hopping_window_block_invariance(ray_session):
    """Same result at 1 block and many tiny blocks (combiner/merge split
    can't change the answer)."""
    import ray.data as rd

    from getml_community_ray.stages.windows import hopping_window

    rng = np.random.default_rng(7)
    n = 400
    t0 = 1_600_000_000_000_000
    tbl = pa.table(
        {
            "ts": pa.array(
                t0 + rng.integers(0, 86_400_000_000, size=n)
            ).cast(pa.timestamp("us")),
            "k": pa.array(rng.choice(["x", "y"], size=n)),
            "v": pa.array(rng.integers(0, 100, size=n).astype(np.float64)),
        }
    )
    kw = dict(ts_col="ts", key_col="k", value_col="v", width_s=1800,
              slide_s=600)
    a = (
        hopping_window(rd.from_arrow(tbl), **kw)
        .to_pandas().sort_values(["key", "window_start_us"])
        .reset_index(drop=True)
    )
    b = (
        hopping_window(
            rd.from_arrow(tbl).repartition(16), **kw
        )
        .to_pandas().sort_values(["key", "window_start_us"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize("seed", [0, 1])
def test_token_decontaminate_vs_brute(ray_session, seed):
    import ray.data as rd

    from getml_community_ray.stages.tokens import token_ngram_decontaminate

    rng = np.random.default_rng(40 + seed)
    N = 4
    docs = []
    for i in range(120):
        ln = int(rng.integers(0, 20))
        docs.append(rng.integers(0, 6, size=ln).astype(np.int32))
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(docs))),
            "tokens": pa.array([d.tolist() for d in docs],
                               type=pa.list_(pa.int32())),
        }
    )
    bench_ix = list(range(0, 20))
    bench = pa.table(
        {"tokens": pa.array([docs[i].tolist() for i in bench_ix],
                            type=pa.list_(pa.int32()))}
    )
    got = (
        token_ngram_decontaminate(
            rd.from_arrow(tbl), rd.from_arrow(bench), n=N, min_overlap=1
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )

    def grams(d):
        return {tuple(d[i:i + N]) for i in range(len(d) - N + 1)}

    bset = set().union(*[grams(docs[i]) for i in bench_ix]) if bench_ix else set()
    want_overlap = [len(grams(d) & bset) for d in docs]
    assert got["n_overlap"].tolist() == want_overlap
    assert got["contaminated"].tolist() == [int(x >= 1) for x in want_overlap]


def test_grouped_topk_block_invariance(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.groupby import grouped_topk

    rng = np.random.default_rng(9)
    n = 600
    tbl = pa.table(
        {
            "id": pa.array(np.arange(n)),
            "k": pa.array(rng.choice(["a", "b", "c", "d"], size=n)),
            "v": pa.array(rng.integers(0, 50, size=n)),  # many ties
        }
    )
    kw = dict(key_col="k", value_col="v", id_col="id", k=5)
    a = (
        grouped_topk(rd.from_arrow(tbl), **kw)
        .to_pandas().sort_values(["k", "rank"]).reset_index(drop=True)
    )
    b = (
        grouped_topk(rd.from_arrow(tbl).repartition(17), **kw)
        .to_pandas().sort_values(["k", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # brute force
    df = tbl.to_pandas()
    want = (
        df.sort_values(["k", "v", "id"], ascending=[True, False, True])
        .groupby("k").head(5)
    )
    got_ids = a.sort_values(["k", "rank"])["id"].tolist()
    assert got_ids == want["id"].tolist()


@pytest.mark.parametrize("seed", [0, 3])
def test_token_dup_windows_vs_brute(ray_session, seed):
    """Duplicate-window signal vs a dict-of-tuples brute force: heavy set
    = grams in >= min_docs distinct docs; per-doc occurrence counts of
    heavy grams; short docs (len < n) get 0 windows / 0.0 fraction."""
    import ray.data as rd

    from getml_community_ray.stages.tokens import token_dup_windows

    rng = np.random.default_rng(seed)
    n, min_docs = 4, 2
    # small vocab + short grams so cross-doc duplicate windows exist
    n_docs = 120
    lens = rng.integers(0, 14, size=n_docs)
    toks = [rng.integers(0, 6, size=ln).astype(np.int32) for ln in lens]
    # inject an exact repeated window across several docs
    boiler = np.array([1, 2, 3, 4, 5], dtype=np.int32)
    for d in (5, 17, 33):
        toks[d] = np.concatenate([boiler, toks[d]])
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs)),
            "tokens": pa.array([t.tolist() for t in toks],
                               type=pa.list_(pa.int32())),
        }
    )
    got = (
        token_dup_windows(
            rd.from_arrow(tbl), tokens_col="tokens", id_col="doc_id",
            n=n, min_docs=min_docs,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    from collections import Counter, defaultdict

    doc_grams = []
    for t in toks:
        gs = [tuple(t[i:i + n]) for i in range(max(len(t) - n + 1, 0))]
        doc_grams.append(gs)
    by_gram = defaultdict(set)
    for d, gs in enumerate(doc_grams):
        for g in gs:
            by_gram[g].add(d)
    heavy = {g for g, ds_ in by_gram.items() if len(ds_) >= min_docs}
    n_win = np.array([len(gs) for gs in doc_grams], dtype=np.int64)
    n_dup = np.array(
        [sum(1 for g in gs if g in heavy) for gs in doc_grams],
        dtype=np.int64,
    )
    frac = np.where(n_win > 0, n_dup / np.maximum(n_win, 1), 0.0)
    assert (got["n_windows"].to_numpy() == n_win).all()
    assert (got["n_dup_windows"].to_numpy() == n_dup).all()
    np.testing.assert_allclose(got["dup_fraction"].to_numpy(), frac,
                               rtol=0, atol=0)
    # the injected boilerplate window must be detected
    assert got.loc[got.doc_id == 5, "n_dup_windows"].iloc[0] >= 2


@pytest.mark.parametrize("window,stride", [(8, 8), (8, 4), (5, 3)])
def test_token_window_chunks_vs_brute(ray_session, window, stride):
    import ray.data as rd

    from getml_community_ray.stages.tokens import token_window_chunks

    rng = np.random.default_rng(7)
    tbl, toks = _tok_table(rng, n_docs=120)
    got = (
        token_window_chunks(
            rd.from_arrow(tbl), id_col="doc_id", tokens_col="tokens",
            window=window, stride=stride,
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_ix"])
        .reset_index(drop=True)
    )
    rows = []
    for did, t in zip(range(len(toks)), toks):
        start, cix = 0, 0
        while start < len(t):
            rows.append((did, cix, t[start:start + window]))
            start += stride
            cix += 1
    assert len(got) == len(rows)
    for (did, cix, want), (_, g) in zip(rows, got.iterrows()):
        assert g["doc_id"] == did and g["chunk_ix"] == cix
        assert g["chunk_len"] == len(want)
        assert np.array_equal(np.asarray(g["chunk_tokens"], dtype=np.int32),
                              want)


def test_token_window_chunks_sliced_block(ray_session):
    """Sliced ListArray (nonzero offset) must not leak sibling-row values."""
    from getml_community_ray.stages.tokens import token_window_chunks
    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2]),
            "tokens": pa.array(
                [[1, 2, 3, 4, 5], [6, 7], [8, 9, 10]], type=pa.list_(pa.int32())
            ),
        }
    )
    sliced = tbl.slice(1, 2)  # rows 1..2 with a values-buffer offset
    got = (
        token_window_chunks(rd.from_arrow(sliced), id_col="doc_id",
                            tokens_col="tokens", window=2, stride=2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_ix"])
        .reset_index(drop=True)
    )
    want = [(1, 0, [6, 7]), (2, 0, [8, 9]), (2, 1, [10])]
    assert len(got) == 3
    for (did, cix, w), (_, g) in zip(want, got.iterrows()):
        assert (g["doc_id"], g["chunk_ix"]) == (did, cix)
        assert list(g["chunk_tokens"]) == w


def test_token_vocab_remap_vs_brute(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.tokens import (
        make_remap_lut,
        token_vocab_remap,
    )

    rng = np.random.default_rng(11)
    tbl, toks = _tok_table(rng, n_docs=100, vocab=50)
    got = (
        token_vocab_remap(rd.from_arrow(tbl), tokens_col="tokens",
                          vocab_size=50, every=3, mul=17, add=5,
                          concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    lut = make_remap_lut(50, every=3, mul=17, add=5)
    for did, t in zip(range(len(toks)), toks):
        want = lut[t] if len(t) else np.zeros(0, np.int32)
        assert np.array_equal(
            np.asarray(got.loc[did, "tokens"], dtype=np.int32), want
        )


def test_token_diversity_vs_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from getml_community_ray.stages.tokens import token_diversity

    rng = np.random.default_rng(5)
    rows = []
    for i in range(300):
        n = int(rng.integers(1, 60))
        rows.append(rng.integers(0, 50, n).astype(np.int32))
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i:04d}" for i in range(300)]),
            "tokens": pa.array(
                [r.tolist() for r in rows], type=pa.list_(pa.int32())
            ),
        }
    )
    got = (
        token_diversity(rd.from_arrow(t).repartition(4))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("seqs", t)
    want = con.execute(
        """
        SELECT d.doc_id, CAST(len(d.tokens) AS BIGINT) AS n_tok,
               CAST(COUNT(c.tok) AS BIGINT) AS n_distinct,
               CAST(COALESCE(SUM(c.c * (c.c - 1)), 0) AS BIGINT)
                   AS simpson_num
        FROM seqs d
        LEFT JOIN (
          SELECT doc_id, tok, COUNT(*) AS c
          FROM (SELECT doc_id, unnest(tokens) AS tok FROM seqs)
          GROUP BY 1, 2
        ) c USING (doc_id)
        GROUP BY 1, 2 ORDER BY 1
        """
    ).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_token_mask_vs_brute(ray_session):
    import ray.data as rd

    from getml_community_ray.kernels.hashing import splitmix64
    from getml_community_ray.stages.tokens import token_mask

    rng = np.random.default_rng(7)
    tbl, toks = _tok_table(rng, n_docs=150, vocab=50)
    got = (
        token_mask(rd.from_arrow(tbl), tokens_col="tokens",
                   id_col="doc_id", mask_id=99, rate_pct=20, pos_mul=31)
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    # empty sequences are dropped
    assert set(got.index) == {i for i, t in enumerate(toks) if len(t)}
    for did, t in enumerate(toks):
        if not len(t):
            continue
        pos = np.arange(1, len(t) + 1, dtype=np.int64)
        with np.errstate(over="ignore"):
            x = (np.int64(did) * np.int64(31) + pos).view(np.uint64)
        m = (splitmix64(x) % np.uint64(100)) < np.uint64(20)
        assert got.loc[did, "n_tok"] == len(t)
        assert got.loc[did, "n_masked"] == int(m.sum())
        assert got.loc[did, "masked_pos_sum"] == int(pos[m].sum())
        assert got.loc[did, "tok_sum"] == int(
            np.where(m, 99, t.astype(np.int64)).sum())


def test_token_mask_partition_invariance(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.tokens import token_mask

    rng = np.random.default_rng(8)
    tbl, _ = _tok_table(rng, n_docs=120, vocab=30)

    def run(nparts):
        ds = rd.from_arrow(tbl).repartition(nparts)
        return (
            token_mask(ds, tokens_col="tokens", id_col="doc_id")
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(1), run(7))


def test_token_pmi_vs_brute(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.tokens import token_pmi_bigrams

    rng = np.random.default_rng(13)
    tbl, toks = _tok_table(rng, n_docs=300, vocab=12)
    got = (
        token_pmi_bigrams(rd.from_arrow(tbl).repartition(4),
                          tokens_col="tokens", top_k=10)
        .to_pandas().reset_index(drop=True)
    )
    from collections import Counter

    bg, ug = Counter(), Counter()
    n_tokens = n_bigrams = 0
    for t in toks:
        ug.update(t.tolist())
        n_tokens += len(t)
        if len(t) >= 2:
            bg.update(zip(t[:-1].tolist(), t[1:].tolist()))
            n_bigrams += len(t) - 1
    top = sorted(bg.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert len(got) == 10
    for i, ((a, b), c) in enumerate(top):
        r = got.iloc[i]
        assert (r["t0"], r["t1"], r["c_xy"]) == (a, b, c)
        assert r["c_x"] == ug[a] and r["c_y"] == ug[b]
        assert r["n_tokens"] == n_tokens and r["n_bigrams"] == n_bigrams


def test_token_span_corrupt_vs_brute(ray_session):
    import ray.data as rd

    from getml_community_ray.kernels.hashing import splitmix64
    from getml_community_ray.stages.tokens import token_span_corrupt

    rng = np.random.default_rng(41)
    tbl, toks = _tok_table(rng, n_docs=200, vocab=40)
    got = (
        token_span_corrupt(
            rd.from_arrow(tbl).repartition(5), tokens_col="tokens",
            id_col="doc_id", start_mod=4, max_extra=2,
            mul_start=31, mul_len=37,
        )
        .to_pandas().sort_values("doc_id").set_index("doc_id")
    )
    for did, t in enumerate(toks):
        if not len(t):
            assert did not in got.index
            continue
        n = len(t)
        pos = np.arange(1, n + 1, dtype=np.int64)
        with np.errstate(over="ignore"):
            h1 = splitmix64((np.int64(did) * np.int64(31) + pos)
                            .view(np.uint64))
            h2 = splitmix64((np.int64(did) * np.int64(37) + pos)
                            .view(np.uint64))
        starts = (h1 % np.uint64(4)) == 0
        ln = 1 + (h2 % np.uint64(3)).astype(np.int64)
        cov = np.zeros(n, dtype=bool)
        for p in np.flatnonzero(starts):
            cov[p: min(p + ln[p], n)] = True
        assert got.loc[did, "n_spans"] == int(starts.sum())
        assert got.loc[did, "n_corrupted"] == int(cov.sum())
        assert got.loc[did, "corrupted_pos_sum"] == int(pos[cov].sum())
        assert got.loc[did, "clean_tok_sum"] == int(
            t.astype(np.int64)[~cov].sum())


def test_token_max_run_vs_brute(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.tokens import token_max_run

    rng = np.random.default_rng(53)
    # low vocab => frequent runs
    tbl, toks = _tok_table(rng, n_docs=250, vocab=4)
    got = (
        token_max_run(rd.from_arrow(tbl).repartition(5),
                      tokens_col="tokens", id_col="doc_id")
        .to_pandas().sort_values("doc_id").set_index("doc_id")
    )
    for did, t in enumerate(toks):
        if not len(t):
            assert did not in got.index
            continue
        runs = []
        start = 0
        for i in range(1, len(t) + 1):
            if i == len(t) or t[i] != t[start]:
                runs.append((i - start, start, int(t[start])))
                start = i
        best = max(runs, key=lambda r: (r[0], -r[1]))
        assert got.loc[did, "n_tok"] == len(t)
        assert got.loc[did, "max_run"] == best[0]
        assert got.loc[did, "run_token"] == best[2]
        assert got.loc[did, "n_runs"] == len(runs)


def test_hopping_distinct_vs_brute(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.windows import hopping_distinct

    rng = np.random.default_rng(61)
    n = 1500
    tbl = pa.table(
        {
            "ts": pa.array(
                (1_700_000_000_000_000
                 + rng.integers(0, 3 * 86400, n) * 1_000_000),
                type=pa.timestamp("us"),
            ),
            "k": pa.array(rng.choice(["a", "b"], n)),
            "m": pa.array(rng.integers(0, 40, n).astype(np.int64)),
        }
    )
    got = (
        hopping_distinct(
            rd.from_arrow(tbl).repartition(6), ts_col="ts", key_col="k",
            member_col="m", width_s=3600, slide_s=900, num_partitions=5,
        )
        .to_pandas().sort_values(["key", "window_start_us"])
        .reset_index(drop=True)
    )
    # brute force
    from collections import defaultdict

    sets = defaultdict(set)
    tus = tbl["ts"].cast(pa.int64()).to_numpy()
    S = 900 * 10**6
    for t, k, m in zip(tus, tbl["k"].to_pylist(), tbl["m"].to_pylist()):
        for j in range(4):
            sets[(k, (t // S - j) * S)].add(m)
    want = pd.DataFrame(
        [(k, w, len(s)) for (k, w), s in sorted(sets.items())],
        columns=["key", "window_start_us", "n_distinct"],
    )
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_token_context_diversity_vs_brute(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.tokens import token_context_diversity

    rng = np.random.default_rng(67)
    tbl, toks = _tok_table(rng, n_docs=200, vocab=15)
    got = (
        token_context_diversity(rd.from_arrow(tbl).repartition(4),
                                tokens_col="tokens", num_partitions=3)
        .to_pandas().sort_values("t0").reset_index(drop=True)
    )
    from collections import Counter, defaultdict

    ctx = defaultdict(Counter)
    for t in toks:
        for a, b in zip(t[:-1], t[1:]):
            ctx[int(a)][int(b)] += 1
    assert set(got["t0"]) == set(ctx)
    g = got.set_index("t0")
    for t0, c in ctx.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert g.loc[t0, "n_pairs"] == sum(c.values())
        assert g.loc[t0, "n_distinct_next"] == len(c)
        assert g.loc[t0, "simpson_num"] == sum(v * (v - 1) for v in c.values())
        assert g.loc[t0, "top_next"] == top[0]
        assert g.loc[t0, "top_c"] == top[1]
