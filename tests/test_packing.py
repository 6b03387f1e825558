"""Corpus-composition ops: mixture sampling, sequence packing, n-gram
repetition signals (stages/packing.py, stages/text.ngram_repetition)."""

import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest


def _docs():
    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "x", "yy", "zzz"]
    texts = [
        " ".join(rng.choice(words, size=int(rng.integers(0, 30))))
        for _ in range(80)
    ]
    texts += ["", "solo", "a b a b a b a b", "  pad  ded  "]
    return pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "source": [f"s{i % 3}" for i in range(len(texts))],
        }
    )


def test_mixture_sample_deterministic_and_exact(ray_session):
    import ray.data as rd

    from getml_community_ray.kernels.hashing import splitmix64
    from getml_community_ray.stages.packing import (
        mixture_sample,
        mixture_thresholds,
    )

    df = _docs()
    w = {"s0": 0.0, "s1": 0.5, "s2": 1.0}
    out = (
        mixture_sample(
            rd.from_pandas(df), id_col="doc_id", source_col="source",
            weights=w,
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    thr = mixture_thresholds(w)
    h = splitmix64(df.doc_id.to_numpy(np.uint64))
    exp = df[
        [
            thr[s] >= 1 << 64 or int(hv) < thr[s]
            for s, hv in zip(df.source, h)
        ]
    ]
    assert out.doc_id.tolist() == exp.doc_id.tolist()
    # w=0 drops everything, w=1 keeps everything
    assert not (out.source == "s0").any()
    assert (out.source == "s2").sum() == (df.source == "s2").sum()
    # rerun identical
    out2 = (
        mixture_sample(
            rd.from_pandas(df), id_col="doc_id", source_col="source",
            weights=w,
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out.doc_id.tolist() == out2.doc_id.tolist()


def test_pack_documents_matches_bruteforce_any_partitioning(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.packing import pack_documents

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "doc_id": range(200),
            "source": [f"s{i % 3}" for i in range(200)],
            "n_tokens": rng.integers(0, 900, size=200),
        }
    )
    expected = {}
    S, C = 4, 512
    for (_, _), grp in df.assign(shard=df.doc_id % S).groupby(
        ["source", "shard"]
    ):
        g = grp.sort_values("doc_id")
        start = g.n_tokens.cumsum().shift(fill_value=0)
        for did, st in zip(g.doc_id, start):
            expected[did] = (int(st) // C, int(st) % C)
    for parts in (1, 7):
        out = (
            pack_documents(
                rd.from_pandas(df), id_col="doc_id", source_col="source",
                n_tok_col="n_tokens", context_len=C, num_shards=S,
                num_partitions=parts,
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        got = {
            int(r.doc_id): (int(r.bin_id), int(r.bin_offset))
            for r in out.itertuples()
        }
        assert got == expected, f"num_partitions={parts}"


def _brute_ngram(text, n):
    t = text.lower()
    nc = len(t)
    words = re.split(r"\s+", t)
    grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    if not grams or nc == 0:
        return 0.0, 0.0
    c = Counter(grams)
    g, cnt = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    top = cnt * len(g) / nc
    dup = sum(k * len(s) for s, k in c.items() if k > 1) / nc
    return top, dup


@pytest.mark.parametrize("n_top,n_dup", [(2, 3), (3, 5)])
def test_ngram_repetition_matches_bruteforce(ray_session, n_top, n_dup):
    import ray.data as rd

    from getml_community_ray.stages.text import ngram_repetition

    df = _docs()
    out = (
        ngram_repetition(
            rd.from_pandas(df), text_col="text", id_col="doc_id",
            n_top=n_top, n_dup=n_dup,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, row in out.iterrows():
        bt, _ = _brute_ngram(df.text[row.doc_id], n_top)
        _, bd = _brute_ngram(df.text[row.doc_id], n_dup)
        assert row[f"top{n_top}_frac"] == pytest.approx(bt, abs=1e-6)
        assert row[f"dup{n_dup}_frac"] == pytest.approx(bd, abs=1e-6)


def test_c4_line_filter_matches_bruteforce(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.text import c4_line_filter

    texts = [
        "Good line with words.\nshort.\nno punctuation here\n"
        "has javascript inside.\nbraces { bad }.\nAnother fine line!",
        "",
        "single unpunctuated line",
        'quoted line ends well."\nLorem Ipsum is flagged.',
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = (
        c4_line_filter(rd.from_pandas(df), text_col="text", id_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def brute(t):
        lines = t.split("\n")
        kept = [
            ln
            for ln in lines
            if re.search(r'[.!?"]$', ln)
            and len(re.findall(r"\S+", ln)) >= 3
            and "javascript" not in ln.lower()
            and "{" not in ln
        ]
        return len(lines), len(kept), "\n".join(kept), int("lorem ipsum" in t.lower())

    for i, row in out.iterrows():
        nl, nk, cleaned, lorem = brute(texts[row.doc_id])
        assert (row.n_lines, row.n_kept, row.cleaned, row.has_lorem) == (
            nl, nk, cleaned, lorem,
        ), row.doc_id


def test_chunk_documents_matches_bruteforce(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.text import chunk_documents

    df = _docs()
    C, O = 8, 3
    out = (
        chunk_documents(
            rd.from_pandas(df), text_col="text", id_col="doc_id",
            chunk_words=C, overlap_words=O,
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_ix"])
        .reset_index(drop=True)
    )
    S = C - O
    rows = []
    for did, t in zip(df.doc_id, df.text):
        words = re.split(r"\s+", t)
        w = len(words)
        n = 1 if w <= C else 1 + int(np.ceil((w - C) / S))
        for j in range(n):
            seg = words[j * S : j * S + C]
            rows.append((did, j, len(seg), " ".join(seg)))
    exp = pd.DataFrame(
        rows, columns=["doc_id", "chunk_ix", "n_chunk_words", "chunk_text"]
    )
    pd.testing.assert_frame_equal(
        out[exp.columns].astype(exp.dtypes.to_dict()), exp
    )


def test_sample_per_key_partition_invariance(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.packing import sample_per_key

    rng = np.random.default_rng(31)
    df = pd.DataFrame(
        {
            "id": rng.permutation(5000),
            "k": rng.choice(["a", "b", "c", "rare"], 5000,
                            p=[0.5, 0.3, 0.19, 0.01]),
        }
    )
    outs = []
    for parts, blocks in ((3, 1), (17, 8)):
        ds = rd.from_pandas(df).repartition(blocks)
        out = sample_per_key(ds, id_col="id", key_col="k", k=9,
                             num_partitions=parts).to_pandas()
        outs.append(out.sort_values("id").reset_index(drop=True))
    assert outs[0].equals(outs[1])
    counts = outs[0].groupby("k").size()
    assert (counts <= 9).all()
    assert counts[["a", "b", "c"]].eq(9).all()  # dense keys fill k


def test_sample_per_key_fewer_than_k(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.packing import sample_per_key

    df = pd.DataFrame({"id": range(4), "k": ["x"] * 4})
    out = sample_per_key(
        rd.from_pandas(df), id_col="id", key_col="k", k=10,
        num_partitions=2,
    ).to_pandas()
    assert sorted(out.id) == [0, 1, 2, 3]


def test_deterministic_shuffle(ray_session):
    import ray.data as rd
    from getml_community_ray.kernels.hashing import splitmix64
    from getml_community_ray.stages.packing import deterministic_shuffle

    n = 5_000
    ids = np.arange(n, dtype=np.int64)
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"id": rng.permutation(ids), "v": np.arange(n)})

    out = deterministic_shuffle(
        rd.from_pandas(df, override_num_blocks=7), id_col="id", seed=11,
        num_shards=16,
    ).to_pandas()
    assert len(out) == n
    # positions are a permutation of 0..n-1
    assert sorted(out["shuffle_pos"]) == list(range(n))
    # brute force: global order by (splitmix64(id + seed), id)
    h = splitmix64(out["id"].to_numpy().astype(np.uint64) + np.uint64(11))
    got = out.assign(_h=h.astype(np.uint64)).sort_values("shuffle_pos")
    want = got.sort_values(["_h", "id"])
    assert (got["id"].to_numpy() == want["id"].to_numpy()).all()

    # partition invariance: different block count, identical positions
    out2 = deterministic_shuffle(
        rd.from_pandas(df, override_num_blocks=2), id_col="id", seed=11,
        num_shards=16,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    a = out.sort_values("id").reset_index(drop=True)
    assert (a["shuffle_pos"].to_numpy() == out2["shuffle_pos"].to_numpy()).all()

    # num_shards=1 (ADVICE r4: shift=64 is UB on uint64 — special-cased):
    # single shard must yield the identical global permutation
    out1 = deterministic_shuffle(
        rd.from_pandas(df, override_num_blocks=3), id_col="id", seed=11,
        num_shards=1,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    assert (a["shuffle_pos"].to_numpy() == out1["shuffle_pos"].to_numpy()).all()

    import pytest

    with pytest.raises(ValueError, match="power of two"):
        deterministic_shuffle(
            rd.from_pandas(df), id_col="id", seed=11, num_shards=0,
        )


def test_exact_ecdf(ray_session):
    import ray.data as rd
    from getml_community_ray.stages.quantiles import exact_ecdf

    rng = np.random.default_rng(9)
    v = rng.integers(-50, 50, size=3_000)
    df = pd.DataFrame({"id": np.arange(3_000, dtype=np.int64), "x": v})
    out = exact_ecdf(
        rd.from_pandas(df, override_num_blocks=5), value_col="x",
        keep_cols=["id"],
    ).to_pandas().sort_values("id").reset_index(drop=True)
    # brute force n_less
    want = np.array([(v < x).sum() for x in df["x"]])
    assert (out["n_less"].to_numpy() == want).all()
    assert np.allclose(out["pct_rank"], want / (len(v) - 1))


def test_stratified_sample_exact_quotas(ray_session):
    import ray.data as rd
    from getml_community_ray.kernels.hashing import splitmix64
    from getml_community_ray.stages.packing import stratified_sample

    rng = np.random.default_rng(7)
    n = 6_000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.choice(["a", "b", "c"], size=n, p=[0.6, 0.3, 0.1]),
    })
    out = stratified_sample(
        rd.from_pandas(df, override_num_blocks=6), key_col="k",
        id_col="id", num=1, den=4,
    ).to_pandas()
    want_counts = {k: (c * 1) // 4 for k, c in df["k"].value_counts().items()}
    got_counts = out["k"].value_counts().to_dict()
    assert got_counts == want_counts
    # membership: exactly the quota smallest splitmix64(id) per key
    h = splitmix64(df["id"].to_numpy().astype(np.uint64))
    df2 = df.assign(h=h)
    for k, q in want_counts.items():
        want_ids = set(
            df2[df2.k == k].sort_values(["h", "id"]).head(q)["id"]
        )
        assert set(out[out.k == k]["id"]) == want_ids
    # partition invariance
    out2 = stratified_sample(
        rd.from_pandas(df, override_num_blocks=2), key_col="k",
        id_col="id", num=1, den=4,
    ).to_pandas()
    assert set(map(tuple, out[["id", "k"]].values)) == set(
        map(tuple, out2[["id", "k"]].values)
    )


def test_dataset_checksum_order_invariant(ray_session):
    import ray.data as rd
    from getml_community_ray.stages.integrity import dataset_checksum

    rng = np.random.default_rng(11)
    n = 5_000
    df = pd.DataFrame({
        "a": np.arange(n, dtype=np.int64),
        "b": rng.integers(-10**9, 10**9, n),
    })
    c1 = dataset_checksum(
        rd.from_pandas(df, override_num_blocks=3), int_cols=["a", "b"]
    )
    # shuffled row order + different block count -> identical digest
    c2 = dataset_checksum(
        rd.from_pandas(df.sample(frac=1.0, random_state=3),
                       override_num_blocks=9),
        int_cols=["a", "b"],
    )
    assert c1.equals(c2)
    assert c1["n_rows"][0].as_py() == n
    # a single changed value changes the digest
    df3 = df.copy(); df3.loc[17, "b"] += 1
    c3 = dataset_checksum(
        rd.from_pandas(df3, override_num_blocks=3), int_cols=["a", "b"]
    )
    assert c3["checksum"][0].as_py() != c1["checksum"][0].as_py()


def test_token_incremental_dedup_brute(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from getml_community_ray.stages.tokens import token_incremental_dedup

    rng = np.random.default_rng(13)
    base_rows = [rng.integers(0, 50, rng.integers(4, 10)).astype(np.int32)
                 for _ in range(60)]
    # new: 20 novel + 15 verbatim copies of base rows
    new_rows = [rng.integers(50, 99, rng.integers(4, 10)).astype(np.int32)
                for _ in range(20)]
    new_rows += [base_rows[i].copy() for i in range(15)]
    base = pa.table({
        "doc_key": pa.array(np.arange(60, dtype=np.int64)),
        "tokens": pa.array([r.tolist() for r in base_rows],
                           type=pa.list_(pa.int32())),
    })
    new = pa.table({
        "doc_key": pa.array(np.arange(100, 100 + len(new_rows),
                                      dtype=np.int64)),
        "tokens": pa.array([r.tolist() for r in new_rows],
                           type=pa.list_(pa.int32())),
    })
    out = token_incremental_dedup(
        rd.from_arrow(new).repartition(4), rd.from_arrow(base).repartition(3),
        tokens_col="tokens", id_col="doc_key",
    ).to_pandas()
    base_set = {tuple(r.tolist()) for r in base_rows}
    want = {100 + i for i, r in enumerate(new_rows)
            if tuple(r.tolist()) not in base_set}
    assert set(out["doc_key"]) == want
    assert len(out) == 20  # all copies dropped, all novel kept


def test_stratified_sample_null_keys(ray_session):
    """Null stratification keys never receive a quota and are dropped —
    and must not crash the counts combiner (r5 review regression)."""
    import ray.data as rd
    from getml_community_ray.stages.packing import stratified_sample

    n = 2_000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": pd.array(
            [None if i % 7 == 0 else f"s{i % 5}" for i in range(n)],
            dtype="string",
        ),
    })
    out = stratified_sample(
        rd.from_pandas(df, override_num_blocks=4),
        key_col="k", id_col="id", num=1, den=4, num_partitions=8,
    ).to_pandas()
    non_null = df[df["k"].notna()]
    expect = int(sum(
        (len(g) * 1) // 4 for _, g in non_null.groupby("k")
    ))
    assert len(out) == expect
    assert out["k"].notna().all()

    # int64 keys with nulls go through the same path
    df2 = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": pd.array(
            [None if i % 11 == 0 else i % 3 for i in range(n)],
            dtype="Int64",
        ),
    })
    out2 = stratified_sample(
        rd.from_pandas(df2, override_num_blocks=3),
        key_col="k", id_col="id", num=1, den=4, num_partitions=8,
    ).to_pandas()
    nn2 = df2[df2["k"].notna()]
    expect2 = int(sum((len(g) * 1) // 4 for _, g in nn2.groupby("k")))
    assert len(out2) == expect2
