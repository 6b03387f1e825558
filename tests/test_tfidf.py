"""tfidf_top_terms vs DuckDB and vs a brute-force python twin."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def _docs(rng, n=120, vocab=40):
    words = np.array([f"w{i:03d}" for i in range(vocab)])
    texts = [
        " ".join(rng.choice(words, size=rng.integers(1, 30)))
        for _ in range(n)
    ]
    # some docs with extra whitespace and an empty doc
    texts[0] = ""
    texts[1] = "  " + texts[1] + "   "
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def test_tfidf_vs_duckdb(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.text import tfidf_top_terms

    df = _docs(np.random.default_rng(3))
    got = (
        tfidf_top_terms(
            rd.from_pandas(df).repartition(5),
            text_col="text", id_col="doc_id", n_docs=len(df),
            num_partitions=4,
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(r"""
        WITH pairs AS (
          SELECT doc_id, word FROM (
            SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS word
            FROM documents)
          WHERE word <> ''
        ), tf AS (
          SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
          FROM pairs GROUP BY doc_id, word
        ), df AS (
          SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word
        ), scored AS (
          SELECT tf.doc_id, tf.word, tf.tf, df.df,
                 CAST(FLOOR(tf.tf * LN(
                     (SELECT CAST(count(*) AS DOUBLE) FROM documents) / df.df
                 ) * 1000000.0 + 0.5) AS BIGINT) AS tfidf_fp
          FROM tf JOIN df USING (word)
        )
        SELECT doc_id, word, tf, df, tfidf_fp FROM scored
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY tfidf_fp DESC, word) = 1
        ORDER BY doc_id
    """).df()
    assert len(got) == len(want)
    for c in ["doc_id", "tf", "df", "tfidf_fp"]:
        assert (got[c].to_numpy(dtype=np.int64)
                == want[c].to_numpy(dtype=np.int64)).all(), c
    assert (got["word"].to_numpy().astype(str)
            == want["word"].to_numpy().astype(str)).all()


def test_tfidf_partition_invariance(ray_session):
    import ray.data as rd

    from getml_community_ray.stages.text import tfidf_top_terms

    df = _docs(np.random.default_rng(9), n=60)
    outs = []
    for blocks, parts in [(1, 2), (6, 5)]:
        outs.append(
            tfidf_top_terms(
                rd.from_pandas(df).repartition(blocks),
                text_col="text", id_col="doc_id", n_docs=len(df),
                num_partitions=parts,
            )
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
