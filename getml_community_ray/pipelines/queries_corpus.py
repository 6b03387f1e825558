"""Driver-contract queries for the corpus / training-data operators:
BPE-ish token counting, binary payload lane, embedding near-dup, n-gram
Jaccard dedup, IVF ANN, multimodal feature plumbing."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.partitioning import auto_partitions


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def q_token_count_bpe(sf_dir: str):
    from ..stages.text import token_count_bpe

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return token_count_bpe(ds, text_col="text", id_col="doc_id")


SQL_TOKEN_COUNT_BPE = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\w{1,4}|[^\w\s]')) AS BIGINT)
           AS n_tokens
FROM documents
"""


def q_payload_bytes(sf_dir: str):
    """Binary-payload lane: text -> binary column -> per-payload byte
    length computed from the binary buffer (proves the opaque-binary
    plumbing against a SQL oracle)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        payload = b["text"].cast(pa.binary())
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_bytes": pc.cast(pc.binary_length(payload), pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


SQL_PAYLOAD_BYTES = """
SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
"""


def q_cosine_neardup_embeddings(sf_dir: str):
    from ..stages.dedup import cosine_neardup_exact

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return cosine_neardup_exact(ds, threshold=0.4)


SQL_COSINE_NEARDUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) * 1e6)
            AS BIGINT) / 1000000.0 AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.4
"""


def q_ngram_jaccard_documents(sf_dir: str):
    """MinHash-LSH candidates -> distributed pair explode -> text hash-join
    -> exact 5-gram Jaccard verify (>= 0.5). Oracle = brute-force SQL
    Jaccard: every true pair on this corpus sits at >= 0.9, where
    16-band/4-row LSH recall is 1 - 4e-8 (verified at sf0.001/sf0.01)."""
    from ..stages.dedup import ngram_jaccard_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_jaccard_pairs(
        ds, text_col="text", id_col="doc_id", threshold=0.5
    )


def q_fingerprint_documents(sf_dir: str):
    """Strided rolling-hash fingerprint; exact DuckDB-twin oracle."""
    from ..stages.text import fingerprint

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return fingerprint(ds, text_col="text", id_col="doc_id")


def q_ivf_topk_embeddings(sf_dir: str):
    """IVF ANN through the full scale machinery — centroid train, broadcast
    assign, (cluster, sub) partitioned per-group search, associative top-k
    merge — at n_probe == n_clusters, where IVF is EXACT, so the brute-force
    SQL top-k is a true oracle. Recall of n_probe < n_clusters is asserted
    in tests/test_dedup_extra.py."""
    import ray
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    from ..stages.similarity import ivf_topk

    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    qt = qt.filter(pc.less(qt["vec_id"], 5))
    qids = np.asarray(qt["vec_id"], dtype=np.int64)
    Q = np.stack(
        [np.asarray(x, dtype=np.float64) for x in qt["embedding"].to_pylist()]
    )
    ref = ray.put((qids, Q))
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ivf_topk(ds, query_ref=ref, k=10, n_clusters=16, n_probe=16)


SQL_IVF_TOPK = """
WITH s AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         CAST(round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                           CAST(e.embedding AS DOUBLE[])) * 1e6)
              AS BIGINT) / 1000000.0 AS cosine
  FROM embeddings q CROSS JOIN embeddings e
  WHERE q.vec_id < 5
)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC)
            AS BIGINT) AS rank
FROM s QUALIFY rank <= 10
"""


def q_cosine_neardup_lsh(sf_dir: str):
    """Scale lane of embedding near-dedup: random-hyperplane LSH buckets ->
    exact cosine verify within buckets (only (id, vector) columns shuffle;
    no driver materialization). Params (4 planes x 64 tables) give per-pair
    miss probability ~4e-6 at the 0.45 threshold on this corpus, so the
    output equals the brute-force SQL oracle (verified at sf0.001/sf0.01);
    at larger scale trade planes/tables for bucket size."""
    from ..stages.dedup import cosine_neardup_lsh

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return cosine_neardup_lsh(
        ds, threshold=0.45, n_planes=4, n_tables=64
    )


SQL_COSINE_NEARDUP_LSH = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) * 1e6)
            AS BIGINT) / 1000000.0 AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.45
"""


def q_multimodal_features(sf_dir: str):
    """Documents -> binary payloads -> actor-pool byte-histogram features
    (decode/resize plumbing covered in tests; stubbed codec). Integer bin
    counts (normalize=False) so the SQL oracle is exact; crc32 is projected
    out (no SQL twin) but stays pinned by tests/test_multimodal.py."""
    from ..stages.multimodal import ByteHistogramFeatures

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_payload(b: pa.Table) -> pa.Table:
        return pa.table(
            {"id": b["doc_id"], "payload": b["text"].cast(pa.binary())}
        )

    return (
        ds.map_batches(to_payload, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            ByteHistogramFeatures,
            fn_constructor_kwargs={"normalize": False},
            batch_format="pyarrow",
            batch_size=256,
            concurrency=2,
        )
        .select_columns(["id", "n_bytes", "byte_hist"])
    )


# 16-bin histogram of the payload bytes (bin = byte >> 4), exact integer
# counts; char == byte holds on the pure-ASCII driver corpus (see
# sql_oracles module scope note).
SQL_MULTIMODAL_FEATURES = """
WITH by_pos AS (
  SELECT doc_id AS id,
         ord(substring(text, CAST(s AS INT), 1)) // 16 AS bin
  FROM documents,
       LATERAL (SELECT unnest(generate_series(1, length(text))) AS s) t
),
cnt AS (
  SELECT id, bin, count(*) AS c FROM by_pos GROUP BY 1, 2
),
grid AS (
  SELECT d.doc_id AS id,
         CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
         b.bin, coalesce(c.c, 0) AS c
  FROM documents d
  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bin) b
  LEFT JOIN cnt c ON c.id = d.doc_id AND c.bin = b.bin
)
SELECT id, n_bytes, list(CAST(c AS BIGINT) ORDER BY bin) AS byte_hist
FROM grid GROUP BY id, n_bytes
"""


CORPUS_QUERIES = {
    "token_count_bpe_documents": q_token_count_bpe,
    "payload_bytes_documents": q_payload_bytes,
    "cosine_neardup_embeddings": q_cosine_neardup_embeddings,
    "ngram_jaccard_documents": q_ngram_jaccard_documents,
    "fingerprint_documents": q_fingerprint_documents,
    "ivf_topk_embeddings": q_ivf_topk_embeddings,
    "multimodal_features_documents": q_multimodal_features,
}

def _hash_oracles() -> dict[str, str]:
    from .sql_oracles import (
        sql_fingerprint,
        sql_near_dedup_clusters,
        sql_ngram_jaccard,
    )

    return {
        "ngram_jaccard_documents": sql_ngram_jaccard(threshold=0.5),
        "near_dedup_clusters_documents": sql_near_dedup_clusters(threshold=0.5),
        "fingerprint_documents": sql_fingerprint(),
    }


CORPUS_QUERIES["cosine_neardup_lsh_embeddings"] = q_cosine_neardup_lsh

CORPUS_ORACLE_SQL = {
    "token_count_bpe_documents": SQL_TOKEN_COUNT_BPE,
    "payload_bytes_documents": SQL_PAYLOAD_BYTES,
    "cosine_neardup_embeddings": SQL_COSINE_NEARDUP,
    "ivf_topk_embeddings": SQL_IVF_TOPK,
    "cosine_neardup_lsh_embeddings": SQL_COSINE_NEARDUP_LSH,
    **_hash_oracles(),
}


def q_salted_word_counts(sf_dir: str):
    """word_counts via the two-level SALTED merge (stages/skew.py): exact
    for any distribution, spreads Zipf-hot words over `salt` reducers."""
    from ..stages.preprocessors import TextFieldSplitter
    from ..stages.skew import salted_group_count

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    words = TextFieldSplitter(text_col="text", id_col="doc_id").transform(ds)
    counts = salted_group_count(words, "word", salt=8)
    return counts.filter(expr="cnt >= 10")


SQL_SALTED_WORD_COUNTS = r"""
SELECT word, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents)
WHERE word <> ''
GROUP BY word HAVING count(*) >= 10
"""

CORPUS_QUERIES["salted_word_counts_documents"] = q_salted_word_counts
CORPUS_ORACLE_SQL["salted_word_counts_documents"] = SQL_SALTED_WORD_COUNTS


def q_near_dedup_clusters(sf_dir: str):
    """End-to-end near-dedup: LSH -> distributed exact Jaccard verify ->
    connected components -> canonical (min-id) per cluster. Oracle =
    recursive-CTE connected components over the brute-force edge list."""
    from ..stages.dedup import near_dedup_clusters

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return near_dedup_clusters(
        ds, text_col="text", id_col="doc_id", threshold=0.5
    )


CORPUS_QUERIES["near_dedup_clusters_documents"] = q_near_dedup_clusters


TOKENS_CORPUS = "/tmp/graft_seq_smoke_tokens"


def _ensure_tokens_corpus() -> str:
    from ..sources.synth import ensure_local_corpus

    return ensure_local_corpus(TOKENS_CORPUS, n_rows=5_000, n_shards=4, seed=123)


def q_tokens_passthrough(sf_dir: str):
    """BASELINE per-row invariant through the driver contract: pre-tokenized
    sequences flow through a filter+project pipeline with the `tokens`
    list<int32> untouched (zero-copy lane, never shuffled); the output pins
    the payload with order-sensitive integer sums (sum, position-weighted
    sum, first/last token) that the DuckDB oracle recomputes from the same
    parquet — an exact content+order check. Byte-level equality vs the
    source is additionally asserted in tests/test_codec.py (CRC lane)."""
    import ray.data as rd

    _ensure_tokens_corpus()
    ds = rd.read_parquet(
        TOKENS_CORPUS, columns=["doc_id", "tokens", "n_tok", "source"]
    )
    ds = ds.filter(expr="n_tok >= 16")

    def pins(b: pa.Table) -> pa.Table:
        toks = b["tokens"].combine_chunks()
        vals = np.asarray(toks.values, dtype=np.int64)
        off = np.asarray(toks.offsets, dtype=np.int64)
        lens = np.diff(off)
        # per-row position weights 1..len (reset at row starts)
        pos = np.arange(len(vals), dtype=np.int64) - np.repeat(off[:-1], lens) + 1
        seg = off[:-1]
        tok_sum = np.add.reduceat(vals, seg) if len(vals) else np.zeros(0, np.int64)
        tok_wsum = (
            np.add.reduceat(vals * pos, seg) if len(vals) else np.zeros(0, np.int64)
        )
        first = vals[off[:-1]] if len(vals) else np.zeros(0, np.int64)
        last = vals[off[1:] - 1] if len(vals) else np.zeros(0, np.int64)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "source": b["source"],
                "n_tok": b["n_tok"],
                "tok_sum": pa.array(tok_sum),
                "tok_wsum": pa.array(tok_wsum),
                "tok_first": pa.array(first),
                "tok_last": pa.array(last),
            }
        )

    return ds.map_batches(pins, batch_format="pyarrow", zero_copy_batch=True)


def sql_tokens_passthrough() -> str:
    _ensure_tokens_corpus()
    return f"""
SELECT doc_id, source, n_tok,
       CAST(list_aggregate(CAST(tokens AS BIGINT[]), 'sum') AS BIGINT) AS tok_sum,
       CAST(list_aggregate(
           list_transform(CAST(tokens AS BIGINT[]), (x, i) -> x * i), 'sum')
           AS BIGINT) AS tok_wsum,
       CAST(tokens[1] AS BIGINT) AS tok_first,
       CAST(tokens[len(tokens)] AS BIGINT) AS tok_last
FROM read_parquet('{TOKENS_CORPUS}/*.parquet')
WHERE n_tok >= 16
"""


CORPUS_QUERIES["tokens_passthrough_sequences"] = q_tokens_passthrough
CORPUS_ORACLE_SQL["tokens_passthrough_sequences"] = sql_tokens_passthrough()


def q_simhash_candidates(sf_dir: str):
    """SimHash banded near-dup candidate pairs (pigeonhole-complete for
    hamming <= 3); exact band+hamming SQL twin as oracle."""
    from ..stages.dedup import simhash_candidates

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_candidates(
        ds, text_col="text", id_col="doc_id", max_hamming=10
    )


def _register_corpus_hash_oracles() -> None:
    from .sql_oracles import sql_simhash_pairs

    CORPUS_ORACLE_SQL["simhash_candidates_documents"] = sql_simhash_pairs(
        max_hamming=10
    )
    CORPUS_ORACLE_SQL["multimodal_features_documents"] = SQL_MULTIMODAL_FEATURES


CORPUS_QUERIES["simhash_candidates_documents"] = q_simhash_candidates
_register_corpus_hash_oracles()


def q_gopher_quality(sf_dir: str):
    """Gopher-style quality filter rules as a D query: every ratio is a
    ratio of exact integers, so IEEE division matches DuckDB bit-for-bit."""
    from ..stages.text import gopher_quality

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return gopher_quality(ds, text_col="text", id_col="doc_id")


SQL_GOPHER_QUALITY = r"""
WITH w AS (
    SELECT doc_id,
           regexp_split_to_array(text, '\s+') AS words,
           CAST(length(text) AS DOUBLE) AS n_chars,
           CAST(len(regexp_extract_all(text, '\s')) AS DOUBLE) AS n_space,
           CAST(len(regexp_extract_all(text, '[#…]')) AS DOUBLE) AS n_sym
    FROM documents
), r AS (
    SELECT doc_id,
           CAST(len(words) AS DOUBLE) AS n_words,
           (n_chars - n_space) / len(words) AS mean_wl,
           n_sym / len(words) AS sym_ratio,
           CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))
                AS DOUBLE) / len(words) AS alpha_frac
    FROM w
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(round(mean_wl * 1000000.0) AS BIGINT) / 1000000.0
           AS mean_word_len,
       CAST(round(sym_ratio * 1000000.0) AS BIGINT) / 1000000.0
           AS symbol_ratio,
       CAST(round(alpha_frac * 1000000.0) AS BIGINT) / 1000000.0
           AS alpha_word_frac,
       CAST(n_words >= 5 AND n_words <= 100000
            AND mean_wl >= 2.0 AND mean_wl <= 12.0
            AND sym_ratio < 0.1 AND alpha_frac > 0.8 AS BIGINT) AS keep
FROM r
"""


def q_distinct_word_fraction(sf_dir: str):
    from ..stages.text import distinct_word_fraction

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return distinct_word_fraction(ds, text_col="text", id_col="doc_id")


SQL_DISTINCT_WORD_FRACTION = r"""
WITH w AS (
    SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words
    FROM documents
)
SELECT doc_id,
       CAST(len(words) AS BIGINT) AS n_words,
       CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct_words,
       CAST(round((CAST(len(list_distinct(words)) AS DOUBLE) / len(words))
                  * 1000000.0) AS BIGINT) / 1000000.0 AS distinct_frac
FROM w
"""


def q_pii_scrub(sf_dir: str):
    """PII scrub lane: inject a deterministic contact string per doc (the
    corpus has none), then regex-scrub emails and phone spans. The full
    scrubbed text is compared, proving byte-identical RE2 replacement."""
    import pyarrow.compute as pc

    from ..stages.text import pii_scrub

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def inject(b: pa.Table) -> pa.Table:
        contact = pc.binary_join_element_wise(
            b["text"],
            " contact user",
            pc.cast(b["doc_id"], pa.string()),
            "@mail.example.org call 555-0199.",
            "",
        )
        return pa.table({"doc_id": b["doc_id"], "text": contact})

    return pii_scrub(
        ds.map_batches(inject, batch_format="pyarrow", zero_copy_batch=True),
        text_col="text",
        id_col="doc_id",
    )


SQL_PII_SCRUB = r"""
WITH t AS (
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@mail.example.org call 555-0199.' AS text
    FROM documents
), e AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(
               text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               AS BIGINT) AS n_emails,
           regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g') AS scrubbed
    FROM t
)
SELECT doc_id, n_emails,
       CAST(len(regexp_extract_all(scrubbed, '\b\d{3}-\d{4}\b'))
           AS BIGINT) AS n_phones,
       regexp_replace(scrubbed, '\b\d{3}-\d{4}\b', '<PHONE>', 'g')
           AS scrubbed
FROM e
"""

CORPUS_QUERIES.update(
    {
        "gopher_quality_documents": q_gopher_quality,
        "distinct_word_fraction_documents": q_distinct_word_fraction,
        "pii_scrub_documents": q_pii_scrub,
    }
)
CORPUS_ORACLE_SQL.update(
    {
        "gopher_quality_documents": SQL_GOPHER_QUALITY,
        "distinct_word_fraction_documents": SQL_DISTINCT_WORD_FRACTION,
        "pii_scrub_documents": SQL_PII_SCRUB,
    }
)


def q_quantize_embeddings(sf_dir: str):
    from ..stages.similarity import quantize_embeddings_int8

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return quantize_embeddings_int8(ds, vec_col="embedding", id_col="vec_id")


SQL_QUANTIZE_EMBEDDINGS = """
WITH m AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
           CAST(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
                AS DOUBLE) AS max_abs
    FROM embeddings
)
SELECT vec_id, max_abs,
       CAST(CASE WHEN max_abs > 0 THEN list_sum(
           list_transform(v, x -> floor(x * 127.0 / max_abs + 0.5)))
           ELSE 0 END AS BIGINT) AS sum_q,
       CAST(CASE WHEN max_abs > 0 THEN list_sum(
           list_transform(v, x -> abs(floor(x * 127.0 / max_abs + 0.5))))
           ELSE 0 END AS BIGINT) AS l1_q
FROM m
"""

CORPUS_QUERIES["quantize_embeddings_int8"] = q_quantize_embeddings
CORPUS_ORACLE_SQL["quantize_embeddings_int8"] = SQL_QUANTIZE_EMBEDDINGS


# ---------------------------------------------------------------------------
# Corpus-composition lanes: Gopher repetition filters, deterministic
# mixture sampling, concat-and-chunk sequence packing (stages/packing.py,
# stages/text.ngram_repetition).
# ---------------------------------------------------------------------------

def q_ngram_repetition(sf_dir: str):
    from ..stages.text import ngram_repetition

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_repetition(ds, text_col="text", id_col="doc_id",
                            n_top=2, n_dup=3)


SQL_NGRAM_REPETITION = r"""
WITH w AS (
    SELECT doc_id, len(lower(text)) AS n_chars,
           regexp_split_to_array(lower(text), '\s+') AS words
    FROM documents
), g2 AS (
    SELECT doc_id, unnest(list_transform(
               generate_series(1, len(words) - 1),
               i -> words[i] || ' ' || words[i + 1])) AS gram
    FROM w
), c2 AS (
    SELECT doc_id, gram, count(*) AS cnt, len(gram) AS gchars
    FROM g2 GROUP BY doc_id, gram
), t2 AS (
    SELECT doc_id, cnt * gchars AS top_chars,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY cnt DESC, gram ASC) AS rn
    FROM c2
), g3 AS (
    SELECT doc_id, unnest(list_transform(
               generate_series(1, len(words) - 2),
               i -> words[i] || ' ' || words[i + 1] || ' ' || words[i + 2]))
               AS gram
    FROM w
), c3 AS (
    SELECT doc_id, gram, count(*) AS cnt, len(gram) AS gchars
    FROM g3 GROUP BY doc_id, gram
), d3 AS (
    SELECT doc_id,
           sum(CASE WHEN cnt > 1 THEN cnt * gchars ELSE 0 END) AS dup_chars
    FROM c3 GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(round(coalesce(t2.top_chars, 0)
                  / CASE WHEN w.n_chars > 0 THEN w.n_chars ELSE 1 END
                  * 1000000.0) AS BIGINT) / 1000000.0 AS top2_frac,
       CAST(round(coalesce(d3.dup_chars, 0)
                  / CASE WHEN w.n_chars > 0 THEN w.n_chars ELSE 1 END
                  * 1000000.0) AS BIGINT) / 1000000.0 AS dup3_frac
FROM w
LEFT JOIN t2 ON t2.doc_id = w.doc_id AND t2.rn = 1
LEFT JOIN d3 ON d3.doc_id = w.doc_id
"""


MIXTURE_WEIGHTS = {f"src{i}": 0.125 + (i % 4) * 0.25 for i in range(20)}


def q_mixture_sample(sf_dir: str):
    from ..stages.packing import mixture_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    return mixture_sample(ds, id_col="doc_id", source_col="source",
                          weights=MIXTURE_WEIGHTS)


def _sql_mixture_sample() -> str:
    from ..stages.packing import mixture_sample_sql

    return mixture_sample_sql("documents", id_col="doc_id",
                              source_col="source", weights=MIXTURE_WEIGHTS)


PACK_CONTEXT_LEN = 2048
PACK_SHARDS = 4


def q_sequence_packing(sf_dir: str):
    """Concat-and-chunk packing over the documents table: token counts
    from the BPE-ish lexer, 4 deterministic shards per source, context
    2048 — emits every document's (bin_id, bin_offset) layout."""
    import pyarrow.compute as pc

    from ..stages.packing import pack_documents
    from ..stages.text import _BPE_ASCII_RE  # noqa: F401 (regex parity)
    import re

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    bpe = re.compile(r"\w{1,4}|[^\w\s]", re.ASCII)

    def count_tokens(b: pa.Table) -> pa.Table:
        txt = np.asarray(b["text"]).astype(str)
        n = np.fromiter(
            (len(bpe.findall(t)) for t in txt), count=len(txt),
            dtype=np.int64,
        )
        return pa.table({
            "doc_id": b["doc_id"], "source": b["source"],
            "n_tokens": pa.array(n),
        })

    return pack_documents(
        ds.map_batches(count_tokens, batch_format="pyarrow",
                       zero_copy_batch=True),
        id_col="doc_id", source_col="source", n_tok_col="n_tokens",
        context_len=PACK_CONTEXT_LEN, num_shards=PACK_SHARDS,
    )


SQL_SEQUENCE_PACKING = rf"""
WITH t AS (
    SELECT doc_id, source, doc_id % {PACK_SHARDS} AS shard,
           CAST(len(regexp_extract_all(text, '\w{{1,4}}|[^\w\s]'))
                AS BIGINT) AS n_tokens
    FROM documents
), s AS (
    SELECT *,
           coalesce(SUM(n_tokens) OVER (
               PARTITION BY source, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS start
    FROM t
)
SELECT doc_id, source, shard, n_tokens,
       CAST(start // {PACK_CONTEXT_LEN} AS BIGINT) AS bin_id,
       CAST(start % {PACK_CONTEXT_LEN} AS BIGINT) AS bin_offset
FROM s
"""

CORPUS_QUERIES.update(
    {
        "ngram_repetition_documents": q_ngram_repetition,
        "mixture_sample_documents": q_mixture_sample,
        "sequence_packing_documents": q_sequence_packing,
    }
)
CORPUS_ORACLE_SQL.update(
    {
        "ngram_repetition_documents": SQL_NGRAM_REPETITION,
        "mixture_sample_documents": _sql_mixture_sample(),
        "sequence_packing_documents": SQL_SEQUENCE_PACKING,
    }
)


def q_c4_line_filter(sf_dir: str):
    """C4 line-filter lane: the synthetic corpus has no newlines or
    punctuation, so inject deterministic line structure first (every
    ' data ' becomes '.' + newline — same replace() on the oracle side),
    then run the real rules. The full cleaned text is value-compared."""
    import pyarrow.compute as pc

    from ..stages.text import c4_line_filter

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def inject(b: pa.Table) -> pa.Table:
        t = pc.replace_substring(b["text"], pattern=" data ",
                                 replacement=".\n")
        return pa.table({"doc_id": b["doc_id"], "text": t})

    return c4_line_filter(
        ds.map_batches(inject, batch_format="pyarrow", zero_copy_batch=True),
        text_col="text", id_col="doc_id",
    )


SQL_C4_LINE_FILTER = r"""
WITH t AS (
    SELECT doc_id, replace(text, ' data ', '.' || chr(10)) AS text
    FROM documents
), l AS (
    SELECT doc_id, text, string_split(text, chr(10)) AS lines
    FROM t
), f AS (
    SELECT doc_id,
           len(lines) AS n_lines,
           list_filter(lines, x ->
               regexp_matches(x, '[.!?"]$')
               AND len(regexp_extract_all(x, '\S+')) >= 3
               AND NOT contains(lower(x), 'javascript')
               AND NOT contains(x, '{')) AS kept,
           CAST(contains(lower(text), 'lorem ipsum') AS BIGINT) AS has_lorem
    FROM l
)
SELECT doc_id, n_lines,
       len(kept) AS n_kept,
       CAST(round(CAST(len(kept) AS DOUBLE)
                  / CASE WHEN n_lines > 0 THEN n_lines ELSE 1 END
                  * 1000000.0) AS BIGINT) / 1000000.0 AS kept_frac,
       has_lorem,
       coalesce(array_to_string(kept, chr(10)), '') AS cleaned
FROM f
"""


CHUNK_WORDS = 32
CHUNK_OVERLAP = 8


def q_chunk_documents(sf_dir: str):
    from ..stages.text import chunk_documents

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_documents(ds, text_col="text", id_col="doc_id",
                           chunk_words=CHUNK_WORDS,
                           overlap_words=CHUNK_OVERLAP)


_STRIDE = CHUNK_WORDS - CHUNK_OVERLAP
SQL_CHUNK_DOCUMENTS = rf"""
WITH w AS (
    SELECT doc_id, regexp_split_to_array(text, '\s+') AS words
    FROM documents
), n AS (
    SELECT doc_id, words, len(words) AS w,
           CASE WHEN len(words) <= {CHUNK_WORDS} THEN 1
                ELSE 1 + CAST(ceil((len(words) - {CHUNK_WORDS})
                                   / {_STRIDE}.0) AS BIGINT)
           END AS n_chunks
    FROM w
), c AS (
    SELECT doc_id, words, w,
           unnest(generate_series(0, n_chunks - 1)) AS chunk_ix
    FROM n
)
SELECT doc_id, chunk_ix,
       least({CHUNK_WORDS}, w - chunk_ix * {_STRIDE}) AS n_chunk_words,
       array_to_string(
           list_slice(words, chunk_ix * {_STRIDE} + 1,
                      chunk_ix * {_STRIDE}
                      + least({CHUNK_WORDS}, w - chunk_ix * {_STRIDE})),
           ' ') AS chunk_text
FROM c
"""

CORPUS_QUERIES.update(
    {
        "c4_line_filter_documents": q_c4_line_filter,
        "chunk_documents_documents": q_chunk_documents,
    }
)
CORPUS_ORACLE_SQL.update(
    {
        "c4_line_filter_documents": SQL_C4_LINE_FILTER,
        "chunk_documents_documents": SQL_CHUNK_DOCUMENTS,
    }
)


def q_sample_per_key(sf_dir: str):
    """Deterministic 20-per-user event subsample (bottom-k by
    splitmix64(event_id); reservoir-sample analog that is reproducible and
    partitioning-independent)."""
    import ray.data as rd

    from ..stages.packing import sample_per_key

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"],
    )
    return sample_per_key(
        ev, id_col="event_id", key_col="user_id", k=20
    )


def _sql_sample_per_key() -> str:
    from ..stages.packing import sample_per_key_sql

    return sample_per_key_sql(
        "events", id_col="event_id", key_col="user_id", k=20,
        select_cols=["event_id", "user_id", "event_type", "value"],
    )


CORPUS_QUERIES["sample_per_key_events"] = q_sample_per_key
CORPUS_ORACLE_SQL["sample_per_key_events"] = _sql_sample_per_key()


def q_hll_registers(sf_dir: str):
    """HyperLogLog register table for distinct users per event_type — the
    mergeable COUNT_DISTINCT scale lane (integer registers, oracle-exact;
    kernels/sketches.py)."""
    import ray.data as rd

    from ..stages.groupby import hll_count_distinct

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return hll_count_distinct(
        ev, key_col="user_id", group_col="event_type", p=10
    )


def _sql_hll_registers() -> str:
    from ..kernels.sketches import sql_hll_registers

    return sql_hll_registers(
        "events", key_expr="CAST(CASE WHEN user_id < 0 THEN CAST(user_id AS HUGEINT) + 18446744073709551616 ELSE CAST(user_id AS HUGEINT) END AS UBIGINT)",
        group_col="event_type", p=10,
    )


CORPUS_QUERIES["hll_registers_events"] = q_hll_registers
CORPUS_ORACLE_SQL["hll_registers_events"] = _sql_hll_registers()


def q_histogram_events(sf_dir: str):
    """Fixed-grid per-group histogram of event values — the bounded-memory
    approximate-quantile lane (integer rows, oracle-exact;
    stages/groupby.grouped_histogram)."""
    import ray.data as rd

    from ..stages.groupby import grouped_histogram

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["value", "event_type"]
    )
    return grouped_histogram(
        ev, value_col="value", group_col="event_type", n_bins=64
    )


def _sql_histogram_events() -> str:
    from ..kernels.sketches import sql_grouped_histogram

    return sql_grouped_histogram(
        "events", value_col="value", group_col="event_type", n_bins=64
    )


CORPUS_QUERIES["histogram_events"] = q_histogram_events
CORPUS_ORACLE_SQL["histogram_events"] = _sql_histogram_events()


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: docs from source 'src0' act as the eval
    suite; every doc is scored by how many distinct 13-char grams it
    shares with that suite. Engine = broadcast bench gram-hash set +
    streaming searchsorted probe (stages/text.ngram_decontaminate);
    oracle = brute-force substring intersection."""
    from ..stages.text import ngram_decontaminate

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    bench = ds.filter(expr="source == 'src0'")
    return ngram_decontaminate(
        ds.select_columns(["doc_id", "text"]), bench,
        text_col="text", id_col="doc_id", gram=13, min_overlap=1,
    )


SQL_DECONTAMINATE = """
WITH bench_g AS (
  SELECT DISTINCT substring(text, CAST(s AS INT), 13) AS g
  FROM documents,
       LATERAL (SELECT unnest(generate_series(
           1, greatest(length(text) - 12, 1))) AS s) t
  WHERE source = 'src0'
),
doc_g AS (
  SELECT DISTINCT doc_id, substring(text, CAST(s AS INT), 13) AS g
  FROM documents,
       LATERAL (SELECT unnest(generate_series(
           1, greatest(length(text) - 12, 1))) AS s) t
),
ov AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
  FROM doc_g JOIN bench_g USING (g) GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(ov.n_overlap, 0) AS n_overlap,
       CAST(COALESCE(ov.n_overlap, 0) >= 1 AS BIGINT) AS contaminated
FROM documents d LEFT JOIN ov ON ov.doc_id = d.doc_id
"""

CORPUS_QUERIES["decontaminate_documents"] = q_decontaminate
CORPUS_ORACLE_SQL["decontaminate_documents"] = SQL_DECONTAMINATE


def q_token_histogram(sf_dir: str):
    """Corpus-wide token-id frequency (vocab histogram) over the
    pre-tokenized sequence table — per-batch bincount combiner over the
    zero-copy flattened list values, ONE tiny groupby merge
    (stages/tokens.token_histogram); the token arrays never shuffle."""
    import ray.data as rd

    from ..stages.tokens import token_histogram

    _ensure_tokens_corpus()
    ds = rd.read_parquet(TOKENS_CORPUS, columns=["tokens"])
    return token_histogram(ds, tokens_col="tokens")


def sql_token_histogram() -> str:
    _ensure_tokens_corpus()
    return f"""
SELECT CAST(t AS BIGINT) AS token_id, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT unnest(tokens) AS t
      FROM read_parquet('{TOKENS_CORPUS}/*.parquet'))
GROUP BY 1
"""


CORPUS_QUERIES["token_histogram_sequences"] = q_token_histogram
CORPUS_ORACLE_SQL["token_histogram_sequences"] = sql_token_histogram()


def q_token_bigrams(sf_dir: str):
    """Top-100 adjacent token bigrams (never crossing row boundaries) —
    packed-key per-batch combiner, one groupby merge, deterministic
    (cnt desc, t0, t1) tie-break (stages/tokens.token_bigram_counts)."""
    import ray.data as rd

    from ..stages.tokens import token_bigram_counts

    _ensure_tokens_corpus()
    ds = rd.read_parquet(TOKENS_CORPUS, columns=["tokens"])
    return token_bigram_counts(ds, tokens_col="tokens", top_k=100)


def sql_token_bigrams() -> str:
    _ensure_tokens_corpus()
    return f"""
SELECT CAST(tokens[CAST(i AS INT)] AS BIGINT) AS t0,
       CAST(tokens[CAST(i AS INT) + 1] AS BIGINT) AS t1,
       CAST(count(*) AS BIGINT) AS cnt
FROM read_parquet('{TOKENS_CORPUS}/*.parquet'),
     LATERAL (SELECT unnest(generate_series(1, len(tokens) - 1)) AS i) s
GROUP BY 1, 2
ORDER BY cnt DESC, t0, t1
LIMIT 100
"""


CORPUS_QUERIES["token_bigrams_sequences"] = q_token_bigrams
CORPUS_ORACLE_SQL["token_bigrams_sequences"] = sql_token_bigrams()


def q_hopping_window(sf_dir: str):
    """Hopping-window aggregate over events: 1h windows sliding every
    15min per event_type — each row lands in 4 windows; the per-batch
    combiner shrinks the 4x expansion to per-(batch, key, window) integer
    partial states before the ONE groupby exchange
    (stages/windows.hopping_window)."""
    import pyarrow.compute as pc

    from ..stages.windows import hopping_window

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ts": b["ts"],
                "event_type": b["event_type"],
                "cents": pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
            }
        )

    return hopping_window(
        ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        ts_col="ts", key_col="event_type", value_col="cents",
        width_s=3600, slide_s=900,
    )


SQL_HOPPING_WINDOW = """
WITH e AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT) AS tsu,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
ex AS (
  SELECT event_type,
         ((tsu // 900000000) - CAST(j AS BIGINT)) * 900000000
             AS window_start_us,
         cents
  FROM e, LATERAL (SELECT unnest(generate_series(0, 3)) AS j) s
)
SELECT event_type AS key, window_start_us,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS "sum",
       MIN(cents) AS "min",
       MAX(cents) AS "max"
FROM ex GROUP BY 1, 2
"""

CORPUS_QUERIES["hopping_window_events"] = q_hopping_window
CORPUS_ORACLE_SQL["hopping_window_events"] = SQL_HOPPING_WINDOW


def q_cms_counters(sf_dir: str):
    """Count-min sketch over event user_ids — the mergeable
    point-frequency/heavy-hitter lane (stages/groupby.cms_counters);
    counter table is integer-exact and partitioning-invariant."""
    import ray.data as rd

    from ..stages.groupby import cms_counters

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return cms_counters(ev, key_col="user_id", depth=4, width=1024)


def _sql_cms_counters() -> str:
    from ..kernels.sketches import sql_cms_counters

    return sql_cms_counters(
        "events", key_expr="CAST(CASE WHEN user_id < 0 THEN CAST(user_id AS HUGEINT) + 18446744073709551616 ELSE CAST(user_id AS HUGEINT) END AS UBIGINT)", depth=4, width=1024
    )


CORPUS_QUERIES["cms_counters_events"] = q_cms_counters


def q_heavy_hitters(sf_dir: str):
    """phi-heavy hitters over event user_ids: keys with frequency > n/k
    (k=150) and their EXACT counts (stages/groupby.heavy_hitters) — the
    candidate-bounded Misra-Gries two-pass, never a full-distinct
    groupby. Exchange is O(k x batches) + O(candidates)."""
    import ray.data as rd

    from ..stages.groupby import heavy_hitters

    def make():
        return rd.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])

    return heavy_hitters(make, key_col="user_id", k=150)


SQL_HEAVY_HITTERS = """
WITH tot AS (SELECT COUNT(*) AS t FROM events)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
FROM events, tot
GROUP BY user_id, tot.t
HAVING COUNT(*) * 150 > tot.t
ORDER BY user_id
"""

CORPUS_QUERIES["heavy_hitters_events"] = q_heavy_hitters
CORPUS_ORACLE_SQL["heavy_hitters_events"] = SQL_HEAVY_HITTERS
CORPUS_ORACLE_SQL["cms_counters_events"] = _sql_cms_counters()


def q_token_decontaminate(sf_dir: str):
    """Benchmark decontamination on the TOKEN level: sequences from
    source 'src000' act as the eval suite; every sequence is scored by
    its count of distinct shared token 8-grams. Broadcast sorted
    bench-gram hash set + streaming rolling-hash probe
    (stages/tokens.token_ngram_decontaminate) — the corpus never
    shuffles; oracle = brute-force list-slice gram intersection."""
    import ray.data as rd

    from ..stages.tokens import token_ngram_decontaminate

    _ensure_tokens_corpus()
    ds = rd.read_parquet(
        TOKENS_CORPUS, columns=["doc_id", "tokens", "source"]
    )
    bench = ds.filter(expr="source == 'src000'").select_columns(["tokens"])
    return token_ngram_decontaminate(
        ds.select_columns(["doc_id", "tokens"]), bench,
        tokens_col="tokens", id_col="doc_id", n=8, min_overlap=1,
    )


def sql_token_decontaminate() -> str:
    _ensure_tokens_corpus()
    src = f"read_parquet('{TOKENS_CORPUS}/*.parquet')"
    return f"""
WITH g AS (
  SELECT doc_id, source,
         tokens[CAST(i AS INT):CAST(i + 7 AS INT)] AS gram
  FROM {src},
       LATERAL (SELECT unnest(generate_series(1, len(tokens) - 7)) AS i) s
  WHERE len(tokens) >= 8
),
bench_g AS (SELECT DISTINCT gram FROM g WHERE source = 'src000'),
doc_g AS (SELECT DISTINCT doc_id, gram FROM g),
ov AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
  FROM doc_g JOIN bench_g USING (gram) GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(ov.n_overlap, 0) AS n_overlap,
       CAST(COALESCE(ov.n_overlap, 0) >= 1 AS BIGINT) AS contaminated
FROM {src} d LEFT JOIN ov USING (doc_id)
"""


CORPUS_QUERIES["token_decontaminate_sequences"] = q_token_decontaminate
CORPUS_ORACLE_SQL["token_decontaminate_sequences"] = sql_token_decontaminate()


def q_topk_per_user(sf_dir: str):
    """Per-key leaderboard: top-3 events by integer-cents value per user
    (ties -> smallest event_id), via the combiner-pruned grouped top-k
    (stages/groupby.grouped_topk) — the exchange carries at most k rows
    per (batch, user), never raw volume."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..stages.groupby import grouped_topk

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "cents": pc.cast(
                    pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
                    pa.int64(),
                ),
            }
        )

    return grouped_topk(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        key_col="user_id", value_col="cents", id_col="event_id", k=3,
    )


SQL_TOPK_PER_USER = """
SELECT event_id, user_id,
       CAST(round(value * 100) AS BIGINT) AS cents,
       CAST(row_number() OVER (
           PARTITION BY user_id
           ORDER BY CAST(round(value * 100) AS BIGINT) DESC, event_id ASC
       ) AS BIGINT) AS rank
FROM events
QUALIFY rank <= 3
"""

CORPUS_QUERIES["topk_per_user_events"] = q_topk_per_user
CORPUS_ORACLE_SQL["topk_per_user_events"] = SQL_TOPK_PER_USER


def q_tfidf_documents(sf_dir: str):
    """TF-IDF: highest-scoring term per document (fixed-point score,
    word-keyed df join, per-doc argmax with word-asc tie-break)."""
    import ray.data as rd

    from ..stages.text import tfidf_top_terms

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_docs = rd.read_parquet(f"{sf_dir}/documents.parquet").count()
    return tfidf_top_terms(
        ds, text_col="text", id_col="doc_id", n_docs=n_docs,
    )


SQL_TFIDF = """
WITH pairs AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS word
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
"""

CORPUS_QUERIES["tfidf_documents"] = q_tfidf_documents
CORPUS_ORACLE_SQL["tfidf_documents"] = SQL_TFIDF


def q_centroids_embeddings(sf_dir: str):
    """Per-label embedding centroid: int64 fixed-point accumulation (exact
    under any partitioning), O(labels x dims) exchange."""
    import ray.data as rd

    from ..stages.similarity import grouped_centroids

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )
    return grouped_centroids(ds, group_col="label", emb_col="embedding")


SQL_CENTROIDS = """
WITH flat AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5)
              AS BIGINT) AS x_fp
  FROM embeddings
)
SELECT label, dim, CAST(SUM(x_fp) AS BIGINT) AS sum_fp,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(SUM(x_fp) AS DOUBLE) / count(*) / 1000000.0 AS mean
FROM flat GROUP BY label, dim ORDER BY label, dim
"""

CORPUS_QUERIES["centroids_embeddings"] = q_centroids_embeddings
CORPUS_ORACLE_SQL["centroids_embeddings"] = SQL_CENTROIDS


def q_histogram_quantiles_events(sf_dir: str):
    """PromQL histogram_quantile analog: q50/q90/q99 estimates per
    event_type from the fixed-grid histogram sketch (error <= one bin
    width; O(groups x bins) exchange, never the value column)."""
    import ray.data as rd

    from ..stages.groupby import grouped_histogram_quantiles

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["value", "event_type"]
    )
    return grouped_histogram_quantiles(
        ev, value_col="value", group_col="event_type", n_bins=64,
        qs=(0.5, 0.9, 0.99),
    )


def _sql_histogram_quantiles_events() -> str:
    from ..kernels.sketches import sql_grouped_histogram_quantiles

    return sql_grouped_histogram_quantiles(
        "events", value_col="value", group_col="event_type", n_bins=64,
        qs=(0.5, 0.9, 0.99),
    )


CORPUS_QUERIES["histogram_quantiles_events"] = q_histogram_quantiles_events
CORPUS_ORACLE_SQL["histogram_quantiles_events"] = (
    _sql_histogram_quantiles_events()
)


def q_token_dup_windows(sf_dir: str):
    """Corpus-wide duplicate token-window signal (Lee et al. 2022): score
    every sequence by its count/fraction of 8-token windows that occur in
    >= 2 distinct sequences. One hash-only groupby + broadcast probe
    (stages/tokens.token_dup_windows); tokens never shuffle."""
    import ray.data as rd

    from ..stages.tokens import token_dup_windows

    _ensure_tokens_corpus()
    ds = rd.read_parquet(TOKENS_CORPUS, columns=["doc_id", "tokens"])
    return token_dup_windows(
        ds, tokens_col="tokens", id_col="doc_id", n=8, min_docs=2,
    )


def sql_token_dup_windows() -> str:
    _ensure_tokens_corpus()
    src = f"read_parquet('{TOKENS_CORPUS}/*.parquet')"
    return f"""
WITH g AS (
  SELECT doc_id,
         tokens[CAST(i AS INT):CAST(i + 7 AS INT)] AS gram
  FROM {src},
       LATERAL (SELECT unnest(generate_series(1, len(tokens) - 7)) AS i) s
  WHERE len(tokens) >= 8
),
heavy AS (
  SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g)
  GROUP BY gram HAVING count(*) >= 2
),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup
  FROM g JOIN heavy USING (gram) GROUP BY 1
)
SELECT d.doc_id,
       CAST(GREATEST(len(d.tokens) - 7, 0) AS BIGINT) AS n_windows,
       COALESCE(per_doc.n_dup, 0) AS n_dup_windows,
       CASE WHEN len(d.tokens) - 7 > 0
            THEN CAST(COALESCE(per_doc.n_dup, 0) AS DOUBLE)
                 / (len(d.tokens) - 7)
            ELSE 0.0 END AS dup_fraction
FROM {src} d LEFT JOIN per_doc USING (doc_id)
"""


CORPUS_QUERIES["token_dup_windows_sequences"] = q_token_dup_windows
CORPUS_ORACLE_SQL["token_dup_windows_sequences"] = sql_token_dup_windows()


def q_token_window_chunks(sf_dir: str):
    """Context-window sharding of the tokens payload (stages/tokens.py
    token_window_chunks): window=96, stride=64 (overlapping) — each chunk
    row is pinned with order-sensitive integer checks (sum/first/last)
    that the DuckDB twin recomputes from list slices, so chunk CONTENT and
    BOUNDARIES are both value-compared. The raw chunk_tokens list is
    asserted byte-equal to brute-force slices in tests."""
    import ray.data as rd

    from ..stages.tokens import token_window_chunks

    _ensure_tokens_corpus()
    ds = rd.read_parquet(TOKENS_CORPUS, columns=["doc_id", "tokens"])
    chunks = token_window_chunks(
        ds, id_col="doc_id", tokens_col="tokens", window=96, stride=64
    )

    def pins(b: pa.Table) -> pa.Table:
        toks = b["chunk_tokens"].combine_chunks()
        vals = np.asarray(toks.flatten(), dtype=np.int64)
        off = np.asarray(toks.offsets, dtype=np.int64)
        off = off - off[0]
        seg = off[:-1]
        tok_sum = (
            np.add.reduceat(vals, seg) if len(vals) else np.zeros(0, np.int64)
        )
        tok_sum[np.diff(off) == 0] = 0
        first = np.where(np.diff(off) > 0, vals[np.minimum(seg, len(vals) - 1)], 0)
        last = np.where(np.diff(off) > 0, vals[off[1:] - 1], 0)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "chunk_ix": b["chunk_ix"],
                "chunk_len": b["chunk_len"],
                "tok_sum": pa.array(tok_sum),
                "tok_first": pa.array(first),
                "tok_last": pa.array(last),
            }
        )

    return chunks.map_batches(pins, batch_format="pyarrow", zero_copy_batch=True)


def sql_token_window_chunks() -> str:
    _ensure_tokens_corpus()
    w, s = 96, 64
    return f"""
WITH c AS (
  SELECT doc_id, tokens,
         unnest(generate_series(
             0, CAST(CEIL(len(tokens) / {float(s)}) AS BIGINT) - 1)) AS chunk_ix
  FROM read_parquet('{TOKENS_CORPUS}/*.parquet')
  WHERE len(tokens) > 0)
SELECT doc_id,
       chunk_ix,
       LEAST(chunk_ix*{s} + {w}, len(tokens)) - chunk_ix*{s} AS chunk_len,
       CAST(list_aggregate(
           CAST(tokens[chunk_ix*{s}+1 : LEAST(chunk_ix*{s}+{w}, len(tokens))]
                AS BIGINT[]),
           'sum') AS BIGINT) AS tok_sum,
       CAST(tokens[chunk_ix*{s}+1] AS BIGINT) AS tok_first,
       CAST(tokens[LEAST(chunk_ix*{s}+{w}, len(tokens))] AS BIGINT) AS tok_last
FROM c
"""


CORPUS_QUERIES["token_window_chunks_sequences"] = q_token_window_chunks
CORPUS_ORACLE_SQL["token_window_chunks_sequences"] = sql_token_window_chunks()


_REMAP_V, _REMAP_EVERY, _REMAP_MUL, _REMAP_ADD = 50257, 5, 40503, 7


def q_token_vocab_remap(sf_dir: str):
    """Vocabulary remap over the tokens payload (stages/tokens.py
    TokenVocabRemap): a BROADCAST dense LUT (ray.put once, resolved per
    actor in __init__) applied as one np.take over the flattened values —
    the small-side-broadcast pattern on the token lane. The mapping is
    formula-defined (ids % 5 == 0 -> (id*40503 + 7) % 50257) so the DuckDB
    twin spells the identical mapping in a list_transform lambda; output
    rows are pinned with order-sensitive sums over the REMAPPED sequence."""
    import ray.data as rd

    from ..stages.tokens import token_vocab_remap

    _ensure_tokens_corpus()
    ds = rd.read_parquet(TOKENS_CORPUS, columns=["doc_id", "tokens"])
    out = token_vocab_remap(
        ds, tokens_col="tokens", vocab_size=_REMAP_V, every=_REMAP_EVERY,
        mul=_REMAP_MUL, add=_REMAP_ADD, concurrency=4
    )

    def pins(b: pa.Table) -> pa.Table:
        toks = b["tokens"].combine_chunks()
        vals = np.asarray(toks.flatten(), dtype=np.int64)
        off = np.asarray(toks.offsets, dtype=np.int64)
        off = off - off[0]
        lens = np.diff(off)
        pos = (
            np.arange(len(vals), dtype=np.int64)
            - np.repeat(off[:-1], lens) + 1
        )
        seg = off[:-1]
        tok_sum = np.add.reduceat(vals, seg) if len(vals) else np.zeros(0, np.int64)
        tok_wsum = (
            np.add.reduceat(vals * pos, seg) if len(vals) else np.zeros(0, np.int64)
        )
        first = vals[off[:-1]] if len(vals) else np.zeros(0, np.int64)
        last = vals[off[1:] - 1] if len(vals) else np.zeros(0, np.int64)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "tok_sum": pa.array(tok_sum),
                "tok_wsum": pa.array(tok_wsum),
                "tok_first": pa.array(first),
                "tok_last": pa.array(last),
            }
        )

    return out.map_batches(pins, batch_format="pyarrow", zero_copy_batch=True)


def sql_token_vocab_remap() -> str:
    _ensure_tokens_corpus()
    v, e, m, a = _REMAP_V, _REMAP_EVERY, _REMAP_MUL, _REMAP_ADD
    return f"""
WITH r AS (
  SELECT doc_id,
         list_transform(CAST(tokens AS BIGINT[]),
             x -> CASE WHEN x % {e} = 0 THEN (x * {m} + {a}) % {v}
                       ELSE x END) AS t2
  FROM read_parquet('{TOKENS_CORPUS}/*.parquet')
  WHERE len(tokens) > 0)
SELECT doc_id,
       CAST(list_aggregate(t2, 'sum') AS BIGINT) AS tok_sum,
       CAST(list_aggregate(
           list_transform(t2, (x, i) -> x * i), 'sum') AS BIGINT) AS tok_wsum,
       CAST(t2[1] AS BIGINT) AS tok_first,
       CAST(t2[len(t2)] AS BIGINT) AS tok_last
FROM r
"""


CORPUS_QUERIES["token_vocab_remap_sequences"] = q_token_vocab_remap
CORPUS_ORACLE_SQL["token_vocab_remap_sequences"] = sql_token_vocab_remap()


def q_token_diversity(sf_dir: str):
    """Per-sequence lexical diversity, integer-exact: n_tok, n_distinct,
    and the Simpson collision mass SUM c*(c-1) over per-sequence token
    counts — the token-level analog of Gopher's distinct-word fraction,
    chosen integer so hash-exactness never hangs on float summation order
    (stages/tokens.token_diversity). Stateless, zero shuffles."""
    import ray.data as rd

    from ..stages.tokens import token_diversity

    _ensure_tokens_corpus()
    ds = rd.read_parquet(TOKENS_CORPUS, columns=["doc_id", "tokens"])
    return token_diversity(ds, tokens_col="tokens", id_col="doc_id")


def sql_token_diversity() -> str:
    _ensure_tokens_corpus()
    return f"""
SELECT d.doc_id,
       CAST(len(d.tokens) AS BIGINT) AS n_tok,
       CAST(COUNT(c.tok) AS BIGINT) AS n_distinct,
       CAST(COALESCE(SUM(c.c * (c.c - 1)), 0) AS BIGINT) AS simpson_num
FROM read_parquet('{TOKENS_CORPUS}/*.parquet') d
LEFT JOIN (
  SELECT doc_id, tok, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(tokens) AS tok
        FROM read_parquet('{TOKENS_CORPUS}/*.parquet'))
  GROUP BY 1, 2
) c USING (doc_id)
GROUP BY 1, 2
ORDER BY 1
"""


CORPUS_QUERIES["token_diversity_sequences"] = q_token_diversity
CORPUS_ORACLE_SQL["token_diversity_sequences"] = sql_token_diversity()


_MASK_ID, _MASK_PCT, _MASK_MUL = 50256, 15, 1_000_003


def q_token_mask(sf_dir: str):
    """Deterministic MLM-style masking over the tokens payload
    (stages/tokens.token_mask): mask token (doc, pos) iff
    splitmix64(dockey*MUL + pos) % 100 < 15, dockey parsed from the
    doc_id digits. Hash-seeded by (key, pos) so the mask is invariant to
    batch boundaries and partitioning — any 100 TB shard recomputes its
    masks in isolation. Output pins the masked sequence with integer
    sums; the DuckDB twin spells the identical splitmix64."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..stages.tokens import token_mask

    _ensure_tokens_corpus()
    ds = rd.read_parquet(TOKENS_CORPUS, columns=["doc_id", "tokens"])

    def add_key(b: pa.Table) -> pa.Table:
        d = b["doc_id"]
        s = pc.cast(pc.utf8_slice_codeunits(d, 3, 6), pa.int64())
        t = pc.cast(pc.utf8_slice_codeunits(d, 7, 19), pa.int64())
        key = pc.add(pc.multiply(s, pa.scalar(10**12, pa.int64())), t)
        return b.append_column("dockey", key)

    ds = ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
    return token_mask(
        ds, tokens_col="tokens", id_col="doc_id", key_col="dockey",
        mask_id=_MASK_ID, rate_pct=_MASK_PCT, pos_mul=_MASK_MUL,
    )


def sql_token_mask() -> str:
    from ..kernels.hashing import SQL_M64, sql_mulmod, sql_splitmix64_cols

    _ensure_tokens_corpus()
    sm = ",\n         ".join(sql_splitmix64_cols("x", "m_"))
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(substring(doc_id, 4, 3) AS BIGINT) * 1000000000000
           + CAST(substring(doc_id, 8) AS BIGINT) AS dockey,
         CAST(len(tokens) AS BIGINT) AS n_tok,
         unnest(CAST(tokens AS BIGINT[])) AS tok,
         unnest(generate_series(1, len(tokens))) AS pos
  FROM read_parquet('{TOKENS_CORPUS}/*.parquet') WHERE len(tokens) > 0
),
h AS (
  SELECT doc_id, n_tok, tok, pos,
         {sql_mulmod('dockey', _MASK_MUL)} AS mm,
         CAST((CAST(mm AS HUGEINT) + pos) % {SQL_M64} AS UBIGINT) AS x,
         {sm}
  FROM t
)
SELECT doc_id, n_tok,
       CAST(COALESCE(SUM(CASE WHEN m_out % 100 < {_MASK_PCT} THEN 1 END), 0)
            AS BIGINT) AS n_masked,
       CAST(COALESCE(SUM(CASE WHEN m_out % 100 < {_MASK_PCT} THEN pos END), 0)
            AS BIGINT) AS masked_pos_sum,
       CAST(SUM(CASE WHEN m_out % 100 < {_MASK_PCT} THEN {_MASK_ID} ELSE tok END)
            AS BIGINT) AS tok_sum
FROM h GROUP BY 1, 2
"""


CORPUS_QUERIES["token_mask_sequences"] = q_token_mask
CORPUS_ORACLE_SQL["token_mask_sequences"] = sql_token_mask()


def q_token_pmi(sf_dir: str):
    """PMI raw counts for the top-50 adjacent token bigrams
    (stages/tokens.token_pmi_bigrams): distributed bigram top-k +
    O(vocab) unigram histogram broadcast — every PMI ingredient emitted
    as exact integers (c_xy, c_x, c_y, n_tokens, n_bigrams), so the op
    is hash-exact and PMI itself is one closed-form expression per row."""
    import ray.data as rd

    from ..stages.tokens import token_pmi_bigrams

    _ensure_tokens_corpus()
    ds = rd.read_parquet(TOKENS_CORPUS, columns=["tokens"])
    return token_pmi_bigrams(ds, tokens_col="tokens", top_k=50)


def sql_token_pmi() -> str:
    _ensure_tokens_corpus()
    src = f"read_parquet('{TOKENS_CORPUS}/*.parquet')"
    return f"""
WITH bg AS (
  SELECT CAST(tokens[CAST(i AS INT)] AS BIGINT) AS t0,
         CAST(tokens[CAST(i AS INT) + 1] AS BIGINT) AS t1,
         CAST(count(*) AS BIGINT) AS c_xy
  FROM {src},
       LATERAL (SELECT unnest(generate_series(1, len(tokens) - 1)) AS i) s
  GROUP BY 1, 2
  ORDER BY c_xy DESC, t0, t1
  LIMIT 50
),
uc AS (
  SELECT CAST(tok AS BIGINT) AS tok, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(tokens) AS tok FROM {src})
  GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(len(tokens)) AS BIGINT) AS n_tokens,
         CAST(SUM(GREATEST(len(tokens) - 1, 0)) AS BIGINT) AS n_bigrams
  FROM {src}
)
SELECT bg.t0, bg.t1, bg.c_xy, ux.c AS c_x, uy.c AS c_y,
       tot.n_tokens, tot.n_bigrams
FROM bg, tot
JOIN uc ux ON ux.tok = bg.t0
JOIN uc uy ON uy.tok = bg.t1
"""


CORPUS_QUERIES["token_pmi_sequences"] = q_token_pmi
CORPUS_ORACLE_SQL["token_pmi_sequences"] = sql_token_pmi()


_SPAN_MOD, _SPAN_EXTRA, _SPAN_MUL1, _SPAN_MUL2 = 8, 3, 1_000_003, 786_433


def q_token_span_corrupt(sf_dir: str):
    """Deterministic T5-style span corruption over the tokens payload
    (stages/tokens.token_span_corrupt): spans start where
    splitmix64(dockey·MUL1+pos) % 8 == 0 with length 1 + h2 % 4, union
    coverage via a vectorized difference array. (key,pos)-seeded ⇒
    partition/batch/order-invariant; integer pins; zero shuffles."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..stages.tokens import token_span_corrupt

    _ensure_tokens_corpus()
    ds = rd.read_parquet(TOKENS_CORPUS, columns=["doc_id", "tokens"])

    def add_key(b: pa.Table) -> pa.Table:
        d = b["doc_id"]
        s = pc.cast(pc.utf8_slice_codeunits(d, 3, 6), pa.int64())
        t = pc.cast(pc.utf8_slice_codeunits(d, 7, 19), pa.int64())
        key = pc.add(pc.multiply(s, pa.scalar(10**12, pa.int64())), t)
        return b.append_column("dockey", key)

    ds = ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
    return token_span_corrupt(
        ds, tokens_col="tokens", id_col="doc_id", key_col="dockey",
        start_mod=_SPAN_MOD, max_extra=_SPAN_EXTRA,
        mul_start=_SPAN_MUL1, mul_len=_SPAN_MUL2,
    )


def sql_token_span_corrupt() -> str:
    from ..kernels.hashing import SQL_M64, sql_mulmod, sql_splitmix64_cols

    _ensure_tokens_corpus()
    sm_s = ",\n         ".join(sql_splitmix64_cols("xa", "s_"))
    sm_l = ",\n         ".join(sql_splitmix64_cols("xb", "l_"))
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(substring(doc_id, 4, 3) AS BIGINT) * 1000000000000
           + CAST(substring(doc_id, 8) AS BIGINT) AS dockey,
         CAST(len(tokens) AS BIGINT) AS n_tok,
         unnest(CAST(tokens AS BIGINT[])) AS tok,
         unnest(generate_series(1, len(tokens))) AS pos
  FROM read_parquet('{TOKENS_CORPUS}/*.parquet') WHERE len(tokens) > 0
),
h AS (
  SELECT doc_id, n_tok, tok, pos,
         {sql_mulmod('dockey', _SPAN_MUL1)} AS ma,
         CAST((CAST(ma AS HUGEINT) + pos) % {SQL_M64} AS UBIGINT) AS xa,
         {sm_s},
         {sql_mulmod('dockey', _SPAN_MUL2)} AS mb,
         CAST((CAST(mb AS HUGEINT) + pos) % {SQL_M64} AS UBIGINT) AS xb,
         {sm_l}
  FROM t
),
hh AS (
  SELECT doc_id, n_tok, tok, pos,
         (s_out % {_SPAN_MOD} = 0) AS is_start,
         1 + CAST(l_out % {_SPAN_EXTRA + 1} AS BIGINT) AS len
  FROM h
),
starts AS (SELECT doc_id, pos, len FROM hh WHERE is_start),
cover AS (
  SELECT DISTINCT s.doc_id, s.pos + d.d AS cpos
  FROM starts s,
       LATERAL (SELECT unnest(generate_series(0, s.len - 1)) AS d) d
)
SELECT hh.doc_id, hh.n_tok,
       CAST(COALESCE(SUM(CASE WHEN hh.is_start THEN 1 END), 0)
            AS BIGINT) AS n_spans,
       CAST(COALESCE(SUM(CASE WHEN c.cpos IS NOT NULL THEN 1 END), 0)
            AS BIGINT) AS n_corrupted,
       CAST(COALESCE(SUM(CASE WHEN c.cpos IS NOT NULL THEN hh.pos END), 0)
            AS BIGINT) AS corrupted_pos_sum,
       CAST(COALESCE(SUM(CASE WHEN c.cpos IS NULL THEN hh.tok END), 0)
            AS BIGINT) AS clean_tok_sum
FROM hh LEFT JOIN cover c
  ON c.doc_id = hh.doc_id AND c.cpos = hh.pos
GROUP BY 1, 2
"""


CORPUS_QUERIES["token_span_corrupt_sequences"] = q_token_span_corrupt
CORPUS_ORACLE_SQL["token_span_corrupt_sequences"] = sql_token_span_corrupt()


def q_token_max_run(sf_dir: str):
    """Longest identical-token run per sequence — the degenerate-
    repetition detector (stages/tokens.token_max_run): earliest longest
    run's token carried as witness; integer-exact, zero shuffles."""
    import ray.data as rd

    from ..stages.tokens import token_max_run

    _ensure_tokens_corpus()
    ds = rd.read_parquet(TOKENS_CORPUS, columns=["doc_id", "tokens"])
    return token_max_run(ds, tokens_col="tokens", id_col="doc_id")


def sql_token_max_run() -> str:
    _ensure_tokens_corpus()
    src = f"read_parquet('{TOKENS_CORPUS}/*.parquet')"
    return f"""
WITH t AS (
  SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tok,
         CAST(unnest(tokens) AS BIGINT) AS tok,
         unnest(generate_series(1, len(tokens))) AS pos
  FROM {src} WHERE len(tokens) > 0
),
r AS (
  SELECT doc_id, n_tok, tok,
         pos - ROW_NUMBER() OVER (
             PARTITION BY doc_id, tok ORDER BY pos) AS grp,
         pos
  FROM t
),
runs AS (
  SELECT doc_id, n_tok, tok,
         CAST(COUNT(*) AS BIGINT) AS run_len,
         MIN(pos) AS start_pos
  FROM r GROUP BY doc_id, n_tok, tok, grp
),
best AS (
  SELECT doc_id, n_tok, run_len AS max_run, tok AS run_token
  FROM runs
  QUALIFY ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY run_len DESC, start_pos) = 1
),
cnt AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_runs FROM runs GROUP BY 1
)
SELECT best.doc_id, best.n_tok, best.max_run, best.run_token, cnt.n_runs
FROM best JOIN cnt USING (doc_id)
"""


CORPUS_QUERIES["token_max_run_sequences"] = q_token_max_run
CORPUS_ORACLE_SQL["token_max_run_sequences"] = sql_token_max_run()


def q_hopping_distinct(sf_dir: str):
    """Sliding unique-visitors: exact distinct user count per
    (event_type, 1h window sliding 15min)
    (stages/windows.hopping_distinct) — triples hash-partition BY
    TRIPLE so per-partition distinct partials sum exactly; exchange is
    O(distinct triples)."""
    import ray.data as rd

    from ..stages.windows import hopping_distinct

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "user_id"]
    )
    return hopping_distinct(
        ev, ts_col="ts", key_col="event_type", member_col="user_id",
        width_s=3600, slide_s=900,
    )


SQL_HOPPING_DISTINCT = """
WITH e AS (
  SELECT event_type, CAST(epoch_us(ts) AS BIGINT) AS tsu, user_id
  FROM events
),
ex AS (
  SELECT event_type,
         ((tsu // 900000000) - CAST(j AS BIGINT)) * 900000000
             AS window_start_us,
         user_id
  FROM e, LATERAL (SELECT unnest(generate_series(0, 3)) AS j) s
)
SELECT event_type AS key, window_start_us,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM ex GROUP BY 1, 2
"""

CORPUS_QUERIES["hopping_distinct_events"] = q_hopping_distinct
CORPUS_ORACLE_SQL["hopping_distinct_events"] = SQL_HOPPING_DISTINCT


def q_token_context_diversity(sf_dir: str):
    """Next-token diversity per context token
    (stages/tokens.token_context_diversity): packed-bigram combiner,
    exchange partitioned BY CONTEXT so each t0's successors co-locate;
    exact integer diversity moments + deterministic top successor."""
    import ray.data as rd

    from ..stages.tokens import token_context_diversity

    _ensure_tokens_corpus()
    ds = rd.read_parquet(TOKENS_CORPUS, columns=["tokens"])
    return token_context_diversity(ds, tokens_col="tokens")


def sql_token_context_diversity() -> str:
    _ensure_tokens_corpus()
    src = f"read_parquet('{TOKENS_CORPUS}/*.parquet')"
    return f"""
WITH bg AS (
  SELECT CAST(tokens[CAST(i AS INT)] AS BIGINT) AS t0,
         CAST(tokens[CAST(i AS INT) + 1] AS BIGINT) AS t1,
         CAST(count(*) AS BIGINT) AS c
  FROM {src},
       LATERAL (SELECT unnest(generate_series(1, len(tokens) - 1)) AS i) s
  GROUP BY 1, 2
),
agg AS (
  SELECT t0, CAST(SUM(c) AS BIGINT) AS n_pairs,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_next,
         CAST(SUM(c * (c - 1)) AS BIGINT) AS simpson_num
  FROM bg GROUP BY 1
),
top AS (
  SELECT t0, t1 AS top_next, c AS top_c
  FROM bg
  QUALIFY ROW_NUMBER() OVER (PARTITION BY t0 ORDER BY c DESC, t1) = 1
)
SELECT agg.t0, agg.n_pairs, agg.n_distinct_next, agg.simpson_num,
       top.top_next, top.top_c
FROM agg JOIN top USING (t0)
"""


CORPUS_QUERIES["token_context_diversity_sequences"] = (
    q_token_context_diversity
)
CORPUS_ORACLE_SQL["token_context_diversity_sequences"] = (
    sql_token_context_diversity()
)


NEARDUP_TOKENS_CORPUS = "/tmp/graft_neardup_tokens"


def _ensure_neardup_tokens() -> str:
    from ..sources.synth import ensure_neardup_token_corpus

    return ensure_neardup_token_corpus(NEARDUP_TOKENS_CORPUS)


def q_token_minhash_lsh(sf_dir: str):
    """Payload-native near-dup candidates: MinHash over length-8 TOKEN-ID
    windows (no detokenization), LSH-banded, bucketed one-task-per-hash-
    partition (stages/tokens.token_minhash_lsh_candidates). Runs over the
    injected-near-dup token corpus (sources/synth.ensure_neardup_token_
    corpus); cluster members share ~96% of positions => near-certain band
    collisions, independent docs collide with ~0 probability."""
    import ray.data as rd

    from ..stages.tokens import token_minhash_lsh_candidates

    _ensure_neardup_tokens()
    ds = rd.read_parquet(NEARDUP_TOKENS_CORPUS, columns=["doc_id", "tokens"])
    return token_minhash_lsh_candidates(
        ds, tokens_col="tokens", id_col="doc_id",
        num_perm=32, bands=8, n=8, num_partitions=auto_partitions(),
    )


def sql_token_minhash_lsh_corpus() -> str:
    from .sql_oracles import sql_token_minhash_lsh

    _ensure_neardup_tokens()
    return sql_token_minhash_lsh(
        src=f"read_parquet('{NEARDUP_TOKENS_CORPUS}/*.parquet')",
        id_col="doc_id", tokens_col="tokens",
        num_perm=32, bands=8, n=8,
    )


CORPUS_QUERIES["token_minhash_lsh_sequences"] = q_token_minhash_lsh
CORPUS_ORACLE_SQL["token_minhash_lsh_sequences"] = sql_token_minhash_lsh_corpus()


def q_token_jaccard_pairs(sf_dir: str):
    """Exact token-8-gram Jaccard over token-LSH candidate pairs, fully
    distributed (stages/tokens.token_jaccard_pairs); the oracle is the
    EXACT pipeline twin (LSH pair derivation + gram Jaccard in SQL), so
    the check is independent of LSH recall."""
    import ray.data as rd

    from ..stages.tokens import token_jaccard_pairs

    _ensure_neardup_tokens()
    ds = rd.read_parquet(NEARDUP_TOKENS_CORPUS, columns=["doc_key", "tokens"])
    return token_jaccard_pairs(
        ds, tokens_col="tokens", id_col="doc_key",
        num_perm=32, bands=8, n=8, threshold=0.5,
    )


def sql_token_jaccard_pairs_corpus() -> str:
    from .sql_oracles import sql_token_jaccard_pairs

    _ensure_neardup_tokens()
    return sql_token_jaccard_pairs(
        src=f"read_parquet('{NEARDUP_TOKENS_CORPUS}/*.parquet')",
        id_col="doc_key", tokens_col="tokens",
        num_perm=32, bands=8, n=8, threshold=0.5,
    )


CORPUS_QUERIES["token_jaccard_pairs_sequences"] = q_token_jaccard_pairs
CORPUS_ORACLE_SQL["token_jaccard_pairs_sequences"] = (
    sql_token_jaccard_pairs_corpus()
)


def q_token_near_dedup(sf_dir: str):
    """End-to-end payload-native near-dedup clustering over token arrays
    (stages/tokens.token_near_dedup_clusters): LSH -> exact gram-Jaccard
    verify -> connected components (lane shared with the text pipeline),
    canonical = min doc_key."""
    import ray.data as rd

    from ..stages.tokens import token_near_dedup_clusters

    _ensure_neardup_tokens()
    ds = rd.read_parquet(NEARDUP_TOKENS_CORPUS, columns=["doc_key", "tokens"])
    return token_near_dedup_clusters(
        ds, tokens_col="tokens", id_col="doc_key",
        num_perm=32, bands=8, n=8, threshold=0.5,
    )


def sql_token_near_dedup_corpus() -> str:
    from .sql_oracles import sql_token_near_dedup

    _ensure_neardup_tokens()
    return sql_token_near_dedup(
        src=f"read_parquet('{NEARDUP_TOKENS_CORPUS}/*.parquet')",
        id_col="doc_key", tokens_col="tokens",
        num_perm=32, bands=8, n=8, threshold=0.5,
    )


CORPUS_QUERIES["token_near_dedup_sequences"] = q_token_near_dedup
CORPUS_ORACLE_SQL["token_near_dedup_sequences"] = sql_token_near_dedup_corpus()


def q_token_topk_per_source(sf_dir: str):
    """Top-20 tokens per source over the sequences corpus
    (stages/tokens.token_topk_per_source): exact counts, deterministic
    (cnt desc, token asc) ties, combiner-pruned exchange."""
    import ray.data as rd

    from ..stages.tokens import token_topk_per_source

    _ensure_tokens_corpus()
    ds = rd.read_parquet(TOKENS_CORPUS, columns=["source", "tokens"])
    return token_topk_per_source(
        ds, tokens_col="tokens", source_col="source", k=20
    )


def sql_token_topk_per_source() -> str:
    _ensure_tokens_corpus()
    return f"""
WITH c AS (
  SELECT source, CAST(u.t AS BIGINT) AS token_id,
         CAST(count(*) AS BIGINT) AS cnt
  FROM read_parquet('{TOKENS_CORPUS}/*.parquet'), unnest(tokens) AS u(t)
  GROUP BY 1, 2
), r AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY source ORDER BY cnt DESC, token_id) AS rank
  FROM c
)
SELECT source, token_id, cnt, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 20
"""


CORPUS_QUERIES["token_topk_per_source_sequences"] = q_token_topk_per_source
CORPUS_ORACLE_SQL["token_topk_per_source_sequences"] = (
    sql_token_topk_per_source()
)


def q_token_exact_dedup(sf_dir: str):
    """Exact dedup of identical token SEQUENCES (stages/tokens.
    token_exact_dedup): only (length-salted content hash, id) pairs
    shuffle; the injected verbatim copies collapse onto their base doc."""
    import ray.data as rd

    from ..stages.tokens import token_exact_dedup

    _ensure_neardup_tokens()
    ds = rd.read_parquet(NEARDUP_TOKENS_CORPUS, columns=["doc_key", "tokens"])
    return token_exact_dedup(ds, tokens_col="tokens", id_col="doc_key")


def sql_token_exact_dedup() -> str:
    _ensure_neardup_tokens()
    return f"""
SELECT CAST(MIN(doc_key) AS BIGINT) AS doc_key,
       CAST(COUNT(*) AS BIGINT) AS dup_count
FROM read_parquet('{NEARDUP_TOKENS_CORPUS}/*.parquet')
GROUP BY tokens
"""


CORPUS_QUERIES["token_exact_dedup_sequences"] = q_token_exact_dedup
CORPUS_ORACLE_SQL["token_exact_dedup_sequences"] = sql_token_exact_dedup()


def q_token_rarity(sf_dir: str):
    """Integer-exact unigram rarity score per sequence (perplexity proxy
    with log2 = bit length, no float logs; stages/tokens.
    token_rarity_score): histogram broadcast + stateless gather pass."""
    import ray.data as rd

    from ..stages.tokens import token_rarity_score

    _ensure_tokens_corpus()
    ds = rd.read_parquet(TOKENS_CORPUS, columns=["doc_id", "tokens"])
    return token_rarity_score(ds, tokens_col="tokens", id_col="doc_id")


def sql_token_rarity() -> str:
    _ensure_tokens_corpus()
    src = f"read_parquet('{TOKENS_CORPUS}/*.parquet')"
    return f"""
WITH tok AS (
  SELECT doc_id, CAST(u.t AS BIGINT) AS t
  FROM {src}, unnest(tokens) AS u(t)
), hist AS (
  SELECT t, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1
), tot AS (
  SELECT CAST(LENGTH(BIN(count(*))) AS BIGINT) AS tb FROM tok
), scored AS (
  SELECT tok.doc_id,
         CAST(count(*) AS BIGINT) AS n_tok,
         CAST(SUM(tot.tb - LENGTH(BIN(hist.cnt))) AS BIGINT) AS rarity
  FROM tok JOIN hist USING (t), tot
  GROUP BY tok.doc_id, tot.tb
)
-- LEFT JOIN from the base table so a zero-token sequence yields
-- (n_tok=0, rarity=0), matching the engine's stateless gather pass
SELECT base.doc_id,
       COALESCE(scored.n_tok, 0) AS n_tok,
       COALESCE(scored.rarity, 0) AS rarity
FROM {src} AS base
LEFT JOIN scored USING (doc_id)
"""


CORPUS_QUERIES["token_rarity_sequences"] = q_token_rarity
CORPUS_ORACLE_SQL["token_rarity_sequences"] = sql_token_rarity()


def q_token_incremental_dedup(sf_dir: str):
    """Incremental-ingestion exact dedup (stages/tokens.
    token_incremental_dedup): odd-doc_key sequences are the 'incoming
    batch', even keys the 'standing corpus' — survivors are the new
    sequences whose token content is absent from the base. Bloom screen
    (no false negatives) + ONE candidate-sized exact hash join; payloads
    never move."""
    import ray.data as rd

    from ..stages.tokens import token_incremental_dedup

    _ensure_neardup_tokens()
    ds = rd.read_parquet(NEARDUP_TOKENS_CORPUS, columns=["doc_key", "tokens"])

    def _parity(b, want):
        import pyarrow.compute as pc

        keep = pc.equal(
            pc.bit_wise_and(b["doc_key"], pa.scalar(1, pa.int64())), want
        )
        return b.filter(keep)

    new = ds.map_batches(lambda b: _parity(b, 1), batch_format="pyarrow",
                         zero_copy_batch=True)
    base = ds.map_batches(lambda b: _parity(b, 0), batch_format="pyarrow",
                          zero_copy_batch=True)
    return token_incremental_dedup(
        new, base, tokens_col="tokens", id_col="doc_key"
    )


def sql_token_incremental_dedup() -> str:
    _ensure_neardup_tokens()
    src = f"read_parquet('{NEARDUP_TOKENS_CORPUS}/*.parquet')"
    return f"""
WITH base AS (SELECT tokens FROM {src} WHERE doc_key % 2 = 0),
     nw AS (SELECT doc_key, tokens FROM {src} WHERE doc_key % 2 = 1)
SELECT nw.doc_key, CAST(len(nw.tokens) AS BIGINT) AS n_tok
FROM nw
ANTI JOIN base ON nw.tokens = base.tokens
"""


CORPUS_QUERIES["token_incremental_dedup_sequences"] = q_token_incremental_dedup
CORPUS_ORACLE_SQL["token_incremental_dedup_sequences"] = (
    sql_token_incremental_dedup()
)
