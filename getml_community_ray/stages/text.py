"""Text-analysis stages over the `documents` table: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

The reference's text machinery is a vocabulary + word-index used for
word-occurrence features (`textmining/Vocabulary.hpp:31-67`,
`WordIndex.hpp:27-61`, splitter `TextFieldSplitter.cpp:105-149`); these
stages generalize it to corpus-quality signals. All are stateless
vectorized `map_batches` (regexes precompiled at module import — an actor
pool would also work but compiled-regex state is cheap enough to ship).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WORD_RE = r"\s+"
_STOPWORDS_EN = {"the", "and", "of", "a", "to", "in", "is", "that", "it", "for"}
_STOPWORDS_DE = {"der", "die", "das", "und", "ist", "ein", "zu", "den", "nicht"}
_STOPWORDS_FR = {"le", "la", "les", "et", "est", "un", "une", "des", "que"}

# BPE-ish token estimate: word pieces of <= 4 chars (compiled once per proc)
_BPE_RE = re.compile(r"\w{1,4}|[^\w\s]")


def token_stats(ds, *, text_col: str, id_col: str):
    """Whitespace word count + char count per doc — DuckDB-oracle-friendly:
    n_words == len(regexp_split_to_array(text, '\\s+')) on non-empty text."""

    def f(b: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(b[text_col], pattern=_WORD_RE)
        n_words = pc.cast(pc.list_value_length(words), pa.int64())
        n_chars = pc.cast(pc.utf8_length(b[text_col]), pa.int64())
        return pa.table(
            {
                id_col: b[id_col],
                "n_words": n_words,
                "n_chars": n_chars,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def quality_scores(ds, *, text_col: str, id_col: str):
    """Length/punctuation/digit/upper ratios (round to 6 dp for oracle
    comparability)."""

    def f(b: pa.Table) -> pa.Table:
        txt = b[text_col]
        n = pc.cast(pc.utf8_length(txt), pa.float64())
        def ratio(pattern):
            c = pc.cast(
                pc.count_substring_regex(txt, pattern=pattern), pa.float64()
            )
            r = np.asarray(pc.divide(c, n).combine_chunks()
                           if isinstance(c, pa.ChunkedArray) else pc.divide(c, n),
                           dtype=np.float64)
            # fixed-point 6dp: bit-identical to the oracle's
            # CAST(round(x*1e6) AS BIGINT)/1000000.0
            return pa.array(np.rint(r * 1e6) / 1e6)

        return pa.table(
            {
                id_col: b[id_col],
                "punct_ratio": ratio(r"[.,!?;:]"),
                "digit_ratio": ratio(r"[0-9]"),
                "upper_ratio": ratio(r"[A-Z]"),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


class LangId:
    """Stopword-voting language heuristic — stateful stage pattern: the
    stopword tables and splitter live once per actor (`__init__`), batches
    stream through `__call__` (SURVEY.md §2.7 actor-pool contract)."""

    def __init__(self):
        self.tables = {
            "en": _STOPWORDS_EN,
            "de": _STOPWORDS_DE,
            "fr": _STOPWORDS_FR,
        }
        self.word = re.compile(r"[a-zA-Zäöüéèêàç]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = np.asarray(batch["text"]).astype(str)
        langs = []
        for t in txt:
            words = [w.lower() for w in self.word.findall(t[:2000])]
            scores = {
                k: sum(1 for w in words if w in tbl)
                for k, tbl in self.tables.items()
            }
            best = max(scores, key=lambda k: (scores[k], k))
            langs.append(best if scores[best] > 0 else "unknown")
        return batch.append_column("lang_pred", pa.array(langs, type=pa.string()))


def fingerprint(ds, *, text_col: str, id_col: str, window: int = 16):
    """Rolling-hash document fingerprint (winnowing-lite): min over strided
    byte windows of splitmix64(polyhash(window)) — cheap near-identity
    signature, fully vectorized across the batch (one fused rolling-hash
    pass) with an exact DuckDB twin (pipelines/sql_oracles.sql_fingerprint)
    serving as the driver oracle."""
    from ..kernels.hashing import _intra, batch_gram_hashes, splitmix64

    step = max(1, window // 2)

    def f(b: pa.Table) -> pa.Table:
        txt = np.asarray(b[text_col]).astype(str)
        if len(txt) == 0:
            return pa.table(
                {id_col: b[id_col], "fingerprint": pa.array([], type=pa.int64())}
            )
        tb = [t.encode() for t in txt]
        hs, off = batch_gram_hashes(tb, window)
        # strided positions 0, step, 2*step, ... within each doc's windows
        ng = np.diff(off)
        cnt = (ng + step - 1) // step
        idx = np.repeat(off[:-1], cnt) + _intra(cnt) * step
        sm = splitmix64(hs[idx])
        cut = np.concatenate([[0], np.cumsum(cnt)])
        fps = np.minimum.reduceat(sm, cut[:-1])
        return pa.table(
            {id_col: b[id_col], "fingerprint": pa.array(fps.astype(np.int64))}
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ASCII-classed so Python `re` agrees with RE2 (DuckDB) on \w/\s
_BPE_ASCII_RE = re.compile(r"\w{1,4}|[^\w\s]", re.ASCII)


def token_count_bpe(ds, *, text_col: str, id_col: str):
    """BPE-ish token estimate: count of word pieces (<=4 word chars) +
    punctuation marks. ASCII char classes so the DuckDB RE2 oracle
    `len(regexp_extract_all(text, '\\w{1,4}|[^\\w\\s]'))` matches exactly."""

    def f(b: pa.Table) -> pa.Table:
        txt = np.asarray(b[text_col]).astype(str)
        n = np.fromiter(
            (len(_BPE_ASCII_RE.findall(t)) for t in txt),
            count=len(txt),
            dtype=np.int64,
        )
        return pa.table({id_col: b[id_col], "n_tokens": pa.array(n)})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def word_occurrence_columns(ds, *, text_col: str, words: list[str]):
    """Per-row occurrence counts of each vocabulary word (whitespace
    tokenization) as float64 columns `w_<word>` — the reference's
    per-vocab-word text features (fastprop apply_text,
    `src/engine/src/fastprop/Aggregator.cpp:371-414`) wired into the
    window-feature grammar: feed the output as fastprop value columns.

    Vectorized: one regex split per batch, flattened Arrow string equality
    per word, segmented reduceat — no per-row Python."""
    import pyarrow.compute as pc

    def f(b: pa.Table) -> pa.Table:
        col = b[text_col].combine_chunks()
        split = pc.split_pattern_regex(col, pattern=r"\s+")
        flat = split.flatten()
        offs = np.asarray(split.offsets, dtype=np.int64)
        lens = np.diff(offs)
        out = dict(zip(b.column_names, b.columns))
        seg = offs[:-1] - offs[0]  # offsets relative to the flattened values
        for w in words:
            eq = np.asarray(pc.equal(flat, w).fill_null(False)).astype(np.float64)
            if len(eq) and seg[-1] < len(eq):
                cnt = np.add.reduceat(eq, seg)
            else:
                cnt = np.zeros(len(b))
            # reduceat repeats the element at zero-length segments: zero them
            cnt = np.where(lens > 0, cnt, 0.0)
            out[f"w_{w}"] = pa.array(cnt)
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def gopher_quality(ds, *, text_col: str, id_col: str):
    """Gopher-style document quality rules (Rae et al. 2021, table A1):
    word-count bounds, mean word length bounds, symbol-to-word ratio,
    alpha-word fraction — each emitted as a 6dp fixed-point ratio plus the
    combined keep flag, so a filter pipeline is `keep == 1`.

    Fully vectorized (one regex split per batch, Arrow kernels after);
    ratios use the same CAST(round(x*1e6))/1e6 fixed point as
    quality_scores so the DuckDB oracle is bit-exact."""

    def fixed6(x: np.ndarray) -> pa.Array:
        return pa.array(np.rint(x * 1e6) / 1e6)

    def f(b: pa.Table) -> pa.Table:
        txt = b[text_col].combine_chunks()
        split = pc.split_pattern_regex(txt, pattern=_WORD_RE)
        n_words = np.asarray(pc.list_value_length(split), dtype=np.float64)
        n_chars = np.asarray(pc.utf8_length(txt), dtype=np.float64)
        n_space = np.asarray(
            pc.count_substring_regex(txt, pattern=r"\s"), dtype=np.float64
        )
        # mean word length == non-whitespace chars / words (split on \s+)
        mean_wl = np.divide(
            n_chars - n_space, n_words, out=np.zeros_like(n_words),
            where=n_words > 0,
        )
        n_sym = np.asarray(
            pc.count_substring_regex(txt, pattern=r"[#…]"), dtype=np.float64
        )
        sym_ratio = np.divide(
            n_sym, n_words, out=np.zeros_like(n_words), where=n_words > 0
        )
        # fraction of words containing an alphabetic character
        flat = split.flatten()
        alpha = np.asarray(
            pc.match_substring_regex(flat, pattern=r"[A-Za-z]").fill_null(False)
        ).astype(np.float64)
        offs = np.asarray(split.offsets, dtype=np.int64)
        seg = offs[:-1] - offs[0]
        lens = np.diff(offs)
        if len(alpha) and len(seg) and seg[-1] < len(alpha):
            n_alpha = np.add.reduceat(alpha, seg)
        else:
            n_alpha = np.zeros(len(b))
        n_alpha = np.where(lens > 0, n_alpha, 0.0)
        alpha_frac = np.divide(
            n_alpha, n_words, out=np.zeros_like(n_words), where=n_words > 0
        )
        keep = (
            (n_words >= 5)
            & (n_words <= 100_000)
            & (mean_wl >= 2.0)
            & (mean_wl <= 12.0)
            & (sym_ratio < 0.1)
            & (alpha_frac > 0.8)
        )
        return pa.table(
            {
                id_col: b[id_col],
                "n_words": pa.array(n_words.astype(np.int64)),
                "mean_word_len": fixed6(mean_wl),
                "symbol_ratio": fixed6(sym_ratio),
                "alpha_word_frac": fixed6(alpha_frac),
                "keep": pa.array(keep.astype(np.int64)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def distinct_word_fraction(ds, *, text_col: str, id_col: str):
    """Repetition signal: distinct-word fraction per document (the Gopher
    duplicate-content family). Vectorized: one split per batch, a single
    pandas factorize over the flattened words (C hash table), np.unique on
    (doc, word-code) pairs, bincount per doc — no per-row Python."""
    import pandas as pd

    def f(b: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(b[text_col].combine_chunks())
        split = pc.split_pattern_regex(txt, pattern=_WORD_RE)
        flat = split.flatten()
        offs = np.asarray(split.offsets, dtype=np.int64)
        lens = np.diff(offs).astype(np.float64)
        codes = pd.factorize(np.asarray(flat))[0].astype(np.int64)
        doc_idx = np.repeat(
            np.arange(len(b), dtype=np.int64), np.diff(offs - offs[0])
        )
        k = int(codes.max()) + 1 if len(codes) else 1
        uniq = np.unique(doc_idx * k + codes)
        n_dist = np.bincount((uniq // k).astype(np.int64), minlength=len(b)).astype(
            np.float64
        )
        frac = np.divide(
            n_dist, lens, out=np.zeros_like(n_dist), where=lens > 0
        )
        return pa.table(
            {
                id_col: b[id_col],
                "n_words": pa.array(lens.astype(np.int64)),
                "n_distinct_words": pa.array(n_dist.astype(np.int64)),
                "distinct_frac": pa.array(np.rint(frac * 1e6) / 1e6),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b\d{3}-\d{4}\b"


def pii_scrub(ds, *, text_col: str, id_col: str):
    """PII scrubbing for training corpora: replace emails / phone-shaped
    spans with placeholder tokens, report per-doc match counts. Both the
    engine (pyarrow.compute) and the DuckDB oracle run RE2, so the
    replacements are bit-identical."""

    def f(b: pa.Table) -> pa.Table:
        txt = b[text_col]
        n_email = pc.cast(
            pc.count_substring_regex(txt, pattern=_EMAIL_RE), pa.int64()
        )
        scrub = pc.replace_substring_regex(
            txt, pattern=_EMAIL_RE, replacement="<EMAIL>"
        )
        n_phone = pc.cast(
            pc.count_substring_regex(scrub, pattern=_PHONE_RE), pa.int64()
        )
        scrub = pc.replace_substring_regex(
            scrub, pattern=_PHONE_RE, replacement="<PHONE>"
        )
        return pa.table(
            {
                id_col: b[id_col],
                "n_emails": n_email,
                "n_phones": n_phone,
                "scrubbed": scrub,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def ngram_repetition(ds, *, text_col: str, id_col: str,
                     n_top: int = 2, n_dup: int = 3):
    """Gopher/MassiveText repetition filters (Rae et al. 2021, table A1):

    - ``top{n}_frac``: characters covered by the MOST frequent word
      n-gram — count * len(gram) / len(text); ties resolve to the
      lexicographically smallest gram so the DuckDB oracle's
      ``row_number() OVER (ORDER BY cnt DESC, gram ASC)`` agrees exactly.
    - ``dup{n}_frac``: sum over n-grams occurring MORE THAN ONCE of
      count * len(gram) / len(text). Overlap-agnostic upper bound of the
      original rule (Gopher counts overlapping characters once — a
      sequential per-doc scan); documented divergence, identical on both
      the engine and oracle side.

    Grams are built zero-copy from the flattened word array with ONE
    ``binary_join_element_wise`` per n (no per-row Python); counting is a
    single pandas factorize (C hash table) + np.unique over packed
    (doc, gram-code) keys, the per-doc argmax a lexsort over the distinct
    entries. Words split on whitespace over lowercased text, matching the
    rest of this module's quality signals."""
    import pandas as pd

    def gram_stats(flat: pa.Array, doc_idx: np.ndarray, n_docs: int,
                   n: int):
        """(top_chars, dup_chars) per doc for one n."""
        m = len(flat) - (n - 1)
        top = np.zeros(n_docs, dtype=np.float64)
        dup = np.zeros(n_docs, dtype=np.float64)
        if m <= 0:
            return top, dup
        parts = [flat.slice(j, m) for j in range(n)]
        grams = pc.binary_join_element_wise(*parts, " ")
        valid = doc_idx[: m] == doc_idx[n - 1:]
        gsel = np.asarray(grams)[valid]
        dsel = doc_idx[:m][valid]
        if not len(gsel):
            return top, dup
        codes, uniq = pd.factorize(gsel)
        glen = np.asarray(
            pc.utf8_length(pa.array(uniq)), dtype=np.float64
        )
        k = len(uniq)
        packed, counts = np.unique(dsel * k + codes, return_counts=True)
        e_doc = packed // k
        e_code = (packed % k).astype(np.int64)
        e_chars = glen[e_code]
        # top gram per doc: order by (doc asc, count desc, gram asc)
        order = np.lexsort((uniq[e_code], -counts, e_doc))
        first = np.ones(len(order), dtype=bool)
        d_s = e_doc[order]
        if len(d_s) > 1:
            first[1:] = d_s[1:] != d_s[:-1]
        sel = order[first]
        top[e_doc[sel]] = counts[sel] * e_chars[sel]
        dmask = counts > 1
        if dmask.any():
            dup += np.bincount(
                e_doc[dmask], weights=counts[dmask] * e_chars[dmask],
                minlength=n_docs,
            )
        return top, dup

    def fixed6(x: np.ndarray) -> pa.Array:
        # half-away-from-zero (x >= 0 here) — matches DuckDB round();
        # np.rint's half-to-even diverges at exact .5 ulps (power-of-two
        # doc lengths hit these)
        return pa.array(np.floor(x * 1e6 + 0.5) / 1e6)

    def f(b: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(b[text_col].combine_chunks())
        n_chars = np.asarray(pc.utf8_length(txt), dtype=np.float64)
        split = pc.split_pattern_regex(txt, pattern=_WORD_RE)
        flat = split.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        offs = np.asarray(split.offsets, dtype=np.int64)
        doc_idx = np.repeat(
            np.arange(len(b), dtype=np.int64), np.diff(offs - offs[0])
        )
        top_c, _ = gram_stats(flat, doc_idx, len(b), n_top)
        _, dup_c = gram_stats(flat, doc_idx, len(b), n_dup)
        safe = np.where(n_chars > 0, n_chars, 1.0)
        return pa.table(
            {
                id_col: b[id_col],
                f"top{n_top}_frac": fixed6(
                    np.where(n_chars > 0, top_c / safe, 0.0)
                ),
                f"dup{n_dup}_frac": fixed6(
                    np.where(n_chars > 0, dup_c / safe, 0.0)
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def c4_line_filter(ds, *, text_col: str, id_col: str,
                   min_words: int = 3):
    """C4-style line-level cleaning (Raffel et al. 2020, §2.2): keep a
    line iff it ends in terminal punctuation (. ! ? "), has at least
    `min_words` words, and contains neither 'javascript' (case-insensitive)
    nor a curly brace; flag documents containing 'lorem ipsum'. Emits the
    cleaned text (kept lines rejoined with newlines) plus line counts.

    Vectorized: one newline split per batch, per-line RE2 kernels over the
    flattened line array, per-doc rebuild via ListArray offsets + one
    binary_join — no per-row Python."""

    def fixed6(x: np.ndarray) -> pa.Array:
        return pa.array(np.floor(x * 1e6 + 0.5) / 1e6)

    def f(b: pa.Table) -> pa.Table:
        txt = b[text_col].combine_chunks()
        split = pc.split_pattern(txt, pattern="\n")
        flat = split.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        offs = np.asarray(split.offsets, dtype=np.int64)
        n_lines = np.diff(offs)
        doc_idx = np.repeat(np.arange(len(b), dtype=np.int64), n_lines)

        ends = np.asarray(
            pc.match_substring_regex(flat, pattern=r'[.!?"]$').fill_null(False)
        )
        enough = (
            np.asarray(
                pc.count_substring_regex(flat, pattern=r"\S+"),
                dtype=np.int64,
            )
            >= min_words
        )
        js = np.asarray(
            pc.match_substring(flat, pattern="javascript",
                               ignore_case=True).fill_null(False)
        )
        brace = np.asarray(
            pc.match_substring(flat, pattern="{").fill_null(False)
        )
        keep = ends & enough & ~js & ~brace

        kept_cnt = np.bincount(doc_idx[keep], minlength=len(b))
        new_offs = np.concatenate([[0], np.cumsum(kept_cnt)])
        kept_lines = flat.filter(pa.array(keep))
        lists = pa.ListArray.from_arrays(
            pa.array(new_offs, type=pa.int32()), kept_lines
        )
        cleaned = pc.binary_join(lists, "\n")
        lorem = pc.match_substring(txt, pattern="lorem ipsum",
                                   ignore_case=True).fill_null(False)
        nl = n_lines.astype(np.float64)
        return pa.table(
            {
                id_col: b[id_col],
                "n_lines": pa.array(n_lines.astype(np.int64)),
                "n_kept": pa.array(kept_cnt.astype(np.int64)),
                "kept_frac": fixed6(
                    np.divide(kept_cnt, nl, out=np.zeros(len(b)),
                              where=nl > 0)
                ),
                "has_lorem": pc.cast(lorem, pa.int64()),
                "cleaned": cleaned,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def chunk_documents(ds, *, text_col: str, id_col: str,
                    chunk_words: int = 64, overlap_words: int = 16):
    """RAG-style sliding-window chunking: split each document into word
    windows of `chunk_words` with `overlap_words` overlap (stride =
    chunk - overlap); emit one row per chunk with its index and text.
    A document with w words yields 1 chunk if w <= chunk_words else
    1 + ceil((w - chunk_words) / stride).

    Fully vectorized expansion: the flattened word array is gathered with
    one take() over computed indices and rebuilt as a ListArray, one
    binary_join per batch. Stateless map_batches — linear at any scale."""
    C, S = int(chunk_words), int(chunk_words) - int(overlap_words)
    if S <= 0:
        raise ValueError("overlap_words must be < chunk_words")

    def f(b: pa.Table) -> pa.Table:
        txt = b[text_col].combine_chunks()
        split = pc.split_pattern_regex(txt, pattern=_WORD_RE)
        flat = split.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        offs = np.asarray(split.offsets, dtype=np.int64)
        w = np.diff(offs)
        doc_word0 = offs[:-1] - offs[0]
        n_chunks = np.where(
            w <= C, 1, 1 + np.ceil((w - C) / S).astype(np.int64)
        ).astype(np.int64)

        tot = int(n_chunks.sum())
        doc_of = np.repeat(np.arange(len(b), dtype=np.int64), n_chunks)
        c0 = np.concatenate([[0], np.cumsum(n_chunks)])
        chunk_ix = np.arange(tot, dtype=np.int64) - c0[doc_of]
        start = chunk_ix * S
        cnt = np.minimum(C, w[doc_of] - start)

        g0 = doc_word0[doc_of] + start  # global start of each chunk
        t0 = np.concatenate([[0], np.cumsum(cnt)])
        idx = np.repeat(g0, cnt) + (
            np.arange(int(t0[-1]), dtype=np.int64) - np.repeat(t0[:-1], cnt)
        )
        lists = pa.ListArray.from_arrays(
            pa.array(t0, type=pa.int32()), flat.take(pa.array(idx))
        )
        chunks = pc.binary_join(lists, " ")
        take = pa.array(doc_of)
        return pa.table(
            {
                id_col: b[id_col].combine_chunks().take(take),
                "chunk_ix": pa.array(chunk_ix),
                "n_chunk_words": pa.array(cnt.astype(np.int64)),
                "chunk_text": chunks,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def ngram_decontaminate(
    ds,
    bench_ds,
    *,
    text_col: str,
    id_col: str,
    bench_text_col: str | None = None,
    gram: int = 13,
    min_overlap: int = 1,
):
    """Benchmark decontamination: per training doc, the number of distinct
    `gram`-char substrings shared with ANY benchmark doc, and a flag at
    `min_overlap` (the GPT-3 appendix-C / PaLM lane, at char-gram
    granularity so the exact SQL twin stays substring-expressible).

    The benchmark side is small by definition (eval suites), so its
    distinct gram-hash set is gathered once — per-block distinct hashes
    stream to the driver (8 bytes per distinct gram), sorted, `ray.put`
    once — and the training corpus then streams through one stateless
    map_batches with a searchsorted membership probe per distinct doc
    gram: the corpus itself never shuffles and never materializes. Gram
    identity is the 64-bit polynomial hash (kernels/hashing.poly_hash_*),
    identical to the near-dedup lanes; vs the oracle's true substring sets
    this diverges only on a 64-bit collision (p ~ n_grams^2 / 2^64).

    Returns (id_col, n_overlap:int64, contaminated:int64 0/1). Docs shorter
    than `gram` contribute their whole text as one gram (the engine-wide
    shingle contract, matching SQL substring() clamping).
    """
    import ray

    from ..kernels.hashing import batch_gram_hashes

    btc = bench_text_col or text_col

    def bench_grams(b: pa.Table) -> pa.Table:
        txt = np.asarray(b[btc]).astype(str)
        hs, _ = batch_gram_hashes([t.encode() for t in txt], gram)
        return pa.table({"gh": pa.array(np.unique(hs).view(np.int64))})

    parts = bench_ds.map_batches(
        bench_grams, batch_format="pyarrow", zero_copy_batch=True
    )
    arrs = [
        np.asarray(b["gh"], dtype=np.int64).view(np.uint64)
        for b in parts.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    bench = (
        np.unique(np.concatenate(arrs)) if arrs
        else np.zeros(0, dtype=np.uint64)
    )
    ref = ray.put(bench)

    class Probe:
        def __init__(self):
            self.bench = ray.get(ref)  # zero-copy plasma read, sorted

        def __call__(self, b: pa.Table) -> pa.Table:
            n = b.num_rows
            if n == 0:
                return pa.table(
                    {
                        id_col: b[id_col],
                        "n_overlap": pa.array([], type=pa.int64()),
                        "contaminated": pa.array([], type=pa.int64()),
                    }
                )
            txt = np.asarray(b[text_col]).astype(str)
            hs, off = batch_gram_hashes([t.encode() for t in txt], gram)
            did = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
            # distinct (doc, gram) pairs, all-vectorized
            order = np.lexsort((hs, did))
            d_s, h_s = did[order], hs[order]
            new = np.ones(len(d_s), dtype=bool)
            if len(d_s) > 1:
                new[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
            d_u, h_u = d_s[new], h_s[new]
            bench = self.bench
            if len(bench):
                idx = np.searchsorted(bench, h_u)
                hit = (idx < len(bench)) & (
                    bench[np.minimum(idx, len(bench) - 1)] == h_u
                )
            else:
                hit = np.zeros(len(h_u), dtype=bool)
            n_ov = np.bincount(d_u[hit], minlength=n).astype(np.int64)
            return pa.table(
                {
                    id_col: b[id_col],
                    "n_overlap": pa.array(n_ov),
                    "contaminated": pa.array(
                        (n_ov >= min_overlap).astype(np.int64)
                    ),
                }
            )

    return ds.map_batches(
        Probe, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 16),
    )


def tfidf_top_terms(
    ds,
    *,
    text_col: str,
    id_col: str,
    n_docs: int,
    num_partitions: int = 16,
):
    """TF-IDF scoring: highest-scoring term per document.

    Extends the reference's vocabulary/word-index machinery
    (`textmining/Vocabulary.hpp:31-67`, `WordIndex.hpp:27-61`) with the
    classic corpus statistic. Fully distributed:

    1. per-batch (doc, word, tf) — EXACT because the whitespace explode
       keeps every document's words inside the batch that produced them;
    2. df = distributed count of the (already-distinct) tf rows per word;
    3. word-keyed hash join tf x df — at web scale the vocabulary does
       not fit a broadcast, so this is the correct exchange (one shuffle
       of the tf table keyed by word);
    4. fixed-point score tfidf_fp = round(tf * ln(n_docs / df) * 1e6)
       (half-away rounding, matching DuckDB ROUND — the repo-wide
       fixed-point pattern that makes float ranking oracle-exact);
    5. top-1 per doc: per-batch argmax combiner (ties -> smallest word),
       one doc-keyed exchange of <= 1 row per doc per batch, final argmax.

    Returns (id_col, word, tf, df, tfidf_fp)."""
    from .joins import hash_join
    from .rollup import crc_hash_sources

    def tf_batch(b: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(b[text_col], pattern=r"\s+")
        lengths = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = np.asarray(pc.list_flatten(words)).astype(str)
        ids = np.repeat(np.asarray(b[id_col]), lengths)
        keep = flat != ""
        ids, flat = ids[keep], flat[keep]
        uniqw, wid = np.unique(flat, return_inverse=True)
        order = np.lexsort((wid, ids))
        di, wi = ids[order], wid[order]
        n = len(di)
        new = np.ones(n, dtype=bool)
        if n:
            new[1:] = (di[1:] != di[:-1]) | (wi[1:] != wi[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, n))
        return pa.table(
            {
                id_col: pa.array(di[starts]),
                "word": pa.array(uniqw[wi[starts]], type=pa.string()),
                "tf": pa.array(cnt.astype(np.int64)),
            }
        )

    tf_ds = ds.map_batches(tf_batch, batch_format="pyarrow",
                           zero_copy_batch=True)

    from .preprocessors import group_count

    df_ds = group_count(tf_ds.select_columns(["word"]), "word",
                        num_partitions=num_partitions).map_batches(
        lambda b: pa.table({"word": b["word"], "df": b["cnt"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    joined = hash_join(tf_ds, df_ds, on="word",
                       num_partitions=num_partitions)

    def score(b: pa.Table) -> pa.Table:
        tf = np.asarray(b["tf"], dtype=np.float64)
        dfv = np.asarray(b["df"], dtype=np.float64)
        v = tf * np.log(float(n_docs) / dfv) * 1e6
        fp = np.floor(v + 0.5).astype(np.int64)  # v >= 0: half-away == +0.5
        return b.append_column("tfidf_fp", pa.array(fp))

    scored = joined.map_batches(score, batch_format="pyarrow",
                                zero_copy_batch=True)

    def local_top1(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b
        ids = np.asarray(b[id_col])
        fp = np.asarray(b["tfidf_fp"])
        # np.unique codes are lexicographically ordered, so the code is a
        # sortable stand-in for the word tie-break
        _, wc = np.unique(np.asarray(b["word"]).astype(str),
                          return_inverse=True)
        order = np.lexsort((wc, -fp, ids))
        di = ids[order]
        first = np.ones(len(di), dtype=bool)
        first[1:] = di[1:] != di[:-1]
        return b.take(pa.array(order[first]))

    def add_part(b: pa.Table) -> pa.Table:
        b = local_top1(b)  # combiner: <= one row per doc leaves the batch
        ids = np.asarray(b[id_col])
        if ids.dtype.kind in "iu":
            h = ids.astype(np.int64)
        else:
            h = crc_hash_sources(ids.astype(str))
        return b.append_column(
            "_part",
            pa.array((h * 0x9E3779B1 % num_partitions).astype(np.int64)),
        )

    return (
        scored.map_batches(add_part, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            lambda t: local_top1(t.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )
