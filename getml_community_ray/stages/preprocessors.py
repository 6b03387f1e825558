"""Fit/transform preprocessor stages mirroring the reference's preprocessor
suite (`/root/reference/src/engine/include/engine/preprocessors/
Preprocessor.hpp:25-63` contract: fit = one pass producing a small state,
transform = per-batch application).

In Ray terms: fit runs a tiny aggregation over the Dataset (driver collects a
small state object), transform is a vectorized `map_batches` whose closure
carries the state (broadcast implicitly via the serialized task; use
`ray.put` explicitly for states > a few MB).

| stage           | reference                                            |
|-----------------|------------------------------------------------------|
| Seasonal        | src/engine/src/engine/Seasonal.cpp:18-196            |
| Imputation      | src/engine/src/engine/Imputation.cpp:18-75,160-175   |
| CategoryTrimmer | src/engine/src/engine/CategoryTrimmer.cpp:112-157    |
| EMailDomain     | src/engine/src/engine/EMailDomain.cpp:61-80          |
| Substring       | engine/preprocessors/Substring.hpp:47-50,164,195     |
| TextFieldSplitter | src/engine/src/engine/TextFieldSplitter.cpp:105-149|
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class Seasonal:
    """Adds hour / minute / month / weekday / year columns per timestamp
    column. The reference emits zero-padded strings as categoricals plus a
    numerical year (unit 'year, comparison only'); we emit float64 columns
    named <col>_hour etc. (category codes == the numeric value here)."""

    def __init__(self, ts_cols: list[str]):
        self.ts_cols = ts_cols

    def fit(self, ds):
        return self  # stateless: the reference only drops degenerate outputs

    def transform(self, ds):
        from ..functions.scalar import DATE_EXTRACTORS

        cols = self.ts_cols

        def f(b: pa.Table) -> pa.Table:
            for c in cols:
                x = b[c].combine_chunks()
                for part in ("hour", "minute", "month", "weekday", "year"):
                    b = b.append_column(f"{c}_{part}", DATE_EXTRACTORS[part](x))
            return b

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


class Imputation:
    """Replace nulls/NaN with the column mean; optionally add a 0/1
    '<col>_was_null' dummy (reference always adds it when nulls were seen
    at fit time)."""

    def __init__(self, cols: list[str], add_dummies: bool = True):
        self.cols = cols
        self.add_dummies = add_dummies
        self.means_: dict[str, float] = {}
        self.needs_dummy_: dict[str, bool] = {}

    def fit(self, ds):
        from ray.data.aggregate import Count, Sum

        aggs = []
        for c in self.cols:
            # Count must skip nulls here (ray's default counts all rows)
            aggs += [
                Sum(c, alias_name=f"_s_{c}"),
                Count(c, ignore_nulls=True, alias_name=f"_n_{c}"),
            ]
        row = ds.aggregate(*aggs)
        total = ds.count()
        for c in self.cols:
            n = row[f"_n_{c}"] or 0
            self.means_[c] = (row[f"_s_{c}"] / n) if n else 0.0
            self.needs_dummy_[c] = n < total
        return self

    def transform(self, ds):
        means = dict(self.means_)
        dummies = {c for c, v in self.needs_dummy_.items() if v} if self.add_dummies else set()

        def f(b: pa.Table) -> pa.Table:
            for c, mu in means.items():
                col = pc.cast(b[c], pa.float64())
                # is_nan(null) is null — fill to False before the OR, else
                # the if_else condition goes null and the kernel rejects it
                isnan = pc.fill_null(pc.is_nan(col), False)
                isnull = pc.or_(pc.is_null(col), isnan)
                filled = pc.if_else(isnull, pa.scalar(mu, pa.float64()), col)
                b = b.set_column(b.column_names.index(c), c, filled)
                if c in dummies:
                    b = b.append_column(
                        f"{c}_was_null", pc.cast(isnull, pa.float64())
                    )
            return b

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


class CategoryTrimmer:
    """Keep the top `max_num_categories` categories with count >=
    `min_freq`; everything else becomes the trimmed token. Tie-break:
    higher count first, then lexicographically smaller value (deterministic
    under any parallelism; the reference's std::sort order on equal counts
    is unspecified)."""

    TRIMMED = "__trimmed__"

    def __init__(self, col: str, max_num_categories: int = 999, min_freq: int = 30):
        self.col = col
        self.max_num_categories = max_num_categories
        self.min_freq = min_freq
        self.kept_: list[str] | None = None

    def fit(self, ds):
        counts = group_count(ds, self.col).to_pandas()
        counts = counts[counts["cnt"] >= self.min_freq]
        counts = counts.sort_values(
            ["cnt", self.col], ascending=[False, True]
        ).head(self.max_num_categories)
        self.kept_ = counts[self.col].tolist()
        return self

    def transform(self, ds):
        kept = set(self.kept_ or [])
        col = self.col

        def f(b: pa.Table) -> pa.Table:
            vals = np.asarray(b[col]).astype(str)
            out = np.where(np.isin(vals, list(kept)), vals, self.TRIMMED)
            return b.set_column(
                b.column_names.index(col), col, pa.array(out, type=pa.string())
            )

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


class EMailDomain:
    """Extract '@domain' (must contain a dot) as a new categorical column
    (reference EMailDomain.cpp:61-80: empty string when absent/invalid)."""

    def __init__(self, cols: list[str]):
        self.cols = cols

    def fit(self, ds):
        return self

    def transform(self, ds):
        cols = self.cols

        def f(b: pa.Table) -> pa.Table:
            for c in cols:
                dom = pc.extract_regex(b[c], pattern=r"@(?P<d>[^@]*\.[^@]*)$")
                d = pc.struct_field(dom, "d")
                d = pc.if_else(pc.is_null(d), pa.scalar("", pa.string()), d)
                b = b.append_column(f"{c}_domain", d)
            return b

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


class Substring:
    """substr(begin, length) of a string column as a new categorical."""

    def __init__(self, col: str, begin: int, length: int):
        self.col = col
        self.begin = begin
        self.length = length

    def fit(self, ds):
        return self

    def transform(self, ds):
        c, b0, ln = self.col, self.begin, self.length

        def f(b: pa.Table) -> pa.Table:
            return b.append_column(
                f"{c}_substr",
                pc.utf8_slice_codeunits(b[c], start=b0, stop=b0 + ln),
            )

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


class TextFieldSplitter:
    """Split a text column into a NEW peripheral dataset (rowid, word) —
    the reference turns each text field into a separate table joined by
    rowid (TextFieldSplitter.cpp:105-149). flat-map shaped: one output row
    per word; empty tokens dropped."""

    def __init__(self, *, text_col: str, id_col: str):
        self.text_col = text_col
        self.id_col = id_col

    def fit(self, ds):
        return self

    def transform(self, ds):
        tcol, icol = self.text_col, self.id_col

        def f(b: pa.Table) -> pa.Table:
            words = pc.split_pattern_regex(b[tcol], pattern=r"\s+")
            lengths = pc.list_value_length(words).to_numpy(zero_copy_only=False)
            flat = pc.list_flatten(words)
            ids = np.repeat(
                np.asarray(b[icol]), lengths
            )
            keep = pc.not_equal(flat, "")
            tbl = pa.table({icol: pa.array(ids), "word": flat})
            return tbl.filter(keep)

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def group_count(ds, key_col: str, num_partitions: int = 16):
    """Vectorized distributed count-by-key for string keys: per-batch
    np.unique partial counts -> hash-partition the (key, cnt) partials ->
    per-partition merge. Avoids Ray's per-group sort-aggregate."""
    from .rollup import crc_hash_sources

    def partial(b: pa.Table) -> pa.Table:
        vals = np.asarray(b[key_col]).astype(str)
        uniq, cnt = np.unique(vals, return_counts=True)
        return pa.table(
            {key_col: pa.array(uniq, type=pa.string()), "cnt": pa.array(cnt.astype(np.int64))}
        )

    def add_part(b: pa.Table) -> pa.Table:
        h = crc_hash_sources(np.asarray(b[key_col]).astype(str))
        return b.append_column(
            "_part", pa.array((h % num_partitions).astype(np.int64))
        )

    def merge(t: pa.Table) -> pa.Table:
        vals = np.asarray(t[key_col]).astype(str)
        cnt = np.asarray(t["cnt"])
        uniq, inv = np.unique(vals, return_inverse=True)
        # int64 scatter-add: float64 bincount weights lose exactness past 2^53
        out = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(out, inv, np.asarray(cnt, dtype=np.int64))
        return pa.table(
            {key_col: pa.array(uniq, type=pa.string()), "cnt": pa.array(out)}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(lambda t: merge(t.drop_columns(["_part"])), batch_format="pyarrow")
    )
