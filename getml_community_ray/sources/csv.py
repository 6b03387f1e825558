"""CSV ingest with dialect options + type sniffing — the Ray-Data mapping
of the reference's CSV surface (`src/engine/include/io/CSVReader.hpp`,
`io/CSVSniffer.hpp`, `database/sniff.hpp`: quote/sep options + type
sniffing before roles are assigned; Python side
`getml/data/data_frame.py:633-652`).

- `read_csv_dialect`: `ray.data.read_csv` with the full pyarrow option
  surface (delimiter, quote char, escape, header handling, null tokens,
  explicit column types) exposed as plain kwargs. Distribution is Ray's:
  one read task per file / block range, streaming.
- `sniff_csv`: the CSVSniffer analog. Reads a bounded sample (driver-side,
  a few KB — never the file), detects the delimiter + quote char + header
  presence, then infers each column into the reference's runtime type
  lattice {float64, int-coded category/string, timestamp} — the same
  collapse `getml/data/_io/arrow.py:125-146` applies on ingest (all
  numerics -> float64). Returns a plain dict the caller can edit before
  reading, mirroring sniff-then-assign-roles.
"""

from __future__ import annotations

import pyarrow as pa

_DELIMS = [",", ";", "\t", "|"]
_NULLS = ["", "NULL", "null", "NaN", "nan", "N/A"]


def sniff_csv(
    path: str,
    *,
    sample_bytes: int = 64 << 10,
    n_rows: int = 100,
) -> dict:
    """Detect dialect + types from a bounded sample of one CSV file.

    Returns {"delimiter", "quote_char", "has_header", "column_names",
    "column_types"} with column_types drawn from the reference lattice:
    pa.float64() for anything numeric, pa.timestamp("us") for ISO-ish
    timestamps, pa.string() otherwise."""
    with open(path, "rb") as f:
        raw = f.read(sample_bytes)
    # cut the (possibly truncated) last line
    text = raw.decode("utf-8", errors="replace")
    lines = text.splitlines()
    if len(lines) > 1 and not text.endswith("\n"):
        lines = lines[:-1]
    lines = [ln for ln in lines if ln][: n_rows + 1]
    if not lines:
        raise ValueError(f"sniff_csv: no data in sample of {path}")

    # delimiter: the candidate with the most CONSISTENT nonzero count
    # across sample lines (the classic sniffer rule)
    best, best_score = ",", -1.0
    for d in _DELIMS:
        counts = [ln.count(d) for ln in lines]
        if min(counts) == 0:
            continue
        consistency = 1.0 if len(set(counts)) == 1 else 1.0 / len(set(counts))
        score = consistency * (counts[0] + 1)
        if score > best_score:
            best, best_score = d, score
    delim = best

    # quote char: probe the candidates (" then ') — a char counts as the
    # quoting char only when some FIELD is fully bounded by it (opens right
    # after a delimiter/line start AND closes right before the next
    # delimiter/line end) and every line's count is even. The field-bounded
    # rule rejects incidental apostrophes in unquoted data ("1,'Lil' Bob"
    # pairs up but never bounds a whole field).
    import re as _re

    quote = '"'
    d_esc = _re.escape(delim)
    for cand in ('"', "'"):
        c_esc = _re.escape(cand)
        field_bounded = _re.compile(
            f"(?:^|{d_esc}){c_esc}[^{c_esc}]*{c_esc}(?:{d_esc}|$)"
        )
        bounded = any(field_bounded.search(ln) for ln in lines)
        balanced = all(ln.count(cand) % 2 == 0 for ln in lines)
        if bounded and balanced:
            quote = cand
            break

    def split(ln: str) -> list[str]:
        # quote-aware split, good enough for sniffing (pyarrow does the
        # real parse)
        out, cur, q = [], [], False
        for ch in ln:
            if ch == quote:
                q = not q
            elif ch == delim and not q:
                out.append("".join(cur)); cur = []
            else:
                cur.append(ch)
        out.append("".join(cur))
        return out

    rows = [split(ln) for ln in lines]
    ncol = len(rows[0])
    rows = [r for r in rows if len(r) == ncol]

    def is_num(v: str) -> bool:
        v = v.strip().strip(quote)
        if v in _NULLS:
            return True
        try:
            float(v)
            return True
        except ValueError:
            return False

    def is_ts(v: str) -> bool:
        v = v.strip().strip(quote)
        if v in _NULLS:
            return True
        import re

        return bool(re.match(r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2})?)?$", v))

    # header: first row is a header iff it is all-non-numeric while the
    # body has at least one numeric column
    body = rows[1:] if len(rows) > 1 else rows
    body_num = [all(is_num(r[c]) for r in body) for c in range(ncol)]
    has_header = any(body_num) and not any(is_num(v) for v in rows[0])

    names = (
        [v.strip().strip(quote) for v in rows[0]]
        if has_header
        else [f"column_{i:02d}" for i in range(ncol)]
    )
    data = rows[1:] if has_header else rows
    types: dict[str, pa.DataType] = {}
    for c, name in enumerate(names):
        vals = [r[c] for r in data]
        non_null = [v for v in vals if v.strip().strip(quote) not in _NULLS]
        if non_null and all(is_ts(v) for v in non_null):
            types[name] = pa.timestamp("us")
        elif non_null and all(is_num(v) for v in non_null):
            # the reference collapses every numeric to float64 on ingest
            types[name] = pa.float64()
        else:
            types[name] = pa.string()
    return {
        "delimiter": delim,
        "quote_char": quote,
        "has_header": has_header,
        "column_names": names,
        "column_types": types,
    }


def read_csv_dialect(
    paths,
    *,
    delimiter: str = ",",
    quote_char: str = '"',
    escape_char: str | None = None,
    has_header: bool = True,
    column_names: list[str] | None = None,
    column_types: dict | None = None,
    null_values: list[str] | None = None,
    **ray_kwargs,
):
    """`ray.data.read_csv` with the exotic-dialect options plumbed through
    to pyarrow's parser (the option richness `io/CSVReader.hpp` exposes).

    With `has_header=False`, pass `column_names` (or sniff first). Explicit
    `column_types` skip inference — the sniff-then-read path."""
    from pyarrow import csv as pacsv

    import ray.data as rd

    parse = pacsv.ParseOptions(
        delimiter=delimiter,
        quote_char=quote_char,
        escape_char=escape_char if escape_char is not None else False,
        double_quote=True,
    )
    if not has_header and not column_names:
        # Omitting ReadOptions here would make pyarrow silently consume the
        # first data row as a header — fail loudly instead.
        raise ValueError(
            "read_csv_dialect: has_header=False requires column_names "
            "(sniff first, or pass them explicitly)"
        )
    read_names = None if has_header else column_names
    read = pacsv.ReadOptions(column_names=read_names) if read_names else None
    convert = pacsv.ConvertOptions(
        column_types=column_types or {},
        null_values=list(null_values) if null_values is not None else _NULLS,
        strings_can_be_null=True,
    )
    kwargs = dict(parse_options=parse, convert_options=convert)
    if read is not None:
        kwargs["read_options"] = read
    return rd.read_csv(paths, **kwargs, **ray_kwargs)


def read_csv_sniffed(paths, *, sample_path: str | None = None, **ray_kwargs):
    """Sniff dialect + types from the first file, then read all of them
    with the detected options — the one-call `from_csv` a reference user
    expects."""
    import glob
    import os

    if sample_path is None:
        if isinstance(paths, str):
            if os.path.isdir(paths):
                cands = sorted(glob.glob(os.path.join(paths, "*")))
                sample_path = cands[0] if cands else paths
            else:
                cands = sorted(glob.glob(paths))
                sample_path = cands[0] if cands else paths
        else:
            sample_path = paths[0]
    d = sniff_csv(sample_path)
    return read_csv_dialect(
        paths,
        delimiter=d["delimiter"],
        quote_char=d["quote_char"],
        has_header=d["has_header"],
        column_names=d["column_names"],
        column_types=d["column_types"],
        **ray_kwargs,
    )
