"""NDJSON (JSON-lines) ingest with malformed-row quarantine — the
general form of the reference's doc-reader malformed-drop contract
(SURVEY §2.1 S2: readers must survive dirty input, not crash on it).

Validity contract (per line, against a field spec):
- the line parses as JSON and the value is an OBJECT;
- every REQUIRED field is present with the declared kind;
- kinds: ``int`` (JSON integer; bools rejected), ``str`` (JSON string),
  ``float`` (JSON number incl. integers; bools rejected).  Optional
  fields may be absent or JSON null (→ NaN / empty-string fill);
  unexpected extra fields are ignored.

Scale shape: lines stream via ``ray.data.read_text``; each batch first
tries the VECTORIZED Arrow C++ NDJSON reader with an explicit schema
(``pyarrow.json`` errors on ANY type mismatch — no silent coercion, see
the pinned equivalence test), falling back to a per-line ``json.loads``
scan only for batches that contain a malformed line or a missing
required field — so a clean corpus parses at native speed and dirty
batches pay the per-record isolation cost exactly where quarantine
semantics need it.  The tagged parse materializes ONCE; the valid and
quarantine views are map-only filters over the same blocks.
"""

from __future__ import annotations

import io
import json
from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

# (name, kind, required) with kind ∈ int | str | float
FieldSpec = Sequence[tuple[str, str, bool]]

_PA_TYPE = {"int": pa.int64(), "str": pa.string(), "float": pa.float64()}
_FILL = {"int": np.int64(0), "str": "", "float": np.nan}


def _kind_ok(v, kind: str) -> bool:
    if isinstance(v, bool):
        return False
    if kind == "int":
        return isinstance(v, int)
    if kind == "str":
        return isinstance(v, str)
    return isinstance(v, (int, float))


def _parse_line(line: str, spec: FieldSpec):
    """(row dict, None) for a valid line, (None, err category) otherwise."""
    try:
        obj = json.loads(line)
    except ValueError:
        return None, "syntax"
    if not isinstance(obj, dict):
        return None, "not_object"
    row = {}
    for name, kind, required in spec:
        v = obj.get(name)
        if v is None:  # absent or explicit JSON null
            if required:
                return None, "missing_field"
            row[name] = _FILL[kind]
            continue
        if not _kind_ok(v, kind):
            return None, "bad_type"
        row[name] = float(v) if kind == "float" else v
    return row, None


def _slow_parse(lines: list[str], spec: FieldSpec) -> pd.DataFrame:
    cols: dict = {name: [] for name, _, _ in spec}
    valid = np.zeros(len(lines), dtype=np.int8)
    errs, quarantined = [], []
    for i, ln in enumerate(lines):
        row, err = _parse_line(ln, spec)
        if err is None:
            valid[i] = 1
            errs.append("")
            quarantined.append("")
            for name, _, _ in spec:
                cols[name].append(row[name])
        else:
            errs.append(err)
            quarantined.append(ln)
            for name, kind, _ in spec:
                cols[name].append(_FILL[kind])
    out = {}
    for name, kind, _ in spec:
        dt = {"int": np.int64, "str": object, "float": np.float64}[kind]
        out[name] = pd.Series(cols[name], dtype=dt)
    out["_valid"] = valid
    out["_err"] = pd.Series(errs, dtype=object)
    out["_line"] = pd.Series(quarantined, dtype=object)
    return pd.DataFrame(out)


def parse_tagged(lines: list[str], spec: FieldSpec) -> pd.DataFrame:
    """One batch of raw lines → tagged frame (typed spec columns +
    ``_valid``/``_err``/``_line``).  Fast path: Arrow C++ NDJSON with an
    explicit schema; any parse/type error or a null in a REQUIRED column
    routes the whole batch to the per-line scan (pinned equivalent)."""
    import pyarrow.json as pj

    schema = pa.schema([(n, _PA_TYPE[k]) for n, k, _ in spec])
    try:
        tbl = pj.read_json(
            io.BytesIO("\n".join(lines).encode()),
            parse_options=pj.ParseOptions(
                explicit_schema=schema,
                unexpected_field_behavior="ignore"))
    except (pa.ArrowInvalid, ValueError):
        return _slow_parse(lines, spec)
    if tbl.num_rows != len(lines):
        return _slow_parse(lines, spec)  # blank/edge lines — be exact
    for name, kind, required in spec:
        nulls = tbl[name].null_count
        if nulls and (required or kind == "int"):
            # explicit null / missing required → per-line semantics decide
            return _slow_parse(lines, spec)
    df = tbl.to_pandas()
    for name, kind, _ in spec:
        if kind == "float":
            df[name] = df[name].astype(np.float64)  # nulls → NaN fill
        elif kind == "str":
            df[name] = df[name].fillna("").astype(object)
    n = len(df)
    df["_valid"] = np.ones(n, dtype=np.int8)
    df["_err"] = pd.Series([""] * n, dtype=object)
    df["_line"] = pd.Series([""] * n, dtype=object)
    return df


def jsonl_ingest(
    paths: str | list[str], spec: FieldSpec,
) -> tuple[Dataset, Dataset]:
    """(valid, quarantine) over an NDJSON file/directory: valid carries
    the typed spec columns; quarantine carries (line, err).  The tagged
    parse materializes once; both views are map-only filters."""
    import ray.data as rd

    lines = rd.read_text(paths)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return parse_tagged(list(df["text"]), spec)

    tagged = lines.map_batches(tag, batch_format="pandas").materialize()
    names = [n for n, _, _ in spec]
    valid = tagged.map_batches(
        lambda df: df[df["_valid"] == 1][names], batch_format="pandas")
    quarantine = tagged.map_batches(
        lambda df: df[df["_valid"] == 0][["_line", "_err"]]
        .rename(columns={"_line": "line", "_err": "err"}),
        batch_format="pandas")
    return valid, quarantine
