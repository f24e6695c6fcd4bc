"""NDJSON quarantine-ingest gates: per-line reference semantics, fast
(Arrow C++) path ≡ forced slow path on every batch shape, valid ∪
quarantine partitions the input exactly."""

import json

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from searchengine_ray.sources.jsonl import (
    _slow_parse, jsonl_ingest, parse_tagged)

SPEC = [("event_id", "int", True), ("event_type", "str", True),
        ("value", "float", False)]


def _dirty_lines():
    return [
        json.dumps({"event_id": 1, "event_type": "click", "value": 2.5}),
        json.dumps({"event_id": 2, "event_type": "view"}),          # optional absent
        json.dumps({"event_id": 3, "event_type": "view", "value": None}),  # optional null
        json.dumps({"event_id": 4, "event_type": "x", "value": 7}),  # int for float OK
        '{"event_id": ',                                             # syntax
        '[1, 2, 3]',                                                 # not_object
        '42',                                                        # not_object
        json.dumps({"event_id": "abc", "event_type": "c"}),          # bad_type
        json.dumps({"event_id": True, "event_type": "c"}),           # bad_type (bool)
        json.dumps({"event_id": 5.5, "event_type": "c"}),            # bad_type (float)
        json.dumps({"event_type": "c", "value": 1.0}),               # missing_field
        json.dumps({"event_id": None, "event_type": "c"}),           # missing (null)
        json.dumps({"event_id": 6, "event_type": "c", "extra": 9}),  # extra ignored
        json.dumps({"event_id": 7, "event_type": 8}),                # bad_type (str)
    ]


def test_per_line_semantics():
    t = parse_tagged(_dirty_lines(), SPEC)
    assert t["_valid"].tolist() == [1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0]
    errs = t.loc[t["_valid"] == 0, "_err"].tolist()
    assert errs == ["syntax", "not_object", "not_object", "bad_type",
                    "bad_type", "bad_type", "missing_field", "missing_field",
                    "bad_type"]
    v = t[t["_valid"] == 1]
    assert v["event_id"].tolist() == [1, 2, 3, 4, 6]
    assert np.isnan(v["value"].to_numpy()[1]) and np.isnan(
        v["value"].to_numpy()[2])
    assert v["value"].to_numpy()[3] == 7.0
    assert t["event_id"].dtype == np.int64


def test_fast_path_equals_slow_path():
    # clean batch (fast path taken) must equal the forced per-line scan
    clean = [json.dumps({"event_id": i, "event_type": f"t{i % 3}",
                         "value": i / 8}) for i in range(200)]
    for i in range(0, 200, 7):  # optional field absent on a subset
        clean[i] = json.dumps({"event_id": i, "event_type": "t0"})
    fast = parse_tagged(clean, SPEC)
    slow = _slow_parse(clean, SPEC)
    pd.testing.assert_frame_equal(fast, slow)
    # dirty batch: parse_tagged falls back — identical by construction
    dirty = clean + ['{oops']
    pd.testing.assert_frame_equal(parse_tagged(dirty, SPEC),
                                  _slow_parse(dirty, SPEC))


def test_ingest_partitions_input(ray_session, tmp_path):
    lines = _dirty_lines() * 50
    files = []
    for j in range(4):
        p = tmp_path / f"part{j}.jsonl"
        chunk = lines[j::4]
        p.write_text("\n".join(chunk) + "\n")
        files.append(str(p))
    valid, quar = jsonl_ingest(files, SPEC)
    v = valid.to_pandas()
    q = quar.to_pandas()
    assert len(v) + len(q) == len(lines)
    assert len(v) == 5 * 50
    assert sorted(v.columns) == ["event_id", "event_type", "value"]
    assert set(q["err"]) == {"syntax", "not_object", "bad_type",
                             "missing_field"}
    # quarantined lines round-trip verbatim
    assert '{"event_id": ' in set(q["line"])
