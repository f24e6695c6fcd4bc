"""Resumable partitioned sink: per-partition atomicity, skip-finished
resume (bytes of finished partitions untouched), manifest-written-last
completeness, partial-progress reads."""

import hashlib
import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from searchengine_ray.sources.resumable import (
    finished_partitions, resumable_read, resumable_write)

OUT = "/tmp/graft_scratch/test_resumable"


def _input(n=400, parts=8):
    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "grp": [f"g{int(i) % parts}" for i in rng.permutation(n)],
        "text": [f"doc {i} body" for i in range(n)],
    })
    return df


def _file_hashes(out_dir):
    out = {}
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d, "data.parquet")
        if os.path.exists(p):
            out[d] = hashlib.sha256(open(p, "rb").read()).hexdigest()
    return out


def test_clean_write_round_trip(ray_session):
    shutil.rmtree(OUT, ignore_errors=True)
    df = _input()
    stats = resumable_write(rd.from_pandas(df).repartition(4), OUT, "grp",
                            order_by=["doc_id"])
    assert len(stats) == 8 and stats["written"].all()
    assert stats["rows"].sum() == len(df)
    got = resumable_read(OUT).to_pandas()
    got = got.sort_values("doc_id", ignore_index=True)[df.columns.tolist()]
    pd.testing.assert_frame_equal(got, df.sort_values("doc_id",
                                                      ignore_index=True))
    manifest = json.load(open(os.path.join(OUT, "_MANIFEST.json")))
    assert sum(manifest["partitions"].values()) == len(df)


def test_failure_resume_skips_finished_and_is_bit_identical(ray_session):
    df = _input()

    # clean reference run
    ref_dir = OUT + "_ref"
    shutil.rmtree(ref_dir, ignore_errors=True)
    resumable_write(rd.from_pandas(df).repartition(4), ref_dir, "grp",
                    order_by=["doc_id"])
    ref_hashes = _file_hashes(ref_dir)

    # faulted run: g5/g6 crash mid-commit (data landed, marker didn't) —
    # the seam runs inside the write task and raises deterministically,
    # so retries fail too and the job aborts with 6 finished partitions
    run_dir = OUT + "_fault"
    shutil.rmtree(run_dir, ignore_errors=True)

    def bomb(value):
        if value in ("g5", "g6"):
            raise RuntimeError("injected crash mid-commit")

    with pytest.raises(Exception):
        resumable_write(rd.from_pandas(df).repartition(4), run_dir, "grp",
                        order_by=["doc_id"], on_partition_written=bomb)

    done = finished_partitions(run_dir, "grp")
    # the failing partitions never committed; others committed unless the
    # abort cancelled them in flight
    assert not done & {"g5", "g6"}
    assert done and done <= set(f"g{i}" for i in range(8))
    assert not os.path.exists(os.path.join(run_dir, "_MANIFEST.json"))
    with pytest.raises(FileNotFoundError):
        resumable_read(run_dir)  # incomplete without the manifest
    # partial-progress view still works
    partial = resumable_read(run_dir, require_complete=False).to_pandas()
    assert set(partial["grp"].unique()) == set(done)

    pre_hashes = _file_hashes(run_dir)

    # resume: only unfinished partitions get written
    stats = resumable_write(rd.from_pandas(df).repartition(4), run_dir,
                            "grp", order_by=["doc_id"])
    written_now = set(stats[stats["written"]]["partition"])
    assert written_now == set(f"g{i}" for i in range(8)) - done
    assert len(stats) == 8 and stats["rows"].sum() == len(df)
    assert (~stats[stats["partition"].isin(done)]["written"]).all()

    post_hashes = _file_hashes(run_dir)
    for v in done:  # finished partitions' bytes never touched
        assert post_hashes[f"grp={v}"] == pre_hashes[f"grp={v}"]
    # and the final result is bit-identical to the clean run
    assert post_hashes == ref_hashes

    got = resumable_read(run_dir).to_pandas()
    assert len(got) == len(df)


def test_rerun_after_complete_writes_nothing(ray_session):
    run_dir = OUT + "_idem"
    shutil.rmtree(run_dir, ignore_errors=True)
    df = _input(n=80, parts=4)
    resumable_write(rd.from_pandas(df).repartition(2), run_dir, "grp",
                    order_by=["doc_id"])
    pre = _file_hashes(run_dir)
    stats = resumable_write(rd.from_pandas(df).repartition(2), run_dir,
                            "grp", order_by=["doc_id"])
    assert not stats["written"].any()
    assert _file_hashes(run_dir) == pre


# --- schema-evolution read ----------------------------------------------------


def test_read_evolved_conforms_and_defaults(ray_session):
    import tempfile

    import ray.data as rd

    from searchengine_ray.sources.evolve import read_evolved

    with tempfile.TemporaryDirectory(prefix="sr_evolve_") as root:
        v1 = pd.DataFrame({"id": np.arange(5, dtype=np.int64),
                           "a": np.arange(5, dtype=np.int64) * 10,
                           "legacy_junk": ["x"] * 5})
        v2 = pd.DataFrame({"id": np.arange(5, 9, dtype=np.int64),
                           "b": ["p", "q", "r", "s"]})
        rd.from_pandas(v1).write_parquet(f"{root}/v1")
        rd.from_pandas(v2).write_parquet(f"{root}/v2")
        got = (read_evolved([f"{root}/v1", f"{root}/v2"],
                            {"id": (np.int64, 0), "a": (np.int64, -1),
                             "b": (None, "none")})
               .to_pandas().sort_values("id").reset_index(drop=True))
        assert list(got.columns) == ["id", "a", "b"]
        assert got["a"].tolist() == [0, 10, 20, 30, 40, -1, -1, -1, -1]
        assert got["b"].tolist() == ["none"] * 5 + ["p", "q", "r", "s"]
        # undeclared physical column never surfaces
        assert "legacy_junk" not in got.columns


def test_read_evolved_empty_segments_raise(ray_session):
    import pytest as _pytest

    from searchengine_ray.sources.evolve import read_evolved

    with _pytest.raises(ValueError, match="no segments"):
        read_evolved([], {"id": (np.int64, 0)})
