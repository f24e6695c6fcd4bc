"""DSIR gates: engine scores ≡ a sequential pure-Python reference
(hash, smoothing, exact-integer ratio, rounding); selection favors
target-vocabulary docs; determinism across repartitions."""

from hashlib import sha256

import numpy as np
import pandas as pd
import ray.data as rd

from searchengine_ray.stages.dsir import (
    doc_grams, dsir_log_ratio, dsir_scores, dsir_select,
    paired_bucket_counts)

B, SALT = 64, "t1"


def _mk_corpus():
    # target vocabulary: "alpha beta gamma"; off-target: "delta epsilon"
    rows = []
    for i in range(60):
        if i % 3 == 0:   # target slice
            text, is_t = "alpha beta gamma alpha beta", True
        elif i % 3 == 1:  # raw doc that LOOKS like target
            text, is_t = "alpha beta gamma", False
        else:             # raw doc far from target
            text, is_t = "delta epsilon zeta delta", False
        rows.append({"doc_id": i, "text": text + f" tail{i}",
                     "is_target": is_t})
    return pd.DataFrame(rows)


def _ref_bucket(g):
    return int(sha256(f"{g}:{SALT}".encode()).hexdigest()[:12], 16) % B


def test_scores_match_sequential_reference(ray_session):
    df = _mk_corpus()
    ds = rd.from_pandas(df).repartition(5)
    t, q = paired_bucket_counts(ds, SALT, B, "text", "is_target")

    # reference counts
    rt, rq = np.zeros(B, np.int64), np.zeros(B, np.int64)
    for _, r in df.iterrows():
        for g in r["text"].lower().split() + [
                f"{a} {b}" for a, b in zip(r["text"].lower().split(),
                                           r["text"].lower().split()[1:])]:
            b = _ref_bucket(g)
            rq[b] += 1
            if r["is_target"]:
                rt[b] += 1
    assert np.array_equal(t, rt) and np.array_equal(q, rq)

    lr = dsir_log_ratio(t, q)
    tt, qt = int(rt.sum()) + B, int(rq.sum()) + B
    want_lr = np.array([np.log(float((rt[b] + 1) * qt)
                               / float((rq[b] + 1) * tt))
                        for b in range(B)])
    assert np.array_equal(lr, want_lr)  # bit-identical, not just close

    got = (dsir_scores(ds, lr, SALT).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    for _, r in df.iterrows():
        gs = doc_grams(r["text"])
        want = round(float(sum(
            c * lr[b] for b, c in
            pd.Series([_ref_bucket(g) for g in gs]).value_counts()
            .sort_index().items())), 6)
        assert abs(got.loc[got["doc_id"] == r["doc_id"], "score"].iloc[0]
                   - want) < 2e-6


def test_select_prefers_target_like_docs(ray_session):
    df = _mk_corpus()
    ds = rd.from_pandas(df).repartition(4)
    top = dsir_select(ds, "is_target", k=20, salt=SALT, n_buckets=B)
    assert len(top) == 20
    kinds = top["doc_id"].to_numpy() % 3
    assert (kinds != 2).all()  # no off-target doc outranks target-like ones
    # deterministic under a different partitioning
    top2 = dsir_select(rd.from_pandas(df).repartition(9), "is_target",
                       k=20, salt=SALT, n_buckets=B)
    pd.testing.assert_frame_equal(top.reset_index(drop=True),
                                  top2.reset_index(drop=True))


def test_empty_and_degenerate_docs(ray_session):
    df = pd.DataFrame({"doc_id": [0, 1, 2, 3],
                       "text": ["", "...", "alpha", "delta"],
                       "is_target": [False, False, True, False]})
    ds = rd.from_pandas(df)
    t, q = paired_bucket_counts(ds, SALT, B, "text", "is_target")
    got = dsir_scores(ds, dsir_log_ratio(t, q), SALT).to_pandas()
    z = got.set_index("doc_id")["score"]
    assert z.loc[0] == 0.0 and z.loc[1] == 0.0  # gram-free docs score 0
    assert z.loc[2] > 0.0  # target-vocabulary gram scores positive
    assert z.loc[3] < 0.0  # raw-only gram scores negative
