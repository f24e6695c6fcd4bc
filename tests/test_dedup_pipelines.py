"""Distributed dedup / tfidf pipeline behavior beyond the SQL oracles:
planted near-dups must actually be DETECTED (the zero-rows oracle equality
on random fixtures is necessary but not sufficient), and the two
tfidf idf-attachment paths must agree."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _planted_embeddings(n=40, dim=32, seed=5):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim)
    # plant 3 near-dup pairs: tiny perturbations (cos > 0.99) — and one
    # EXACT duplicate
    planted = [(0, n), (7, n + 1), (13, n + 2)]
    extra = [vecs[0] + rng.randn(dim) * 0.02,
             vecs[7] + rng.randn(dim) * 0.02,
             vecs[13].copy()]
    allv = np.vstack([vecs, np.stack(extra)])
    return allv, planted


def _brute_pairs(vecs, threshold):
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    ia, ib = np.triu_indices(len(vecs), k=1)
    keep = sims[ia, ib] >= threshold
    return sorted(zip(ia[keep].tolist(), ib[keep].tolist()))


def test_embedding_neardup_detects_planted(ray_session):
    from searchengine_ray.stages.dedup import embedding_neardup_pairs

    vecs, planted = _planted_embeddings()
    want = _brute_pairs(vecs, 0.95)
    assert len(want) >= 3  # the plants are actually above threshold

    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": [v.tolist() for v in vecs],
    })).repartition(4)
    out = embedding_neardup_pairs(ds, threshold=0.95).to_pandas()
    got = sorted(zip(out["doc_a"].astype(int), out["doc_b"].astype(int)))
    assert got == want
    # exact duplicate reports cosine 1.0
    exact = out[(out["doc_a"] == 13) & (out["doc_b"] == len(vecs) - 1)]
    assert len(exact) == 1 and float(exact["cosine"].iloc[0]) == pytest.approx(1.0)


def test_minhash_verify_detects_planted(ray_session):
    from searchengine_ray.stages.dedup import (
        minhash_lsh_candidates,
        verify_jaccard_pairs,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon ") * 3
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [base,
                 base + "phi chi psi",              # near-dup of 0
                 base.replace("alpha", "ALPHA2"),   # near-dup of 0
                 "completely different words here now",
                 "another unrelated document text body",
                 base],                             # exact dup of 0
    })
    ds = rd.from_pandas(docs).repartition(3)
    out = verify_jaccard_pairs(
        ds, minhash_lsh_candidates(ds, dedup=False), threshold=0.65
    ).to_pandas()
    got = set(zip(out["doc_a"].astype(int), out["doc_b"].astype(int)))
    assert (0, 5) in got          # exact dup
    assert (0, 1) in got and (0, 2) in got
    assert not any(3 in p or 4 in p for p in got)
    j05 = float(out[(out["doc_a"] == 0) & (out["doc_b"] == 5)]["jaccard"].iloc[0])
    assert j05 == pytest.approx(1.0)


def test_simhash_pairs_match_brute_force(ray_session):
    """Pair-level oracle for the simhash family: the banded pipeline's pair
    set must EQUAL the all-pairs numpy hamming64 scan over the same simhash
    values (pigeonhole banding promises exact recall; this is the gate)."""
    from searchengine_ray.functions.phash import hamming64_pairs
    from searchengine_ray.stages.dedup import add_simhash, simhash_neardup_pairs

    base = ("the quick brown fox jumps over the lazy dog while seven "
            "wizards brew strong potions beside the ancient oak tree ") * 4
    texts = [base,
             base + "extra trailing words",           # near-dup of 0
             base.replace("quick", "rapid"),          # near-dup of 0
             base.replace("fox", "wolf").replace("dog", "cat"),
             "completely unrelated content about ray data pipelines",
             "another different document body with other words entirely",
             base]                                    # exact dup of 0
    # pad with random-word docs so the brute force scans a real corpus
    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(200)]
    texts += [" ".join(rng.choice(vocab, size=60)) for _ in range(40)]
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                         "text": texts})
    ds = rd.from_pandas(docs).repartition(4)

    max_ham = 3
    hashed = add_simhash(ds).to_pandas().sort_values("doc_id")
    sh = hashed["simhash"].to_numpy(dtype=np.int64)
    ia, ib = np.triu_indices(len(sh), k=1)
    close = hamming64_pairs(sh[ia], sh[ib]) <= max_ham
    want = sorted(zip(ia[close].tolist(), ib[close].tolist()))
    assert (0, 6) in want and len(want) >= 2  # plants are genuinely close

    out = simhash_neardup_pairs(ds, max_hamming=max_ham).to_pandas()
    got = sorted(zip(out["doc_a"].astype(int), out["doc_b"].astype(int)))
    assert got == want
    # the emitted hamming values must match the brute-force distances too
    brute_ham = dict(zip(zip(ia[close].tolist(), ib[close].tolist()),
                         hamming64_pairs(sh[ia], sh[ib])[close].tolist()))
    for a, b, h in zip(out["doc_a"].astype(int), out["doc_b"].astype(int),
                       out["hamming"].astype(int)):
        assert brute_ham[(a, b)] == h


def test_tfidf_join_path_matches_broadcast(ray_session):
    from searchengine_ray.stages.text import tfidf_postings

    sf = "/root/testdata/sf0.001"
    a = tfidf_postings(
        rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"]),
        mode="simple").to_pandas()
    b = tfidf_postings(
        rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"]),
        mode="simple", broadcast_vocab_limit=0).to_pandas()  # force hash_join
    key = ["doc_id", "token"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True)[a.columns])


def test_containment_catches_inclusion_jaccard_misses(ray_session):
    """A short doc fully quoted inside a much longer one: containment ≈ 1,
    jaccard ≈ |A|/|B| ≪ threshold — the asymmetric case the operator
    exists for.  Also cross-checks values against a set-arithmetic
    oracle."""
    from searchengine_ray.functions.ngrams import shingle_hashes
    from searchengine_ray.stages.dedup import (
        ngram_containment_pairs, ngram_jaccard_pairs)
    from searchengine_ray.stages.text import simple_tokens

    short = "alpha beta gamma delta epsilon zeta eta theta iota"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    long_doc = short + " " + filler
    other = "one two three four five six seven eight nine ten"
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": [short, long_doc, other]})
    ds = rd.from_pandas(df).repartition(2)

    con = ngram_containment_pairs(ds, threshold=0.8).to_pandas()
    jac = ngram_jaccard_pairs(ds, threshold=0.8).to_pandas()
    assert set(zip(con["doc_a"], con["doc_b"])) == {(1, 2)}
    assert len(jac) == 0  # jaccard at the same threshold misses it

    a = shingle_hashes(simple_tokens(short), 3)
    b = shingle_hashes(simple_tokens(long_doc), 3)
    want = round(len(a & b) / min(len(a), len(b)), 6)
    assert con["containment"].iloc[0] == want


def test_fingerprint_overlap_detects_shifted_copy(ray_session):
    """Winnowing copy detection: a verbatim passage pasted at a DIFFERENT
    byte offset inside another doc must still match (content-defined
    sampling is shift-tolerant), unrelated docs must not.  Values are
    cross-checked against a per-doc set-arithmetic oracle."""
    from searchengine_ray.functions.textstats import rolling_fingerprint
    from searchengine_ray.stages.dedup import fingerprint_overlap_pairs

    passage = ("the training corpus deduplication pass removes verbatim "
               "copies wherever they appear in the stream " * 4)
    doc_a = "intro words. " + passage + " closing remarks."
    doc_b = ("a completely different and much longer preamble comes "
             "first here, then the copied part: " + passage)
    other = " ".join(f"unrelated token {i} noise" for i in range(60))
    df = pd.DataFrame({"doc_id": [10, 20, 30],
                       "text": [doc_a, doc_b, other]})
    ds = rd.from_pandas(df).repartition(2)

    out = fingerprint_overlap_pairs(ds, min_shared=4).to_pandas()
    assert set(zip(out["doc_a"], out["doc_b"])) == {(10, 20)}

    fa = set(rolling_fingerprint(doc_a))
    fb = set(rolling_fingerprint(doc_b))
    shared = len(fa & fb)
    row = out.iloc[0]
    assert row["shared"] == shared
    assert row["overlap"] == round(shared / min(len(fa), len(fb)), 6)


def test_snapshot_diff_planted(ray_session):
    import numpy as np
    import ray.data as rd

    from searchengine_ray.stages.dedup import snapshot_diff

    old = pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64),
                        "text": [f"doc {i}" for i in range(6)]})
    new = pd.DataFrame({
        "doc_id": np.array([0, 1, 2, 4, 5, 99], dtype=np.int64),
        "text": ["doc 0", "doc 1 EDITED", "doc 2", "doc 4 EDITED",
                 "doc 5", "brand new"]})
    out = (snapshot_diff(rd.from_pandas(old).repartition(2),
                         rd.from_pandas(new).repartition(3))
           .to_pandas().set_index("doc_id")["status"].to_dict())
    assert out == {1: "changed", 3: "removed", 4: "changed", 99: "added"}


def test_snapshot_diff_identical_is_empty(ray_session):
    import numpy as np
    import ray.data as rd

    from searchengine_ray.stages.dedup import snapshot_diff

    df = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64),
                       "text": [f"d{i}" for i in range(10)]})
    out = snapshot_diff(rd.from_pandas(df), rd.from_pandas(df)).to_pandas()
    assert len(out) == 0


def test_incremental_neardup_equals_full_recompute(ray_session, tmp_path):
    """The persisted-band-store increment path must find EXACTLY the
    delta-involved pairs a full recompute finds (same threshold, same
    deterministic coefficients) — including delta-delta pairs and
    delta-vs-base pairs, and nothing base-base."""
    import numpy as np
    import ray.data as rd

    from searchengine_ray.stages.dedup import (
        build_band_store, incremental_neardup_pairs,
        minhash_lsh_candidates, verify_jaccard_pairs)

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(300)]

    def doc(k=40):
        return " ".join(rng.choice(vocab, k))

    base_rows = [(i, doc()) for i in range(0, 60, 2)]          # even ids
    base_map = dict(base_rows)
    delta_rows = []
    for j, i in enumerate(range(1, 40, 2)):                    # odd ids
        if j % 3 == 0:  # near-dup of a base doc: copy + tiny tail edit
            src = base_rows[j][1]
            delta_rows.append((i, src + " extra"))
        elif j % 3 == 1:  # exact dup of another delta doc
            delta_rows.append((i, delta_rows[-1][1] if delta_rows
                               else doc()))
        else:
            delta_rows.append((i, doc()))
    base = rd.from_pandas(pd.DataFrame(base_rows,
                                       columns=["doc_id", "text"]))
    base = base.repartition(3)
    delta = rd.from_pandas(pd.DataFrame(delta_rows,
                                        columns=["doc_id", "text"]))
    delta = delta.repartition(2)

    store = str(tmp_path / "bands")
    build_band_store(base, store)
    inc = incremental_neardup_pairs(store, base, delta,
                                    threshold=0.65).to_pandas()

    union = base.union(delta)
    full = verify_jaccard_pairs(
        union, minhash_lsh_candidates(union, dedup=False),
        threshold=0.65).to_pandas()
    delta_ids = {i for i, _ in delta_rows}
    full = full[full["doc_a"].isin(delta_ids)
                | full["doc_b"].isin(delta_ids)]

    key = ["doc_a", "doc_b"]
    inc_s = inc.sort_values(key, ignore_index=True)
    full_s = full.sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(inc_s, full_s)
    assert len(inc_s) >= 5  # the planted dups actually exercised the path
    # nothing base-base leaked through
    assert (inc_s["doc_a"].isin(delta_ids)
            | inc_s["doc_b"].isin(delta_ids)).all()


def _brute_jaccard_pairs(texts, threshold, shingle_n=3, round_to=6):
    """Exact all-pairs shingle-set jaccard over the SAME hash/tokenize
    pipeline the engine uses — the PPJoin correctness oracle."""
    from searchengine_ray.functions.ngrams import shingle_hashes
    from searchengine_ray.stages.text import simple_tokens

    sets = [shingle_hashes(simple_tokens(t or ""), shingle_n) for t in texts]
    want = {}
    for a in range(len(sets)):
        for b in range(a + 1, len(sets)):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union > threshold:
                want[(a, b)] = round(inter / union, round_to)
    return want


def _ppjoin_corpus():
    """Corpus that stresses every PPJoin pruning bound: planted near/exact
    dups, a HOT stop-phrase shared by every doc (the shape the df-cap path
    drops — prefix filtering must stay exact through it), and hot-only
    docs whose overlap lives entirely in frequent shingles."""
    rng = np.random.RandomState(23)
    vocab = [f"tok{i}" for i in range(300)]
    hot = "common header phrase every document repeats verbatim always "
    base = hot + " ".join(rng.choice(vocab, size=50))
    texts = [base,
             base + " tiny tail edit",                  # near-dup of 0
             base.replace("tok", "TOK", 3),             # near-dup of 0
             base,                                      # exact dup of 0
             hot * 4,                                   # hot-only doc
             hot * 4 + "one extra word here",           # near-dup of 4
             ]
    texts += [hot + " ".join(rng.choice(vocab, size=40))
              for _ in range(40)]
    return texts


def test_ppjoin_matches_brute_force(ray_session):
    from searchengine_ray.stages.dedup import ppjoin_jaccard_pairs

    texts = _ppjoin_corpus()
    want = _brute_jaccard_pairs(texts, 0.65)
    assert (0, 3) in want and (0, 1) in want and (4, 5) in want
    assert len(want) >= 4

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts})).repartition(4)
    out = ppjoin_jaccard_pairs(ds, threshold=0.65).to_pandas()
    got = {(int(a), int(b)): float(j)
           for a, b, j in zip(out["doc_a"], out["doc_b"], out["jaccard"])}
    assert got == pytest.approx(want)


def test_ppjoin_integer_threshold_boundary(ray_session):
    """threshold=0.5 with even shingle counts makes t*n land EXACTLY on an
    integer — the eps guard in the prefix-length floor must err LONG (keep
    the pair) and the strict J>t comparison must still exclude J==t."""
    from searchengine_ray.stages.dedup import ppjoin_jaccard_pairs

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(120)]
    texts = [" ".join(rng.choice(vocab, size=n))
             for n in (18, 18, 20, 22, 34, 34)]
    texts += [texts[0] + " zz yy",            # near-dup of 0
              texts[4],                        # exact dup of 4
              " ".join(texts[2].split()[:12])]  # prefix-subset of 2
    want = _brute_jaccard_pairs(texts, 0.5)
    assert len(want) >= 2

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts})).repartition(3)
    out = ppjoin_jaccard_pairs(ds, threshold=0.5).to_pandas()
    got = {(int(a), int(b)): float(j)
           for a, b, j in zip(out["doc_a"], out["doc_b"], out["jaccard"])}
    assert got == pytest.approx(want)
