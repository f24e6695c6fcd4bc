"""Caption-image alignment gate: planted-swap ground truth semantics."""

import numpy as np
import pyarrow.parquet as pq


def test_caption_alignment_planted_semantics(ray_session):
    from searchengine_ray.pipelines.queries import q_caption_alignment
    from searchengine_ray.sources.image_table import (ensure_golden_table,
                                                      ensure_image_table)

    got = (q_caption_alignment("unused").to_pandas()
           .sort_values("image_id").reset_index(drop=True))

    corpus = pq.read_table(ensure_image_table(),
                           columns=["image_id", "fmt"]).to_pandas()
    gp = pq.read_table(ensure_golden_table(),
                       columns=["pixels", "w", "h"]).to_pandas()
    n = len(gp)
    assert len(got) == n
    # both tables are sorted by image_id — rows align positionally
    assert (got["image_id"].to_numpy() == corpus["image_id"].to_numpy()).all()
    claims = np.empty((n, 3), np.int64)
    for i, (pxb, w, h) in enumerate(zip(gp["pixels"], gp["w"], gp["h"])):
        arr = np.frombuffer(pxb, np.uint8).reshape(int(h), int(w), 3)
        claims[i] = arr.reshape(-1, 3).mean(axis=0).astype(np.int64) // 32
    idx = np.arange(n)
    planted = idx % 10 == 7
    src = np.where(planted, (idx + 1) % n, idx)
    claim_differs = (claims[src] != claims[idx]).any(axis=1)
    aligned = got["aligned"].to_numpy()

    # every planted row whose neighbor's palette actually differs must be
    # caught (the LAION-filter recall contract)
    assert not aligned[planted & claim_differs].any()
    assert (planted & claim_differs).sum() >= n // 20  # the plant is real
    # unplanted lossless rows decode to the exact golden pixels → the
    # claim must verify (no false positives on the clean side)
    clean_png = (~planted) & (corpus["fmt"].to_numpy() == "png")
    assert aligned[clean_png].all()
    # unplanted lossy rows may flip a boundary bucket, but only rarely —
    # the gate would be useless if codec noise dominated the verdict
    clean_jpeg = (~planted) & (corpus["fmt"].to_numpy() == "jpeg")
    assert aligned[clean_jpeg].mean() > 0.8
