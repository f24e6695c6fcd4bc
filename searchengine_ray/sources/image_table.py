"""Deterministic image+caption corpus table in the BASELINE.json
input_hint shape.

Columns exactly ``(image_id: string, bytes: binary, w: int32, h: int32,
fmt: string, caption: string, phash: int64)``.  Persisted as parquet —
the input hint names Lance, which does not ship in this environment; the
format seam is the same one ``sources/storage.py`` documents, and the
schema is byte-for-byte the hinted one.

The rows derive from the synthetic crawl universe
(``sources/fixtures.make_store``) so corpus-level image queries exercise
the same planted ground truth the crawl's content gate is
conformance-tested on: exact image duplicates (phash hamming 0), lossy
near-duplicates (hamming ≤ 4 after ±2 pixel noise), caption 3-gram
near-dups, and a realistic host/format mix.  Everything is a pure
function of (n_images, seed) — no wall clock, no global RNG — and the
canonical corpus lives at ONE path so the Ray pipeline and the DuckDB
oracle (whose SQL embeds the path) read the same file at every test
scale; ``bench.py`` sizes a separate, larger corpus via ``n_images``.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

N_CANONICAL = 600
SEED = 20240817
# bump when the generator (make_store planting logic / schema) changes:
# the token is baked into the canonical filename so a stale corpus from an
# older code revision can never silently feed the pipeline or the oracle
GEN_VERSION = 1
CANONICAL_PATH = (f"/tmp/graft_image_table/"
                  f"images_v{GEN_VERSION}_n{N_CANONICAL}_s{SEED}.parquet")


def build_image_table(n_images: int, seed: int = SEED) -> pa.Table:
    """Materialize the deterministic corpus as one Arrow table.

    ``image_id`` is the page URL (stable, sorted); near-dup planting
    fractions are make_store defaults (6% image near-dups incl. exact
    dups, 8% caption near-dups)."""
    from searchengine_ray.sources.fixtures import make_store

    store = make_store(n_pages=n_images, n_hosts=8, seed=seed,
                       img_min=24, img_max=64)
    recs = [store.pages[k] for k in sorted(store.pages)]
    return pa.table({
        "image_id": pa.array([r["url"] for r in recs], pa.string()),
        "bytes": pa.array([r["bytes"] for r in recs], pa.binary()),
        "w": pa.array([r["w"] for r in recs], pa.int32()),
        "h": pa.array([r["h"] for r in recs], pa.int32()),
        "fmt": pa.array([r["fmt"] for r in recs], pa.string()),
        "caption": pa.array([r["caption"] for r in recs], pa.string()),
        "phash": pa.array([r["phash"] for r in recs], pa.int64()),
    })


GOLDEN_PATH = (f"/tmp/graft_image_table/"
               f"golden_v{GEN_VERSION}_n{N_CANONICAL}_s{SEED}.parquet")


def build_golden_table(n_images: int, seed: int = SEED) -> pa.Table:
    """Generator GROUND TRUTH for the per-row invariant gate
    (BASELINE.json input_hint: decoded-pixel allclose / PSNR≥40dB for
    lossy + caption equality): the ORIGINAL pixel arrays the generator
    encoded, before any codec touched them.  Same (n, seed, params) as
    ``build_image_table`` so rows align 1:1 with the corpus file."""
    from searchengine_ray.sources.fixtures import make_store

    store = make_store(n_pages=n_images, n_hosts=8, seed=seed,
                       img_min=24, img_max=64)
    keys = sorted(store.pages)
    recs = [store.pages[k] for k in keys]
    return pa.table({
        "image_id": pa.array([r["url"] for r in recs], pa.string()),
        "w": pa.array([r["w"] for r in recs], pa.int32()),
        "h": pa.array([r["h"] for r in recs], pa.int32()),
        "fmt": pa.array([r["fmt"] for r in recs], pa.string()),
        "caption": pa.array([r["caption"] for r in recs], pa.string()),
        # raw uint8 h×w×3 row-major — the pre-encode pixels
        "pixels": pa.array([store.originals[k].tobytes() for k in keys],
                           pa.binary()),
    })


def ensure_golden_table(path: str = GOLDEN_PATH,
                        n_images: int = N_CANONICAL) -> str:
    """Idempotent, atomic — see ``ensure_image_table``."""
    if os.path.exists(path) and pq.read_metadata(path).num_rows == n_images:
        return path
    tbl = build_golden_table(n_images)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path


def ensure_image_table(path: str = CANONICAL_PATH,
                       n_images: int = N_CANONICAL) -> str:
    """Idempotently materialize the corpus at ``path`` and return it.
    Atomic (tmp + rename) so concurrent callers (Ray query + DuckDB
    oracle) can race safely."""
    if os.path.exists(path):
        # the canonical filename carries (version, n, seed); for explicit
        # paths (e.g. bench corpora) validate row count so a stale file from
        # a different size request is rebuilt, not silently reused
        if pq.read_metadata(path).num_rows == n_images:
            return path
    tbl = build_image_table(n_images)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path
