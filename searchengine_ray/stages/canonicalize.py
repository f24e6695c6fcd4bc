"""URL canonicalize/hash/host batch stage (reference M6-M8:
link_similarity.py:15-26, utils/__init__.py:25-35).

Arrow in / Arrow out.  ``urlparse`` has no Arrow kernel, so the body loops
over ONE string column of the batch and builds new columns with numpy/Arrow —
the payload columns are never touched (zero-copy append).  This is the
canonical shape for a per-URL scalar op at 10^10-frontier scale: ~1 µs/URL,
embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

from hashlib import sha256
from urllib.parse import urlparse

import pyarrow as pa

from searchengine_ray.utils.urls import is_valid as _is_valid


def canonicalize_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Append ``url_norm`` (one trailing slash stripped), ``url_hash``
    (scheme-less sha256 hex — the dedup + partition identity) and ``host``."""
    urls = batch[url_col].to_pylist()
    norms, hashes, hosts = [], [], []
    for u in urls:
        if u is None:
            norms.append(None)
            hashes.append(None)
            hosts.append(None)
            continue
        nu = u.rstrip("/") if u.endswith("/") else u
        p = urlparse(nu)
        norms.append(nu)
        hashes.append(
            sha256(
                f"{p.netloc}/{p.path}/{p.params}/{p.query}/{p.fragment}".encode()
            ).hexdigest()
        )
        hosts.append(p.hostname or "")
    return (
        batch.append_column("url_norm", pa.array(norms, pa.string()))
        .append_column("url_hash", pa.array(hashes, pa.string()))
        .append_column("host", pa.array(hosts, pa.string()))
    )


def validity_mask_batch(
    batch: pa.Table,
    url_col: str = "url",
    allowed_domains: tuple[str, ...] | None = None,
) -> pa.Table:
    """Filter rows whose URL fails ``is_valid`` (reference M9 —
    README.md:113-114,209-213)."""
    urls = batch[url_col].to_pylist()
    mask = pa.array([u is not None and _is_valid(u, allowed_domains) for u in urls])
    return batch.filter(mask)
