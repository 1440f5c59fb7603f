"""Checkpoint fetch-and-cache.

The capability LAVIS ``download_cached_file``/``is_url`` provide to the
reference (``models/xinstructblip.py:629-653``, ``utils/trainer.py:
236-240``): resolve a URL-or-path to a local file, downloading into a
shared cache exactly once across processes.
"""

from __future__ import annotations

import hashlib
import os
import re
import urllib.request

_URL_RE = re.compile(r"^https?://", re.IGNORECASE)


def is_url(url_or_path: str) -> bool:
    return bool(_URL_RE.match(url_or_path))


def cache_dir() -> str:
    root = os.environ.get(
        "MRAUDIO_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "mraudio_tpu")
    )
    os.makedirs(root, exist_ok=True)
    return root


def cached_path(url_or_path: str, progress: bool = False) -> str:
    """Return a local path for ``url_or_path``; download-and-cache URLs.

    Only rank/process 0 should call this with a URL in multi-host runs
    (mirror of the reference's rank-0 download + barrier pattern).
    """
    if not is_url(url_or_path):
        if not os.path.exists(url_or_path):
            raise FileNotFoundError(url_or_path)
        return url_or_path

    name = hashlib.sha1(url_or_path.encode()).hexdigest()[:16]
    base = os.path.basename(url_or_path.split("?")[0]) or "checkpoint"
    target = os.path.join(cache_dir(), f"{name}-{base}")
    if os.path.exists(target):
        return target

    tmp = target + ".tmp"
    urllib.request.urlretrieve(url_or_path, tmp)  # noqa: S310
    os.replace(tmp, target)
    return target
