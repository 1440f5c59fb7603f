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


def cached_checkpoint_dir(url_or_path: str) -> str:
    """Resolve a URL-or-path to a LOCAL checkpoint *directory* — the
    resume-from-URL capability of the reference's ``_load_checkpoint``
    (``utils/trainer.py:232-254``, LAVIS ``download_cached_file``).

    The reference's checkpoints are single ``.pth`` files; here they are
    Orbax directories, so a URL must point at a tar/zip archive of one.
    The archive is downloaded once (``cached_path``), extracted once,
    and the checkpoint directory inside is returned — with any
    ``.meta.json`` step-position sidecar landing next to it, so
    mid-epoch resume works from a URL too.  A local directory path
    passes straight through.
    """
    if not is_url(url_or_path) and os.path.isdir(url_or_path):
        return url_or_path
    local = cached_path(url_or_path)
    if os.path.isdir(local):
        return local

    import shutil
    import tarfile
    import zipfile

    dest = local + ".extracted"
    if not os.path.isdir(dest):
        tmp = dest + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        if tarfile.is_tarfile(local):
            with tarfile.open(local) as tf:
                tf.extractall(tmp, filter="data")
        elif zipfile.is_zipfile(local):
            with zipfile.ZipFile(local) as zf:
                zf.extractall(tmp)
        else:
            raise ValueError(
                f"{url_or_path}: expected an Orbax checkpoint directory "
                "or a tar/zip archive of one"
            )
        os.replace(tmp, dest)
    # Archive of the directory itself (one top-level dir, possibly with
    # its .meta.json sidecar alongside) -> return that dir; archive of
    # the directory's CONTENTS -> return the extraction root.
    dirs = [e for e in os.listdir(dest) if os.path.isdir(os.path.join(dest, e))]
    top_files = [e for e in os.listdir(dest)
                 if not os.path.isdir(os.path.join(dest, e))
                 and not e.endswith(".meta.json")]
    if len(dirs) == 1 and not top_files:
        return os.path.join(dest, dirs[0])
    return dest
