"""Shared helpers for sink-style operators that round-trip through a
content-addressed scratch directory.

Write-iff-absent (``mode('ignore')``) checks only path EXISTENCE, not
write completion: an interrupted first write would poison every later
run with a stable wrong answer. ``prepare_scratch_dir`` therefore
removes a leftover dir that lacks Spark's ``_SUCCESS`` marker before
the operator writes. (Streaming file sinks are different: their
``_spark_metadata`` manifest lists only committed files and the
checkpoint resumes an interrupted run, so they are crash-safe without
this.)
"""

from __future__ import annotations

import hashlib
import os
import shutil

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH_DIR = os.path.join(REPO_ROOT, ".scratch")


def content_tag(src_path: str) -> str:
    """Cheap data-vintage fingerprint of a source file (path + size +
    mtime): regenerated testdata gets a fresh scratch dir instead of
    silently reading back a stale write."""
    stat = os.stat(src_path)
    return hashlib.md5(
        f"{src_path}:{stat.st_size}:{stat.st_mtime_ns}".encode()
    ).hexdigest()[:12]


def prepare_scratch_dir(prefix: str, src_path: str) -> tuple[str, bool]:
    """Content-addressed scratch dir for a batch sink; removes an
    incomplete (no ``_SUCCESS``) leftover from an interrupted write so
    ``mode('ignore')`` semantics stay correct. Returns
    ``(out_dir, reused)``."""
    out_dir = os.path.join(SCRATCH_DIR, f"{prefix}_{content_tag(src_path)}")
    if os.path.isdir(out_dir) and not os.path.exists(
        os.path.join(out_dir, "_SUCCESS")
    ):
        shutil.rmtree(out_dir)
    # reused=True iff a prior COMPLETED write survives — i.e.
    # mode('ignore') will skip writing and the query will read data
    # this run did not produce. That is the only stale-content risk
    # path, so callers gate the (count-job-costing) read-back
    # integrity check on it: a fresh write this run is
    # trusted-complete. Returned from here (not probed by callers
    # after the fact) because probing _SUCCESS after the write always
    # says True.
    reused = os.path.exists(os.path.join(out_dir, "_SUCCESS"))
    return out_dir, reused


def assert_readback_complete(src, back, label: str) -> None:
    """Loud integrity gate between a reused scratch sink and its
    read-back: raises if the round-tripped row count differs from the
    source. A stale or partial scratch directory otherwise surfaces
    only as a silent value-hash mismatch at the driver (the failure
    class content-addressing defends against but cannot prove
    absent); this converts it into a named error at the query itself.
    Call only when scratch_is_reused() — a fresh write needs no
    proof, and skipping keeps the two count jobs off the write
    path."""
    n_src, n_back = src.count(), back.count()
    if n_src != n_back:
        raise RuntimeError(
            f"{label}: scratch read-back has {n_back} rows but source has "
            f"{n_src} — stale or partial sink output; delete the scratch "
            "dir and rerun"
        )
