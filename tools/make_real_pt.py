#!/usr/bin/env python
"""Generate fixtures/pt_real/*.pt — REAL torch.save-format archives
(zipfile serialization, the default since torch 1.6), written without
torch by emitting the format directly:

    <scene_id>/data.pkl   pickle: torch._utils._rebuild_tensor_v2 call
                          over a persistent-id'd torch.FloatStorage
    <scene_id>/data/0     raw little-endian float32 storage bytes
    <scene_id>/version    '3'
    <scene_id>/byteorder  'little'

Tensor content mirrors tools/make_pt_blobs.py: the on-disk
(bands, stations, 7, 7) layout the reference permutes at load
(reference data_loader.py:131-132), derived from
scene_patches.parquet so scene_pixels.parquet is an exact oracle.
float32 storage (like real model/data dumps) holding integral DN
values, so the post-load .astype(int) is lossless.

Only PROBE scenes (acquisition day '03') are generated — the registry
query reads every file in the dir, and ~10 files keep the committed
fixture small while covering both sensor families.

The writer stubs ``torch`` / ``torch._utils`` into sys.modules just
long enough for pickle to emit the proper GLOBAL records; nothing
torch-like executes. The reader (sources/torch_pt.py) is validated
against this format — and, being format-faithful, against genuine
torch.save output wherever torch exists.
"""

from __future__ import annotations

import os
import pickle
import sys
import types
import zipfile
from collections import OrderedDict

import numpy as np
import pyarrow.parquet as pq

ROOT = os.environ.get(
    "SPARK_GRAFT_FIXTURE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
    ),
)
PROBE_DAY = "03"


def _build_torch_stubs():
    """Stub modules carrying the globals pickle must reference. Built
    eagerly; installed into sys.modules ONLY while dumping (see
    _stubs_in_sys_modules) — a process-wide stub `torch` would break
    every `import torch` feature probe elsewhere (e.g. the ingest
    decoder's torch.load fast-path)."""
    torch = types.ModuleType("torch")
    utils = types.ModuleType("torch._utils")

    def _rebuild_tensor_v2(*a, **k):  # writer-side stub, never called
        raise RuntimeError("writer-only stub")

    _rebuild_tensor_v2.__module__ = "torch._utils"
    _rebuild_tensor_v2.__qualname__ = "_rebuild_tensor_v2"
    utils._rebuild_tensor_v2 = _rebuild_tensor_v2

    storage_classes = {
        name: type(name, (), {"__module__": "torch"})
        for name in (
            "DoubleStorage",
            "FloatStorage",
            "HalfStorage",
            "LongStorage",
            "IntStorage",
            "ShortStorage",
            "CharStorage",
            "ByteStorage",
            "BoolStorage",
        )
    }
    for name, cls in storage_classes.items():
        setattr(torch, name, cls)
    torch._utils = utils
    return torch, utils, _rebuild_tensor_v2, storage_classes


_TORCH_MOD, _UTILS_MOD, _REBUILD, _STORAGE_CLASSES = _build_torch_stubs()


class _stubs_in_sys_modules:
    """Install the stub torch modules for the duration of a pickle
    dump, restoring sys.modules exactly afterwards. A present real
    torch is shadowed too: the pickler verifies GLOBAL refs resolve to
    the SAME objects it was handed, and it was handed the stubs."""

    _NAMES = ("torch", "torch._utils")

    def __enter__(self):
        self._saved = {n: sys.modules.get(n) for n in self._NAMES}
        sys.modules["torch"] = _TORCH_MOD
        sys.modules["torch._utils"] = _UTILS_MOD

    def __exit__(self, *exc):
        for name, mod in self._saved.items():
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod
        return False

# numpy dtype → torch storage class name (little-endian on disk, like
# torch.save on every commodity platform)
_DTYPE_TO_STORAGE = {
    "float64": "DoubleStorage",
    "float32": "FloatStorage",
    "float16": "HalfStorage",
    "int64": "LongStorage",
    "int32": "IntStorage",
    "int16": "ShortStorage",
    "int8": "CharStorage",
    "uint8": "ByteStorage",
    "bool": "BoolStorage",
}


class _Storage:
    """Placeholder serialized via the persistent-id protocol."""

    def __init__(self, key: str, numel: int, storage_name: str):
        self.key = key
        self.numel = numel
        self.storage_name = storage_name


class _Tensor:
    """Pickles as the exact record torch.save writes for a dense
    contiguous CPU tensor."""

    def __init__(self, arr: np.ndarray, storage: _Storage):
        self.arr = arr
        self.storage = storage

    def __reduce_ex__(self, protocol):
        elem_strides = tuple(s // self.arr.itemsize for s in self.arr.strides)
        return (
            _REBUILD,
            (self.storage, 0, self.arr.shape, elem_strides, False,
             OrderedDict()),
        )


class _PtPickler(pickle.Pickler):
    def persistent_id(self, obj):
        if isinstance(obj, _Storage):
            return (
                "storage",
                _STORAGE_CLASSES[obj.storage_name],
                obj.key,
                "cpu",
                obj.numel,
            )
        return None


def write_pt(path: str, arr: np.ndarray, root: str) -> None:
    """Write one dense tensor as a genuine torch.save zip archive.
    dtype-preserving across the standard numeric dtypes; data is
    little-endian on disk like torch's own output."""
    arr = np.asarray(arr)
    if not arr.flags["C_CONTIGUOUS"]:
        # copy(order="C"), not ascontiguousarray: the latter promotes
        # 0-dim scalars to 1-dim
        arr = arr.copy(order="C")
    storage_name = _DTYPE_TO_STORAGE[arr.dtype.name]
    if arr.dtype.byteorder == ">":
        arr = arr.astype(arr.dtype.newbyteorder("<"))
    storage = _Storage("0", arr.size, storage_name)
    import io

    buf = io.BytesIO()
    p = _PtPickler(buf, protocol=2)
    with _stubs_in_sys_modules():
        p.dump(_Tensor(arr, storage))

    def entry(name: str) -> zipfile.ZipInfo:
        # pinned timestamp → byte-reproducible archives across runs
        return zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0))

    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(entry(f"{root}/data.pkl"), buf.getvalue())
        zf.writestr(entry(f"{root}/data/0"), arr.tobytes())
        zf.writestr(entry(f"{root}/version"), "3")
        zf.writestr(entry(f"{root}/byteorder"), "little")


def main() -> None:
    out_dir = os.path.join(ROOT, "pt_real")
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        os.remove(os.path.join(out_dir, f))
    tbl = pq.read_table(os.path.join(ROOT, "scene_patches.parquet")).to_pylist()
    by_scene: dict[str, list] = {}
    for row in tbl:
        day = row["scene_id"].split("_")[3][6:8]
        if day != PROBE_DAY:
            continue
        by_scene.setdefault(row["scene_id"], []).append(row)
    for scene_id, rows in sorted(by_scene.items()):
        rows.sort(key=lambda r: r["station_pos"])
        stations = np.array([r["bands"] for r in rows], dtype=np.float32)
        disk = stations.transpose(1, 0, 2, 3)  # (bands, stations, 7, 7)
        write_pt(os.path.join(out_dir, f"{scene_id}.pt"), disk, scene_id)
        print(scene_id, disk.shape)


if __name__ == "__main__":
    main()
