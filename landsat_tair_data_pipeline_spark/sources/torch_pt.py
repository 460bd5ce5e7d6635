"""Torch-free reader for PyTorch's zipfile serialization format.

``torch.save`` (default since torch 1.6) writes a ZIP archive:

    <root>/data.pkl     pickle stream; tensors are pickled as a call of
                        ``torch._utils._rebuild_tensor_v2(storage, ...)``
                        where each storage is externalized through the
                        pickle *persistent id* protocol as a tuple
                        ``('storage', <StorageClass>, key, location, numel)``
    <root>/data/<key>   the raw little-endian storage bytes
    <root>/version      format version
    <root>/byteorder    'little' (newer versions; optional)

Everything above is public format knowledge (the torch.serialization
source and the many independent loaders of it). This module decodes
dense CPU tensors to numpy WITHOUT importing torch, which is exactly
what the reference's ``torch.load(...).permute(1, 0, 2, 3)`` ingest
(reference data_loader.py:131-132) needs on executors whose image does
not ship torch: the engine's .pt ingest path stays runnable anywhere.

Security: ``find_class`` is an allow-list — only the tensor-rebuild
helpers, storage type markers, and containers needed to express plain
(possibly nested) tensor payloads unpickle; any other global raises.
That is MORE restrictive than ``torch.load`` with weights_only=True.

Scope: dense little-endian CPU tensors (any of the standard numeric
dtypes). Sparse/quantized layouts and the pre-1.6 non-zip stream raise
``UnsupportedPtError`` with the reason named.
"""

from __future__ import annotations

import io
import math
import pickle
import zipfile
from collections import OrderedDict

import numpy as np


class UnsupportedPtError(ValueError):
    """Raised for .pt payloads outside the dense-CPU-tensor scope."""


_STORAGE_DTYPES: dict[str, np.dtype] = {
    "DoubleStorage": np.dtype("<f8"),
    "FloatStorage": np.dtype("<f4"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("?"),
    # NOTE: torch.UntypedStorage is deliberately ABSENT — untyped
    # storages carry raw bytes with the dtype applied elsewhere, and
    # decoding them as u1 would produce wrong-valued tensors with a
    # plausible shape (silent corruption). Out of scope → loud error.
}


class _StorageType:
    """Marker returned by find_class for ``torch.<X>Storage`` globals."""

    def __init__(self, name: str):
        self.name = name
        self.dtype = _STORAGE_DTYPES[name]

    def __call__(self, *a, **k):  # never constructed in valid streams
        raise UnsupportedPtError(f"direct construction of torch.{self.name}")


def _rebuild_tensor_v2(
    storage: np.ndarray,
    storage_offset: int,
    size: tuple,
    stride: tuple,
    requires_grad: bool = False,
    backward_hooks=None,
    metadata=None,
) -> np.ndarray:
    """numpy equivalent of torch._utils._rebuild_tensor_v2 for dense
    tensors: strided view over the flat storage, copied out so the
    result owns its memory."""
    shape = tuple(int(d) for d in size)
    strides_elems = tuple(int(s) for s in stride)
    offset = int(storage_offset)
    if len(shape) != len(strides_elems) or offset < 0 or any(d < 0 for d in shape):
        raise UnsupportedPtError(
            f"malformed tensor geometry: shape={shape} strides={strides_elems} "
            f"offset={offset}"
        )
    # Bound the strided view against the storage BEFORE building it:
    # pickle-supplied geometry is attacker-controlled, and as_strided
    # reads whatever the arithmetic reaches (out-of-bounds memory on a
    # crafted archive). Max reachable flat index = offset + sum over
    # dims of (dim-1)*stride for positive strides (negative strides
    # reach below offset, also rejected — torch.save never emits them
    # for dense CPU tensors).
    if any(s < 0 for s in strides_elems):
        raise UnsupportedPtError(f"negative strides {strides_elems}")
    max_index = offset + sum(
        (d - 1) * s for d, s in zip(shape, strides_elems) if d > 0
    )
    # math.prod, not np.prod: numpy accumulates in int64 and WRAPS on
    # crafted shapes (e.g. (2^32, 2^32) → 0), which would skip the
    # bounds check below
    n_elems = math.prod(shape)
    if n_elems > 0 and max_index >= storage.size:
        raise UnsupportedPtError(
            f"tensor geometry reaches element {max_index} but storage has "
            f"only {storage.size} elements"
        )
    itemsize = storage.dtype.itemsize
    byte_strides = tuple(s * itemsize for s in strides_elems)
    base = storage[offset:]
    view = np.lib.stride_tricks.as_strided(
        base, shape=shape, strides=byte_strides
    )
    return np.array(view)  # materialize: decouple from the mmap'd buffer


def _rebuild_tensor(storage, storage_offset, size, stride):
    return _rebuild_tensor_v2(storage, storage_offset, size, stride)


_ALLOWED_REBUILDS = {
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
}

_ALLOWED_CONTAINERS = {
    ("collections", "OrderedDict"): OrderedDict,
    ("builtins", "list"): list,
    ("builtins", "dict"): dict,
    ("builtins", "tuple"): tuple,
    ("builtins", "set"): set,
}


class _PtUnpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix

    def find_class(self, module: str, name: str):
        if (module, name) in _ALLOWED_REBUILDS:
            return _ALLOWED_REBUILDS[(module, name)]
        if (module, name) in _ALLOWED_CONTAINERS:
            return _ALLOWED_CONTAINERS[(module, name)]
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(name)
        raise UnsupportedPtError(
            f"blocked global {module}.{name} — only dense-tensor globals "
            "unpickle (allow-list, stricter than weights_only)"
        )

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise UnsupportedPtError(f"unknown persistent id {pid!r}")
        _, storage_type, key, location, _numel = pid
        if not str(location).startswith("cpu"):
            raise UnsupportedPtError(f"non-CPU storage location {location!r}")
        if not isinstance(storage_type, _StorageType):
            raise UnsupportedPtError(
                f"storage type {storage_type!r} is not a typed CPU "
                "storage — untyped-storage archives are out of scope"
            )
        raw = self._zf.read(f"{self._prefix}data/{key}")
        return np.frombuffer(raw, dtype=storage_type.dtype)


def load_pt(data: bytes):
    """Decode a ``torch.save`` zip archive to numpy (tensor → ndarray;
    containers of tensors keep their structure)."""
    bio = io.BytesIO(data)
    if not zipfile.is_zipfile(bio):
        raise UnsupportedPtError(
            "not a zip archive — pre-1.6 legacy torch streams are out of "
            "scope; re-save with the (default) zipfile serialization"
        )
    with zipfile.ZipFile(bio) as zf:
        pkl = [n for n in zf.namelist() if n.endswith("data.pkl")]
        if len(pkl) != 1:
            raise UnsupportedPtError(
                f"expected exactly one data.pkl in archive, found {pkl}"
            )
        prefix = pkl[0][: -len("data.pkl")]
        with zf.open(pkl[0]) as f:
            return _PtUnpickler(f, zf, prefix).load()
