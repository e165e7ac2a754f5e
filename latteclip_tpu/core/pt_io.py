"""Torch-free reader/writer for PyTorch ``.pt`` checkpoint files.

OpenCLIP checkpoints (what the reference trains from and saves — reference
``src/training/main.py:519-551``, ``src/open_clip/factory.py:127-162``) are
zip archives containing a pickle stream (``archive/data.pkl``) whose tensors
are persistent-id references into raw little-endian buffers
(``archive/data/<key>``). This module implements both directions with only
the stdlib + numpy, so the framework has no torch dependency; files written
here load with ``torch.load`` and vice versa (round-trip covered in
``tests/test_pt_io.py``).
"""
from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict, List

import numpy as np

_DTYPE_BY_STORAGE = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}
_STORAGE_BY_DTYPE = {np.dtype(v): k for k, v in _DTYPE_BY_STORAGE.items()}


def _bf16_buffer_to_f32(buf: bytes) -> np.ndarray:
    u16 = np.frombuffer(buf, dtype=np.uint16)
    return (u16.astype(np.uint32) << 16).view(np.float32)


# ---------------------------------------------------------------------------
# Reading
# ---------------------------------------------------------------------------

class _StorageStub:
    __slots__ = ("dtype_name", "key")

    def __init__(self, dtype_name: str, key: str):
        self.dtype_name = dtype_name
        self.key = key


class _TensorStub:
    """Lazily materialised tensor; resolves to numpy once buffers are read."""

    __slots__ = ("storage", "offset", "size", "stride")

    def __init__(self, storage, offset, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = tuple(size)
        self.stride = tuple(stride)

    def materialise(self, buffers: Dict[str, bytes]) -> np.ndarray:
        buf = buffers[self.storage.key]
        if self.storage.dtype_name == "BFloat16Storage":
            flat = _bf16_buffer_to_f32(buf)  # promote bf16 -> f32
        else:
            flat = np.frombuffer(buf, dtype=np.dtype(_DTYPE_BY_STORAGE[self.storage.dtype_name]))
        if not self.size:
            return flat[self.offset].copy()
        itemsize = flat.dtype.itemsize
        arr = np.lib.stride_tricks.as_strided(
            flat[self.offset:],
            shape=self.size,
            strides=tuple(s * itemsize for s in self.stride),
        )
        return np.ascontiguousarray(arr)


def _rebuild_tensor_v2(storage, offset, size, stride, requires_grad=None, hooks=None, metadata=None):
    return _TensorStub(storage, offset, size, stride)


def _rebuild_parameter(tensor, requires_grad=None, hooks=None):
    return tensor


class _Placeholder:
    """Stand-in for any torch class we don't model (optimizer state etc.)."""

    def __init__(self, *args, **kwargs):
        self.args = args

    def __setstate__(self, state):
        self.state = state


def _find_global_for_read(module: str, name: str):
    """Shim used when *our reader* loads a file written by save_pt: resolve
    the rebuild function / storage classes to local stubs, never to torch."""
    if name == "_rebuild_tensor_v2":
        return _rebuild_tensor_v2
    if module.startswith("torch") and name.endswith("Storage"):
        return name
    import importlib

    return getattr(importlib.import_module(module), name)


class _Unpickler(pickle.Unpickler):
    def find_class(self, module: str, name: str):
        if module == __name__ and name == "_find_global":
            return _find_global_for_read
        if module == __name__ and name == "_apply_rebuild":
            return _apply_rebuild
        if name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if name == "_rebuild_parameter":
            return _rebuild_parameter
        if module.startswith("torch") and name.endswith("Storage"):
            return name  # dtype tag; consumed in persistent_load
        if module.startswith("torch") and name == "Size":
            return tuple
        if module == "collections" and name == "OrderedDict":
            return dict
        if module.startswith("torch") or module.startswith("numpy"):
            return _Placeholder
        return super().find_class(module, name)

    def persistent_load(self, pid):
        kind, dtype_tag, key, _location, _numel = pid
        assert kind == "storage", f"unexpected persistent id: {pid}"
        dtype_name = dtype_tag if isinstance(dtype_tag, str) else dtype_tag.__name__
        return _StorageStub(dtype_name, key)


def _resolve(obj: Any, buffers: Dict[str, bytes]) -> Any:
    if isinstance(obj, _TensorStub):
        return obj.materialise(buffers)
    if isinstance(obj, dict):
        return {k: _resolve(v, buffers) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        seq = [_resolve(v, buffers) for v in obj]
        return tuple(seq) if isinstance(obj, tuple) else seq
    return obj


def load_pt(path: str) -> Any:
    """Load a torch zip-format ``.pt`` file into numpy arrays + python objects."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl") or n == "data.pkl")
        prefix = pkl_name[: -len("data.pkl")]
        buffers = {
            n[len(prefix) + len("data/"):]: zf.read(n)
            for n in names
            if n.startswith(prefix + "data/")
        }
        obj = _Unpickler(io.BytesIO(zf.read(pkl_name)), encoding="latin1").load()
    return _resolve(obj, buffers)


# ---------------------------------------------------------------------------
# Writing
# ---------------------------------------------------------------------------

def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Minimal safetensors reader (HF hub checkpoints ship this format).

    Format: u64-LE header length, JSON header mapping tensor name ->
    {dtype, shape, data_offsets}, then raw little-endian buffers.
    """
    _ST_DTYPES = {
        "F64": np.float64, "F32": np.float32, "F16": np.float16,
        "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
        "U8": np.uint8, "BOOL": np.bool_,
    }
    import json as _json
    import struct

    with open(path, "rb") as f:
        (header_len,) = struct.unpack("<Q", f.read(8))
        header = _json.loads(f.read(header_len))
        data = f.read()
    out: Dict[str, np.ndarray] = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        lo, hi = meta["data_offsets"]
        buf = data[lo:hi]
        if meta["dtype"] == "BF16":
            arr = _bf16_buffer_to_f32(buf)
        else:
            arr = np.frombuffer(buf, dtype=_ST_DTYPES[meta["dtype"]])
        out[name] = arr.reshape(meta["shape"]).copy()
    return out


def _find_global(module: str, name: str):  # executed by torch.load
    import importlib

    return getattr(importlib.import_module(module), name)


class _FuncRef:
    """Pickles as GLOBAL module.name (so torch.load resolves real torch fns)."""

    def __init__(self, module: str, name: str):
        self.module = module
        self.name = name

    def __reduce__(self):
        return (_find_global, (self.module, self.name))


class _PersistentStorage:
    """Marker consumed by the Pickler's persistent_id hook."""

    def __init__(self, key: int, arr: np.ndarray):
        self.key = key
        self.arr = arr


def _apply_rebuild(rebuild, storage, offset, size, stride):  # pragma: no cover
    # Executed by torch.load; rebuild is torch._utils._rebuild_tensor_v2.
    return rebuild(storage, offset, size, stride, False, {})


class _TensorProxy:
    """Pickles as a _rebuild_tensor_v2 invocation over a persistent storage."""

    def __init__(self, key: int, arr: np.ndarray):
        self.key = key
        self.arr = arr

    def __reduce__(self):
        strides = tuple(s // self.arr.itemsize for s in self.arr.strides)
        return (
            _apply_rebuild,
            (
                _FuncRef("torch._utils", "_rebuild_tensor_v2"),
                _PersistentStorage(self.key, self.arr),
                0,
                tuple(self.arr.shape),
                strides,
            ),
        )


class _Pickler(pickle.Pickler):
    def persistent_id(self, obj):
        if isinstance(obj, _PersistentStorage):
            storage_name = _STORAGE_BY_DTYPE[obj.arr.dtype]
            return ("storage", _FuncRef("torch", storage_name), str(obj.key), "cpu", obj.arr.size)
        return None


def save_pt(obj: Any, path: str) -> None:
    """Write ``obj`` (dicts/lists/scalars/np.ndarray leaves) as a .pt file
    readable by both :func:`load_pt` and ``torch.load``."""
    tensors: List[np.ndarray] = []

    def convert(o):
        if isinstance(o, np.ndarray):
            arr = np.ascontiguousarray(o)
            if arr.dtype not in _STORAGE_BY_DTYPE:
                arr = arr.astype(np.float32)  # e.g. ml_dtypes.bfloat16
            tensors.append(arr)
            return _TensorProxy(len(tensors) - 1, arr)
        if isinstance(o, (np.floating, np.integer, np.bool_)):
            return o.item()
        if isinstance(o, dict):
            return {k: convert(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            seq = [convert(v) for v in o]
            return tuple(seq) if isinstance(o, tuple) else seq
        return o

    payload = convert(obj)
    buf = io.BytesIO()
    _Pickler(buf, protocol=2).dump(payload)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/version", "3\n")
        for key, arr in enumerate(tensors):
            zf.writestr(f"archive/data/{key}", arr.tobytes())
