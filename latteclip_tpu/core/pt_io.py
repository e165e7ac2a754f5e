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
import struct
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


class _AttrDict(dict):
    """dict that accepts pickle BUILD attribute state (OrderedDict with
    ``_metadata``, as torch ``Module.state_dict()`` produces)."""


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
            # torch state_dicts are OrderedDicts with a ``_metadata``
            # attribute set via pickle BUILD; plain dict has no __dict__,
            # so use a subclass that can absorb the attribute state
            return _AttrDict
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


def _apply_rebuild(rebuild, storage, offset, size, stride):
    # legacy: files written by pre-round-3 save_pt pickle this module's
    # _apply_rebuild as their rebuild shim; kept so load_pt still reads them
    return rebuild(storage, offset, size, stride, False, {})


class _TensorProxy:
    """Marker for a tensor leaf; the emitter writes it as a standard
    ``torch._utils._rebuild_tensor_v2`` REDUCE over a persistent storage."""

    __slots__ = ("key", "arr")

    def __init__(self, key: int, arr: np.ndarray):
        self.key = key
        self.arr = arr


class _PickleEmitter:
    """Hand-rolled protocol-2 pickle emitter for checkpoint payloads.

    Why not ``pickle.Pickler``: the stream must reference
    ``torch._utils._rebuild_tensor_v2`` / ``torch.FloatStorage`` /
    ``collections.OrderedDict`` as GLOBALs **without importing torch**, and
    the stdlib pickler refuses to emit a GLOBAL unless importing it yields
    the object being pickled. Earlier versions routed through shim functions
    in THIS module, which made the files require ``latteclip_tpu`` at
    ``torch.load`` time and fail ``weights_only=True`` (torch >= 2.6
    default). This emitter produces exactly the opcodes torch's own writer
    uses, so the files are plain OpenCLIP checkpoints: every global is on
    torch's weights_only allowlist.
    """

    def __init__(self):
        self.out = io.BytesIO()
        self.out.write(b"\x80\x02")  # PROTO 2
        self._memo: Dict[Any, int] = {}

    # -- memo: torch.load requires each GLOBAL to be memoized only if GET
    # is used; we memoize globals to keep repeated tensors compact ---------
    def _put(self, key) -> None:
        idx = len(self._memo)
        self._memo[key] = idx
        if idx < 256:
            self.out.write(b"q" + bytes([idx]))        # BINPUT
        else:
            self.out.write(b"r" + struct.pack("<I", idx))  # LONG_BINPUT

    def _get(self, key) -> bool:
        idx = self._memo.get(key)
        if idx is None:
            return False
        if idx < 256:
            self.out.write(b"h" + bytes([idx]))        # BINGET
        else:
            self.out.write(b"j" + struct.pack("<I", idx))  # LONG_BINGET
        return True

    def global_(self, module: str, name: str) -> None:
        if self._get(("g", module, name)):
            return
        self.out.write(f"c{module}\n{name}\n".encode("utf-8"))
        self._put(("g", module, name))

    def save(self, o) -> None:
        out = self.out
        if o is None:
            out.write(b"N")
        elif o is True:
            out.write(b"\x88")
        elif o is False:
            out.write(b"\x89")
        elif isinstance(o, _TensorProxy):
            self._tensor(o)
        elif isinstance(o, int):
            self._int(o)
        elif isinstance(o, float):
            out.write(b"G" + struct.pack(">d", o))     # BINFLOAT
        elif isinstance(o, str):
            b = o.encode("utf-8")
            out.write(b"X" + struct.pack("<I", len(b)) + b)  # BINUNICODE
        elif isinstance(o, bytes):
            out.write(b"C" + bytes([len(o)]) + o if len(o) < 256
                      else b"B" + struct.pack("<I", len(o)) + o)
        elif isinstance(o, dict):
            out.write(b"}")                            # EMPTY_DICT
            if o:
                out.write(b"(")                        # MARK
                for k, v in o.items():
                    self.save(k)
                    self.save(v)
                out.write(b"u")                        # SETITEMS
        elif isinstance(o, list):
            out.write(b"]")                            # EMPTY_LIST
            if o:
                out.write(b"(")
                for v in o:
                    self.save(v)
                out.write(b"e")                        # APPENDS
        elif isinstance(o, tuple):
            self._tuple(o)
        else:
            raise TypeError(f"cannot emit {type(o).__name__} into a .pt file")

    def _int(self, i: int) -> None:
        out = self.out
        if 0 <= i < 256:
            out.write(b"K" + bytes([i]))               # BININT1
        elif 0 <= i < 65536:
            out.write(b"M" + struct.pack("<H", i))     # BININT2
        elif -(2 ** 31) <= i < 2 ** 31:
            out.write(b"J" + struct.pack("<i", i))     # BININT
        else:
            enc = i.to_bytes((i.bit_length() + 8) // 8, "little", signed=True)
            out.write(b"\x8a" + bytes([len(enc)]) + enc)  # LONG1

    def _tuple(self, t: tuple) -> None:
        n = len(t)
        if n == 0:
            self.out.write(b")")                       # EMPTY_TUPLE
            return
        if n > 3:
            self.out.write(b"(")                       # MARK
        for v in t:
            self.save(v)
        if n == 1:
            self.out.write(b"\x85")                    # TUPLE1
        elif n == 2:
            self.out.write(b"\x86")                    # TUPLE2
        elif n == 3:
            self.out.write(b"\x87")                    # TUPLE3
        else:
            self.out.write(b"t")                       # TUPLE

    def _marked_tuple(self, emit_items) -> None:
        self.out.write(b"(")                           # MARK
        emit_items()
        self.out.write(b"t")                           # TUPLE

    def _tensor(self, t: _TensorProxy) -> None:
        arr = t.arr
        out = self.out
        # callable
        self.global_("torch._utils", "_rebuild_tensor_v2")
        # args: (storage, offset, size, stride, requires_grad, hooks)
        out.write(b"(")                                # MARK for args tuple
        # persistent id: ('storage', <StorageType>, key, device, numel)
        self._marked_tuple(lambda: (
            self.save("storage"),
            self.global_("torch", _STORAGE_BY_DTYPE[arr.dtype]),
            self.save(str(t.key)),
            self.save("cpu"),
            self.save(int(arr.size)),
        ))
        out.write(b"Q")                                # BINPERSID
        self.save(0)                                   # storage offset
        self._tuple(tuple(int(s) for s in arr.shape))
        self._tuple(tuple(s // arr.itemsize for s in arr.strides))
        out.write(b"\x89")                             # requires_grad=False
        self.global_("collections", "OrderedDict")     # backward hooks
        out.write(b")R")                               # EMPTY_TUPLE, REDUCE
        out.write(b"t")                                # close args tuple
        out.write(b"R")                                # REDUCE -> tensor

    def dump(self, payload) -> bytes:
        self.save(payload)
        self.out.write(b".")                           # STOP
        return self.out.getvalue()


def save_pt(obj: Any, path: str) -> None:
    """Write ``obj`` (dicts/lists/scalars/np.ndarray leaves) as a .pt file
    readable by :func:`load_pt` and by ``torch.load`` — including
    ``weights_only=True``: the stream references only torch-allowlisted
    globals (``_rebuild_tensor_v2``, storage classes, ``OrderedDict``)."""
    tensors: List[np.ndarray] = []

    def convert(o):
        if isinstance(o, np.ndarray):
            # NOT ascontiguousarray: that has ndmin=1 semantics and would
            # silently promote 0-d tensors (logit_scale) to shape (1,)
            arr = o if o.flags["C_CONTIGUOUS"] else np.asarray(o, order="C")
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
    data = _PickleEmitter().dump(payload)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", data)
        zf.writestr("archive/byteorder", "little")
        zf.writestr("archive/version", "3\n")
        for key, arr in enumerate(tensors):
            zf.writestr(f"archive/data/{key}", arr.tobytes())
