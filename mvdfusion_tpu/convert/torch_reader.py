"""Torch-free reader for PyTorch checkpoint files (SURVEY.md §7.2).

The reference's weight artifacts are torch.save archives
(utils/load_model.py:28-110, README.md:43-45). Conversion should not force a
torch install onto a TPU host, so this module parses the two on-disk formats
with zipfile + pickle + numpy only:

  * the zipfile format (torch >= 1.6 default): a zip archive holding
    `<name>/data.pkl` (a pickle whose tensors are persistent-id references)
    and `<name>/data/<key>` raw little-endian storage payloads;
  * the legacy sequential format (pre-1.6, `_use_new_zipfile_serialization=
    False`): magic / protocol / sys_info pickles, the object pickle, the
    storage-key list, then each storage as an 8-byte count + raw payload.

Handled tensor forms (the "real checkpoint bytes" risks VERDICT r3 lists):
fp16/bf16/fp64/integer/bool storages, non-contiguous stride views,
storage_offset views, and SHARED storages (several tensors viewing one
payload — each is materialised as its own contiguous array, exactly like
`tensor.numpy()` after torch.load).

TorchScript archives (the CLIP `clip_vit_14.ckpt`; the reference loads it
with `clip.load` -> torch.jit, encoders/modules.py:414) serialize a scripted
MODULE TREE, not a state_dict: the zip holds `constants.pkl` + `code/` next
to `data.pkl`, and data.pkl's root is an object graph of `__torch__.*`
classes whose tensor-valued attributes ARE the parameters/buffers, stored
through the same persistent-id storage machinery as torch.save. The
torchscript branch here unpickles that graph with inert stand-in classes and
flattens every tensor attribute to its dotted path — exactly the names
`torch.jit.load(path).state_dict()` reports — so CLIP conversion needs no
torch install either.

Everything returns numpy arrays; bf16 payloads are widened to float32 (numpy
has no bfloat16).
"""

from __future__ import annotations

import io
import os
import pickle
import struct
import zipfile
from typing import Any, Dict, Tuple

import numpy as np

# torch storage class name -> (numpy dtype, itemsize). BFloat16 is special-
# cased (no numpy dtype): stored as uint16, widened to f32 on materialise.
_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "HalfStorage": np.dtype("<f2"),
    "DoubleStorage": np.dtype("<f8"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("bool"),
    "BFloat16Storage": np.dtype("<u2"),  # widened on materialise
}


class _StorageType:
    """Stand-in for torch.FloatStorage etc. inside the pickle stream."""

    def __init__(self, name: str):
        self.name = name


class _LazyStorage:
    """One checkpoint storage: dtype + raw bytes (fetched lazily per format)."""

    def __init__(self, name: str, key: str, fetch):
        if name not in _STORAGE_DTYPES:
            raise ValueError(f"unsupported torch storage type {name!r}")
        self.type_name = name
        self.dtype = _STORAGE_DTYPES[name]
        self.key = key
        self._fetch = fetch
        self._arr = None

    def array(self) -> np.ndarray:
        if self._arr is None:
            buf = self._fetch(self.key)
            self._arr = np.frombuffer(buf, dtype=self.dtype)
            if self.type_name == "BFloat16Storage":
                self._arr = (
                    self._arr.astype(np.uint32) << 16
                ).view(np.float32)
        return self._arr


class _Tensor:
    """Rebuilt-tensor record; materialises to a contiguous numpy array."""

    def __init__(self, storage: _LazyStorage, offset: int, size, stride):
        self.storage = storage
        self.offset = int(offset)
        self.size = tuple(int(s) for s in size)
        self.stride = tuple(int(s) for s in stride)

    def numpy(self) -> np.ndarray:
        base = self.storage.array()
        if not self.size:  # 0-d tensor
            return np.array(base[self.offset])
        itemsize = base.dtype.itemsize
        view = np.lib.stride_tricks.as_strided(
            base[self.offset :],
            shape=self.size,
            strides=tuple(s * itemsize for s in self.stride),
        )
        return np.ascontiguousarray(view)

    # duck-typing for convert/torch_to_flax.py::_to_numpy_state
    def detach(self):
        return self

    def cpu(self):
        return self

    # numpy coercion (np.asarray on the record; numpy 2 passes copy=)
    def __array__(self, dtype=None, copy=None):
        a = self.numpy()
        return a.astype(dtype) if dtype is not None else a


def _rebuild_tensor(storage, storage_offset, size, stride):
    """torch._utils._rebuild_tensor (legacy pickles)."""
    return _Tensor(storage, storage_offset, size, stride)


def _rebuild_tensor_v2(
    storage, storage_offset, size, stride, requires_grad=False,
    backward_hooks=None, metadata=None,
):
    return _Tensor(storage, storage_offset, size, stride)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


class _Unpickler(pickle.Unpickler):
    """Resolves the torch globals a checkpoint pickle references without
    torch, and turns persistent ids into _LazyStorage records."""

    def __init__(self, file, fetch_storage):
        super().__init__(file, encoding="utf-8")
        self._fetch = fetch_storage
        # root_key -> _LazyStorage, deduped (shared storages) and inspected
        # by the legacy reader for each payload's dtype/itemsize
        self.storages: Dict[str, _LazyStorage] = {}

    def find_class(self, module: str, name: str):
        if name in _STORAGE_DTYPES and module in ("torch", "torch.cuda"):
            return _StorageType(name)
        if module == "torch._utils":
            return {
                "_rebuild_tensor": _rebuild_tensor,
                "_rebuild_tensor_v2": _rebuild_tensor_v2,
                "_rebuild_parameter": _rebuild_parameter,
            }.get(name) or super().find_class(module, name)
        if (module, name) == ("torch.serialization", "_get_layout"):
            return lambda *_: None
        if module.startswith("torch"):
            # dtype/size/layout objects occasionally appear in metadata;
            # an inert stand-in keeps the stream parseable
            return _StorageType(name)
        return super().find_class(module, name)

    def persistent_load(self, pid):
        # ('storage', storage_type, root_key, location, numel[, view_meta])
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unexpected persistent id {pid!r}")
        if len(pid) > 5 and pid[5]:
            raise ValueError("legacy storage view metadata is not supported")
        storage_type, key = pid[1], pid[2]
        name = storage_type.name if isinstance(storage_type, _StorageType) else str(storage_type)
        key = str(key)
        if key not in self.storages:
            self.storages[key] = _LazyStorage(name, key, self._fetch)
        return self.storages[key]


class _ScriptObject:
    """Inert stand-in for a `__torch__.*` scripted class: pickle NEWOBJ makes
    an empty instance, BUILD lands the attribute dict (insertion-ordered —
    the TorchScript pickler writes attributes in definition order)."""

    _qualname = "?"

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:  # custom __getstate__ forms (quantized etc.): keep raw
            self.__dict__["_raw_state"] = state


class _ScriptUnpickler(_Unpickler):
    """data.pkl / constants.pkl of a torch.jit.save archive."""

    _class_cache: Dict[Tuple[str, str], type] = {}

    def find_class(self, module: str, name: str):
        if module.startswith("__torch__"):
            key = (module, name)
            cls = self._class_cache.get(key)
            if cls is None:
                cls = type(name, (_ScriptObject,), {"_qualname": f"{module}.{name}"})
                self._class_cache[key] = cls
            return cls
        if module == "torch.jit._pickle":
            # list/annotation builders the jit pickler emits for constants
            if name == "restore_type_tag":
                return lambda value, _ty: value
            if name.startswith("build_"):
                return lambda data: data
        return super().find_class(module, name)


def _flatten_script_tree(obj: Any, prefix: str = "") -> Dict[str, "_Tensor"]:
    """Dotted-path tensors of a _ScriptObject graph == jit state_dict keys
    (module lists are objects with '0','1',... attributes, so indices join
    with '.' exactly like torch's state_dict naming)."""
    out: Dict[str, _Tensor] = {}
    items = (
        vars(obj).items() if isinstance(obj, _ScriptObject)
        else obj.items() if isinstance(obj, dict)
        else enumerate(obj) if isinstance(obj, (list, tuple))
        else ()
    )
    for k, v in items:
        name = f"{prefix}{k}"
        if isinstance(v, _Tensor):
            out[name] = v
        elif isinstance(v, (_ScriptObject, dict, list, tuple)):
            out.update(_flatten_script_tree(v, name + "."))
    return out


def _read_torchscript(zf: zipfile.ZipFile, prefix: str, fetch) -> Dict[str, "_Tensor"]:
    with zf.open(f"{prefix}data.pkl") as f:
        root = _ScriptUnpickler(io.BytesIO(f.read()), fetch).load()
    state = _flatten_script_tree(root)
    if not state:
        raise ValueError(
            "torchscript archive yielded no tensors — unsupported serialization form"
        )
    return state


def _read_zip(path: str) -> Any:
    zf = zipfile.ZipFile(path)
    names = zf.namelist()
    pkls = [n for n in names if n.endswith("/data.pkl") or n == "data.pkl"]
    if not pkls:
        raise ValueError(f"{path}: zip archive without data.pkl — not a torch checkpoint")
    prefix = pkls[0][: -len("data.pkl")]

    def fetch(key: str) -> bytes:
        return zf.read(f"{prefix}data/{key}")

    if any(n.endswith("constants.pkl") for n in names):
        return _read_torchscript(zf, prefix, fetch)

    with zf.open(pkls[0]) as f:
        return _Unpickler(io.BytesIO(f.read()), fetch).load()


_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C


def _read_legacy(path: str) -> Any:
    with open(path, "rb") as f:
        magic = pickle.load(f)
        if magic != _LEGACY_MAGIC:
            raise ValueError(f"{path}: not a legacy torch checkpoint (magic {magic!r})")
        _protocol = pickle.load(f)
        _sys_info = pickle.load(f)

        payload: Dict[str, bytes] = {}

        up = _Unpickler(f, payload.__getitem__)
        obj = up.load()

        keys = pickle.load(f)
        for key in keys:
            (numel,) = struct.unpack("<q", f.read(8))
            s = up.storages.get(str(key))
            if s is None:
                raise ValueError(f"{path}: storage {key} has no tensor referencing it")
            payload[str(key)] = f.read(numel * s.dtype.itemsize)
        return obj


def read_torch_checkpoint(path: str) -> Any:
    """Parse a torch.save / torch.jit.save file without torch. Returns the
    pickled object (for torch.jit archives: the flat state-dict of the
    scripted module tree) with every tensor as a `_Tensor` (materialise with
    np.asarray / .numpy())."""
    if zipfile.is_zipfile(path):
        return _read_zip(path)
    return _read_legacy(path)
