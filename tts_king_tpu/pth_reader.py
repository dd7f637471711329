"""Torch-free reader for PyTorch checkpoint files (``.pth.tar`` / ``.pth``).

The reference ships its pretrained weights in ``torch.save`` zip archives
(fsapi.py:26-30 FS2 ``{model, embedding, optimizer}``, hifiapi.py:21-22
HiFi-GAN ``{"generator": ...}``). TPU hosts typically have no torch install,
so converting those checkpoints must not require one. ``torch.save``'s
modern format (the default since torch 1.6, so every checkpoint the
reference's torch 1.7 produced) is just a zip file containing

  * ``<name>/data.pkl`` — a pickle of the object graph where every tensor is
    ``torch._utils._rebuild_tensor_v2(storage_ref, offset, size, stride, ...)``
    and ``storage_ref`` is a pickle *persistent id*
    ``('storage', <StorageClass>, key, location, numel)``;
  * ``<name>/data/<key>`` — the raw little-endian buffer of each storage.

This module re-implements just enough of ``torch.load`` to materialize those
tensors as numpy arrays: a restricted ``pickle.Unpickler`` whose
``persistent_load`` resolves storage keys against the zip members and whose
``find_class`` admits only the handful of rebuild helpers state dicts use
(anything else raises — safer than ``torch.load(weights_only=False)``).

Verified byte-identical to ``torch.load`` via recorded fixtures
(tests/test_pth_reader.py).
"""

import io
import pickle
import zipfile
from collections import OrderedDict

import numpy as np

# torch storage class name -> numpy dtype of the raw buffer.
_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
    "ComplexFloatStorage": np.dtype("<c8"),
    "ComplexDoubleStorage": np.dtype("<c16"),
}


def _bfloat16_dtype():
    # numpy has no native bfloat16; ml_dtypes ships with jax.
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


class _StorageClass:
    """Marker for a ``torch.XxxStorage`` class reference inside the pickle."""

    def __init__(self, name):
        self.name = name

    @property
    def dtype(self):
        if self.name == "BFloat16Storage":
            return _bfloat16_dtype()
        try:
            return _STORAGE_DTYPES[self.name]
        except KeyError:
            raise ValueError(
                f"unsupported torch storage type {self.name}") from None


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    """numpy equivalent of torch._utils._rebuild_tensor_v2.

    ``storage`` is the full flat numpy buffer; build a strided view and copy
    it out (checkpoint tensors are almost always contiguous, but transposed
    saves do occur — honor arbitrary strides)."""
    arr, itemsize = storage
    if not size:
        return arr[storage_offset:storage_offset + 1].reshape(())
    byte_strides = tuple(int(s) * itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        arr[storage_offset:], shape=tuple(int(s) for s in size),
        strides=byte_strides, writeable=False)
    return np.ascontiguousarray(view)


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


def _rebuild_tensor(storage, storage_offset, size, stride):
    return _rebuild_tensor_v2(storage, storage_offset, size, stride)


_SAFE_CLASSES = {
    ("collections", "OrderedDict"): OrderedDict,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    # torch.save(pickle_protocol=2) encodes sizes through these no-ops.
    ("torch._utils", "_rebuild_device_tensor_from_numpy"): lambda a, *_: a,
}


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, load_storage):
        super().__init__(file, encoding="latin1")
        self._load_storage = load_storage

    def find_class(self, module, name):
        key = (module, name)
        if key in _SAFE_CLASSES:
            return _SAFE_CLASSES[key]
        if module in ("torch", "torch.storage") and (
                name.endswith("Storage") or name == "TypedStorage"):
            return _StorageClass(name)
        if module == "torch" and name in ("Size", "device"):
            return tuple if name == "Size" else str
        raise pickle.UnpicklingError(
            f"torch-free checkpoint reader: refusing to unpickle "
            f"{module}.{name} (state dicts of plain tensors only; install "
            f"torch for exotic checkpoints)")

    def persistent_load(self, pid):
        # ('storage', StorageClass, key, location, numel)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unexpected persistent id {pid!r}")
        _, storage_cls, key, _location, _numel = pid
        return self._load_storage(str(key), storage_cls.dtype)


def load_pth(path):
    """Load a ``torch.save`` zip checkpoint without torch.

    Returns the saved object graph with every tensor materialized as a numpy
    array (C-contiguous copies). Raises ``ValueError`` for the pre-1.6
    legacy (non-zip) format.
    """
    if not zipfile.is_zipfile(path):
        raise ValueError(
            f"{path} is not a torch zip checkpoint (pre-1.6 legacy format "
            f"is not supported by the torch-free reader; re-save with a "
            f"modern torch or install torch)")
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]
        byteorder = "little"
        bo_name = prefix + "byteorder"
        if bo_name in names:
            byteorder = zf.read(bo_name).decode().strip()
        if byteorder != "little":
            raise ValueError(f"big-endian checkpoint {path} not supported")

        cache = {}

        def load_storage(key, dtype):
            if key not in cache:
                raw = zf.read(f"{prefix}data/{key}")
                cache[key] = (np.frombuffer(raw, dtype=dtype), dtype.itemsize)
            return cache[key]

        with zf.open(pkl_name) as f:
            return _TorchUnpickler(io.BytesIO(f.read()), load_storage).load()
