"""ctypes loader for the native host runtime (native/obs_abi.cpp).

Builds the shared library on first use (g++ -O3) into
``native/libobs_abi.so``; the compiled artifact is cached next to the source.
Falls back cleanly (``available() == False``) when no toolchain exists —
every feature has a numpy fallback in the callers.
"""
from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
_SRC = _DIR / "obs_abi.cpp"
_SO = _DIR / "libobs_abi.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not _SO.exists()
                or _SO.stat().st_mtime < _SRC.stat().st_mtime):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", str(_SRC), "-o", str(_SO)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO))
        lib.pack_obs.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.obs_struct_size.restype = ctypes.c_int
        lib.ring_create.restype = ctypes.c_void_p
        lib.ring_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.ring_destroy.argtypes = [ctypes.c_void_p]
        lib.ring_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.ring_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.ring_size.argtypes = [ctypes.c_void_p]
        lib.ring_size.restype = ctypes.c_int64
        lib.unpack_actions.argtypes = [ctypes.c_int64, ctypes.c_void_p,
                                       ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def obs_struct_size() -> int:
    return _load().obs_struct_size()


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def pack_obs(map_obs, phase, resources, shop, piles, storage_masks):
    """One-pass packing of batched planar state into the reference's
    ObsData array-of-structs byte layout. All inputs host numpy arrays."""
    lib = _load()
    n = map_obs.shape[0]
    out = np.empty((n, lib.obs_struct_size()), np.uint8)
    m = np.ascontiguousarray(map_obs, np.uint8)
    ph = np.ascontiguousarray(phase, np.int32)
    rs = np.ascontiguousarray(resources, np.float32)
    sh = np.ascontiguousarray(shop, np.int32)
    pl = np.ascontiguousarray(piles, np.int32)
    mk = np.ascontiguousarray(storage_masks, np.uint8)
    lib.pack_obs(n, _ptr(m), _ptr(ph), _ptr(rs), _ptr(sh), _ptr(pl),
                 _ptr(mk), _ptr(out))
    return out


class TrajectoryRing:
    """Lock-free SPSC chunk ring (native) for rollout -> consumer handoff."""

    def __init__(self, chunk_bytes: int, capacity: int = 64):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native runtime unavailable")
        self.chunk_bytes = chunk_bytes
        self._h = self._lib.ring_create(chunk_bytes, capacity)

    def push(self, chunk: np.ndarray) -> bool:
        c = np.ascontiguousarray(chunk.reshape(-1).view(np.uint8))
        assert c.nbytes == self.chunk_bytes
        return bool(self._lib.ring_push(self._h, _ptr(c)))

    def pop(self):
        out = np.empty(self.chunk_bytes, np.uint8)
        if not self._lib.ring_pop(self._h, _ptr(out)):
            return None
        return out

    def __len__(self):
        return int(self._lib.ring_size(self._h))

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.ring_destroy(self._h)
            self._h = None
