"""ctypes bindings for the native C++ runtime (native/rspl_runtime.cc).

Provides fast image decode, rectification remap, and a multi-threaded
stereo prefetcher. Built on demand with ``make -C native`` (g++ + libpng /
libjpeg, both baked into the image); every entry point has a pure-Python
fallback so the library works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "decode_gray", "remap_bilinear", "NativeStereoLoader",
           "build"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librspl_runtime.so")
_lib = None
_lock = threading.Lock()


def build(force: bool = False) -> bool:
    """Compile the native library. Returns True on success."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True, timeout=300)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rspl_decode_gray.restype = ctypes.c_int
        lib.rspl_decode_gray.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
        ]
        lib.rspl_image_size.restype = ctypes.c_int
        lib.rspl_image_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.rspl_remap_bilinear.restype = None
        lib.rspl_remap_bilinear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.rspl_loader_create.restype = ctypes.c_void_p
        lib.rspl_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
        ]
        lib.rspl_loader_next.restype = ctypes.c_int
        lib.rspl_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.rspl_loader_destroy.restype = None
        lib.rspl_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.rspl_merge_lines.restype = ctypes.c_int
        lib.rspl_merge_lines.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_gray(path: str, H: int, W: int) -> np.ndarray:
    """Decode a PNG/JPEG to (H, W) float32 in [0, 1]."""
    lib = _load()
    if lib is None:
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im.convert("L"), np.float32) / 255.0
    out = np.empty((H, W), np.float32)
    rc = lib.rspl_decode_gray(path.encode(), _fptr(out), H, W)
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    return out


def merge_lines(segs: np.ndarray, angle_thr: float, distance_thr: float,
                ep_thr: float):
    """Native MergeLines (rspl_runtime.cc::rspl_merge_lines). Returns the
    merged (M, 4) float64 array, or None when the library is unavailable
    (callers fall back to the numpy implementation in ops/lines.py)."""
    lib = _load()
    if lib is None:
        return None
    S = np.ascontiguousarray(segs, np.float64)
    n = len(S)
    out = np.empty((n, 4), np.float64)
    m = lib.rspl_merge_lines(
        S.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        angle_thr, distance_thr, ep_thr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if m < 0:
        return None
    return out[:m]


def remap_bilinear(src: np.ndarray, map_xy: np.ndarray) -> np.ndarray:
    lib = _load()
    H, W = src.shape
    src = np.ascontiguousarray(src, np.float32)
    map_xy = np.ascontiguousarray(map_xy, np.float32)
    if lib is None:
        from rspl_slam_tpu.camera import remap_bilinear as jax_remap
        import jax.numpy as jnp

        return np.asarray(jax_remap(jnp.asarray(src), jnp.asarray(map_xy)))
    dst = np.empty_like(src)
    lib.rspl_remap_bilinear(_fptr(src), H, W, _fptr(map_xy), _fptr(dst))
    return dst


class NativeStereoLoader:
    """Threaded stereo prefetcher over explicit file lists. Pops frames in
    order; decoding (and optional rectification) runs on worker threads —
    the stage-0 producer of the pipelined runner."""

    def __init__(self, left_paths, right_paths, H, W, map_l=None, map_r=None,
                 depth=3, threads=2):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable (build failed)")
        self._lib = lib
        self.H, self.W = H, W
        self.n = len(left_paths)
        self._lp = (ctypes.c_char_p * self.n)(*[p.encode() for p in left_paths])
        self._rp = (ctypes.c_char_p * self.n)(*[p.encode() for p in right_paths])
        self._ml = (np.ascontiguousarray(map_l, np.float32)
                    if map_l is not None else None)
        self._mr = (np.ascontiguousarray(map_r, np.float32)
                    if map_r is not None else None)
        self._h = lib.rspl_loader_create(
            self._lp, self._rp, self.n, H, W,
            _fptr(self._ml) if self._ml is not None else None,
            _fptr(self._mr) if self._mr is not None else None,
            depth, threads,
        )

    def __iter__(self):
        return self

    def __next__(self):
        left = np.empty((self.H, self.W), np.float32)
        right = np.empty((self.H, self.W), np.float32)
        rc = self._lib.rspl_loader_next(self._h, _fptr(left), _fptr(right))
        if rc == -1:
            raise StopIteration
        if rc == -2:
            raise IOError("native loader: frame decode failed")
        return rc, left, right

    def close(self):
        if self._h:
            self._lib.rspl_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
