"""Native (C++) host-side kernels, loaded via ctypes.

Built lazily with the Makefile in this directory on first import (set
``FGN_TPU_NATIVE_BUILD=0`` to forbid the implicit build); import failure
is caught by fgn_tpu.data.rle, which falls back to the NumPy path, so
toolchain-less hosts keep working. The .so itself is never committed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_FP = os.path.join(_DIR, "librle.so")


def _build() -> bool:
    if os.environ.get("FGN_TPU_NATIVE_BUILD", "1") == "0":
        return False
    try:
        subprocess.run(
            ["make", "-s", "-C", _DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_FP)
    except Exception:
        return False


def _load():
    # always invoke make: it is a no-op when librle.so is fresh and
    # rebuilds it when rle.cc changed (a stale .so would miss symbols)
    if not _build() and not os.path.exists(_LIB_FP):
        return None
    lib = ctypes.CDLL(_LIB_FP)
    lib.rle_encode.restype = ctypes.c_longlong
    lib.rle_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_longlong, ctypes.c_longlong,
        ctypes.c_char_p, ctypes.c_longlong,
    ]
    lib.rle_decode.restype = ctypes.c_longlong
    lib.rle_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong, ctypes.c_longlong,
        ctypes.c_longlong, ctypes.c_void_p,
    ]
    lib.rle_area.restype = ctypes.c_longlong
    lib.rle_area.argtypes = [ctypes.c_char_p, ctypes.c_longlong]
    try:
        lib.rle_paste_encode.restype = ctypes.c_longlong
        lib.rle_paste_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_longlong, ctypes.c_longlong, ctypes.c_float,
            ctypes.c_char_p, ctypes.c_longlong,
        ]
    except AttributeError:  # pragma: no cover — stale .so, rebuild
        if os.environ.get("FGN_TPU_NATIVE_BUILD", "1") == "0":
            # Builds forbidden: leave the existing .so on disk (its
            # other symbols keep working) and expose it without the
            # new entry point — callers feature-test via getattr.
            return lib
        subprocess.run(["make", "-s", "-C", _DIR, "clean"], check=False)
        if _build():
            return _load()
        raise
    return lib


_lib = _load()
if _lib is None:  # pragma: no cover
    raise ImportError("native RLE library unavailable")


class rle_native:
    """Namespace mirroring the subset of fgn_tpu.data.rle it accelerates."""

    @staticmethod
    def encode(mask: np.ndarray):
        h, w = mask.shape
        mask = np.ascontiguousarray(mask, dtype=np.uint8)
        cap = 16 + 8 * (h * w // 2 + 2)
        buf = ctypes.create_string_buffer(cap)
        n = _lib.rle_encode(
            mask.ctypes.data_as(ctypes.c_void_p), h, w, buf, cap
        )
        if n < 0:  # pragma: no cover
            raise RuntimeError("rle_encode buffer overflow")
        return {"size": [int(h), int(w)], "counts": buf.raw[:n]}

    @staticmethod
    def decode(counts: bytes, h: int, w: int) -> np.ndarray:
        out = np.empty((h, w), dtype=np.uint8)
        rc = _lib.rle_decode(
            counts, len(counts), h, w, out.ctypes.data_as(ctypes.c_void_p)
        )
        if rc != 0:
            raise ValueError("invalid RLE: run total != h*w")
        return out

    @staticmethod
    def area(counts: bytes) -> int:
        return int(_lib.rle_area(counts, len(counts)))

    @staticmethod
    def paste_encode(probs: np.ndarray, box, img_h: int, img_w: int,
                     thr: float = 0.5):
        """Fused bilinear paste + threshold + RLE encode of one
        detection: (m, m) float probs + XYXY box → compressed RLE dict.
        Never materializes the (img_h, img_w) canvas."""
        probs = np.ascontiguousarray(probs, dtype=np.float32)
        m = probs.shape[0]
        assert probs.shape == (m, m), probs.shape
        x0, y0, x1, y1 = (float(v) for v in box)
        cap = 16 + 8 * (img_h * img_w // 2 + 2)
        buf = ctypes.create_string_buffer(cap)
        n = _lib.rle_paste_encode(
            probs.ctypes.data_as(ctypes.c_void_p), m,
            x0, y0, x1, y1, img_h, img_w, thr, buf, cap,
        )
        if n < 0:  # pragma: no cover
            raise RuntimeError("rle_paste_encode buffer overflow")
        return {"size": [int(img_h), int(img_w)], "counts": buf.raw[:n]}


if not hasattr(_lib, "rle_paste_encode"):  # pragma: no cover
    # Prebuilt .so predating the fused kernel with builds forbidden
    # (FGN_TPU_NATIVE_BUILD=0): drop the method so data/rle.py's
    # hasattr feature-test routes callers to the two-step NumPy path.
    del rle_native.paste_encode
