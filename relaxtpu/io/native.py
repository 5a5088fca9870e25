"""ctypes binding for the native C++ decoder (native/decoder.cc).

Replaces the reference's ffmpeg-subprocess + PNG round-trip
(``src/video_frames_extract.py``) with in-process libav decode writing BGR24
straight into numpy buffers.  The ctypes call releases the GIL, so decode
overlaps accelerator compute in the evaluator's prefetch threads.

Falls back gracefully: callers should use :func:`available` and fall back to
the cv2 path in ``relaxtpu.io.video`` when the library is missing (the build
is one ``native/build.sh`` invocation).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "librelaxdecode.so",
)
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        build = os.path.join(os.path.dirname(_LIB_PATH), "build.sh")
        if os.path.exists(build):
            try:
                subprocess.run(["sh", build], check=True, capture_output=True)
            except Exception:
                return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.relax_open.restype = ctypes.c_void_p
    lib.relax_open.argtypes = [ctypes.c_char_p]
    lib.relax_open_raw.restype = ctypes.c_void_p
    lib.relax_open_raw.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_double,
    ]
    lib.relax_info.restype = ctypes.c_int
    lib.relax_info.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.relax_info_ex.restype = ctypes.c_int
    lib.relax_info_ex.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.relax_decode_selected.restype = ctypes.c_int64
    lib.relax_decode_selected.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.relax_decode_selected_yuv.restype = ctypes.c_int64
    lib.relax_decode_selected_yuv.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.relax_close.restype = None
    lib.relax_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeDecoder:
    def __init__(self, path: str, raw: dict | None = None):
        """``raw`` opens a headerless .yuv stream and must carry width/height
        (+optional pixfmt/framerate) — LIVE-Qualcomm style (reference passes
        -s/-pix_fmt/-framerate, ``video_frames_extract.py:29-49``)."""
        lib = _load()
        if lib is None:
            raise RuntimeError("native decoder library unavailable (run native/build.sh)")
        self._lib = lib
        if raw is not None:
            self._h = lib.relax_open_raw(
                path.encode(),
                int(raw["width"]),
                int(raw["height"]),
                str(raw.get("pixfmt", "yuv420p")).encode(),
                float(raw.get("framerate") or 30.0),
            )
        else:
            self._h = lib.relax_open(path.encode())
        if not self._h:
            raise FileNotFoundError(f"cannot open video: {path}")
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        nf = ctypes.c_int64()
        lib.relax_info(self._h, ctypes.byref(w), ctypes.byref(h), ctypes.byref(fps), ctypes.byref(nf))
        self.width = w.value
        self.height = h.value
        self.framerate = fps.value
        self.nb_frames = int(nf.value)
        pixfmt = ctypes.create_string_buffer(64)
        depth = ctypes.c_int()
        rate = ctypes.c_int64()
        lib.relax_info_ex(self._h, pixfmt, 64, ctypes.byref(depth), ctypes.byref(rate))
        self.pixfmt = pixfmt.value.decode() or None
        self.bitdepth = depth.value or None
        self.bitrate = int(rate.value) or None

    def decode_selected(self, indices) -> np.ndarray:
        """Decode the (sorted) frame indices -> (n, H, W, 3) uint8 BGR."""
        idx = np.asarray(sorted(indices), np.int64)
        out = np.empty((len(idx), self.height, self.width, 3), np.uint8)
        n = self._lib.relax_decode_selected(
            self._h,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if n < 0:
            raise ValueError("BGR decode failed (unconvertible pixel format)")
        return out[: int(n)]

    def decode_selected_i420(self, indices) -> np.ndarray:
        """Decode the (sorted) frame indices as packed I420.

        Returns (n, H*W*3/2) uint8 — per frame: H*W luma, then U and V at
        (H/2, W/2) each, the standard I420 byte order.  One contiguous
        buffer = ONE host->device transfer for the TPU YUV-ingest path
        (1.5 bytes/px; device unpack+conversion in
        ``relaxtpu.ops.colorspace``).  Requires even frame dimensions.
        """
        if self.width % 2 or self.height % 2:
            raise ValueError("YUV ingest needs even frame dimensions")
        idx = np.asarray(sorted(indices), np.int64)
        out = np.empty((len(idx), self.height * self.width * 3 // 2), np.uint8)
        n = self._lib.relax_decode_selected_yuv(
            self._h,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if n < 0:
            raise ValueError(
                "YUV decode failed (odd dimensions or unconvertible pixel format)"
            )
        return out[: int(n)]

    def close(self):
        if self._h:
            self._lib.relax_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
