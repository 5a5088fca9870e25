"""Frame decoding and ~2 fps sampling.

The reference shells out to ffmpeg twice per video, writing PNGs
(``/root/reference/src/video_frames_extract.py:6-100``):

- sampled frames:   ``select='not(mod(n,interval))'``  -> frames 0, i, 2i, ...
- successor frames: ``select='not(mod(n-1,interval))'`` -> frames 1, i+1, ...
  (frame 0 is NOT selected: ffmpeg's mod(-1, i) != 0)

with ``frame_interval = ceil(framerate/2) if framerate < 2 else
int(framerate/2)`` (ref ``main_fragment_layerstack.py:273-277``).

Here decoding happens in-process (cv2.VideoCapture; raw-YUV fallback for
LIVE-Qualcomm-style ``.yuv`` files) and frames go straight into device
buffers — no PNG round-trip.  Note the reference's features are computed from
8-bit PNG re-encodes; staying uint8 end-to-end preserves that quantization.
"""

from __future__ import annotations

import math
import os

import numpy as np


def _clean_meta(v):
    """None for absent metadata values (pandas rows carry NaN, not None)."""
    return None if v is None or (isinstance(v, float) and math.isnan(v)) else v


def frame_interval_for(framerate: float) -> int:
    if framerate < 2:
        return math.ceil(framerate / 2)
    return int(framerate / 2)


def sample_indices(n_frames: int, interval: int) -> list[int]:
    """Frame indices matching ``not(mod(n, interval))``."""
    interval = max(int(interval), 1)
    return list(range(0, n_frames, interval))


def residual_pair_indices(n_frames: int, interval: int) -> list[tuple[int, int]]:
    """(frame, successor) index pairs matching the two ffmpeg selects, zipped.

    The reference zips the sorted sampled/next PNG lists
    (``main_fragment_layerstack.py:283-293``); a trailing sampled frame with
    no successor is dropped by the zip.
    """
    interval = max(int(interval), 1)
    firsts = sample_indices(n_frames, interval)
    return [(f, f + 1) for f in firsts if f + 1 < n_frames]


def _yuv420_frame_count(path: str, width: int, height: int) -> int:
    frame_bytes = width * height * 3 // 2
    return os.path.getsize(path) // frame_bytes


def _read_yuv420_frames(path: str, width: int, height: int, indices: list[int]) -> list[np.ndarray]:
    """Raw .yuv (I420) frames at the given indices, BGR uint8.

    Native libav rawvideo demuxer when built (GIL-released, same code path as
    containerized video); numpy+cv2 seek/read fallback otherwise."""
    from relaxtpu.io import native

    if native.available():
        try:
            with native.NativeDecoder(
                path, raw={"width": width, "height": height, "pixfmt": "yuv420p"}
            ) as dec:
                frames = list(dec.decode_selected(indices))
                if len(frames) == len(indices):
                    return frames
        except FileNotFoundError:
            raise
        except Exception:
            pass

    import cv2

    frame_bytes = width * height * 3 // 2
    out = []
    with open(path, "rb") as f:
        for idx in indices:
            f.seek(idx * frame_bytes)
            raw = np.frombuffer(f.read(frame_bytes), np.uint8)
            if raw.size < frame_bytes:
                break
            yuv = raw.reshape(height * 3 // 2, width)
            out.append(_yuv420_to_bgr_limited(yuv, width, height))
    return out


def _chroma_upsample2x(c: np.ndarray) -> np.ndarray:
    """Nearest (sample-doubling) 2x chroma upsample.

    Matches swscale's unscaled yuv420p->rgb fast path (one chroma sample per
    2x2 luma block, no interpolation) — the converter behind both the
    reference's ffmpeg PNG dumps and our native decoder's BGR output.  The
    same closed form runs on device (``relaxtpu.ops.colorspace.yuv420_to_bgr``),
    so host and device conversions bit-match."""
    c = c.astype(np.float32)
    return np.repeat(np.repeat(c, 2, axis=-2), 2, axis=-1)


def _yuv420_to_bgr_limited(yuv: np.ndarray, width: int, height: int) -> np.ndarray:
    """BT.601 LIMITED-range I420 -> BGR uint8, matching ffmpeg/sws_scale
    defaults — the reference decodes LIVE-Qualcomm .yuv via the ffmpeg CLI
    (``extract_metadata_NR.py`` / ``video_frames_extract``), and cv2's
    COLOR_YUV2BGR_I420 applies a different luma transfer (up to ~20/255 off
    at dark pixels).  Chroma is doubled per 2x2 block like sws's unscaled fast path."""
    y = yuv[:height].astype(np.float32)
    u = yuv[height : height + height // 4].reshape(height // 2, width // 2)
    v = yuv[height + height // 4 :].reshape(height // 2, width // 2)
    u = _chroma_upsample2x(u) - 128.0
    v = _chroma_upsample2x(v) - 128.0
    yl = 1.164383 * (y - 16.0)
    b = yl + 2.017232 * u
    g = yl - 0.812968 * v - 0.391762 * u
    r = yl + 1.596027 * v
    return np.clip(np.rint(np.stack([b, g, r], axis=-1)), 0, 255).astype(np.uint8)


def _read_video_frames(path: str, indices: list[int]) -> list[np.ndarray]:
    """Sequential decode keeping only the requested (sorted) frame indices.

    Prefers the native C++ decoder (in-process libav, GIL-released, BGR24
    straight into numpy — ``native/decoder.cc``); falls back to cv2.
    """
    from relaxtpu.io import native

    if native.available():
        try:
            with native.NativeDecoder(path) as dec:
                return list(dec.decode_selected(indices))
        except FileNotFoundError:
            raise
        except Exception:
            pass  # fall back to cv2 on any decoder-level failure

    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {path}")
    want = set(indices)
    last = max(indices) if indices else -1
    out: dict[int, np.ndarray] = {}
    n = 0
    while n <= last:
        ok, frame = cap.read()
        if not ok:
            break
        if n in want:
            out[n] = frame
        n += 1
    cap.release()
    return [out[i] for i in sorted(out)]


def probe_video(path: str) -> dict:
    """width/height/framerate/nb_frames/pixfmt/bitdepth/bitrate (ffprobe
    replacement, ref ``extract_metadata_NR.py:28-51``); native decoder first
    (full codecpar metadata), cv2 fallback (bitrate estimated from file size,
    8-bit yuv420p assumed — cv2 can't see codec parameters)."""
    from relaxtpu.io import native

    if native.available():
        try:
            with native.NativeDecoder(path) as dec:
                if dec.nb_frames > 0:
                    return {
                        "width": dec.width,
                        "height": dec.height,
                        "framerate": dec.framerate,
                        "nb_frames": dec.nb_frames,
                        "pixfmt": dec.pixfmt or "yuv420p",
                        "bitdepth": dec.bitdepth or 8,
                        "bitrate": dec.bitrate,
                    }
        except FileNotFoundError:
            raise
        except Exception:
            pass

    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {path}")
    fps = float(cap.get(cv2.CAP_PROP_FPS))
    nb = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    info = {
        "width": int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
        "height": int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
        "framerate": fps,
        "nb_frames": nb,
        "pixfmt": "yuv420p",
        "bitdepth": 8,
        "bitrate": (
            int(os.path.getsize(path) * 8 * fps / nb) if nb > 0 and fps > 0 else None
        ),
    }
    cap.release()
    return info


def decode_sampled_frames(
    path: str,
    framerate: float | None = None,
    width: int | None = None,
    height: int | None = None,
) -> np.ndarray:
    """Sampled full frames -> (B, H, W, 3) uint8 BGR."""
    is_yuv = path.endswith(".yuv")
    framerate = _clean_meta(framerate)
    if framerate is None:
        framerate = probe_video(path)["framerate"]
    interval = frame_interval_for(framerate)
    if is_yuv:
        n = _yuv420_frame_count(path, width, height)
        frames = _read_yuv420_frames(path, width, height, sample_indices(n, interval))
    else:
        n = probe_video(path)["nb_frames"]
        frames = _read_video_frames(path, sample_indices(n, interval))
    return np.stack(frames)


def decode_video_inputs(
    path: str,
    framerate: float | None = None,
    width: int | None = None,
    height: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(frames, prev, nxt) in ONE decode pass.

    The sampled full frames and the pairs' first frames are the same indices
    (0, i, 2i, ...), so everything comes from a single set {k*i} U {k*i+1}
    — the reference decodes the video twice via two ffmpeg subprocesses
    (``process_video`` + ``process_video_residual``).
    """
    is_yuv = path.endswith(".yuv")
    framerate = _clean_meta(framerate)
    if framerate is None:
        framerate = probe_video(path)["framerate"]
    interval = frame_interval_for(framerate)
    if is_yuv:
        n = _yuv420_frame_count(path, width, height)
    else:
        n = probe_video(path)["nb_frames"]
    firsts = sample_indices(n, interval)
    pairs = residual_pair_indices(n, interval)
    flat = sorted({i for p in pairs for i in p} | set(firsts))
    if is_yuv:
        decoded = _read_yuv420_frames(path, width, height, flat)
    else:
        decoded = _read_video_frames(path, flat)
    lookup = dict(zip(flat, decoded))
    frames = np.stack([lookup[i] for i in firsts if i in lookup])
    pairs = [(a, b) for a, b in pairs if a in lookup and b in lookup]
    # pair firsts are a prefix of the sampled indices, so prev is a prefix
    # VIEW of frames — FeatureExtractor.video_feature_async detects this and
    # uploads the stack once.
    kept_firsts = [i for i in firsts if i in lookup]
    if [a for a, _ in pairs] == kept_firsts[: len(pairs)]:
        prev = frames[: len(pairs)]
    else:
        prev = np.stack([lookup[a] for a, _ in pairs])
    nxt = np.stack([lookup[b] for _, b in pairs])
    return frames, prev, nxt


def decode_video_inputs_i420(
    path: str,
    framerate: float | None = None,
    width: int | None = None,
    height: int | None = None,
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """(frames_i420, next_i420, h, w) packed plane buffers, one decode pass.

    The TPU-ingest layout: each row is one frame's I420 bytes (1.5 bytes/px),
    uploaded as ONE contiguous buffer per stack; the BGR conversion fuses
    into the device program (``FeatureExtractor.video_feature_async_i420``).
    The pairs' first frames are the sampled frames, so only these two stacks
    exist.  Requires the native decoder and even frame dimensions — callers
    fall back to :func:`decode_video_inputs` (BGR) otherwise.

    ``width``/``height`` are metadata overrides: the container's geometry
    must MATCH them (this path cannot rescale; a mismatch raises so callers
    fall back to the BGR path, which honors overrides).
    """
    from relaxtpu.io import native

    if not native.available():
        raise RuntimeError("YUV ingest requires the native decoder (native/build.sh)")
    info = probe_video(path)
    framerate = _clean_meta(framerate)
    if framerate is None:
        framerate = info["framerate"]
    interval = frame_interval_for(framerate)
    width, height = _clean_meta(width), _clean_meta(height)
    if (width is not None and int(width) != info["width"]) or (
        height is not None and int(height) != info["height"]
    ):
        raise ValueError(
            f"metadata geometry {width}x{height} != decoded "
            f"{info['width']}x{info['height']} for {path}"
        )
    n = info["nb_frames"]
    firsts = sample_indices(n, interval)
    pairs = residual_pair_indices(n, interval)
    flat = sorted({i for p in pairs for i in p} | set(firsts))
    with native.NativeDecoder(path) as dec:
        buf = dec.decode_selected_i420(flat)
        h, w = dec.height, dec.width
    pos = {idx: k for k, idx in enumerate(flat[: len(buf)])}
    fsel = [pos[i] for i in firsts if i in pos]
    pairs = [(a, b) for a, b in pairs if a in pos and b in pos]
    nsel = [pos[b] for _, b in pairs]
    return buf[fsel], buf[nsel], h, w


def decode_frame_pairs(
    path: str,
    framerate: float | None = None,
    width: int | None = None,
    height: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(prev, next) sampled pairs -> two (B, H, W, 3) uint8 BGR arrays."""
    is_yuv = path.endswith(".yuv")
    framerate = _clean_meta(framerate)
    if framerate is None:
        framerate = probe_video(path)["framerate"]
    interval = frame_interval_for(framerate)
    if is_yuv:
        n = _yuv420_frame_count(path, width, height)
        pairs = residual_pair_indices(n, interval)
        flat = sorted({i for p in pairs for i in p})
        frames = _read_yuv420_frames(path, width, height, flat)
    else:
        n = probe_video(path)["nb_frames"]
        pairs = residual_pair_indices(n, interval)
        flat = sorted({i for p in pairs for i in p})
        frames = _read_video_frames(path, flat)
    lookup = dict(zip(flat, frames))
    pairs = [(a, b) for a, b in pairs if a in lookup and b in lookup]
    prev = np.stack([lookup[a] for a, _ in pairs])
    nxt = np.stack([lookup[b] for _, b in pairs])
    return prev, nxt
