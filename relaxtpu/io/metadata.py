"""Dataset metadata extraction (ffprobe replacement).

Builds the per-dataset metadata CSV the pipeline drivers consume, with the
reference's full column schema — vid, mos, width, height, pixfmt, framerate,
nb_frames, bitdepth, bitrate (``src/data_processing/extract_metadata_NR.py:53-66``)
— via in-process libav/cv2 probing instead of an ffprobe subprocess.

Covers all four reference ingestion flows (``extract_metadata_NR.py:160-192``):

- directory scan (generic; KoNViD-1k / YouTube-UGC style)
- CSV-driven probe (LSVQ: names+mos from the official CSV, streams probed)
- CSV passthrough (LIVE-VQC: metadata already tabulated)
- ``.mat`` info files (CVD2014 / LIVE-Qualcomm: video_names+scores in a
  MATLAB struct; LIVE-Qualcomm videos are raw 1080p yuv420p ``.yuv``
  probed WITHOUT the reference's lossy yuv->x264-mp4 round trip,
  ``extract_metadata_NR.py:111-155``).
"""

from __future__ import annotations

import os

import pandas as pd

from relaxtpu.io.video import probe_video

_COLUMNS = [
    "vid", "mos", "width", "height", "pixfmt", "framerate",
    "nb_frames", "bitdepth", "bitrate",
]


def _probe_row(vid: str, path: str, mos=None) -> dict:
    info = probe_video(path)
    return {
        "vid": vid,
        "mos": mos,
        "width": info["width"],
        "height": info["height"],
        "pixfmt": info.get("pixfmt", "yuv420p"),
        "framerate": info["framerate"],
        "nb_frames": info["nb_frames"],
        "bitdepth": info.get("bitdepth", 8),
        "bitrate": info.get("bitrate"),
    }


def _yuv_row(vid: str, path: str, mos=None, width=1920, height=1080,
             pixfmt="yuv420p", framerate=None) -> dict:
    """Raw .yuv metadata from geometry + file size (no codec to probe).

    The reference transcodes each .yuv to H.264 and ffprobes the *transcode*
    (``extract_metadata_NR.py:136-141``) — so its bitrate/bitdepth describe
    the temp file, not the source.  Here the source is described directly.
    """
    frame_bytes = width * height * 3 // 2  # yuv420p
    nb = os.path.getsize(path) // frame_bytes
    return {
        "vid": vid,
        "mos": mos,
        "width": width,
        "height": height,
        "pixfmt": pixfmt,
        "framerate": framerate,
        "nb_frames": int(nb),
        "bitdepth": 8,
        "bitrate": int(frame_bytes * 8 * framerate) if framerate else None,
    }


def extract_metadata(video_dir: str, exts=(".mp4", ".mkv", ".avi")) -> pd.DataFrame:
    """Directory scan -> metadata frame (generic datasets)."""
    rows = []
    for fname in sorted(os.listdir(video_dir)):
        base, ext = os.path.splitext(fname)
        if ext.lower() not in exts:
            continue
        try:
            rows.append(_probe_row(base, os.path.join(video_dir, fname)))
        except Exception as e:
            rows.append({"vid": base, "error": str(e)})
    return pd.DataFrame(rows)


def metadata_from_info_mat(
    mat_file: str,
    video_dir: str,
    video_type: str = "cvd_2014",
    framerate_hint: float | None = None,
) -> pd.DataFrame:
    """CVD2014 / LIVE-Qualcomm info ``.mat`` -> metadata frame.

    The info file carries ``video_names`` and ``scores`` cell arrays
    (ref ``extract_mat2metadata``, ``extract_metadata_NR.py:111-155``);
    streams are probed per video.  LIVE-Qualcomm ``.yuv`` sources are raw
    1920x1080 yuv420p.
    """
    import scipy.io

    data = scipy.io.loadmat(mat_file)
    names = data["video_names"]
    scores = data["scores"]
    rows = []
    for i in range(len(names)):
        vid = str(np_item(names[i]))
        mos = float(np_item(scores[i]))
        if video_type == "live_qualcomm":
            base = vid[:-4] if vid.endswith(".yuv") else vid
            path = os.path.join(video_dir, base + ".yuv")
            rows.append(_yuv_row(base, path, mos, framerate=framerate_hint))
        else:
            base = vid[:-4] if vid.endswith(".avi") else vid
            path = os.path.join(video_dir, base + ".avi")
            rows.append(_probe_row(base, path, mos))
    return pd.DataFrame(rows, columns=_COLUMNS)


def np_item(cell):
    """Unwrap a (possibly nested) MATLAB cell/array entry to a scalar/str."""
    import numpy as np

    a = np.asarray(cell)
    while a.dtype == object:
        a = np.asarray(a.flat[0])
    return a.item() if a.ndim == 0 else a.flat[0].item()


def metadata_from_csv(
    csv_file: str,
    video_dir: str | None = None,
    video_type: str = "live_vqc",
    name_col: str | None = None,
    mos_col: str = "mos",
) -> pd.DataFrame:
    """CSV-driven flows: LIVE-VQC passthrough / LSVQ probe
    (ref ``extract_csv2metadata``, ``extract_metadata_NR.py:68-109``)."""
    df = pd.read_csv(csv_file)
    if video_type == "live_vqc":
        out = df.copy()
        out["vid"] = [str(v).replace(".mp4", "") for v in out["vid"]]
        return out[[c for c in _COLUMNS if c in out.columns]]
    # lsvq: probe each listed video that exists on disk
    name_col = name_col or ("name" if "name" in df.columns else "vid")
    rows = []
    for _, r in df.iterrows():
        path = os.path.join(video_dir or "", f"{r[name_col]}.mp4")
        if not os.path.exists(path):
            continue
        row = _probe_row(str(r[name_col]), path, r.get(mos_col))
        # the official LSVQ csv carries width/height/frame_number already
        for src, dst in (("width", "width"), ("height", "height"), ("frame_number", "nb_frames")):
            if src in df.columns:
                row[dst] = r[src]
        rows.append(row)
    return pd.DataFrame(rows, columns=_COLUMNS)


