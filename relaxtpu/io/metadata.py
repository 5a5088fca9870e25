"""Dataset metadata extraction (ffprobe replacement).

Builds the per-dataset metadata CSV (vid, width, height, pixfmt, framerate,
nb_frames, ...) the pipeline drivers consume, like
``src/data_processing/extract_metadata_NR.py:28-67`` but via in-process cv2
probing instead of an ffprobe subprocess.
"""

from __future__ import annotations

import os

import pandas as pd

from relaxtpu.io.video import probe_video


def extract_metadata(video_dir: str, exts=(".mp4", ".mkv", ".avi")) -> pd.DataFrame:
    rows = []
    for fname in sorted(os.listdir(video_dir)):
        base, ext = os.path.splitext(fname)
        if ext.lower() not in exts:
            continue
        try:
            info = probe_video(os.path.join(video_dir, fname))
        except Exception as e:
            rows.append({"vid": base, "error": str(e)})
            continue
        rows.append(
            {
                "vid": base,
                "width": info["width"],
                "height": info["height"],
                "pixfmt": "yuv420p",
                "framerate": info["framerate"],
                "nb_frames": info["nb_frames"],
            }
        )
    return pd.DataFrame(rows)


def write_metadata_csv(video_dir: str, out_csv: str) -> pd.DataFrame:
    df = extract_metadata(video_dir)
    df.to_csv(out_csv, index=False)
    return df
