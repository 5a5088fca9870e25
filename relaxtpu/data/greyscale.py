"""Greyscale-video detection (ref ``src/data_processing/check_greyscale.py``).

A frame is greyscale when the max absolute inter-channel difference is <= 3
(ref ``is_greyscale_image:25-35``); a video is greyscale when every sampled
frame is.
"""

from __future__ import annotations

import numpy as np


def is_greyscale_image(img_bgr: np.ndarray, tol: int = 3) -> bool:
    img = img_bgr.astype(np.int32)
    d1 = np.abs(img[..., 0] - img[..., 1]).max()
    d2 = np.abs(img[..., 1] - img[..., 2]).max()
    d3 = np.abs(img[..., 0] - img[..., 2]).max()
    return bool(max(d1, d2, d3) <= tol)


def video_is_greyscale(frames_bgr: np.ndarray, tol: int = 3) -> bool:
    return all(is_greyscale_image(f, tol) for f in frames_bgr)


def check_video_file_greyscale(path: str, tol: int = 3) -> tuple[bool, bool]:
    """(is_greyscale, any_frame_read) for a video file, stopping at the first
    color frame (ref ``check_video_greyscale:37-55``)."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        return False, False
    frame_read = False
    grey = True
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frame_read = True
        if not is_greyscale_image(frame, tol):
            grey = False
            break
    cap.release()
    return (grey and frame_read), frame_read


def greyscale_report(df, video_path_fn, tol: int = 3, progress=None):
    """Greyscale rows of a metadata frame -> report frame with the
    reference's schema {Index, vid, Is Greyscale}
    (ref ``process_videos_from_csv:57-92``); Index is the metadata ROW index
    consumed by the split protocols."""
    import pandas as pd

    rows = []
    for i, row in df.iterrows():
        grey, read = check_video_file_greyscale(video_path_fn(row), tol)
        if progress:
            progress(f"{row['vid']}: greyscale={grey} readable={read}")
        if grey:
            rows.append({"Index": i, "vid": row["vid"], "Is Greyscale": True})
    return pd.DataFrame(rows, columns=["Index", "vid", "Is Greyscale"])


def load_grey_indices(report_csv: str) -> list[int]:
    """Metadata row indices to drop, from a greyscale report CSV
    (ref ``split_train_test.py:115-117`` reads the first column)."""
    import os

    import pandas as pd

    if not os.path.exists(report_csv):
        return []
    grey_df = pd.read_csv(report_csv)
    return grey_df.iloc[:, 0].tolist()
