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
