"""Per-video feature store (replaces the reference's npy-per-video +
npy->mat assembly, ``src/data_processing/extract_npy2mat.py``).

Features are stored one ``.npy`` per video (the per-frame matrix, acting as a
resume checkpoint exactly like the reference's) plus an assembled dataset
matrix; ``assemble`` means over frames (ref ``extract_npy2mat.py:122``).
"""

from __future__ import annotations

import os

import numpy as np


class FeatureStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, dataset: str, index: int) -> str:
        d = os.path.join(self.root, dataset)
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"video_{index + 1}.npy")

    def has(self, dataset: str, index: int) -> bool:
        return os.path.exists(self._path(dataset, index))

    def put(self, dataset: str, index: int, per_frame: np.ndarray) -> None:
        np.save(self._path(dataset, index), per_frame)

    def get(self, dataset: str, index: int) -> np.ndarray:
        return np.load(self._path(dataset, index))

    def assemble(self, dataset: str, n_videos: int) -> np.ndarray:
        """(n_videos, D) matrix: mean over frames per video."""
        rows = []
        for i in range(n_videos):
            per_frame = self.get(dataset, i)
            rows.append(per_frame.mean(axis=0) if per_frame.ndim == 2 else per_frame)
        return np.stack(rows)

    def save_mat(self, dataset: str, n_videos: int, path: str, key: str | None = None) -> None:
        """Reference-compatible .mat export (keyed by dataset name)."""
        import scipy.io

        scipy.io.savemat(path, {key or dataset: self.assemble(dataset, n_videos)})


def load_mat_features(path: str, key: str) -> np.ndarray:
    """Load a reference-format features .mat (keyed by dataset name)."""
    import scipy.io

    return np.asarray(scipy.io.loadmat(path)[key], dtype=float)


def load_chunked_features(paths: list[str], key: str) -> np.ndarray:
    """vstack chunked feature .mats — the reference ships LSVQ-train features
    in 3 chunks (ref ``split_train_test.py:86-89``)."""
    import scipy.io

    chunks = [np.asarray(scipy.io.loadmat(p)[key], dtype=float) for p in paths]
    return np.vstack(chunks)
