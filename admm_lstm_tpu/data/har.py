"""HAR: UCI Human Activity Recognition (561 features, resampled length 10).

Reproduces dataset.py:634-733: per-activity contiguous segments of the
X/y files are resampled to a fixed window via `np.linspace` indexing and
labels are one-hot encoded.  The raw data files are not bundled with the
reference mount (dataset.py:642-646 expects datasets/HAR/{X,y}_{train,test}.txt);
download them from
https://archive.ics.uci.edu/dataset/240/human+activity+recognition+using+smartphones
and point `path` at the directory.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

_DEFAULT_PATHS = ('datasets/HAR', '/root/reference/datasets/HAR')


def _segment_lengths(labels: np.ndarray) -> List[int]:
    """Lengths of maximal constant-label runs (dataset.py:679-691)."""
    lengths, current, prev = [], 0, None
    for y in labels:
        if y != prev:
            if current > 0:
                lengths.append(current)
            current, prev = 1, y
        else:
            current += 1
    lengths.append(current)
    return lengths


def _process(x_path: str, y_path: str, minimal_window: int = 10
             ) -> Tuple[np.ndarray, np.ndarray]:
    x = np.loadtxt(x_path, dtype=np.float32)
    y = np.loadtxt(y_path, dtype=np.int64)
    assert len(x) == len(y), f'length mismatch {len(x)} vs {len(y)}'
    xs, ys, i = [], [], 0
    for seg_len in _segment_lengths(y):
        if seg_len >= minimal_window:
            idx = np.linspace(i, i + seg_len - 1, minimal_window).astype(int)
            xs.append(x[idx])
            ys.append(y[i])
        i += seg_len
    features = np.stack(xs).astype(np.float32)
    labels = np.asarray(ys)
    n_classes = labels.max() + 1
    one_hot = np.eye(n_classes, dtype=np.float32)[labels]
    return features, one_hot


def load(path: str | None = None, minimal_window: int = 10
         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    if path is None:
        for cand in _DEFAULT_PATHS:
            if os.path.isfile(os.path.join(cand, 'X_train.txt')):
                path = cand
                break
        else:
            raise FileNotFoundError(
                f'HAR data files (X_train.txt etc.) not found in '
                f'{_DEFAULT_PATHS}. Download the UCI HAR dataset and place '
                f'X_train/y_train/X_test/y_test.txt under datasets/HAR/.')
    train_x, train_y = _process(os.path.join(path, 'X_train.txt'),
                                os.path.join(path, 'y_train.txt'),
                                minimal_window)
    test_x, test_y = _process(os.path.join(path, 'X_test.txt'),
                              os.path.join(path, 'y_test.txt'),
                              minimal_window)
    # Align class axes if a class is absent from one split.
    width = max(train_y.shape[1], test_y.shape[1])

    def pad(a):
        if a.shape[1] < width:
            a = np.pad(a, ((0, 0), (0, width - a.shape[1])))
        return a.astype(np.float32)

    return train_x, pad(train_y), test_x, pad(test_y)
