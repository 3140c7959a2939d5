"""YahooFinance dataset (AAPL close prices 2018-2024, window 60).

The reference downloads via yfinance and caches tensors under
datasets/YahooFinance/*.pt (dataset.py:446-503); this mount ships the cache
(train (1360,60,1), test (340,60,1)).  We load the cache directly; if it is
absent and raw close prices are provided, we rebuild with the identical
MinMax-scaling + window-60 + shuffled 80/20 split pipeline.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_CACHE_DIRS = (
    'datasets/YahooFinance',
    os.path.join(_REPO_ROOT, 'datasets/YahooFinance'),
    '/root/reference/datasets/YahooFinance',
)
_NAMES = ('train_x', 'train_y', 'test_x', 'test_y')


def load(cache_dir: str | None = None
         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    dirs = (cache_dir,) if cache_dir else _CACHE_DIRS
    for d in dirs:
        if d and all(os.path.isfile(os.path.join(d, f'{n}.pt')) for n in _NAMES):
            import torch  # CPU torch: deserialization only
            out = []
            for n in _NAMES:
                t = torch.load(os.path.join(d, f'{n}.pt'), map_location='cpu',
                               weights_only=False)
                out.append(np.asarray(t.detach().cpu().numpy(), np.float32))
            return tuple(out)
    raise FileNotFoundError(
        f'YahooFinance cache (*.pt) not found in {dirs}; the original '
        f'pipeline needs network access via yfinance (dataset.py:460).')


def build_from_series(closes: np.ndarray, window: int = 60, seed: int = 0,
                      train_ratio: float = 0.8):
    """Rebuild from a raw close-price series (dataset.py:465-503)."""
    lo, hi = closes.min(), closes.max()
    scaled = ((closes - lo) / (hi - lo)).astype(np.float32).reshape(-1, 1)
    xs = np.stack([scaled[i:i + window] for i in range(len(scaled) - window)])
    ys = np.stack([scaled[i + window] for i in range(len(scaled) - window)])
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(xs))
    xs, ys = xs[perm], ys[perm]
    n_train = round(len(xs) * train_ratio)
    return (xs[:n_train], ys[:n_train], xs[n_train:], ys[n_train:])
