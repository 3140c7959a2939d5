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


def load_scenarios(num_scenarios: int = 4, cache_dir: str | None = None,
                   series: list | None = None, seed: int = 0):
    """Scenario batches for vmapped multi-instance training
    (api.train_scenarios).

    With `series` (a list of raw close-price arrays, e.g. one per ticker
    fetched via yfinance), each series becomes one scenario through the
    reference pipeline.  Offline (this container has zero egress and only
    the AAPL cache), the cached window set splits into `num_scenarios`
    disjoint scenario batches — same shapes, distinct sample populations.

    Returns (xs, ys, vxs, vys) with leading scenario axis S.
    """
    if series is not None:
        parts = [build_from_series(np.asarray(s), seed=seed) for s in series]
        n_tr = min(p[0].shape[0] for p in parts)
        n_va = min(p[2].shape[0] for p in parts)
        return (np.stack([p[0][:n_tr] for p in parts]),
                np.stack([p[1][:n_tr] for p in parts]),
                np.stack([p[2][:n_va] for p in parts]),
                np.stack([p[3][:n_va] for p in parts]))

    tx, ty, vx, vy = load(cache_dir)
    rng = np.random.default_rng(seed)
    ptr, pva = rng.permutation(len(tx)), rng.permutation(len(vx))
    n_tr = len(tx) // num_scenarios
    n_va = len(vx) // num_scenarios
    if n_tr == 0 or n_va == 0:
        raise ValueError(
            f'num_scenarios={num_scenarios} exceeds the available windows '
            f'(train {len(tx)}, val {len(vx)}); each scenario needs at '
            f'least one sample of each split')
    xs = np.stack([tx[ptr[s * n_tr:(s + 1) * n_tr]]
                   for s in range(num_scenarios)])
    ys = np.stack([ty[ptr[s * n_tr:(s + 1) * n_tr]]
                   for s in range(num_scenarios)])
    vxs = np.stack([vx[pva[s * n_va:(s + 1) * n_va]]
                    for s in range(num_scenarios)])
    vys = np.stack([vy[pva[s * n_va:(s + 1) * n_va]]
                    for s in range(num_scenarios)])
    return xs, ys, vxs, vys


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
