"""Stacked 2-layer QUALITY at long budgets, through the stacked preset.

Round-5 continuation measurement (GoogleStock, v5e): the round-4
verdict's "stacked quality 4x worse than single-layer" was a
probe-horizon artifact, not a formulation limit —

  (8,8)   every tuning saturates val ~0.024-0.034 (layer capacity)
  (16,16) shipped tuning, 2000 epochs:       best val 0.0204
  (16,16) preset (scaled probe + 2-round
          search finds rho_c 0.032 / rho_h
          0.063, two decades softer), 2000:  best val 6.7e-4 @ epoch 452

The winning trajectory dives then diverges (NaN tail); the in-scan
best-iterate carry returns the pre-divergence minimum — exactly the
behavior train_best_stacked's nan-min probe ranking is built for.
6.7e-4 beats every single-layer GoogleStock result recorded in this
repo (tuned single-layer: 0.0030-0.0202).

Usage: python benchmarks/bench_stacked_quality.py [--epochs 2000]
       [--hidden 16]
"""

import argparse
import json
import sys

sys.path.insert(0, '.')

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=2000)
    ap.add_argument('--hidden', type=int, default=16)
    args = ap.parse_args()

    from admm_lstm_tpu import ADMMConfig
    from admm_lstm_tpu.api import train_best_stacked
    from admm_lstm_tpu.data import load_dataset
    from admm_lstm_tpu.params import parameter_set

    (tx, ty, vx, vy), _, _ = load_dataset('GoogleStock')
    res = train_best_stacked(
        tx, ty, vx, vy, parameter_set('Stacked'),
        config=ADMMConfig(hidden_size=args.hidden, epochs=args.epochs),
        hiddens=(args.hidden, args.hidden), log_every=0)
    vl = np.asarray(res['val_loss'])
    print(json.dumps({
        'metric': 'stacked_quality_googlestock',
        'hiddens': [args.hidden, args.hidden],
        'epochs': args.epochs,
        'preset_choice': res['preset_choice'],
        'probe_val': {k: round(v, 6) for k, v in res['probe_val'].items()},
        'best_val_loss': round(float(np.nanmin(vl)), 6),
        'best_epoch': int(res['best_epoch']),
    }))


if __name__ == '__main__':
    main()
