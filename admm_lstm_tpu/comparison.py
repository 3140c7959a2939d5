"""Multi-optimizer comparison harness.

Reference parity: comparison_experiment/comparison.py — run Fast ADMM-LSTM,
ADMM-LSTM-L, (optionally cached or fresh) ADMM-LSTM-S and the SGD/Adam/
Adagrad baselines on identical data/model/seed, overlay train/val loss
curves (symlog), optionally export all validation curves to a MATLAB .mat.

Run: python -m admm_lstm_tpu.comparison [-d GoogleStock] [-e 100] ...
"""

from __future__ import annotations

import os
import re
import sys
from typing import Dict, List

import numpy as np

from admm_lstm_tpu.utils.config import ADMMConfig
from admm_lstm_tpu.utils.logging import ADMMError, info

with_admm_s = False   # reference: comparison.py:33 (off by default there too)
with_admm_l = True    # reference: comparison.py:34


def run_comparison(num_epochs: int, hidden_size: int, train_x, train_y,
                   test_x, test_y, parameter_set, seed: int = 0,
                   lrs: Dict[str, float] | None = None,
                   skip_fast: bool = False, include_admm_l: bool = True,
                   include_admm_s: bool = False,
                   admm_s_cached: Dict | str | None = None,
                   save: bool = False) -> List[Dict]:
    """Execute every optimizer on the same data; returns the loss dicts."""
    import jax
    from admm_lstm_tpu.api import train
    from admm_lstm_tpu.models.lstm import init_lstm_params
    from admm_lstm_tpu.variants.grad_based import train_grad_based

    lrs = lrs or {}
    results: List[Dict] = []

    def fresh_params():
        return init_lstm_params(jax.random.PRNGKey(seed), train_x.shape[2],
                                hidden_size, train_y.shape[1])

    if not skip_fast:
        cfg = ADMMConfig(epochs=num_epochs, hidden_size=hidden_size, seed=seed)
        results.append(train(train_x, train_y, test_x, test_y, parameter_set,
                             cfg, params=fresh_params(), log_every=0))

    if include_admm_l:
        from admm_lstm_tpu.variants.admm_l import admm_l_demo
        results.append(admm_l_demo(num_epochs, hidden_size, train_x, train_y,
                                   test_x, test_y, seed=seed, save=save,
                                   log_every=0))

    if include_admm_s:
        from admm_lstm_tpu.variants.admm_s import admm_s_demo
        results.append(admm_s_demo(num_epochs, hidden_size, train_x, train_y,
                                   test_x, test_y, seed=seed, log_every=0))
    elif admm_s_cached is not None:
        # Cached trajectories (the reference consumes admm_s/results.py,
        # comparison.py:151-165).  A string is a path to either on-disk
        # format the reference trainer writes (ADMMLSTMS/main.py:344-359).
        if isinstance(admm_s_cached, str):
            from admm_lstm_tpu.data.admm_s_cache import load_admm_s_cache
            admm_s_cached = load_admm_s_cache(admm_s_cached)
        cached = dict(admm_s_cached)
        cached['train_loss'] = cached['train_loss'][:num_epochs + 1]
        cached['val_loss'] = cached['val_loss'][:num_epochs + 1]
        results.append(cached)

    for method in ('sgd', 'adam', 'adagrad'):
        results.append(train_grad_based(
            method, train_x, train_y, test_x, test_y, num_epochs,
            params=fresh_params(), lr=lrs.get(method)))

    return results


def export_matlab(loss_list: List[Dict], save_dir: str = 'MATLAB_VAL_DATA',
                  stem: str = 'MATLAB_Val_comparison') -> str:
    """Export validation curves to .mat (comparison.py:199-210)."""
    import scipy.io as sio
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, stem + '.mat')
    sio.savemat(path, {
        re.sub('[ -]', '', m['name']): np.asarray(m['val_loss'])
        for m in loss_list})
    info(f'Validation loss has been saved to {path}.')
    return path


def main(argv=None) -> int:
    from admm_lstm_tpu.cli import generate_parser, parse_num_samples
    from admm_lstm_tpu.data import load_dataset
    from admm_lstm_tpu.utils.plotting import plot_comparison
    try:
        args = generate_parser().parse_args(argv)
        (train_x, train_y, test_x, test_y), ps, title = load_dataset(
            args.dataset, parse_num_samples(args.num_train),
            parse_num_samples(args.num_val))
        seed = 0 if args.seed < 0 else args.seed
        results = run_comparison(
            args.epoch, args.hidden, train_x, train_y, test_x, test_y, ps,
            seed=seed,
            lrs={'sgd': args.comp_sgd, 'adam': args.comp_adam,
                 'adagrad': args.comp_adagrad},
            skip_fast=args.comp_skip_fast,
            include_admm_l=with_admm_l, include_admm_s=with_admm_s,
            admm_s_cached=args.comp_admm_s_cache,
            save=args.save)
        plot_comparison(results, args.epoch)
        if args.record_matlab_data:
            export_matlab(results)
        for m in results:
            info(f"{m['name']}: final train {m['train_loss'][-1]:.6f} | "
                 f"val {m['val_loss'][-1]:.6f}")
        return 0
    except ADMMError as e:
        return e.code


if __name__ == '__main__':
    sys.exit(main())
