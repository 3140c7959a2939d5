"""Depth-vs-width at fixed parameter count (round-2 verdict #7).

For each task, compares the best SINGLE-layer model against 2-layer
stacks of (approximately) equal parameter count, each family tuned with
the same rho-search budget, then trained long with best-iterate
tracking.  Tasks:

  * DNA1            — the bundled promoter dataset (T=57, I=4).
  * hierarchical    — compositional synthetic target (two nonlinear
                      stages; data/synthetic.load_hierarchical), the
                      hypothesis class where depth should pay.

Records an honest winner per task; results land in docs/ROADMAP.md.
Runtime: minutes on CPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np

from admm_lstm_tpu import ADMMConfig
from admm_lstm_tpu.api import train
from admm_lstm_tpu.params import parameter_set
from admm_lstm_tpu.tune import refine_rho, search_rho_stacked
from admm_lstm_tpu.utils.config import ParameterSet
from admm_lstm_tpu.variants.stacked import train_stacked

EPOCHS = int(os.environ.get('SWEEP_EPOCHS', '200'))


def n_params_single(i, h, o):
    return 4 * (i * h + h * h) + h * o


def n_params_stack(i, hs, o):
    total, prev = 0, i
    for h in hs:
        total += 4 * (prev * h + h * h)
        prev = h
    return total + prev * o


def run_single(tx, ty, vx, vy, hidden, base):
    tuned = refine_rho(tx, ty, vx, vy, base,
                       config=ADMMConfig(hidden_size=hidden), epochs=30,
                       rounds=2)
    ps = tuned['best_parameter_set']
    out = train(tx, ty, vx, vy, ps, ADMMConfig(hidden_size=hidden,
                                               epochs=EPOCHS),
                log_every=0, track_best=True)
    return min(out['val_loss'])


def run_stack(tx, ty, vx, vy, hiddens, base):
    # Full 3x3 (rho_c, rho_z) grid: c cycles fast, z slow.
    zc = np.repeat(np.asarray([0.3, 1.0, 3.0], np.float32), 3)
    from admm_lstm_tpu.tune import candidate_grid
    cands = candidate_grid(base, multipliers=(0.3, 1.0, 3.0), keys=('c',))
    cands = np.concatenate([cands] * 3)
    tuned = search_rho_stacked(tx, ty, vx, vy, base, hiddens,
                               config=ADMMConfig(hidden_size=hiddens[0]),
                               candidates=cands, epochs=30,
                               z_candidates=zc)
    ps = tuned['best_parameter_set']
    out = train_stacked(tx, ty, vx, vy, ps,
                        ADMMConfig(hidden_size=hiddens[0], epochs=EPOCHS),
                        hiddens=hiddens, log_every=0)
    return min(out['val_loss'])


def main():
    tasks = {}
    from admm_lstm_tpu.data import load_dataset
    try:
        (tx, ty, vx, vy), ps_dna, _ = load_dataset('DNA1')
        tasks['DNA1'] = ((tx, ty, vx, vy), ps_dna)
    except FileNotFoundError:
        pass
    from admm_lstm_tpu.data.synthetic import load_hierarchical
    tasks['hierarchical'] = (load_hierarchical(batch=768, seq_len=16,
                                               input_size=8, val_batch=256),
                             parameter_set('Stacked'))

    for name, ((tx, ty, vx, vy), base) in tasks.items():
        i, o = tx.shape[2], ty.shape[1]
        stack_base = ParameterSet(
            rho={**base.rho, 'z': base.rho.get('z', 1.0)},
            beta=dict(base.beta))
        print(f'== {name}  (I={i}, T={tx.shape[1]}, O={o}) ==', flush=True)
        for single_h, stack_h in ((16, (10, 10)), (22, (13, 13))):
            np_s = n_params_single(i, single_h, o)
            np_k = n_params_stack(i, stack_h, o)
            v_s = run_single(tx, ty, vx, vy, single_h, base)
            v_k = run_stack(tx, ty, vx, vy, stack_h, stack_base)
            win = 'STACK' if v_k < v_s else 'single'
            print(f'{name}: single H={single_h} ({np_s}p) val {v_s:.6f}  '
                  f'vs stack {stack_h} ({np_k}p) val {v_k:.6f}  -> {win}',
                  flush=True)


if __name__ == '__main__':
    main()
