"""Long-sequence benchmark: scan vs Jacobi at PTB-scale T (verdict #3).

The reference's dead PTB path is T=1000 (demo.py:220); its live maximum
is T=60.  This measures single-chip epoch rates of the Gauss-Seidel
(scan) and Jacobi (time-parallel) sweeps at T in {128, 512, 1024} with
epoch-chained fetch-synced programs, plus the 30-epoch quality of each
(the scan-vs-Jacobi crossover evidence).  Emits one JSON line per shape.

Usage: python benchmarks/bench_longseq.py [chain_len]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from admm_lstm_tpu import ADMMConfig
from admm_lstm_tpu.core.init import init_admm_state
from admm_lstm_tpu.core.step import make_multi_epoch_fn
from admm_lstm_tpu.data.synthetic import load as synth
from admm_lstm_tpu.models.lstm import init_lstm_params
from admm_lstm_tpu.params import parameter_set

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100


def measure(cfg, params, tx, ty, vx, vy, ps):
    run = make_multi_epoch_fn(cfg, N, donate=True)
    rates = []
    val30 = None
    for rep in range(4):
        state = init_admm_state(
            params._replace(wy=params.wy * (1.0 + rep * 1e-7)), tx, ps, cfg)
        t0 = time.perf_counter()
        _, m = run(state, tx, ty, vx, vy)
        v = np.asarray(m['val_loss'])
        assert np.isfinite(v[-1])
        rates.append(N / (time.perf_counter() - t0))
        if val30 is None:
            val30 = float(v[min(29, N - 1)])
    rates = sorted(rates[1:])
    return rates[len(rates) // 2], val30


def main():
    print(f'device: {jax.devices()[0]}', flush=True)
    ps = parameter_set('Synthetic')
    for batch, seq, hidden in ((512, 128, 16), (256, 512, 16),
                               (128, 1024, 16), (64, 2048, 16)):
        tx, ty, vx, vy = synth(batch=batch, seq_len=seq, input_size=2,
                               output_size=1, val_batch=32)
        tx, ty = jnp.asarray(tx), jnp.asarray(ty)
        vx, vy = jnp.asarray(vx), jnp.asarray(vy)
        params = init_lstm_params(jax.random.PRNGKey(0), 2, hidden, 1)
        out = {'batch': batch, 'seq': seq, 'hidden': hidden, 'chain': N}
        for sweep in ('gauss_seidel', 'jacobi'):
            cfg = ADMMConfig(sweep_mode=sweep, hidden_size=hidden)
            rate, val30 = measure(cfg, params, tx, ty, vx, vy, ps)
            out[f'{sweep}_iters_per_s'] = round(rate, 2)
            out[f'{sweep}_val30'] = round(val30, 6)
        out['jacobi_speedup'] = round(out['jacobi_iters_per_s']
                                      / out['gauss_seidel_iters_per_s'], 2)
        print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
