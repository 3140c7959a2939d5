"""Kernel benchmark: XLA lax.scan sweep vs the fused Pallas sweep.

Runs the full fast-variant epoch at several (batch, seq, hidden) points on
the attached TPU and reports chained-execution epoch times for both paths,
plus a numeric agreement check.

Usage: python benchmarks/bench_kernels.py
"""

import os
import sys
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _sync import fetch_sync  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from admm_lstm_tpu import ADMMConfig
from admm_lstm_tpu.core.init import init_admm_state
from admm_lstm_tpu.core.step import make_admm_step
from admm_lstm_tpu.data.synthetic import load as synth
from admm_lstm_tpu.models.lstm import init_lstm_params
from admm_lstm_tpu.params import parameter_set


def bench_config(batch, seq, hidden, n=100):
    tx, ty, _, _ = synth(batch=batch, seq_len=seq, input_size=1,
                         output_size=1, val_batch=4)
    tx, ty = jnp.asarray(tx), jnp.asarray(ty)
    params = init_lstm_params(jax.random.PRNGKey(0), 1, hidden, 1)
    ps = parameter_set('Synthetic')

    results = {}
    states = {}
    for name, cfg in (('xla', ADMMConfig()),
                      ('pallas', ADMMConfig(use_pallas_sweep=True))):
        step = make_admm_step(cfg, donate=False)
        state = init_admm_state(params, tx, ps, cfg)
        for _ in range(3):
            state = step(state, tx, ty)
        fetch_sync(state.params.wy)
        t0 = time.perf_counter()
        s = state
        for _ in range(n):
            s = step(s, tx, ty)
        fetch_sync(s.params.wy)
        results[name] = (time.perf_counter() - t0) / n * 1e3
        states[name] = state  # 3-epoch state for the agreement check

    # Numeric agreement over a short horizon (the ADMM fixed point is
    # chaotic at some configs, so ulp-level differences diverge over
    # hundreds of epochs by sensitivity, not by kernel error).
    err = max(float(jnp.max(jnp.abs(states['xla'].gates.c
                                    - states['pallas'].gates.c))),
              float(jnp.max(jnp.abs(states['xla'].params.wh
                                    - states['pallas'].params.wh))))
    speedup = results['xla'] / results['pallas']
    print(f'B={batch:5d} T={seq:3d} H={hidden:4d}: '
          f'xla {results["xla"]:7.3f} ms | pallas {results["pallas"]:7.3f} ms '
          f'| speedup {speedup:4.2f}x | max err {err:.2e}')
    return results


if __name__ == '__main__':
    print(f'device: {jax.devices()[0]}')
    for batch, seq, hidden in ((4224, 10, 10), (4096, 10, 64),
                               (4096, 10, 128), (2048, 32, 128),
                               (1360, 60, 10), (1024, 16, 256)):
        bench_config(batch, seq, hidden)
