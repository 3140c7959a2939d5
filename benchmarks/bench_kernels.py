"""Kernel benchmark: XLA sweep paths vs the fused batch-minor Pallas
kernels, at full-epoch granularity.

Each measurement is an epoch-CHAINED program (`lax.scan` over N epochs,
the production loop shape) ending in a real host fetch — per-dispatch
relay overhead is amortized out and `block_until_ready`'s unreliability
on this relay is sidestepped (see benchmarks/_sync.py).

Compares, at several (batch, seq, hidden) points:
  gauss_seidel:  lax.scan sweep  vs  pallas_interior_sweep
  jacobi:        vmapped sweep   vs  pallas_jacobi_sweep

Usage: python benchmarks/bench_kernels.py [N_epochs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from admm_lstm_tpu import ADMMConfig
from admm_lstm_tpu.core.init import init_admm_state
from admm_lstm_tpu.core.step import make_admm_step, make_multi_epoch_fn
from admm_lstm_tpu.data.synthetic import load as synth
from admm_lstm_tpu.models.lstm import init_lstm_params
from admm_lstm_tpu.params import parameter_set

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300


def chain_rate(cfg, params, tx, ty, ps):
    """Epochs/s of the chained epoch program (median of 3 chains)."""
    run = make_multi_epoch_fn(cfg, N, donate=True)
    times = []
    for rep in range(4):  # first is warm/compile
        state = init_admm_state(
            params._replace(wy=params.wy * (1.0 + rep * 1e-7)), tx, ps, cfg)
        t0 = time.perf_counter()
        _, m = run(state, tx, ty, tx[:8], ty[:8])
        final = float(np.asarray(m['val_loss'])[-1])
        assert np.isfinite(final)
        times.append((time.perf_counter() - t0) / N)
    times = sorted(times[1:])
    return 1.0 / times[len(times) // 2]


def bench_config(batch, seq, hidden):
    tx, ty, _, _ = synth(batch=batch, seq_len=seq, input_size=1,
                         output_size=1, val_batch=4)
    tx, ty = jnp.asarray(tx), jnp.asarray(ty)
    params = init_lstm_params(jax.random.PRNGKey(0), 1, hidden, 1)
    ps = parameter_set('Synthetic')

    # Numeric agreement over a short horizon (the ADMM fixed point is
    # chaotic at some configs; ulp differences diverge by sensitivity).
    for sweep in ('gauss_seidel', 'jacobi'):
        s_x = init_admm_state(params, tx, ps, ADMMConfig(sweep_mode=sweep, use_pallas_sweep=False))
        s_p = init_admm_state(params, tx, ps,
                              ADMMConfig(sweep_mode=sweep,
                                         use_pallas_sweep=True))
        st_x = make_admm_step(ADMMConfig(sweep_mode=sweep, use_pallas_sweep=False), donate=False)
        st_p = make_admm_step(ADMMConfig(sweep_mode=sweep,
                                         use_pallas_sweep=True), donate=False)
        for _ in range(3):
            s_x = st_x(s_x, tx, ty)
            s_p = st_p(s_p, tx, ty)
        err = float(jnp.max(jnp.abs(s_x.gates.c - s_p.gates.c)))
        assert err < 1e-4, (sweep, err)

        r_xla = chain_rate(ADMMConfig(sweep_mode=sweep, use_pallas_sweep=False), params, tx, ty, ps)
        r_pal = chain_rate(ADMMConfig(sweep_mode=sweep,
                                      use_pallas_sweep=True),
                           params, tx, ty, ps)
        print(f'B={batch:5d} T={seq:3d} H={hidden:4d} [{sweep:12s}]: '
              f'xla {1e6 / r_xla:7.1f} us/ep | pallas {1e6 / r_pal:7.1f} '
              f'us/ep | speedup {r_pal / r_xla:4.2f}x | err {err:.1e}',
              flush=True)


if __name__ == '__main__':
    print(f'device: {jax.devices()[0]}', flush=True)
    for batch, seq, hidden in ((4224, 10, 10), (4096, 10, 64),
                               (2048, 32, 128), (1360, 60, 10),
                               (1024, 100, 32)):
        bench_config(batch, seq, hidden)
