"""Scenario-vmap utilization: per-scenario epoch cost vs instance count.

A single full-batch ADMM epoch at GoogleStock/Yahoo scale keeps a v5e
badly underutilized (~0.13 ms/epoch is the dispatch+latency floor).
vmapping S independent training instances (tickers / market regimes /
tuning candidates) into one program amortizes that floor: measured on
TPU v5e at B=1024, T=20, H=64 —

    S=1:  0.13 ms/step  -> 0.127 ms per scenario-epoch  (0.16 G cell-steps/s)
    S=4:  0.18 ms/step  -> 0.045 ms per scenario-epoch  (0.46 G)
    S=16: 0.23 ms/step  -> 0.015 ms per scenario-epoch  (1.40 G)

Usage: python benchmarks/bench_scenarios.py [--batch 1024 --seq 20 --hidden 64]
"""

import argparse
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=1024)
    ap.add_argument('--seq', type=int, default=20)
    ap.add_argument('--hidden', type=int, default=64)
    ap.add_argument('--scenarios', type=int, nargs='+', default=[1, 4, 16])
    ap.add_argument('--steps', type=int, default=30)
    ap.add_argument('--reps', type=int, default=4)
    args = ap.parse_args()

    from admm_lstm_tpu import ADMMConfig
    from admm_lstm_tpu.core.init import init_admm_state
    from admm_lstm_tpu.core.step import admm_step, rules_for
    from admm_lstm_tpu.data.synthetic import load as synth
    from admm_lstm_tpu.models.lstm import init_lstm_params
    from admm_lstm_tpu.params import parameter_set

    B, T, I, H = args.batch, args.seq, 8, args.hidden
    cfg = ADMMConfig(hidden_size=H)
    rules = rules_for(cfg)
    ps = parameter_set('Synthetic')

    for s_count in args.scenarios:
        data = [synth(batch=B, seq_len=T, input_size=I, output_size=1,
                      val_batch=8, seed=s) for s in range(s_count)]
        x_all = jnp.asarray(np.stack([d[0] for d in data]))
        y_all = jnp.asarray(np.stack([d[1] for d in data]))
        keys = jax.random.split(jax.random.PRNGKey(0), s_count)
        params = jax.vmap(lambda k: init_lstm_params(k, I, H, 1))(keys)

        def init_all():
            return jax.vmap(lambda p, x: init_admm_state(p, x, ps, cfg))(
                params, x_all)

        step = jax.jit(jax.vmap(lambda s, x, y: admm_step(s, x, y, rules)),
                       donate_argnums=(0,))
        st = step(init_all(), x_all, y_all)
        fetch_sync(st.params.wy)

        best = float('inf')
        for rep in range(args.reps):
            states = init_all()
            states = states._replace(params=states.params._replace(
                wy=states.params.wy * (1 + (rep + 1) * 1e-7)))
            t0 = time.perf_counter()
            for _ in range(args.steps):
                states = step(states, x_all, y_all)
            fetch_sync(states.params.wy)
            best = min(best, (time.perf_counter() - t0) / args.steps)
        print(f'S={s_count}: {best * 1e3:.3f} ms/step total -> '
              f'{best / s_count * 1e3:.4f} ms per scenario-epoch '
              f'({s_count * B * T / best / 1e6:.0f}M cell-steps/s)')


if __name__ == '__main__':
    main()
