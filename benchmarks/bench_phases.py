"""Per-phase solve-step timing on the attached TPU.

Reports pipelined per-call device times for each phase of the fast-variant
epoch (wy update, 4+4 weight prox solves, the t-sweep) and the full epoch,
across hidden sizes — the "solve step us/chip" observability the build
plan asks for.

Usage: python benchmarks/bench_phases.py

CAVEAT for relay/tunneled TPU environments: repeated identical calls can
be served from a result cache, making these per-phase numbers lower
bounds; bench.py's chained-state measurement is the authoritative
end-to-end figure.
"""

import functools
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
from admm_lstm_tpu.core.step import (_sweep, _weight_phase, _wy_update,
                                     admm_step, rules_for)
from admm_lstm_tpu.data.synthetic import load as synth
from admm_lstm_tpu.models.lstm import init_lstm_params
from admm_lstm_tpu.params import parameter_set


def bench(fn, *args, n=100):
    r = fn(*args)
    fetch_sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    fetch_sync(r)
    return (time.perf_counter() - t0) / n * 1e3


def profile(batch, seq, hidden):
    tx, ty, _, _ = synth(batch=batch, seq_len=seq, input_size=1,
                         output_size=1, val_batch=4)
    tx, ty = jnp.asarray(tx), jnp.asarray(ty)
    params = init_lstm_params(jax.random.PRNGKey(0), 1, hidden, 1)
    cfg = ADMMConfig()
    rules = rules_for(cfg)
    state = init_admm_state(params, tx, parameter_set('Synthetic'), cfg)
    x_im = jnp.transpose(tx, (1, 2, 0))  # (T, I, B) batch-minor

    wy_fn = jax.jit(functools.partial(_wy_update, rules=rules))
    wp_fn = jax.jit(functools.partial(_weight_phase, rules=rules))
    sweep_fn = jax.jit(lambda st, xtm, yy: _sweep(st, xtm, st.params, yy,
                                                  rules))
    full_fn = jax.jit(functools.partial(admm_step, rules=rules))

    t_wy = bench(wy_fn, state)
    t_wp = bench(wp_fn, state, x_im)
    t_sw = bench(sweep_fn, state, x_im, jnp.transpose(ty))
    t_full = bench(full_fn, state, tx, ty)
    print(f'B={batch:5d} T={seq:3d} H={hidden:4d}: '
          f'wy {t_wy * 1e3:7.1f} us | weights {t_wp * 1e3:8.1f} us | '
          f'sweep {t_sw * 1e3:8.1f} us | full epoch {t_full * 1e3:8.1f} us')


if __name__ == '__main__':
    print(f'device: {jax.devices()[0]} '
          f'(pipelined per-call times; async dispatch overlap included)')
    for b, t, h in ((4224, 10, 10), (4096, 10, 64), (4096, 10, 128),
                    (1024, 16, 256)):
        profile(b, t, h)
