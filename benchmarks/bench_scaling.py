"""Weak-scaling harness: consensus-ADMM throughput vs mesh size.

Weak scaling: per-device batch is held constant while the mesh grows; the
reported efficiency is T(1)/T(n) (1.0 = perfect).  On this single-chip
environment run it against virtual CPU devices for the mechanism
(JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8);
on a pod slice it measures real ICI collectives.

Usage: python benchmarks/bench_scaling.py [--per-device-batch 512]
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


def bench_mesh(n_dev: int, per_device_batch: int, seq: int, hidden: int,
               epochs: int = 30):
    from admm_lstm_tpu import ADMMConfig
    from admm_lstm_tpu.core.init import init_admm_state
    from admm_lstm_tpu.data.synthetic import load as synth
    from admm_lstm_tpu.models.lstm import init_lstm_params
    from admm_lstm_tpu.parallel import (make_mesh, make_sharded_step,
                                        shard_batch, shard_state)
    from admm_lstm_tpu.params import parameter_set

    batch = per_device_batch * n_dev
    tx, ty, _, _ = synth(batch=batch, seq_len=seq, input_size=1,
                         output_size=1, val_batch=8)
    tx, ty = jnp.asarray(tx), jnp.asarray(ty)
    params = init_lstm_params(jax.random.PRNGKey(0), 1, hidden, 1)
    cfg = ADMMConfig()
    mesh = make_mesh((n_dev,), devices=jax.devices()[:n_dev])
    state = shard_state(init_admm_state(params, tx, parameter_set('Synthetic'),
                                        cfg), mesh)
    sx, sy = shard_batch(tx, ty, mesh)
    step = make_sharded_step(cfg, mesh, donate=False)
    for _ in range(3):
        state = step(state, sx, sy)
    fetch_sync(state.params.wy)
    t0 = time.perf_counter()
    s = state
    for _ in range(epochs):
        s = step(s, sx, sy)
    fetch_sync(s.params.wy)
    return (time.perf_counter() - t0) / epochs * 1e3


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--per-device-batch', type=int, default=512)
    parser.add_argument('--seq', type=int, default=10)
    parser.add_argument('--hidden', type=int, default=64)
    parser.add_argument('--cpu', action='store_true',
                        help='Force the CPU backend (use with '
                             'XLA_FLAGS=--xla_force_host_platform_device_'
                             'count=N for a virtual mesh; plain env vars '
                             'are overridden by this container)')
    args = parser.parse_args()
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    n_devices = len(jax.devices())
    print(f'devices: {n_devices} x {jax.devices()[0].device_kind}')
    base = None
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_devices]
    for n in sizes:
        ms = bench_mesh(n, args.per_device_batch, args.seq, args.hidden)
        if base is None:
            base = ms
        eff = base / ms
        print(f'mesh={n:3d} (global batch {args.per_device_batch * n:6d}): '
              f'{ms:8.3f} ms/epoch | weak-scaling efficiency {eff:.2f}')


if __name__ == '__main__':
    main()
