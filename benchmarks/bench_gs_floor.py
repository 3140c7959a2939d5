"""Serial-latency floor of the Gauss-Seidel sweep kernel at long T.

Round-4 verdict #6 asked why the GS kernel trails the Jacobi sweep at
T >= 1024 and whether the carry-dependent MXU matmul or the time_block
is the limiter.  Measured answers (v5e, T=2047, H=16, B=64, round 5):

  * time_block is NOT the limiter: K in {8, 16, 32} moves the kernel
    2.84 -> 2.77 -> 2.82 ms (~2%).
  * the per-gate matmuls are NOT the limiter: gate-folding the four
    (H, H) @ (H, Bt) dots into one (4H, H) @ (H, Bt) dot measured
    NEUTRAL (2.84 -> 3.03 ms at auto-K, 2.77 -> 2.80 at K=16) — the
    change was reverted.
  * the limiter is the SERIAL INSTRUCTION CHAIN: this probe runs the
    same grid structure (time-fastest sequential grid, VMEM carries)
    with the minimal math that still realizes the recurrence — the 4
    recurrent matmuls + plain LSTM cell updates, no GS closed forms,
    no dual updates, 1 output slab instead of 11 — and costs
    0.67 us/step.  The full kernel costs 1.36 us/step with ~3x the op
    count, i.e. it already sits at the serialized instruction-latency
    floor for exact Gauss-Seidel semantics.  The Jacobi kernel escapes
    by removing the serial dependency entirely (grid cells
    independent), which is exactly why both modes exist.

Whole-epoch consequence (bench_longseq, chain 100, round 5): Jacobi/GS
epoch-rate ratios 1.09 / 1.24 / 1.32 / 1.07 at T = 128 / 512 / 1024 /
2048 — the sweep difference is diluted by the rest of the epoch, and
the remaining gap is the structural serialization priced here, not an
implementation defect.

Usage: python benchmarks/bench_gs_floor.py [--seq 2048] [--hidden 16]
       [--batch 64]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import admm_lstm_tpu  # noqa: F401  (compile cache)


def _floor_kernel(xproj_ref, wh_t_ref, h_out, h_prev, c_prev, *,
                  time_block: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_prev[:] = jnp.zeros_like(h_prev)
        c_prev[:] = jnp.zeros_like(c_prev)

    for j in range(time_block):
        hp = h_prev[:]
        cp = c_prev[:]
        pre4 = tuple(
            xproj_ref[j, g] + jnp.dot(wh_t_ref[g], hp,
                                      preferred_element_type=jnp.float32,
                                      precision=jax.lax.Precision.HIGHEST)
            for g in range(4))
        c_n = (jax.nn.sigmoid(pre4[1]) * cp
               + jax.nn.sigmoid(pre4[0]) * jnp.tanh(pre4[2]))
        h_n = jax.nn.sigmoid(pre4[3]) * jnp.tanh(c_n)
        h_out[j] = h_n
        h_prev[:] = h_n
        c_prev[:] = c_n


@functools.partial(jax.jit, static_argnames=('time_block',))
def floor_sweep(xproj, wh, time_block: int = 16):
    steps, _, hidden, batch = xproj.shape
    k = time_block
    tile = max(8, -(-batch // 8) * 8)
    spad = steps + ((-steps) % k)
    if spad != steps:
        xproj = jnp.pad(xproj, ((0, spad - steps), (0, 0), (0, 0), (0, 0)))
    slab = pl.BlockSpec((k, hidden, tile), lambda b, t: (t, 0, b),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_floor_kernel, time_block=k),
        grid=(1, spad // k),
        in_specs=[pl.BlockSpec((k, 4, hidden, tile),
                               lambda b, t: (t, 0, 0, b),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((4, hidden, hidden), lambda b, t: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=slab,
        out_shape=jax.ShapeDtypeStruct((spad, hidden, batch), jnp.float32),
        scratch_shapes=[pltpu.VMEM((hidden, tile), jnp.float32),
                        pltpu.VMEM((hidden, tile), jnp.float32)],
    )(xproj, jnp.transpose(wh, (0, 2, 1)))
    return outs[:steps]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--seq', type=int, default=2048)
    ap.add_argument('--hidden', type=int, default=16)
    ap.add_argument('--batch', type=int, default=64)
    args = ap.parse_args()

    t1 = args.seq - 1
    rng = np.random.RandomState(0)
    xproj = jnp.asarray(rng.randn(t1, 4, args.hidden,
                                  args.batch).astype(np.float32)) * 0.1
    wh = jnp.asarray(rng.randn(4, args.hidden,
                               args.hidden).astype(np.float32)) * 0.1

    def chain(xp):
        def body(c, _):
            h = floor_sweep(c, wh)
            return c + h[0, 0, 0] * 1e-30, h[0, 0, 0]
        return lax.scan(body, xp, None, length=30)[1]

    fn = jax.jit(chain)
    out = fn(xproj)
    assert np.isfinite(float(np.asarray(out[-1])))
    ts = []
    for rep in range(3):
        xp = xproj * (1 + (rep + 1) * 1e-7)
        t0 = time.perf_counter()
        out = fn(xp)
        float(np.asarray(out[-1]))
        ts.append((time.perf_counter() - t0) / 30 * 1e3)
    print(f'carry-chain floor (T={t1}, H={args.hidden}, B={args.batch}): '
          f'{min(ts):.3f} ms = {min(ts) / t1 * 1e3:.3f} us/step')


if __name__ == '__main__':
    main()
