"""Measured projection: does 4-way tensor parallelism pay at H = 256?

Round-4 verdict ("what's weak" #7): the tp_h128_exact bench runs the
2-D (data, model)-sharded program on a (1, 1) mesh, which proves zero
lowering overhead but says nothing about whether model-sharding the
H = 256 Gram/Cholesky would actually pay on a real mesh — the
collectives are free at (1, 1) by definition.  One chip cannot measure
real ICI collectives, so this benchmark does the honest next-best
thing: MEASURE the per-chip compute of each TP shard at its true local
size on this chip, and MODEL the collectives analytically from bytes
and published v5e ICI bandwidth (~45 GB/s per direction per link, ring
reduction 2*S*(n-1)/n; "How to Scale Your Model" numbers).

TP layout recap (parallel/sharding.state_shardings, model_axis set):
slab H axis and weight output columns shard over 'model', so the
gate-folded K = 4H Gram systems split K/n per chip.

  * x-stage (D = 561): design matrix x is replicated and the targets
    are K-sharded -> the K-split is collective-free.
  * h-stage (D = H = 256): the design is the H-sharded h history ->
    one all-gather of (T, H, B) f32 per epoch (~21 MB, ring cost
    (n-1)/n * S / BW ~ 0.35 ms at n = 4).
  * sweep recurrence: contraction over the sharded H -> one psum of
    the (4, H, B) pre-activation block per timestep
    (~8.4 MB -> ~0.28 ms each, T of them).

Measured on v5e (chained, fetch-synced, DEFAULT precision + pallas
chol — the turbo exact path), B = 2048, T = 10, AFTER the round-5
block-triangular Gram (which sped both the full and the sharded
stages; pre-blocktri numbers in parentheses):

  x-stage  D=561: K=1024 -> 83.7 ms (120.2)   K=256 shard -> 20.8 (29.2)
  h-stage  D=256: K=1024 -> 19.6 ms (23.2)    K=256 shard ->  5.3 (6.1)
  whole epoch unsharded (bench_har_sweep H=256): 126.3 ms (162.7)
    -> the two weight stages are ~103 ms = 82% of the epoch.

Projection for TP = 4 per-chip epoch:
  20.8 + 5.3 (weight stages, measured at shard size)
  + 0.35 (h all-gather) + ~2.8 (T sweep psums)
  + ~23/4..23 (remaining phases; elementwise slab work is
    H-sharded, so scaled 4x as the optimistic bound and unsharded as
    the pessimistic one)
  = ~35-52 ms  ->  projected speedup 2.4-3.6x on 4 chips
                   (60-91% parallel efficiency).

Conclusion: TP pays at H = 256 — the phase that dominates the epoch
(the K = 4H Gram/Cholesky stack) splits collective-free or nearly so,
and its measured 4-way-shard compute is ~4x / 3.7x faster.  The
number that needs real hardware remains the measured end-to-end rate;
everything measurable on one chip is measured here.

Usage: python benchmarks/tp_projection.py [--epoch_full_ms MS]
"""

import json
import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import admm_lstm_tpu  # noqa: F401
from admm_lstm_tpu.solvers.normal_eq import gauss_newton_ridge_update_wide

ICI_GBPS = 45.0      # per direction per link, v5e (scaling-book figure)
T, B = 10, 2048
N_CHAIN = 20


def _measure_stage(dim: int, k4: int) -> float:
    rng = np.random.RandomState(0)
    m_inputs = jnp.asarray(rng.randn(T, dim, B).astype(np.float32)) * 0.1
    pre = jnp.asarray(rng.randn(T, k4, B).astype(np.float32)) * 0.1
    w = jnp.asarray(rng.randn(dim, k4).astype(np.float32)) * 0.1
    tgt = jnp.asarray(rng.randn(T, k4, B).astype(np.float32)) * 0.1
    rho_g = jnp.ones((4,), jnp.float32)
    beta_g = jnp.ones((4,), jnp.float32) * 1e-6
    tanh_cols = jnp.repeat(jnp.asarray((False, False, True, False)), k4 // 4)

    def chain(mi, p, ww, tg):
        def body(carry, _):
            wnew = gauss_newton_ridge_update_wide(
                mi, p, carry, tg, rho_g, beta_g, tanh_cols,
                jax.lax.Precision.DEFAULT, use_pallas_chol=True)
            return carry + (wnew[0, 0] - carry[0, 0]) * 1e-30, wnew[0, 0]
        return lax.scan(body, ww, None, length=N_CHAIN)[1]

    fn = jax.jit(chain)
    out = fn(m_inputs, pre, w, tgt)
    assert np.isfinite(float(np.asarray(out[-1])))
    ts = []
    for rep in range(3):
        s = 1 + (rep + 1) * 1e-7
        t0 = time.perf_counter()
        out = fn(m_inputs * s, pre * s, w * s, tgt * s)
        float(np.asarray(out[-1]))
        ts.append((time.perf_counter() - t0) / N_CHAIN * 1e3)
    return min(ts)


def _ring_allgather_ms(bytes_total: float, n: int) -> float:
    return bytes_total * (n - 1) / n / (ICI_GBPS * 1e9) * 1e3


def _ring_allreduce_ms(bytes_total: float, n: int) -> float:
    return 2 * bytes_total * (n - 1) / n / (ICI_GBPS * 1e9) * 1e3


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--epoch_full_ms', type=float, default=126.3,
                    help='unsharded H=256 epoch from bench_har_sweep '
                         '(126.3 ms after the round-5 blocktri Gram; '
                         'was 162.7 before it)')
    args = ap.parse_args()
    h = 256
    n_tp = 4
    res = {'hidden': h, 'tp': n_tp, 'batch': B, 'seq_len': T}
    res['x_stage_full_ms'] = round(_measure_stage(561, 4 * h), 2)
    res['x_stage_shard_ms'] = round(_measure_stage(561, 4 * h // n_tp), 2)
    res['h_stage_full_ms'] = round(_measure_stage(h, 4 * h), 2)
    res['h_stage_shard_ms'] = round(_measure_stage(h, 4 * h // n_tp), 2)

    allgather_ms = _ring_allgather_ms(T * h * B * 4, n_tp)
    psum_ms = T * _ring_allreduce_ms(4 * h * B * 4, n_tp)
    res['h_allgather_ms_model'] = round(allgather_ms, 3)
    res['sweep_psums_ms_model'] = round(psum_ms, 3)

    epoch_full_ms = args.epoch_full_ms
    rest = epoch_full_ms - res['x_stage_full_ms'] - res['h_stage_full_ms']
    shard_core = (res['x_stage_shard_ms'] + res['h_stage_shard_ms']
                  + allgather_ms + psum_ms)
    res['epoch_full_ms'] = epoch_full_ms
    res['rest_phases_ms'] = round(rest, 2)
    res['projected_epoch_ms_optimistic'] = round(shard_core + rest / n_tp, 2)
    res['projected_epoch_ms_pessimistic'] = round(shard_core + rest, 2)
    res['projected_speedup'] = [
        round(epoch_full_ms / res['projected_epoch_ms_pessimistic'], 2),
        round(epoch_full_ms / res['projected_epoch_ms_optimistic'], 2)]
    res['parallel_efficiency'] = [
        round(v / n_tp, 2) for v in res['projected_speedup']]
    print(json.dumps(res, indent=1))


if __name__ == '__main__':
    main()
