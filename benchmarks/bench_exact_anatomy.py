"""Phase anatomy of the HAR-scale exact-solve epoch: where do the
non-MXU milliseconds go?

At H=64 / D=561 the Gram matmuls' pure MXU time at the achieved 47
TFLOP/s would be ~17 ms, but the epoch measures ~71 ms.  Candidate
sinks: the chunked A materialization, the batched Cholesky factor/solve
at D=561 (1024 systems — triangular work the MXU hates), the rhs
assembly einsums, and the (tiny-H) sweep.  This probe times each piece
as its own fetch-synced jitted function, self-chained REPS times with
the inputs tied to the loop carry (docs/ROADMAP.md measurement rules).

Usage: python benchmarks/bench_exact_anatomy.py [--hidden 64]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, args, reps, sync_slice):
    """Median seconds of `reps` fetch-synced calls; fn jitted, inputs
    perturbed per rep to defeat the relay's result cache.  The sync
    indexes ON DEVICE first and fetches a scalar — np.asarray on the
    full output would time the relay transfer of the whole array (the
    round-4 gram_bvec 10.7 s artifact)."""
    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0][sync_slice]))   # warm
    rates = []
    for r in range(reps):
        args2 = [a * (1 + (r + 1) * 1e-7) if isinstance(a, jax.Array)
                 and a.dtype == jnp.float32 else a for a in args]
        t0 = time.perf_counter()
        out = fn(*args2)
        float(np.asarray(jax.tree.leaves(out)[0][sync_slice]))
        rates.append(time.perf_counter() - t0)
    return sorted(rates)[len(rates) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--hidden', type=int, default=64)
    ap.add_argument('--batch', type=int, default=2048)
    ap.add_argument('--reps', type=int, default=5)
    args = ap.parse_args()

    from admm_lstm_tpu.solvers import normal_eq as ne

    H, B, T, D = args.hidden, args.batch, 10, 561
    K = 4 * H
    N = T * B
    rng = np.random.RandomState(0)
    s2 = jnp.asarray(rng.rand(T, K, B).astype(np.float32) * 0.25)
    wres = jnp.asarray(rng.randn(T, K, B).astype(np.float32) * 0.1)
    m = jnp.asarray(rng.randn(T, D, B).astype(np.float32))
    prec = lax.Precision.DEFAULT

    results = {}

    # 1. Gram + bvec alone (the chunked wide contraction).
    gb = jax.jit(lambda a, b, c: ne._gram_bvec(a, b, c, prec))
    dt = timed(gb, [s2, wres, m], args.reps, (0, 0, 0))
    results['gram_bvec_ms'] = round(dt * 1e3, 2)

    # 2. Cholesky factor+solve alone on a (K, D, D) SPD stack.
    gram, bvec = gb(s2, wres, m)
    eye = jnp.eye(D, dtype=jnp.float32)
    lhs = gram + (jnp.einsum('kdd->k', gram) / D * 0.25
                  + 1e-3)[:, None, None] * eye

    def chol_solve(a, b):
        def one(aa, bb):
            cho = jax.scipy.linalg.cho_factor(aa)
            return jax.scipy.linalg.cho_solve(cho, bb)
        return jax.vmap(one)(a, b)

    cs = jax.jit(chol_solve)
    dt = timed(cs, [lhs, bvec], args.reps, (0, 0))
    results['chol_solve_ms'] = round(dt * 1e3, 2)

    # 2b. LU alternative (jnp.linalg.solve) for comparison.
    lu = jax.jit(lambda a, b: jnp.linalg.solve(a, b[..., None])[..., 0])
    dt = timed(lu, [lhs, bvec], args.reps, (0, 0))
    results['lu_solve_ms'] = round(dt * 1e3, 2)

    # 2c. Blocked MXU Cholesky (solvers/blocked_chol) — the D > 128 path.
    from admm_lstm_tpu.solvers.blocked_chol import blocked_spd_solve
    bs = jax.jit(blocked_spd_solve)
    dt = timed(bs, [lhs, bvec], args.reps, (0, 0))
    results['blocked_solve_ms'] = round(dt * 1e3, 2)
    x_ref = cs(lhs, bvec)
    x_blk = bs(lhs, bvec)
    results['blocked_vs_cho_maxdiff'] = float(
        jnp.max(jnp.abs(x_ref - x_blk)) / (jnp.max(jnp.abs(x_ref)) + 1e-30))

    # 3. The full wide exact update (both from step's run_stage shapes):
    # x-side D=561 and h-side D=H.
    w_w = jnp.asarray(rng.randn(D, K).astype(np.float32) * 0.05)
    pre = jnp.asarray(rng.randn(T, K, B).astype(np.float32) * 0.3)
    tgt = jnp.asarray(rng.randn(T, K, B).astype(np.float32) * 0.3)
    rho_g = jnp.ones(4, jnp.float32)
    beta_g = jnp.full(4, 1e-6, jnp.float32)
    tanh_cols = jnp.repeat(jnp.asarray([False, False, True, False]), H)
    full = jax.jit(lambda mm, pp, ww, tt: ne.gauss_newton_ridge_update_wide(
        mm, pp, ww, tt, rho_g, beta_g, tanh_cols, prec))
    dt = timed(full, [m, pre, w_w, tgt], args.reps, (0, 0))
    results['xside_full_ms'] = round(dt * 1e3, 2)

    mh = jnp.asarray(rng.randn(T, H, B).astype(np.float32))
    w_h = jnp.asarray(rng.randn(H, K).astype(np.float32) * 0.05)
    fullh = jax.jit(lambda mm, pp, ww, tt: ne.gauss_newton_ridge_update_wide(
        mm, pp, ww, tt, rho_g, beta_g, tanh_cols, prec))
    dt = timed(fullh, [mh, pre, w_h, tgt], args.reps, (0, 0))
    results['hside_full_ms'] = round(dt * 1e3, 2)

    gram_tflop = 2 * K * D * D * N / 1e12
    results['xside_gram_tflop'] = round(gram_tflop, 3)
    results['note'] = (f'H={H} B={B} D={D}: pure-MXU gram time at 197 '
                       f'TFLOP/s would be {gram_tflop / 197 * 1e3:.1f} ms')
    print(json.dumps(results))


def blocked_sub_anatomy(hidden=64, batch=2048, reps=5):
    """Where do the blocked-solve milliseconds go?  Times the batched
    128-block diagonal Cholesky, the batched triangular panel inverse,
    and a pure-matmul panel+trailing skeleton separately (each scaled by
    the nb panels a D=561 factorization runs)."""
    K, D, c = 4 * hidden, 561, 128
    nb = -(-D // c)
    rng = np.random.RandomState(1)
    mm = rng.randn(K, c, c).astype(np.float32)
    ajj = jnp.asarray(mm @ mm.transpose(0, 2, 1)
                      + c * np.eye(c, dtype=np.float32))
    eye = jnp.broadcast_to(jnp.eye(c, dtype=jnp.float32), (K, c, c))

    out = {}
    f_chol = jax.jit(lambda x: lax.linalg.cholesky(x))
    out['diag_chol_ms_total'] = round(
        timed(f_chol, [ajj], reps, (0, 0, 0)) * 1e3 * nb, 2)
    ljj = f_chol(ajj)
    f_tri = jax.jit(lambda l: lax.linalg.triangular_solve(
        l, eye, left_side=True, lower=True))
    out['tri_inv_ms_total'] = round(
        timed(f_tri, [ljj], reps, (0, 0, 0)) * 1e3 * nb, 2)

    panel = jnp.asarray(rng.randn(K, (nb - 1) * c, c).astype(np.float32))
    linv = f_tri(ljj)
    f_mm = jax.jit(lambda p, li: (
        jnp.einsum('krd,ksd->krs', jnp.einsum('krc,kdc->krd', p, li),
                   jnp.einsum('krc,kdc->krd', p, li))))
    out['panel_plus_trailing_mm_ms_total'] = round(
        timed(f_mm, [panel, linv], reps, (0, 0, 0)) * 1e3 * nb, 2)
    print(json.dumps(out))


if __name__ == '__main__':
    import os
    if os.environ.get('ADMM_ANATOMY_SUB'):
        blocked_sub_anatomy()
    else:
        main()
