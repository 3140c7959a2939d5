"""One-command ON-DEVICE correctness check of every Pallas kernel.

The test suite exercises the kernels in interpret mode on CPU
(tests/conftest.py forces the CPU backend so the suite runs anywhere);
this script re-runs the same correctness oracles on the real attached
accelerator.  Round-5 verified outputs on TPU v5e:

  pallas_chol_solve   (256,64,64)  max err vs cho_solve   3.0e-08
  pallas_chol_solve   (512,128,128) (blocked route)       1.8e-08
  pallas_chol_inverse (256,64,64)  max err vs trisolve    5.2e-08
  blocked_spd_solve   (256,561)    max err vs cho_solve   ~1e-05 rel
  gate-sweep kernels: epoch trajectories vs the scan path (see also
  the goldens check: docs/PARITY.md "On-device parity").

Usage: python tools/verify_device_kernels.py
"""

import sys

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np

import admm_lstm_tpu  # noqa: F401


def check(name, got, ref, tol):
    err = float(jnp.max(jnp.abs(got - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    ok = err <= tol * max(scale, 1.0)
    print(f'{"PASS" if ok else "FAIL"}  {name}: max abs err {err:.2e} '
          f'(scale {scale:.2e}, tol {tol:g})')
    return ok


def main() -> int:
    print('device:', jax.devices()[0])
    from admm_lstm_tpu.kernels.cholesky import (pallas_chol_inverse,
                                                pallas_chol_solve)
    from admm_lstm_tpu.solvers.blocked_chol import blocked_spd_solve

    ok = True
    rng = np.random.RandomState(0)
    for n, d in ((256, 64), (40, 10), (512, 128)):
        m = rng.randn(n, d, d).astype(np.float32)
        a = jnp.asarray(m @ m.transpose(0, 2, 1)
                        + d * np.eye(d, dtype=np.float32))
        b = jnp.asarray(rng.randn(n, d).astype(np.float32))
        ref = jax.vmap(lambda aa, bb: jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(aa), bb))(a, b)
        ok &= check(f'pallas_chol_solve ({n},{d},{d})',
                    pallas_chol_solve(a, b), ref, 5e-6)
        if d <= 128:
            eye = jnp.broadcast_to(jnp.eye(d, dtype=jnp.float32), (n, d, d))
            l = jax.lax.linalg.cholesky(a)
            linv_ref = jax.lax.linalg.triangular_solve(
                l, eye, left_side=True, lower=True)
            ok &= check(f'pallas_chol_inverse ({n},{d},{d})',
                        pallas_chol_inverse(a), linv_ref, 5e-6)

    n, d = 256, 561
    m = rng.randn(n, d, d).astype(np.float32)
    a = jnp.asarray(m @ m.transpose(0, 2, 1)
                    + d * np.eye(d, dtype=np.float32))
    b = jnp.asarray(rng.randn(n, d).astype(np.float32))
    ref = jax.vmap(lambda aa, bb: jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(aa), bb))(a, b)
    ok &= check(f'blocked_spd_solve ({n},{d})',
                blocked_spd_solve(a, b), ref, 5e-4)

    # Gate-sweep kernels vs the XLA scan path: one epoch, same state.
    from admm_lstm_tpu import ADMMConfig
    from admm_lstm_tpu.core.init import init_admm_state
    from admm_lstm_tpu.core.step import make_admm_step
    from admm_lstm_tpu.data.synthetic import load as synth
    from admm_lstm_tpu.models.lstm import init_lstm_params
    from admm_lstm_tpu.params import parameter_set
    tx, ty, _, _ = synth(batch=128, seq_len=24, input_size=2, output_size=1)
    tx, ty = jnp.asarray(tx), jnp.asarray(ty)
    params = init_lstm_params(jax.random.PRNGKey(0), 2, 10, 1)
    ps = parameter_set('Synthetic')
    outs = {}
    for label, kw in (('kernel', dict(use_pallas_sweep=True)),
                      ('scan', dict(use_pallas_sweep=False))):
        cfg = ADMMConfig(**kw)
        st = init_admm_state(params, tx, ps, cfg)
        for _ in range(3):
            st = make_admm_step(cfg, donate=False)(st, tx, ty)
        outs[label] = st
    for leaf in ('i', 'c', 'h'):
        ok &= check(f'gate_sweep epoch x3, gates.{leaf}',
                    getattr(outs['kernel'].gates, leaf),
                    getattr(outs['scan'].gates, leaf), 1e-5)

    print('ALL PASS' if ok else 'FAILURES PRESENT')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
