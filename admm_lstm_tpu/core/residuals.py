"""Primal/dual residual monitoring and residual-balancing rho adaptation.

The reference never surfaces ADMM residuals — they exist only implicitly
inside the dual ascent steps (admm.py:512-539) and are never logged.  Here
both halves of the standard pair are first-class observables:

  * `admm_residuals(state, x)`   — RMS PRIMAL violation per constraint
    family (how far the splitting constraints are from holding).
  * `dual_residuals(state, old)` — RMS DUAL residual per family:
    rho * ||primal_new - primal_old||, the between-sweep change of each
    block scaled by its penalty (the s^k = rho A^T B (z^k - z^{k-1}) of
    Boyd et al. §3.3 specialized to this splitting).

Together they give a convergence certificate and drive the opt-in
residual-balancing rho adaptation (`balanced_rho`, Boyd §3.4.1): when the
primal residual of a family outweighs its dual residual the penalty rises,
and vice versa — keeping both shrinking at comparable rates without
hand-tuning.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from admm_lstm_tpu.core.state import ADMMState, GateSlabs, Penalties

_FAMILIES = ('i', 'f', 'g', 'o', 'c', 'h', 'y')


def _rms(x: jax.Array) -> jax.Array:
    x = x.astype(jnp.float32)  # accumulate in f32 under bf16 slab storage
    return jnp.sqrt(jnp.mean(x * x))


def admm_residuals(state: ADMMState, train_x: jax.Array,
                   precision=lax.Precision.HIGHEST) -> Dict[str, jax.Array]:
    """RMS primal residuals of each constraint family.

    Constraints (the augmented-Lagrangian coupling terms of admm.py):
      gate_g[t] = act(x_t Wx_g + h_{t-1} Wh_g)   for g in i,f,g,o
      c[t]      = f[t]*c[t-1] + i[t]*g[t]
      h[t]      = o[t]*tanh(c[t])
      a         = h_T @ wy
    """
    return admm_residuals_im(state, jnp.transpose(train_x, (1, 2, 0)),
                             precision)


def admm_residuals_im(state: ADMMState, x_im: jax.Array,
                      precision=lax.Precision.HIGHEST) -> Dict[str, jax.Array]:
    """`admm_residuals` on pre-transposed (T, I, B) inputs (the layout
    epoch-chunked programs hoist once per chain, core/step.admm_step_im)."""
    g = state.gates
    p = state.params
    h_prev = g.h[:-1]

    pre = (jnp.einsum('tdb,gdh->gthb', x_im, p.wx, precision=precision)
           + jnp.einsum('tub,guh->gthb', h_prev, p.wh, precision=precision))
    acts = jnp.stack([jax.nn.sigmoid(pre[0]), jax.nn.sigmoid(pre[1]),
                      jnp.tanh(pre[2]), jax.nn.sigmoid(pre[3])])
    gates_now = jnp.stack([g.i[1:], g.f[1:], g.g[1:], g.o[1:]])

    res = {}
    for k, idx in zip(('i', 'f', 'g', 'o'), range(4)):
        res[f'r_{k}'] = _rms(gates_now[idx] - acts[idx])
    res['r_c'] = _rms(g.c[1:] - (g.f[1:] * g.c[:-1] + g.i[1:] * g.g[1:]))
    res['r_h'] = _rms(g.h[1:] - g.o[1:] * jnp.tanh(g.c[1:]))
    res['r_y'] = _rms(g.a - jnp.einsum('hb,ho->ob', g.h[-1], p.wy,
                                       precision=precision))
    return res


def dual_residuals(state: ADMMState,
                   prev_gates: GateSlabs) -> Dict[str, jax.Array]:
    """RMS dual residuals: rho_k * ||primal_k^new - primal_k^old||_RMS.

    The dual residual of an ADMM block is the penalty-scaled change of the
    coupled primal variables between consecutive sweeps (Boyd et al. 2011,
    eq. 3.12); at a fixed point both it and the primal residual vanish.
    The reference computes neither (its dual ascent admm.py:504-546 uses
    the primal residual implicitly and discards it).
    """
    g, r = state.gates, state.rho
    out = {}
    for k in ('i', 'f', 'g', 'o', 'c', 'h'):
        out[f's_{k}'] = getattr(r, k) * _rms(getattr(g, k)
                                             - getattr(prev_gates, k))
    out['s_y'] = r.y * _rms(g.a - prev_gates.a)
    return out


def balanced_rho(rho: Penalties, primal: Dict[str, jax.Array],
                 dual: Dict[str, jax.Array], mu: float = 10.0,
                 tau: float = 2.0, rho_min: float = 1e-9,
                 rho_max: float = 1e3) -> Penalties:
    """Residual-balancing rho update (Boyd §3.4.1), per constraint family.

    If a family's primal residual exceeds mu x its dual residual, its rho
    multiplies by tau (push the constraint harder); if the dual residual
    dominates, rho divides by tau (let the iterates move).  The unscaled
    duals lambda need no rescaling under a rho change (only the ascent
    step size changes).  Bounded to [rho_min, rho_max] so a noisy family
    cannot run away inside a long jitted scan.
    """
    new = {}
    for k in _FAMILIES:
        v = getattr(rho, k)
        r, s = primal[f'r_{k}'], dual[f's_{k}']
        v_new = jnp.where(r > mu * s, v * tau,
                          jnp.where(s > mu * r, v / tau, v))
        new[k] = jnp.clip(v_new, rho_min, rho_max)
    return Penalties(**new)
