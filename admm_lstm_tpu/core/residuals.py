"""Primal/dual residual monitoring.

The reference never surfaces ADMM residuals — they exist only implicitly
inside the dual ascent steps (admm.py:512-539) and are never logged.  Here
they are a first-class observable: `admm_residuals(state, x)` returns the
RMS violation of every constraint block, a direct convergence/health signal
for rho tuning.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from admm_lstm_tpu.core.state import ADMMState


def _rms(x: jax.Array) -> jax.Array:
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
    g = state.gates
    p = state.params
    x_tm = jnp.transpose(train_x, (1, 0, 2))
    h_prev = g.h[:-1]

    pre = (jnp.einsum('tbd,gdh->gtbh', x_tm, p.wx, precision=precision)
           + jnp.einsum('tbd,gdh->gtbh', h_prev, p.wh, precision=precision))
    acts = jnp.stack([jax.nn.sigmoid(pre[0]), jax.nn.sigmoid(pre[1]),
                      jnp.tanh(pre[2]), jax.nn.sigmoid(pre[3])])
    gates_now = jnp.stack([g.i[1:], g.f[1:], g.g[1:], g.o[1:]])

    res = {}
    for k, idx in zip(('i', 'f', 'g', 'o'), range(4)):
        res[f'r_{k}'] = _rms(gates_now[idx] - acts[idx])
    res['r_c'] = _rms(g.c[1:] - (g.f[1:] * g.c[:-1] + g.i[1:] * g.g[1:]))
    res['r_h'] = _rms(g.h[1:] - g.o[1:] * jnp.tanh(g.c[1:]))
    res['r_y'] = _rms(g.a - jnp.dot(g.h[-1], p.wy, precision=precision))
    return res
