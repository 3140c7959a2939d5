"""Closed-form ADMM subproblem solvers (fully vectorized, no control flow).

Each function is the whole-(B,H)-slab version of one per-timestep update
rule from the reference's eager loop.  All are pure elementwise/VPU math, so
XLA fuses each into a handful of kernels; the Pallas path in
``kernels/gate_sweep.py`` fuses a full timestep into one kernel.

Two of the reference's "iterative" updates are provably non-iterative and
are therefore implemented closed-form here (their backtracking loops can
never execute; tests/test_solvers.py:35-107 re-verifies this against a
literal re-implementation):

* ``wy`` (admm.py:246-280): the acceptance test compares
  ``original_func(beta)`` with ``estimated_func(beta, theta)`` which itself
  evaluates ``original_func(beta)`` (admm.py:262-264 — a Lipschitz-probe
  quirk), so the condition reduces to ``0 > 1.5*||grad||^2/theta``: never
  true.  Hence theta is always 1/2 after the final halving.

* ``c`` (admm.py:405-436): the loop tests the candidate ``current_c`` which
  is initialized to ``c`` itself, making the first test
  ``f(c) > f(c)``: never true.  Hence theta = 1/2 always.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def d_tanh(x: jax.Array) -> jax.Array:
    return 1.0 - jnp.tanh(x) ** 2


def d_sigmoid(x: jax.Array) -> jax.Array:
    s = jax.nn.sigmoid(x)
    return s * (1.0 - s)


def gate_ifgo_update(lam: jax.Array, rho1: jax.Array, act: jax.Array,
                     p1: jax.Array, p2, p3,
                     var2: jax.Array, rho2: jax.Array, lam2: jax.Array) -> jax.Array:
    """Closed-form i/f/g/o update (admm.py:353-386).

    new_gate = -(lam - rho1*act + (rho2*(p2*p3 - var2) - lam2)*p1)
               / (rho1 + rho2*p1^2)

    where `act` is the activated pre-activation sigma/tanh(x_t Wx + h_{t-1} Wh),
    and (p1, p2, p3, var2, lam2, rho2) select the coupling partner per gate:
      i: p1=g,        p2=f,  p3=c_{t-1}, var2=c, rho2=rho_c, lam2=lam_c
      f: p1=c_{t-1},  p2=g,  p3=i,       var2=c, rho2=rho_c, lam2=lam_c
      g: p1=i,        p2=f,  p3=c_{t-1}, var2=c, rho2=rho_c, lam2=lam_c
      o: p1=tanh(c),  p2=0,  p3=0,       var2=h, rho2=rho_h, lam2=lam_h
    """
    return -(lam - rho1 * act + (rho2 * (p2 * p3 - var2) - lam2) * p1) / (
        rho1 + rho2 * p1 * p1)


def c_update(c_old: jax.Array, o_new: jax.Array, h_old: jax.Array,
             lam_h: jax.Array, lam_c: jax.Array,
             rho_h: jax.Array, rho_c: jax.Array,
             f_new: jax.Array, c_prev: jax.Array,
             i_new: jax.Array, g_new: jax.Array) -> jax.Array:
    """Cell-state prox-linear update with the provably-constant theta = 1/2
    (admm.py:388-436; see module docstring for the no-op-loop proof).

    gradient = d/dc 0.5*||tanh(c)*o - (h + lam_h/rho_h)||^2
             = (tanh(c)*o - h - lam_h/rho_h) * o * (1 - tanh(c)^2)
    A        = lam_c/rho_c - f*c_{t-1} - i*g
    c_new    = (theta*c - gradient - rho_c*A) / (rho_c + theta),  theta = 1/2
    """
    tc = jnp.tanh(c_old)
    z = h_old + lam_h / rho_h
    gradient = (tc * o_new - z) * o_new * (1.0 - tc * tc)
    a_term = lam_c / rho_c - f_new * c_prev - i_new * g_new
    theta = jnp.asarray(0.5, c_old.dtype)
    return (theta * c_old - gradient - rho_c * a_term) / (rho_c + theta)


def h_interior_update(o_new: jax.Array, tanh_c_new: jax.Array,
                      lam_h: jax.Array, rho_h: jax.Array) -> jax.Array:
    """h update for t < T (admm.py:455-457): h = o*tanh(c) - lam_h/rho_h.

    (lam_h stays identically zero for t < T since the h-dual is only ever
    updated at t = T, admm.py:532-539 — the term is kept for faithfulness.)
    """
    return (rho_h * o_new * tanh_c_new - lam_h) / rho_h


def a_update(train_y: jax.Array, hw: jax.Array,
             rho_y: jax.Array, lam_y: jax.Array, batch_size: int,
             with_dual_y: bool) -> jax.Array:
    """Output-auxiliary closed form (admm.py:489-502).

    a = (2*y + B*rho_y*(h_T @ wy) - [B*lam_y]) / (2 + B*rho_y)
    `hw` is the precomputed readout product h_T @ wy of shape (B, O) —
    passed in so the function is layout-free (core stores h batch-minor,
    the stacked variant batch-major).  The batch-size scaling of the data
    term is a deliberate reference quirk (the MSE data term carries a 1/B
    that the derivation clears).
    """
    num = 2.0 * train_y + batch_size * rho_y * hw
    if with_dual_y:
        num = num - batch_size * lam_y
    return num / (2.0 + batch_size * rho_y)


def wy_update(wy: jax.Array, h_last: jax.Array, a: jax.Array,
              rho_y: jax.Array, beta_wy: jax.Array, lam_y: jax.Array,
              with_dual_y: bool, precision,
              batch_minor: bool = False) -> jax.Array:
    """Readout-weight update with the provably-constant theta = 1/2
    (admm.py:246-280; see module docstring for the no-op-loop proof).

    gradient = rho_y * h_T^T (h_T @ wy - a - [lam_y/rho_y])
    wy_new   = (theta*wy - gradient) / (theta + beta_wy),  theta = 1/2

    batch_minor: h_last is (H, B) and a/lam_y are (O, B) (the core and
    stacked hot layouts) instead of the batch-major (B, H)/(B, O)
    default — one formula, two layouts (round-5 dedup).
    """
    if batch_minor:
        resid = jnp.einsum('hb,ho->ob', h_last, wy,
                           precision=precision) - a
        if with_dual_y:
            resid = resid - lam_y / rho_y
        gradient = rho_y * jnp.einsum('hb,ob->ho', h_last, resid,
                                      precision=precision)
    else:
        resid = jnp.dot(h_last, wy, precision=precision) - a
        if with_dual_y:
            resid = resid - lam_y / rho_y
        gradient = rho_y * jnp.dot(h_last.T, resid, precision=precision)
    theta = jnp.asarray(0.5, wy.dtype)
    return (theta * wy - gradient) / (theta + beta_wy)


def dual_ifgo_update(lam: jax.Array, rho: jax.Array, gate_new: jax.Array,
                     act: jax.Array) -> jax.Array:
    """lam += rho * (gate - act(x_t Wx + h_{t-1} Wh))  (admm.py:512-522)."""
    return lam + rho * (gate_new - act)


def dual_c_update(lam_c: jax.Array, rho_c: jax.Array, c_new: jax.Array,
                  f_new: jax.Array, c_prev: jax.Array,
                  i_new: jax.Array, g_new: jax.Array) -> jax.Array:
    """lam_c += rho_c * (c - (f*c_{t-1} + i*g))  (admm.py:524-530)."""
    return lam_c + rho_c * (c_new - (f_new * c_prev + i_new * g_new))


def dual_h_update(lam_h: jax.Array, rho_h: jax.Array, h_new: jax.Array,
                  o_new: jax.Array, tanh_c_new: jax.Array) -> jax.Array:
    """lam_h += rho_h * (h - o*tanh(c)); applied at t = T only (admm.py:532-539)."""
    return lam_h + rho_h * (h_new - o_new * tanh_c_new)


def dual_y_update(lam_y: jax.Array, rho_y: jax.Array, a_new: jax.Array,
                  hw: jax.Array) -> jax.Array:
    """lam_y += rho_y * (a - h_T @ wy)  (admm.py:541-546).

    `hw` = h_T @ wy precomputed by the caller (layout-free, see a_update).
    """
    return lam_y + rho_y * (a_new - hw)
