"""Prox-linear solvers with genuine backtracking line searches.

Only two update families in the fast ADMM variant have data-dependent
iteration counts (everything else is closed-form, see closed_form.py):

* the 8 gate-weight updates (admm.py:282-343) — implemented here as two
  4-gate-parallel solves (input side, then hidden side) whose four
  independent line searches run in lockstep inside one `lax.while_loop`
  with per-gate masking.  Gate independence is exact: updating x2f reads
  only f-slab quantities and h2f (admm.py:293-314), never the freshly
  written i-weights, so batching the gates changes nothing but wall-clock.

* the final-timestep h update (admm.py:439-487) — a theta-capped search.

All objective/inner-product reductions are `jnp.sum` over the batch axis,
so under a data-sharded mesh GSPMD turns the acceptance predicates into
global (psum-reduced) decisions automatically — every device takes the same
branch, which is what keeps the while_loops coherent across the mesh.
All loops are additionally capped at `max_iters` doublings so compiled code
cannot spin (e.g. on NaN objectives); the cap is far above any count the
reference can reach in f32.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class WeightStageResult(NamedTuple):
    weights: jax.Array    # (4, D, H) updated weights
    theta: jax.Array      # (4,) final (halved) step sizes
    iters: jax.Array      # (4,) number of doublings taken


def weight_stage_update(m_inputs: jax.Array, fixed_proj: jax.Array,
                        weights: jax.Array, gate_target: jax.Array,
                        rho_g: jax.Array, beta_g: jax.Array,
                        is_tanh: jax.Array, seq_len: int,
                        max_iters: int, precision) -> WeightStageResult:
    """One side (input or hidden) of the gate-weight phase, all 4 gates at once.

    Implements admm.py:282-343 for gates i,f,g,o in parallel:

      grad   = rho * sum_t M_t^T [(act(M_t W + fixed_t) - target_t) * act'(.)]
      search theta: while f(W + grad/theta) > f(W) + <grad, d> + T/2*theta*|d|^2:
          theta *= 2
      theta /= 2
      W_new  = (rho*T*theta/2 * W - grad) / (beta + rho*T*theta/2)

    Args:
      m_inputs:   (T, B, D)  per-timestep design matrix for this side
                  (train_x for the x side; the stale h history h[0:T] for the
                  h side — including the zero row 0, admm.py:298,305).
      fixed_proj: (4, T, B, H) the other side's projection M'_t @ V (V fixed
                  for this stage: old h-weights in stage x, fresh x-weights in
                  stage h — matching the reference's update order x2g, h2g).
      weights:    (4, D, H) current weights of this side.
      gate_target: (4, T, B, H) = dual[1:]/rho + gate[1:]  (admm.py:309-310).
      rho_g:      (4,) per-gate penalty.
      beta_g:     (4,) per-gate ridge coefficient.
      is_tanh:    (4,) bool; True for gate g (tanh), False for sigmoid gates.
    """
    dtype = weights.dtype
    tanh_b = is_tanh[:, None, None, None]

    def act(x):
        return jnp.where(tanh_b, jnp.tanh(x), jax.nn.sigmoid(x))

    def d_act(x):
        s = jax.nn.sigmoid(x)
        return jnp.where(tanh_b, 1.0 - jnp.tanh(x) ** 2, s * (1.0 - s))

    def project(w):
        # (T,B,D) x (4,D,H) -> (4,T,B,H)
        return jnp.einsum('tbd,gdh->gtbh', m_inputs, w, precision=precision)

    pre = project(weights) + fixed_proj
    resid = act(pre) - gate_target
    grad = rho_g[:, None, None] * jnp.einsum(
        'tbd,gtbh->gdh', m_inputs, resid * d_act(pre), precision=precision)

    f_at_w = 0.5 * rho_g * jnp.sum(resid * resid, axis=(1, 2, 3))

    # Candidates are W + grad/theta, and `project` is linear, so every
    # line-search iteration reuses ONE precomputed gradient projection:
    #   project(W + grad/theta) = pre_w + grad_proj/theta.
    # This turns each doubling from an O(T*B*D*H) matmul into pure
    # elementwise work (the activation over the (4,T,B,H) slab).
    grad_proj = project(grad)

    def accept_fails(theta):
        """True per gate when the reference's while-condition holds
        (original(beta) > estimated(beta, theta)) => keep doubling."""
        th4 = theta[:, None, None, None]
        beta_pre = pre + grad_proj / th4
        r = act(beta_pre) - gate_target
        original = 0.5 * rho_g * jnp.sum(r * r, axis=(1, 2, 3))
        diff = grad / theta[:, None, None]
        inner = jnp.sum(grad * diff, axis=(1, 2))
        quad = jnp.sum(diff * diff, axis=(1, 2))
        estimated = f_at_w + inner + seq_len * 0.5 * theta * quad
        return original > estimated

    def cond(carry):
        theta, done, k = carry
        return jnp.logical_and(jnp.logical_not(jnp.all(done)), k < max_iters)

    def body(carry):
        theta, done, k = carry
        fails = accept_fails(theta)
        still_active = jnp.logical_and(jnp.logical_not(done), fails)
        theta = jnp.where(still_active, theta * 2.0, theta)
        done = jnp.logical_or(done, jnp.logical_not(fails))
        return theta, done, k + 1

    theta0 = jnp.ones((4,), dtype)
    theta, _, iters = lax.while_loop(cond, body, (theta0, jnp.zeros((4,), bool),
                                                  jnp.asarray(0, jnp.int32)))
    theta = theta / 2.0

    scale = 0.5 * rho_g * seq_len * theta
    new_w = (scale[:, None, None] * weights - grad) / (beta_g + scale)[:, None, None]
    return WeightStageResult(weights=new_w, theta=theta, iters=iters)


class WideStageResult(NamedTuple):
    weights: jax.Array    # (D, 4H) updated weights, gate-major columns
    proj_new: jax.Array   # (T, 4H, B) m_inputs @ weights (no extra matmul)
    theta: jax.Array      # (4,) final (halved) step sizes
    iters: jax.Array      # (4,) number of doublings taken


def weight_stage_update_wide(m_inputs: jax.Array, proj_self: jax.Array,
                             proj_other: jax.Array, weights_w: jax.Array,
                             target_w: jax.Array, rho_g: jax.Array,
                             beta_g: jax.Array, tanh_cols: jax.Array,
                             seq_len: int, max_iters: int,
                             precision) -> WideStageResult:
    """Gate-folded, BATCH-MINOR variant of `weight_stage_update`.

    Same math, different data layout: the four gates live side by side in
    axis 1 — slabs are (T, 4H, B) and weights (D, 4H) with columns ordered
    gate-major (k = g*H + h), design matrices (T, D, B).  On TPU the
    minor-most axis maps to the 128-wide vector lanes; the batch axis is
    the large one (GoogleStock B = 4224 = 33*128), so keeping it minor
    removes the lane padding an H- or 4H-minor slab pays at the
    reference's hidden sizes (see core/state.py layout notes and
    benchmarks/bench_layout.py) — and this stage's candidate passes over
    (pre, grad_proj, target) are where the epoch's bytes move.

    Two more structural savings over the stacked-layout stage:
      * the caller passes both sides' projections (`proj_self` =
        m_inputs @ weights_w, `proj_other` the frozen side), so the
        stage never re-projects the frozen side; and
      * because the prox-linear update is LINEAR in the weights
        (W+ = (s W - grad)/(beta + s)) and projection is linear, the
        updated projection `proj_new` is assembled elementwise from
        `proj_self` and the (already needed) gradient projection — the
        next stage's "fresh other-side projection" (admm.py:305) costs
        no matmul and no extra slab.

    Per-gate scalars (rho, beta, theta) enter the wide slabs as
    length-4H vectors broadcast over the batch lanes ([:, None]);
    per-gate reductions leave via sum-to-(4H,) then reshape(4, H)
    .sum(-1), so the (T, B)-sized reductions all run in the wide layout.
    """
    dtype = weights_w.dtype
    hidden = weights_w.shape[-1] // 4
    rho_cols = jnp.repeat(rho_g, hidden)     # (4H,)
    tanh_b = tanh_cols[:, None]              # (4H, 1) bool, broadcast over B

    # ONE transcendental per slab pass: sigmoid(x) = (1 + tanh(x/2)) / 2,
    # so both gate activations are a + b * tanh(s * x) with per-column
    # constants, and both derivatives are c * (1 - u^2) of the SAME
    # u = tanh(s * x).  The candidate passes are transcendental-bound in
    # the compact batch-minor layout; the where(tanh, sigmoid) form
    # evaluated BOTH families per element (4 transcendental slab evals
    # for act+d_act; this is 1).
    s_cols = jnp.where(tanh_b, 1.0, 0.5)
    b_cols = jnp.where(tanh_b, 1.0, 0.5)
    a_cols = jnp.where(tanh_b, 0.0, 0.5)
    c_cols = jnp.where(tanh_b, 1.0, 0.25)

    def act(x):
        return a_cols + b_cols * jnp.tanh(s_cols * x)

    def act_dact(x):
        u = jnp.tanh(s_cols * x)
        return a_cols + b_cols * u, c_cols * (1.0 - u * u)

    def per_gate(v):
        """(4H,) -> (4,) block sums."""
        return v.reshape(4, hidden).sum(-1)

    pre = proj_self + proj_other
    act_pre, dact_pre = act_dact(pre)
    resid = act_pre - target_w
    grad = rho_cols * jnp.einsum('tdb,tkb->dk', m_inputs, resid * dact_pre,
                                 precision=precision)

    f_at_w = 0.5 * rho_g * per_gate(jnp.sum(resid * resid, axis=(0, 2)))

    grad_proj = jnp.einsum('tdb,dk->tkb', m_inputs, grad, precision=precision)

    # The acceptance test's linear and quadratic terms collapse to ONE
    # scalar per gate: with diff = grad/theta,
    #   <grad, diff> + T/2 * theta * |diff|^2 = (1 + T/2) * S / theta,
    # where S = sum(grad^2).  So each search step needs only the slab-sized
    # `original` sum; everything else is scalar algebra.
    grad_sq = per_gate(jnp.sum(grad * grad, axis=0))          # (4,) = S
    est_coef = (1.0 + 0.5 * seq_len) * grad_sq

    # BLOCKED first-acceptance scan: the reference doubles theta one probe
    # at a time (admm.py:321-336); each probe is a pass over the
    # (pre, grad_proj, target) slabs.  Evaluating BLOCK_K candidate
    # thetas {theta * 2^j} per pass reads the slabs once at the cost of
    # BLOCK_K x the activation transcendentals.  Measured round 3 (TPU
    # v5e, GoogleStock, batch-minor layout + single-tanh activations):
    # K=4 and K=8 tie within relay noise (149 vs 145 us weight phase), so
    # the default stays 8 (fewer while-loop trips when a search needs
    # many doublings).  First-acceptance-on-the-lattice semantics (and
    # the max_iters cap) are preserved exactly for ANY block size:
    # candidates are ordered, masked past the cap, and the winner is the
    # lowest accepted exponent — precisely the theta the sequential loop
    # stops at (tests cover K in {2,4,8}).
    BLOCK_K = int(os.environ.get('ADMM_LS_BLOCK_K', '8'))

    def accept_block(theta_base, k):
        """(4, BLOCK_K) fails table for candidates theta_base * 2^j."""
        fails = []
        for j in range(BLOCK_K):
            th = theta_base * (2.0 ** j)
            th_cols = jnp.repeat(th, hidden)[:, None]    # (4H, 1)
            r = act(pre + grad_proj / th_cols) - target_w
            original = 0.5 * rho_g * per_gate(jnp.sum(r * r, axis=(0, 2)))
            fail = original > f_at_w + est_coef / th
            # Candidates past the doubling cap are forced to "fail" so the
            # capped sequential semantics survive blocking.
            fails.append(jnp.logical_or(fail, k + j >= max_iters))
        return jnp.stack(fails, axis=1)

    def cond(carry):
        _, _, done, k = carry
        return jnp.logical_and(jnp.logical_not(jnp.all(done)), k < max_iters)

    def body(carry):
        theta_base, theta_acc, done, k = carry
        fails = accept_block(theta_base, k)               # (4, BLOCK_K)
        accepts = jnp.logical_not(fails)
        found = jnp.any(accepts, axis=1)                  # (4,)
        first = jnp.argmax(accepts, axis=1)               # (4,) lowest j
        theta_hit = theta_base * (2.0 ** first.astype(dtype))
        newly = jnp.logical_and(jnp.logical_not(done), found)
        theta_acc = jnp.where(newly, theta_hit, theta_acc)
        done = jnp.logical_or(done, found)
        # Unaccepted gates advance by one block — clipped to the doubling
        # budget so a capped gate lands on exactly the sequential loop's
        # last doubled theta.
        step = jnp.minimum(BLOCK_K, max_iters - k).astype(dtype)
        theta_base = jnp.where(done, theta_base, theta_base * (2.0 ** step))
        return theta_base, theta_acc, done, k + BLOCK_K

    ones = jnp.ones((4,), dtype)
    theta_base, theta_acc, done, iters = lax.while_loop(
        cond, body, (ones, ones, jnp.zeros((4,), bool),
                     jnp.asarray(0, jnp.int32)))
    # Accepted gates stop at their first accepted theta; a gate that hit
    # the cap keeps its last doubled base (same as the sequential loop).
    theta = jnp.where(done, theta_acc, theta_base) / 2.0

    scale = 0.5 * rho_g * seq_len * theta                   # (4,)
    scale_cols = jnp.repeat(scale, hidden)
    denom_cols = jnp.repeat(beta_g + scale, hidden)
    new_w = (scale_cols * weights_w - grad) / denom_cols
    proj_new = ((scale_cols[:, None] * proj_self - grad_proj)
                / denom_cols[:, None])
    return WideStageResult(weights=new_w, proj_new=proj_new, theta=theta,
                           iters=iters)


class HFinalResult(NamedTuple):
    h: jax.Array
    theta: jax.Array


def h_final_update(h_old: jax.Array, o_new: jax.Array, tanh_c_new: jax.Array,
                   lam_h: jax.Array, rho_h: jax.Array,
                   wy: jax.Array, a_old: jax.Array,
                   rho_y: jax.Array, lam_y: jax.Array,
                   *, with_dual_y: bool, theta0: float, theta_max: float,
                   max_iters: int, precision,
                   grad_uses_rho_h: bool = False,
                   probe_is_grad_over_theta: bool = False,
                   to_out=None, from_out=None) -> HFinalResult:
    """Final-timestep h update: prox-linear on the output-fit term
    (admm.py:439-487; no-dual-y flavor admm.no_dual_y.py:414-449).

    Loop (faithful to the reference's break placement):
      theta = theta0; beta = probe(theta)
      while f(beta) > f(h) + <grad, beta-h> + theta/2*|beta-h|^2:
          theta *= 2; beta = probe(theta)
          if theta >= theta_max: break
      theta /= 2
      h_new = (theta*h + rho_h*o*tanh(c) - lam_h - grad) / (theta + rho_h)

    Flavor switches (for the no_dual_y variant, admm.no_dual_y.py:426,439):
      grad_uses_rho_h:          gradient scaled by rho_h instead of rho_y.
      probe_is_grad_over_theta: probe point is grad/theta instead of the
                                prox candidate.

    Layout: all non-readout math is elementwise.  The readout products are
    the only layout-sensitive ops; `to_out` (h-like -> output space, i.e.
    h @ wy) and `from_out` (output space -> h-like, i.e. r @ wy^T) let
    callers supply their convention — core passes batch-minor (H, B) ->
    out-minor (O, B) closures; the defaults below implement the
    batch-major (B, H) / (B, O) convention the stacked variant and the
    unit tests use.  a_old / lam_y just need to match to_out's output
    layout.
    """
    if to_out is None:
        to_out = lambda v: jnp.dot(v, wy, precision=precision)
    if from_out is None:
        from_out = lambda r: jnp.dot(r, wy.T, precision=precision)
    dtype = h_old.dtype
    target = a_old
    if with_dual_y:
        target = target + lam_y / rho_y

    hw0 = to_out(h_old)
    resid0 = hw0 - target
    grad_rho = rho_h if grad_uses_rho_h else rho_y
    grad = grad_rho * from_out(resid0)

    f_at_h = 0.5 * rho_y * jnp.sum(resid0 * resid0)
    prox_num_fixed = rho_h * o_new * tanh_c_new - lam_h - grad

    # Both probe families are affine in theta-reciprocal terms, so their
    # readout products hoist out of the loop: probe(theta)@wy is assembled
    # from hw0 = h_old@wy, pnf_wy = prox_num_fixed@wy, grad_wy = grad@wy —
    # each search iteration is then matmul-free.
    pnf_wy = to_out(prox_num_fixed)
    grad_wy = to_out(grad)

    def probe(theta):
        if probe_is_grad_over_theta:
            return grad / theta
        return (theta * h_old + prox_num_fixed) / (theta + rho_h)

    def probe_wy(theta):
        if probe_is_grad_over_theta:
            return grad_wy / theta
        return (theta * hw0 + pnf_wy) / (theta + rho_h)

    def accept_fails(theta):
        beta = probe(theta)
        r = probe_wy(theta) - target
        original = 0.5 * rho_y * jnp.sum(r * r)
        diff = beta - h_old
        estimated = (f_at_h + jnp.sum(grad * diff)
                     + 0.5 * theta * jnp.sum(diff * diff))
        return original > estimated

    def cond(carry):
        theta, stop, k = carry
        return jnp.logical_and(
            jnp.logical_and(jnp.logical_not(stop), k < max_iters),
            accept_fails(theta))

    def body(carry):
        theta, stop, k = carry
        theta = theta * 2.0
        stop = theta >= theta_max
        return theta, stop, k + 1

    theta0_arr = jnp.asarray(theta0, dtype)
    init = (theta0_arr, jnp.asarray(False), jnp.asarray(0, jnp.int32))
    theta, _, _ = lax.while_loop(cond, body, init)
    theta = theta / 2.0

    h_new = (theta * h_old + prox_num_fixed) / (theta + rho_h)
    return HFinalResult(h=h_new, theta=theta)
