"""The one-epoch ADMM update as a pure, jittable function.

This is the TPU re-design of the reference's `ADMMBasedOptimizer.step()`
(admm.py:62-78).  The reference runs an eager Python sweep with ~O(T * 50)
tiny dispatched tensor ops and `.clone().detach()` on every access
(admm.py:187-213); here the entire epoch compiles to one XLA program:

  1. readout update `wy`            — closed form (see solvers/closed_form.py
                                      for the proof the reference's search is
                                      a no-op).
  2. 8 gate-weight updates          — two 4-gate-parallel prox-linear solves
     (x-side then h-side, matching the reference's x2g-before-h2g order)
     with lockstep `lax.while_loop` line searches. The input-side design
     matrices and targets are formed once as wide (T*B)-row matmuls (MXU).
  3. the timestep sweep t = 1..T    — one `lax.scan` carrying (h, c), exact
     Gauss-Seidel order i,f,g,o,c,h inside the body (admm.py:345-351);
     the final timestep (prox-linear h + output auxiliary `a` + h-dual) is
     peeled out of the scan so the hot body has no conditionals.
  4. dual ascent for i,f,g,o,c at every t fused into the scan body; h-dual
     at t = T; optional y-dual (admm.py:77-78).

Variant switches (fast vs no_dual_y, reference admm.py vs admm.no_dual_y.py)
are static `StepRules`, so each variant compiles to its own specialized
program with zero runtime branching.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from admm_lstm_tpu.core.state import ADMMState, DualSlabs, GateSlabs
from admm_lstm_tpu.models.lstm import LSTMParams
from admm_lstm_tpu.solvers import closed_form as cf
from admm_lstm_tpu.solvers.normal_eq import gauss_newton_ridge_update_wide
from admm_lstm_tpu.solvers.prox_linear import (h_final_update,
                                               weight_stage_update_wide)
from admm_lstm_tpu.utils.config import ADMMConfig

_PRECISIONS = {
    'highest': lax.Precision.HIGHEST,
    'high': lax.Precision.HIGH,
    'default': lax.Precision.DEFAULT,
}

# Gate order i,f,g,o; only g uses tanh.
_IS_TANH = (False, False, True, False)


@dataclasses.dataclass(frozen=True)
class StepRules:
    """Static (trace-time) parameters selecting the solver variant."""

    with_dual_y: bool = False
    # wy update: final theta and the ridge multiplier in the denominator.
    #   fast      (admm.py:266-280):            theta = 1/2,   beta factor 1
    #   no_dual_y (admm.no_dual_y.py:231-249):  theta = 0.005, beta factor 2
    wy_theta: float = 0.5
    wy_beta_factor: float = 1.0
    # final-h search flavor (see solvers/prox_linear.h_final_update).
    h_grad_uses_rho_h: bool = False
    h_probe_grad_over_theta: bool = False
    h_theta0: float = 0.1
    h_theta_max: float = 1.0
    max_backtrack: int = 60
    # Lipschitz-safeguarded wy step: theta = max(wy_theta,
    # rho_y * lambda_max(h^T h)) — a TRUE majorizer of the wy objective.
    # The reference's wy line searches are tautological no-ops (their
    # acceptance predicates compare f(beta) against f(beta) + a positive
    # quantity; admm.py:262-277, admm.no_dual_y.py:237-245), leaving a
    # fixed tiny theta that diverges whenever rho_y * ||h||^2 > theta
    # (measured: no_dual_y explodes on YahooFinance with the shipped
    # tuning).  Off by default for reference parity.
    wy_lipschitz: bool = False
    # Residual-balancing rho adaptation (core/residuals.balanced_rho):
    # after each epoch, any family whose primal residual dominates its
    # dual residual (x mu) gets rho *= tau, and vice versa.  Off by
    # default (reference parity keeps rho fixed at the shipped tunings).
    adaptive_rho: bool = False
    adapt_mu: float = 10.0
    adapt_tau: float = 2.0
    # Freeze the adaptation once state.epoch reaches this (0 = never):
    # late adaptation cycles rho around the deadband and perturbs the
    # fixed-point approach (see utils/config.py round-3 diagnosis).
    adapt_stop_epoch: int = 0
    # Geometric dual damping for the STACKED variant only: every dual
    # ascent becomes lam <- decay * (lam + rho * resid).  1.0 = exact
    # ADMM; slightly below 1 suppresses the late-stage dual oscillation
    # long-horizon stacks exhibit (variants/stacked.py docstring).
    stacked_dual_decay: float = 1.0
    matmul_precision: str = 'highest'
    exact_weight_solve: bool = False
    exact_solve_max_dim: int = 160
    # True / False / 'auto' (see utils/config.ADMMConfig.use_pallas_sweep;
    # resolved per shape by _sweep_uses_pallas).
    use_pallas_sweep: object = False
    use_pallas_chol: bool = False
    # Data-parallel composition of the Pallas sweep kernels: when a Mesh
    # is attached here (parallel/sharding.make_sharded_* does this for
    # plain-DP layouts), the sweep's pallas_calls are wrapped in
    # `jax.shard_map` over `pallas_shard_axis` — each device runs the
    # kernel on its local batch shard (the kernel's grid already tiles
    # the batch/lane axis, so a shard is just a smaller batch; the math
    # is elementwise + per-batch-column independent, making the sharded
    # run bit-equal to the unsharded one).  None = no wrapping (single
    # device, or layouts where the kernels don't apply: time-sharded
    # slabs cut the kernel's sequential-time grid, model-sharded slabs
    # cut its full-H blocks).
    pallas_shard_mesh: object = None
    pallas_shard_axis: str = 'data'
    # 'gauss_seidel' = the reference's exact sequential order (lax.scan);
    # 'jacobi' = all interior timesteps updated in parallel from the
    # PREVIOUS sweep's (h, c) — one vmapped block, no recurrence, enabling
    # time-axis sharding for long sequences (documented semantic drift:
    # within-sweep t-1 information arrives one sweep later).
    sweep_mode: str = 'gauss_seidel'

    @property
    def precision(self):
        return _PRECISIONS[self.matmul_precision]


def rules_for(config: ADMMConfig) -> StepRules:
    common = dict(
        h_theta0=config.h_theta0, h_theta_max=config.h_theta_max,
        max_backtrack=config.max_backtrack,
        matmul_precision=config.matmul_precision,
        exact_weight_solve=config.exact_weight_solve,
        exact_solve_max_dim=config.exact_solve_max_dim,
        use_pallas_sweep=config.use_pallas_sweep,
        use_pallas_chol=config.use_pallas_chol,
        sweep_mode=config.sweep_mode,
        # Adaptive rho implies the Lipschitz-safeguarded wy step: the
        # reference's fixed theta is only valid while rho_y stays tiny
        # (see wy_lipschitz above), and rho adaptation is free to raise
        # it — measured: GoogleStock diverges to NaN within 30 epochs
        # without the safeguard, converges to 0.0087 with it.
        wy_lipschitz=config.wy_lipschitz or config.adaptive_rho,
        adaptive_rho=config.adaptive_rho,
        adapt_mu=config.adapt_mu,
        adapt_tau=config.adapt_tau,
        adapt_stop_epoch=config.adapt_stop_epoch,
        stacked_dual_decay=config.stacked_dual_decay,
    )
    if config.variant == 'no_dual_y':
        return StepRules(with_dual_y=False, wy_theta=0.005, wy_beta_factor=2.0,
                         h_grad_uses_rho_h=True, h_probe_grad_over_theta=True,
                         **common)
    if config.variant == 'fast':
        return StepRules(with_dual_y=config.with_dual_y, **common)
    raise ValueError(f'core.step handles fast/no_dual_y; {config.variant} '
                     f'lives in admm_lstm_tpu.variants')


def _sweep_uses_pallas(rules: StepRules, seq_len: int, hidden: int) -> bool:
    """Resolve the use_pallas_sweep flag for a concrete shape.

    'auto' enables the Gauss-Seidel kernel on TPU at seq_len >= 16 and
    hidden <= 128, where the time-blocked grid amortizes the scan's
    per-step overhead (measured: 1.20x at T=16, 1.56x at T=24, 1.38x at
    T=32, rising to 3.3x at T=1024/2048, all at bit-matched quality;
    the T=10 GoogleStock shape ties, hence the floor); the Jacobi
    kernel never auto-enables (it loses to the vmapped XLA block at
    every measured shape)."""
    flag = rules.use_pallas_sweep
    if flag == 'auto':
        return (jax.default_backend() == 'tpu'
                and rules.sweep_mode == 'gauss_seidel'
                and seq_len >= 16 and hidden <= 128)
    return bool(flag)


def _wy_update(state: ADMMState, rules: StepRules) -> jax.Array:
    """Readout update generalized over variant constants (admm.py:246-280)."""
    precision = rules.precision
    h_last = state.gates.h[-1]                      # (H, B) batch-minor
    resid = (jnp.einsum('hb,ho->ob', h_last, state.params.wy,
                        precision=precision) - state.gates.a)
    if rules.with_dual_y:
        resid = resid - state.duals.y / state.rho.y
    grad = state.rho.y * jnp.einsum('hb,ob->ho', h_last, resid,
                                    precision=precision)
    theta = jnp.asarray(rules.wy_theta, state.params.wy.dtype)
    if rules.wy_lipschitz:
        gram = jnp.einsum('hb,kb->hk', h_last, h_last, precision=precision)
        lip = state.rho.y * jnp.linalg.eigvalsh(gram)[-1]
        theta = jnp.maximum(theta, lip)
    denom = theta + rules.wy_beta_factor * state.beta.wy
    return (theta * state.params.wy - grad) / denom


def _weight_phase(state: ADMMState, x_im: jax.Array,
                  rules: StepRules) -> Tuple[jax.Array, jax.Array]:
    """The 8 gate-weight updates as two 4-gate-parallel stages.

    Stage ordering preserves the reference's Gauss-Seidel structure
    (admm.py:69-71: x2g then h2g per gate): the h-side stage sees the fresh
    x-side weights.  Cross-gate batching is exact because gate updates are
    mutually independent (each touches only its own gate's slabs/duals).

    Data layout is GATE-FOLDED and BATCH-MINOR: slabs are (T, 4H, B) with
    the four gates side by side in axis 1 (gate-major, k = g*H + h) and
    the batch in the minor axis, weights (D, 4H).  On TPU the minor axis
    maps to the 128-wide vector lanes; putting the LARGE axis (B) there
    removes the lane padding that an (.., H) or (.., 4H) minor axis pays
    at the reference's hidden sizes (H=10: 12.8x / 3.2x inflated HBM
    traffic per slab touch — measured in benchmarks/bench_layout.py).
    The weight phase is where the epoch's bytes move
    (benchmarks/bench_attrib.py), so this layout is the phase's roofline
    fix.  The two stages also SHARE projections: each side's
    design-matrix projection is computed once, and stage H's "fresh
    x-side projection" (admm.py:305) is assembled elementwise from stage
    X's already-computed arrays via linearity of the prox update (see
    weight_stage_update_wide), never re-projected.
    """
    precision = rules.precision
    seq_len = state.seq_len
    hidden = state.hidden_size
    gates, duals, rho = state.gates, state.duals, state.rho
    h_hist = gates.h[:-1]          # (T, H, B) stale history incl. zero row
    rho_g = rho.stacked_ifgo()     # (4,)

    def to_wide(w):      # (4, D, H) -> (D, 4H)
        return jnp.transpose(w, (1, 0, 2)).reshape(w.shape[1], 4 * hidden)

    def from_wide(w_w):  # (D, 4H) -> (4, D, H)
        return jnp.transpose(w_w.reshape(w_w.shape[0], 4, hidden), (1, 0, 2))

    # target = dual/rho + gate per gate (admm.py:309-310), rows t=1..T.
    target_w = jnp.concatenate(
        [d[1:] / r + g[1:] for g, d, r in
         ((gates.i, duals.i, rho.i), (gates.f, duals.f, rho.f),
          (gates.g, duals.g, rho.g), (gates.o, duals.o, rho.o))], axis=1)
    tanh_cols = jnp.repeat(jnp.asarray(_IS_TANH), hidden)

    wx_w, wh_w = to_wide(state.params.wx), to_wide(state.params.wh)
    xproj = jnp.einsum('tdb,dk->tkb', x_im, wx_w, precision=precision)
    hproj = jnp.einsum('tdb,dk->tkb', h_hist, wh_w, precision=precision)

    # Under exact_weight_solve each STAGE picks by its own design width D
    # (static at trace time): exact for D <= exact_solve_max_dim (default
    # 160: both sides of every small-feature dataset and the hidden side
    # up to H = 160), prox-linear above.  The chunked Gram builder
    # (solvers/normal_eq._gram_bvec) keeps memory bounded at any D —
    # the round-3 OOM at H = 256 / D = 561 is fixed — but the Gram FLOPs
    # grow as O(4H * D^2 * T * B) (~500x the prox step at D = 561), so
    # widening past the default is an explicit config decision.
    def run_stage(m_inputs, proj_self, proj_other, w_w, beta_g, need_proj):
        """-> (new_w wide, fresh self-projection or None).

        m_inputs is (T, D, B); the stage's design width D is axis 1.
        """
        if (rules.exact_weight_solve
                and m_inputs.shape[1] <= rules.exact_solve_max_dim):
            new_w = gauss_newton_ridge_update_wide(
                m_inputs, proj_self + proj_other, w_w, target_w, rho_g,
                beta_g, tanh_cols, precision,
                use_pallas_chol=rules.use_pallas_chol)
            proj_new = (jnp.einsum('tdb,dk->tkb', m_inputs, new_w,
                                   precision=precision) if need_proj else None)
            return new_w, proj_new
        res = weight_stage_update_wide(
            m_inputs, proj_self, proj_other, w_w, target_w, rho_g, beta_g,
            tanh_cols, seq_len, rules.max_backtrack, precision)
        return res.weights, res.proj_new

    # Stage X: update x2{i,f,g,o}; hidden-side projection fixed at old wh.
    wx_new_w, xproj_new = run_stage(x_im, xproj, hproj, wx_w, state.beta.x,
                                    need_proj=True)
    # Stage H: update h2{i,f,g,o}; input-side projection uses FRESH wx.
    wh_new_w, _ = run_stage(h_hist, hproj, xproj_new, wh_w, state.beta.h,
                            need_proj=False)
    return from_wide(wx_new_w), from_wide(wh_new_w)


def _timestep_primal_duals(xp_t, old, duals_t, h_prev, c_prev, wh, rho,
                           precision, pre=None):
    """Shared interior-timestep math: primal i,f,g,o,c + duals i,f,g,o,c.

    Exactly the reference's in-timestep Gauss-Seidel order (admm.py:345-351):
    each update sees the freshly written earlier blocks.  Returns everything
    the caller needs to finish the step (h differs between interior/final t).

    All math here is elementwise, so the function is LAYOUT-FREE when `pre`
    is supplied — and since round 5 EVERY production caller supplies it
    with batch-minor (4, H, B) blocks (core and the stacked variant
    alike).  The pre=None fallback below assumes the legacy
    batch-at-axis-0 (B, H) convention and exists only for unit tests;
    do not call it with batch-minor blocks (at H == B it would silently
    compute a transposed pre-activation).
    """
    i_o, f_o, g_o, o_o, c_o, h_o = old
    lam_i, lam_f, lam_g, lam_o, lam_c, lam_h = duals_t

    if pre is None:
        pre = xp_t + jnp.einsum('bh,ghk->gbk', h_prev, wh,
                                precision=precision)
    act_i = jax.nn.sigmoid(pre[0])
    act_f = jax.nn.sigmoid(pre[1])
    act_g = jnp.tanh(pre[2])
    act_o = jax.nn.sigmoid(pre[3])

    i_n = cf.gate_ifgo_update(lam_i, rho.i, act_i, g_o, f_o, c_prev,
                              c_o, rho.c, lam_c)
    f_n = cf.gate_ifgo_update(lam_f, rho.f, act_f, c_prev, g_o, i_n,
                              c_o, rho.c, lam_c)
    g_n = cf.gate_ifgo_update(lam_g, rho.g, act_g, i_n, f_n, c_prev,
                              c_o, rho.c, lam_c)
    o_n = cf.gate_ifgo_update(lam_o, rho.o, act_o, jnp.tanh(c_o), 0.0, 0.0,
                              h_o, rho.h, lam_h)
    c_n = cf.c_update(c_o, o_n, h_o, lam_h, lam_c, rho.h, rho.c,
                      f_n, c_prev, i_n, g_n)

    lam_i_n = cf.dual_ifgo_update(lam_i, rho.i, i_n, act_i)
    lam_f_n = cf.dual_ifgo_update(lam_f, rho.f, f_n, act_f)
    lam_g_n = cf.dual_ifgo_update(lam_g, rho.g, g_n, act_g)
    lam_o_n = cf.dual_ifgo_update(lam_o, rho.o, o_n, act_o)
    lam_c_n = cf.dual_c_update(lam_c, rho.c, c_n, f_n, c_prev, i_n, g_n)

    return (i_n, f_n, g_n, o_n, c_n), (lam_i_n, lam_f_n, lam_g_n, lam_o_n,
                                       lam_c_n)


def _sweep(state: ADMMState, x_im: jax.Array, params_new: LSTMParams,
           y_im: jax.Array, rules: StepRules):
    """The t = 1..T sweep: scan over interior steps, peeled final step.

    Batch-minor layout throughout: per-timestep blocks are (4, H, B) /
    (H, B) — the minor (lane) axis is the batch, so the ~17 slab
    reads/writes per scan step carry no lane padding at small H (see
    core/state.py layout notes).
    """
    precision = rules.precision
    rho = state.rho
    seq_len = state.seq_len
    batch = state.batch_size

    # Hoist the input-side projections out of the recurrence: one wide matmul.
    xproj = jnp.einsum('tdb,gdh->tghb', x_im, params_new.wx,
                       precision=precision)  # (T, 4, H, B)

    gates, duals = state.gates, state.duals

    def slabs_at(slab_tuple, sl):
        return tuple(s[sl] for s in slab_tuple)

    old_slabs = (gates.i, gates.f, gates.g, gates.o, gates.c, gates.h)
    dual_slabs = (duals.i, duals.f, duals.g, duals.o, duals.c, duals.h)

    interior = slice(1, seq_len)  # t = 1..T-1

    def recur_pre(xp_t, h_prev):
        # (4, H, B) pre-activations: input projection + recurrent matmul.
        return xp_t + jnp.einsum('hb,ghk->gkb', h_prev, params_new.wh,
                                 precision=precision)

    def body(carry, xs):
        h_prev, c_prev = carry
        xp_t, old, duals_t = xs
        (i_n, f_n, g_n, o_n, c_n), lam_n = _timestep_primal_duals(
            xp_t, old, duals_t, h_prev, c_prev, params_new.wh, rho, precision,
            pre=recur_pre(xp_t, h_prev))
        lam_h = duals_t[5]
        h_n = cf.h_interior_update(o_n, jnp.tanh(c_n), lam_h, rho.h)
        outs = (i_n, f_n, g_n, o_n, c_n, h_n) + lam_n
        return (h_n, c_n), outs

    init_carry = (gates.h[0], gates.c[0])
    if rules.sweep_mode == 'jacobi' and seq_len > 1:
        # Time-parallel block update: every interior timestep reads the
        # PREVIOUS sweep's h[t-1], c[t-1] instead of the in-sweep carry —
        # no recurrence, so the whole block vmaps over t (and the time
        # axis of all slabs can be sharded).  Gauss-Seidel order i..h is
        # preserved WITHIN each timestep.
        h_prev_all = gates.h[0:seq_len - 1]
        c_prev_all = gates.c[0:seq_len - 1]
        # One wide recurrent projection over all interior timesteps: a
        # single (H, .)x(., 4H)-shaped MXU contraction (vmapping the
        # per-step einsum instead costs ~10x in layout copies).
        wh_flat = jnp.transpose(params_new.wh, (1, 0, 2)).reshape(
            state.hidden_size, 4 * state.hidden_size)
        rec = jnp.einsum('thb,hk->tkb', h_prev_all, wh_flat,
                         precision=precision)
        rec = rec.reshape(seq_len - 1, 4, state.hidden_size, batch)
        pre_all = xproj[:seq_len - 1] + rec

        if _sweep_uses_pallas(rules, seq_len, state.hidden_size):
            # Fused elementwise Pallas pass over all (t, b) blocks: one
            # batch-minor kernel (lanes = batch, no padding) instead of
            # XLA's materialized per-op intermediates.
            from admm_lstm_tpu.kernels.gate_sweep import pallas_jacobi_sweep
            interpret = jax.default_backend() != 'tpu'
            rho_vec = jnp.stack([rho.i, rho.f, rho.g, rho.o, rho.c, rho.h])
            call = functools.partial(pallas_jacobi_sweep,
                                     interpret=interpret)
            if rules.pallas_shard_mesh is not None:
                from jax.sharding import PartitionSpec as P
                ax = rules.pallas_shard_axis
                slab = P(None, None, ax)
                call = jax.shard_map(
                    call, mesh=rules.pallas_shard_mesh,
                    in_specs=(P(None, None, None, ax), (slab,) * 6,
                              (slab,) * 6, slab, slab, P()),
                    out_specs=((slab,) * 6, (slab,) * 5),
                    check_vma=False)
            new_gates, new_duals = call(
                pre_all, slabs_at(old_slabs, interior),
                slabs_at(dual_slabs, interior), h_prev_all, c_prev_all,
                rho_vec)
            scanned = new_gates + new_duals
        else:
            def jstep(xp_t, old, duals_t, h_prev, c_prev):
                (i_n, f_n, g_n, o_n, c_n), lam_n = _timestep_primal_duals(
                    xp_t, old, duals_t, h_prev, c_prev, params_new.wh, rho,
                    precision, pre=xp_t)
                h_n = cf.h_interior_update(o_n, jnp.tanh(c_n), duals_t[5],
                                           rho.h)
                return (i_n, f_n, g_n, o_n, c_n, h_n) + lam_n

            scanned = jax.vmap(jstep, in_axes=(0, 0, 0, 0, 0))(
                pre_all, slabs_at(old_slabs, interior),
                slabs_at(dual_slabs, interior), h_prev_all, c_prev_all)
        # The peeled final step still consumes the freshest available
        # (h, c) at T-1: the values just computed.
        h_prev, c_prev = scanned[5][-1], scanned[4][-1]
    elif _sweep_uses_pallas(rules, seq_len, state.hidden_size) and seq_len > 1:
        from admm_lstm_tpu.kernels.gate_sweep import pallas_interior_sweep
        interpret = jax.default_backend() != 'tpu'
        rho_vec = jnp.stack([rho.i, rho.f, rho.g, rho.o, rho.c, rho.h])
        call = functools.partial(pallas_interior_sweep, interpret=interpret)
        if rules.pallas_shard_mesh is not None:
            from jax.sharding import PartitionSpec as P
            ax = rules.pallas_shard_axis
            slab = P(None, None, ax)
            call = jax.shard_map(
                call, mesh=rules.pallas_shard_mesh,
                in_specs=(P(None, None, None, ax), P(), (slab,) * 6,
                          (slab,) * 6, P()),
                out_specs=((slab,) * 6, (slab,) * 5),
                check_vma=False)
        new_gates, new_duals = call(
            xproj[:seq_len - 1], params_new.wh,
            slabs_at(old_slabs, interior), slabs_at(dual_slabs, interior),
            rho_vec)
        scanned = new_gates + new_duals
        h_prev, c_prev = scanned[5][-1], scanned[4][-1]
    else:
        xs = (xproj[:seq_len - 1],
              slabs_at(old_slabs, interior),
              slabs_at(dual_slabs, interior))
        (h_prev, c_prev), scanned = lax.scan(body, init_carry, xs)

    # --- Final timestep t = T (admm.py:74-76: gates, then a, then duals). ---
    old_T = slabs_at(old_slabs, seq_len)
    duals_T = slabs_at(dual_slabs, seq_len)
    (i_T, f_T, g_T, o_T, c_T), lam_T = _timestep_primal_duals(
        xproj[seq_len - 1], old_T, duals_T, h_prev, c_prev, params_new.wh,
        rho, precision, pre=recur_pre(xproj[seq_len - 1], h_prev))
    tanh_c_T = jnp.tanh(c_T)
    wy = params_new.wy
    # Batch-minor readout closures for the layout-free final-h search:
    # h-like tensors are (H, B), output-space tensors (O, B) — the output
    # axis stays off the 128-wide lane dimension (O = 1 on every bundled
    # regression dataset would otherwise pad each a/y touch 128x).
    to_out = lambda v: jnp.einsum('hb,ho->ob', v, wy, precision=precision)
    from_out = lambda r: jnp.einsum('ob,ho->hb', r, wy, precision=precision)
    h_T = h_final_update(
        old_T[5], o_T, tanh_c_T, duals_T[5], rho.h,
        wy, gates.a, rho.y, duals.y,
        with_dual_y=rules.with_dual_y, theta0=rules.h_theta0,
        theta_max=rules.h_theta_max, max_iters=rules.max_backtrack,
        precision=precision,
        grad_uses_rho_h=rules.h_grad_uses_rho_h,
        probe_is_grad_over_theta=rules.h_probe_grad_over_theta,
        to_out=to_out, from_out=from_out).h

    a_new = cf.a_update(y_im, to_out(h_T), rho.y, duals.y,
                        batch, rules.with_dual_y)
    lam_h_T = cf.dual_h_update(duals_T[5], rho.h, h_T, o_T, tanh_c_T)

    # --- Reassemble (T+1, H, B) slabs: zero row 0 | scan rows | final row. ---
    zero_row = jnp.zeros((1, state.hidden_size, batch), x_im.dtype)

    def assemble(mid, last):
        return jnp.concatenate([zero_row, mid, last[None]], axis=0)

    i_s, f_s, g_s, o_s, c_s, h_s, li_s, lf_s, lg_s, lo_s, lc_s = scanned
    gates_new = GateSlabs(
        i=assemble(i_s, i_T), f=assemble(f_s, f_T), g=assemble(g_s, g_T),
        o=assemble(o_s, o_T), c=assemble(c_s, c_T), h=assemble(h_s, h_T),
        a=a_new)

    # h-dual rows t < T are never written (admm.py:532-534).
    lam_h_slab = duals.h.at[seq_len].set(lam_h_T)
    lam_T_i, lam_T_f, lam_T_g, lam_T_o, lam_T_c = lam_T

    def assemble_dual(old_slab, mid, last):
        del old_slab
        return jnp.concatenate([zero_row, mid, last[None]], axis=0)

    duals_new = DualSlabs(
        i=assemble_dual(duals.i, li_s, lam_T_i),
        f=assemble_dual(duals.f, lf_s, lam_T_f),
        g=assemble_dual(duals.g, lg_s, lam_T_g),
        o=assemble_dual(duals.o, lo_s, lam_T_o),
        c=assemble_dual(duals.c, lc_s, lam_T_c),
        h=lam_h_slab,
        y=duals.y)
    return gates_new, duals_new


def admm_step(state: ADMMState, train_x: jax.Array, train_y: jax.Array,
              rules: StepRules) -> ADMMState:
    """One full ADMM epoch: (state, (B,T,I), (B,O)) -> state.

    Faithful to the update ordering of admm.py:62-78:
    wy -> 8 gate weights -> per-t primal/dual sweep (+ a at t=T) -> y-dual.
    """
    # (T, I, B) / (O, B): time-major, BATCH-MINOR (core/state.py notes).
    x_im = jnp.transpose(train_x, (1, 2, 0)).astype(jnp.float32)
    y_im = jnp.transpose(train_y).astype(jnp.float32)
    return admm_step_im(state, x_im, y_im, rules)


def admm_step_im(state: ADMMState, x_im: jax.Array, y_im: jax.Array,
                 rules: StepRules) -> ADMMState:
    """`admm_step` on pre-transposed (T, I, B) inputs and (O, B) targets.

    Epoch-chunked programs (make_multi_epoch_fn and the sharded
    counterparts) transpose x and y ONCE per chain and scan over this
    function: x arrives from the host as (B, T, I) and y as (B, O),
    whose minor axes are tiny (I = O = 1 on GoogleStock/Yahoo) and
    lane-pad up to 128x — re-reading those padded layouts every epoch
    (the transposes plus the metric forwards) measurably dominated the
    post-layout-refactor epoch.
    """
    precision = rules.precision

    # Storage-dtype policy (ADMMConfig.dtype='bfloat16'): slabs live in
    # HBM at reduced precision, ALL math runs in f32.  The up/downcasts
    # fuse into the first consumer / last producer of each slab, so the
    # f32 copies never materialize — only the (halved) slab traffic does.
    slab_dtype = state.gates.i.dtype
    if slab_dtype != jnp.float32:
        up = lambda a: a.astype(jnp.float32)
        state = state._replace(gates=jax.tree.map(up, state.gates),
                               duals=jax.tree.map(up, state.duals))

    wy_new = _wy_update(state, rules)
    state = state._replace(params=state.params._replace(wy=wy_new))

    wx_new, wh_new = _weight_phase(state, x_im, rules)
    params_new = LSTMParams(wx=wx_new, wh=wh_new, wy=wy_new)

    gates_new, duals_new = _sweep(state, x_im, params_new, y_im, rules)

    if rules.with_dual_y:
        hw = jnp.einsum('hb,ho->ob', gates_new.h[-1], params_new.wy,
                        precision=precision)
        lam_y = cf.dual_y_update(duals_new.y, state.rho.y, gates_new.a, hw)
        duals_new = duals_new._replace(y=lam_y)

    if slab_dtype != jnp.float32:
        down = lambda a: a.astype(slab_dtype)
        gates_new = GateSlabs(*(down(s) for s in gates_new[:6]),
                              a=gates_new.a)
        duals_new = DualSlabs(*(down(s) for s in duals_new[:6]),
                              y=duals_new.y)
    new_state = ADMMState(params=params_new, gates=gates_new,
                          duals=duals_new, rho=state.rho, beta=state.beta,
                          epoch=state.epoch + 1)
    if rules.adaptive_rho:
        from admm_lstm_tpu.core.residuals import (admm_residuals_im,
                                                  balanced_rho,
                                                  dual_residuals)
        primal = admm_residuals_im(new_state, x_im, precision)
        dual = dual_residuals(new_state, state.gates)
        rho_new = balanced_rho(new_state.rho, primal, dual,
                               mu=rules.adapt_mu, tau=rules.adapt_tau)
        if rules.adapt_stop_epoch:
            live = new_state.epoch <= rules.adapt_stop_epoch
            rho_new = jax.tree.map(
                lambda n, o: jnp.where(live, n, o), rho_new, new_state.rho)
        new_state = new_state._replace(rho=rho_new)
    return new_state


def make_epoch_fn(config: ADMMConfig, donate: bool = True,
                  with_residuals: bool = False):
    """One program per epoch: step + train/val loss (+ residuals).

    Fusing the metric evaluation into the step program matters twice on
    TPU: XLA shares the forward pass work, and the training loop executes
    a single executable (no per-epoch program switching / extra dispatch).
    Signature: (state, x, y, vx, vy) -> (state, metrics dict).
    """
    from admm_lstm_tpu.core.residuals import admm_residuals_im, dual_residuals
    from admm_lstm_tpu.models.lstm import train_val_mse_im
    rules = rules_for(config)

    def epoch(state, x, y, vx, vy):
        x_im = jnp.transpose(x, (1, 2, 0)).astype(jnp.float32)
        vx_im = jnp.transpose(vx, (1, 2, 0)).astype(jnp.float32)
        y_im = jnp.transpose(y).astype(jnp.float32)
        vy_im = jnp.transpose(vy).astype(jnp.float32)
        prev_gates = state.gates
        state = admm_step_im(state, x_im, y_im, rules)
        xall_im = jnp.concatenate([x_im, vx_im], axis=-1)
        train_l, val_l = train_val_mse_im(state.params, xall_im, y_im,
                                          vy_im, rules.precision)
        metrics = {'train_loss': train_l, 'val_loss': val_l}
        if with_residuals:
            metrics.update(admm_residuals_im(state, x_im, rules.precision))
            metrics.update(dual_residuals(state, prev_gates))
        return state, metrics

    return jax.jit(epoch, donate_argnums=(0,) if donate else ())


@functools.lru_cache(maxsize=128)
def _cached_multi_epoch(rules: StepRules, num_epochs: int, donate: bool,
                        with_residuals: bool):
    from admm_lstm_tpu.core.residuals import admm_residuals_im, dual_residuals
    from admm_lstm_tpu.models.lstm import train_val_mse_im

    def run(state, x, y, vx, vy):
        # Hoist the batch-minor transposes OUT of the epoch scan: x/vx
        # arrive (B, T, I) and y/vy (B, O), whose tiny minor axes
        # lane-pad up to 128x; re-reading those layouts every epoch (the
        # step's transposes + two metric forwards) would dominate a
        # sub-200us epoch.  The train and val inputs concatenate (once)
        # along the batch lanes so both metrics come out of ONE forward
        # scan per epoch (train_val_mse_im).
        x_im = jnp.transpose(x, (1, 2, 0)).astype(jnp.float32)
        vx_im = jnp.transpose(vx, (1, 2, 0)).astype(jnp.float32)
        y_im = jnp.transpose(y).astype(jnp.float32)
        vy_im = jnp.transpose(vy).astype(jnp.float32)
        xall_im = jnp.concatenate([x_im, vx_im], axis=-1)

        def body(state, _):
            prev_gates = state.gates
            state = admm_step_im(state, x_im, y_im, rules)
            train_l, val_l = train_val_mse_im(state.params, xall_im, y_im,
                                              vy_im, rules.precision)
            metrics = {'train_loss': train_l, 'val_loss': val_l}
            if with_residuals:
                metrics.update(admm_residuals_im(state, x_im,
                                                 rules.precision))
                metrics.update(dual_residuals(state, prev_gates))
            return state, metrics

        return lax.scan(body, state, None, length=num_epochs)

    return jax.jit(run, donate_argnums=(0,) if donate else ())


def make_multi_epoch_fn(config: ADMMConfig, num_epochs: int,
                        donate: bool = True, with_residuals: bool = False):
    """Run `num_epochs` ADMM epochs inside ONE device program
    (`lax.scan` over epochs), returning per-epoch metric trajectories as
    on-device arrays — exactly one host round-trip per chunk.

    This is the production loop shape for TPU: the reference's
    epoch-at-a-time host loop (demo.py:352-356) costs a host sync per
    epoch, which at sub-100us epochs dominates end-to-end time.
    """
    return _cached_multi_epoch(rules_for(config), num_epochs, donate,
                               with_residuals)


@functools.lru_cache(maxsize=64)
def _cached_multi_epoch_best(rules: StepRules, num_epochs: int,
                             with_residuals: bool):
    from admm_lstm_tpu.core.residuals import admm_residuals_im, dual_residuals
    from admm_lstm_tpu.models.lstm import train_val_mse_im

    def run(state, best_val, best_params, x, y, vx, vy):
        x_im = jnp.transpose(x, (1, 2, 0)).astype(jnp.float32)
        vx_im = jnp.transpose(vx, (1, 2, 0)).astype(jnp.float32)
        y_im = jnp.transpose(y).astype(jnp.float32)
        vy_im = jnp.transpose(vy).astype(jnp.float32)
        xall_im = jnp.concatenate([x_im, vx_im], axis=-1)

        def body(carry, _):
            state, best_val, best_params = carry
            prev_gates = state.gates
            state = admm_step_im(state, x_im, y_im, rules)
            tl, vl = train_val_mse_im(state.params, xall_im, y_im, vy_im,
                                      rules.precision)
            metrics = {
                'train_loss': tl,
                'val_loss': vl,
            }
            if with_residuals:
                metrics.update(admm_residuals_im(state, x_im,
                                                 rules.precision))
                metrics.update(dual_residuals(state, prev_gates))
            better = vl < best_val
            best_val = jnp.where(better, vl, best_val)
            best_params = jax.tree.map(
                lambda new, old: jnp.where(better, new, old),
                state.params, best_params)
            return (state, best_val, best_params), metrics

        (state, best_val, best_params), metrics = lax.scan(
            body, (state, best_val, best_params), None, length=num_epochs)
        return state, best_val, best_params, metrics

    return jax.jit(run, donate_argnums=(0, 2))


def make_multi_epoch_best_fn(config: ADMMConfig, num_epochs: int,
                             with_residuals: bool = False):
    """Epoch-chunked program with ON-DEVICE best-validation-iterate
    tracking (the per-epoch tree-where over the tiny params is free next
    to the slab work).  Signature: (state, best_val, best_params, x, y,
    vx, vy) -> (state, best_val, best_params, metrics).  state and
    best_params are DONATED.

    Nonconvex ADMM has no monotonicity guarantee — on some problems
    (measured: SMSSpam, every stable rho_c; tools/diag notes in
    docs/ROADMAP.md) the validation loss rebounds after its minimum, so
    the best iterate, not the final one, is the deliverable."""
    return _cached_multi_epoch_best(rules_for(config), num_epochs,
                                    with_residuals)


@functools.lru_cache(maxsize=64)
def _cached_step(rules: StepRules, donate: bool):
    fn = functools.partial(admm_step, rules=rules)
    donate_argnums = (0,) if donate else ()
    return jax.jit(fn, donate_argnums=donate_argnums)


def make_admm_step(config: ADMMConfig, donate: bool = True):
    """Build the jitted epoch function for a config (fast / no_dual_y).

    Cached per (rules, donate) so repeated construction (tests, resumed
    training loops) reuses the compiled executable.
    """
    return _cached_step(rules_for(config), donate)
