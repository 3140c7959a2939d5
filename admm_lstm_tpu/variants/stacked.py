"""Stacked N-layer LSTM trained by ADMM (the build plan's stretch config).

The reference supports only a single LSTM layer; this module extends the
ADMM-LSTM family to an arbitrary stack (layer k: H_{k-1} -> H_k, linear
head on the top layer's h_T).  A naive extension — linearizing the upper
layer's gate constraints into the lower layer's h update — is unstable:
the linearized coupling drags the lower h slabs far outside the feasible
|h| < 1 manifold and the top layer ends up regressing on fantasy
features (measured: it never beats predicting the mean).

The working formulation instead introduces **pre-activation auxiliaries**
for every layer above the first, the same device the reference's
ADMM-LSTM-L variant uses within a layer (admm_l/admm_lstm.py:166-185) and
the standard trick of the deep-ADMM literature (Taylor et al. 2016):

    z_k,t   = wx_k @ h_{k-1,t} + wh_k @ h_{k,t-1}     (linear, dual lam_z)
    gate_k,t = act(z_k,t)                              (elementwise)

With z in place every inter-layer solve is quadratic:

  * h_{k,t} (k < top) minimizes  rho_h/2 ||h - o*tanh(c) + lam_h/rho_h||^2
    + rho_z/2 sum_g ||z_{k+1,g,t} - wx_{k+1,g} h - wh_{k+1,g} h_{k+1,t-1}
    + lam_z/rho_z||^2  — an H_k x H_k ridge solve whose matrix
    (rho_h I + rho_z sum_g wx_g wx_g^T) is FIXED across (b, t): it is
    inverted once per epoch and the per-timestep solve becomes one
    (B,H)x(H,H) matmul inside the scan (MXU-friendly);
  * z_k,t takes a majorized prox-linear elementwise step against the gate
    fit (the ADMM-L pattern, admm_lstm.py:166-185);
  * the upper layers' weight updates become EXACT ridge least squares
    (all four gates share one design matrix [h_{k-1,t}; h_{k,t-1}]);
  * layer 0 keeps the reference's single-layer treatment verbatim (its
    input x is ground truth), and the top layer's final h keeps the
    output prox (admm.py:470-487) + `a` + y-dual.

Epoch order: wy -> layer-0 weight prox -> upper-layer exact weight solves
-> joint t-sweep (bottom-up per timestep: layer-0 gates/c/h, then per
upper layer z -> gates -> c -> h), duals fused into the sweep.  Lower
layers' h duals stay at zero (the reference's own loose interior-h
treatment, admm.py:532-534) — ascending them accumulates and
destabilizes the late trajectory.

Measured behavior (after fixing the weight-phase timestep alignment —
the below-layer design rows must be the same-t h[1:], not the shifted
h[:-1]): monotone convergence on synthetic regression at depths 2-4
(depth 3: 0.0031 at 300 epochs vs mean floor 0.040) and on GoogleStock
(0.107 -> 0.0008 train in 120 epochs at (8,8)).

The round-1 long-T instability (YahooFinance T=60: val dips to ~0.004
near epoch 42 then TRAIN and val both jump to ~0.25 and never recover)
was traced to the layer-0 prox-linear weight search taking one
catastrophic step (max|wh0| 0.82 -> 789 in a single epoch).  Layer 0 now
uses the LM-anchored exact Gauss-Newton ridge solve
(`_layer0_weight_phase`), after which the same run is monotone for 120+
epochs (val 0.0038 at 120, best at the end).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from admm_lstm_tpu.core.state import (DualSlabs, GateSlabs, Penalties,
                                      penalties_from, ridges_from, Ridges)
from admm_lstm_tpu.core.step import StepRules, _timestep_primal_duals
from admm_lstm_tpu.models.lstm import LSTMParams, init_lstm_params
from admm_lstm_tpu.solvers import closed_form as cf
from admm_lstm_tpu.solvers.prox_linear import h_final_update
from admm_lstm_tpu.utils.config import ADMMConfig, ParameterSet


class StackedParams(NamedTuple):
    """N LSTM layers + readout head on the top layer's final hidden state."""

    layers: Tuple[LSTMParams, ...]   # layer k: wx (4,H_{k-1},H_k), wh (4,H_k,H_k)
    wy: jax.Array                    # (H_top, O)

    @property
    def layer1(self) -> LSTMParams:
        return self.layers[0]

    @property
    def layer2(self) -> LSTMParams:
        return self.layers[-1]

    @property
    def num_layers(self) -> int:
        return len(self.layers)


class StackedState(NamedTuple):
    params: StackedParams
    gates: Tuple[GateSlabs, ...]   # per layer; only the top layer's `a` is live
    duals: Tuple[DualSlabs, ...]   # per layer; only the top layer's `y` is live
    zs: Tuple[jax.Array, ...]      # len n-1: z for layer j+1, (T+1, 4, H_{j+1}, B)
    zduals: Tuple[jax.Array, ...]  # lam_z, same shapes
    rho: Penalties
    rho_z: jax.Array               # scalar penalty on the z linear constraints
    beta: Ridges
    epoch: jax.Array

    # Backward-compatible 2-layer accessors.
    @property
    def gates1(self) -> GateSlabs:
        return self.gates[0]

    @property
    def gates2(self) -> GateSlabs:
        return self.gates[-1]

    @property
    def duals1(self) -> DualSlabs:
        return self.duals[0]

    @property
    def duals2(self) -> DualSlabs:
        return self.duals[-1]


def init_stacked(key: jax.Array, input_size: int, hiddens: Sequence[int],
                 output_size: int) -> StackedParams:
    """Xavier-init an N-layer stack (hiddens = per-layer widths)."""
    if len(hiddens) < 1:
        raise ValueError('need at least one layer')
    keys = jax.random.split(key, len(hiddens) + 1)
    layers = []
    prev = input_size
    for k, hdim in enumerate(hiddens):
        layers.append(init_lstm_params(keys[k], prev, hdim, output_size))
        prev = hdim
    std = jnp.sqrt(2.0 / (prev + output_size))
    wy = std * jax.random.normal(keys[-1], (prev, output_size))
    return StackedParams(layers=tuple(layers), wy=wy)


def init_stacked_params(key: jax.Array, input_size: int, h1: int, h2: int,
                        output_size: int) -> StackedParams:
    """2-layer convenience wrapper (the original stretch config)."""
    return init_stacked(key, input_size, (h1, h2), output_size)


def _scan_stack(params: StackedParams, x: jax.Array, precision,
                collect: bool):
    """Shared N-layer forward: returns final (h,c) per layer and, when
    `collect`, per-layer gate histories + upper-layer pre-activations."""
    from admm_lstm_tpu.models.lstm import _gate_activations, _input_projections
    batch = x.shape[0]
    n = len(params.layers)
    init = []
    for lp in params.layers:
        z = jnp.zeros((batch, lp.hidden_size), x.dtype)
        init.append((z, z))
    xproj = _input_projections(params.layers[0], x, precision)

    def cell(carry, xp_t):
        new_carry = []
        outs = []
        pres = []
        inp_proj = xp_t
        for k, lp in enumerate(params.layers):
            h, c = carry[k]
            pre = inp_proj + jnp.einsum('bh,ghk->bgk', h, lp.wh,
                                        precision=precision)
            if collect and k > 0:
                pres.append(jnp.moveaxis(pre, 1, 0))   # (4, B, H_k)
            i, f, g, o = _gate_activations(pre)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            new_carry.append((h, c))
            if collect:
                outs.append((i, f, g, o, c, h))
            if k + 1 < n:
                inp_proj = jnp.einsum('bh,ghk->bgk', h,
                                      params.layers[k + 1].wx,
                                      precision=precision)
        out = (tuple(outs), tuple(pres)) if collect else None
        return tuple(new_carry), out

    final, hist = lax.scan(cell, tuple(init), xproj)
    return final, hist


def stacked_forward(params: StackedParams, x: jax.Array,
                    precision=lax.Precision.HIGHEST) -> jax.Array:
    """Inference: N stacked recurrences + head."""
    final, _ = _scan_stack(params, x, precision, collect=False)
    h_top = final[-1][0]
    return jnp.dot(h_top, params.wy, precision=precision)


def stacked_mse_loss(params: StackedParams, x, y,
                     precision=lax.Precision.HIGHEST):
    return jnp.mean((stacked_forward(params, x, precision) - y) ** 2)


def stacked_forward_im(params: StackedParams, x_im: jax.Array,
                       precision=lax.Precision.HIGHEST) -> jax.Array:
    """Inference on pre-transposed (T, I, B) inputs -> (O, B) predictions.

    The batch-minor counterpart of `stacked_forward` for epoch-chunked
    programs: the metric forwards re-read x every epoch, and the
    batch-major (B, T, I) layout lane-pads the tiny I axis up to 128x
    (see core/state.py layout notes) — the chain transposes once and
    scans over this.
    """
    n = len(params.layers)
    batch = x_im.shape[2]
    init = tuple((jnp.zeros((lp.hidden_size, batch), x_im.dtype),) * 2
                 for lp in params.layers)
    xproj = jnp.einsum('tdb,gdh->tghb', x_im, params.layers[0].wx,
                       precision=precision)

    def cell(carry, xp_t):
        new_carry = []
        inp_proj = xp_t                              # (4, H_k, B)
        for k, lp in enumerate(params.layers):
            h, c = carry[k]
            pre = inp_proj + jnp.einsum('hb,ghk->gkb', h, lp.wh,
                                        precision=precision)
            i = jax.nn.sigmoid(pre[0])
            f = jax.nn.sigmoid(pre[1])
            g = jnp.tanh(pre[2])
            o = jax.nn.sigmoid(pre[3])
            c = f * c + i * g
            h = o * jnp.tanh(c)
            new_carry.append((h, c))
            if k + 1 < n:
                inp_proj = jnp.einsum('hb,ghk->gkb', h,
                                      params.layers[k + 1].wx,
                                      precision=precision)
        return tuple(new_carry), None

    final, _ = lax.scan(cell, init, xproj)
    h_top = final[-1][0]                             # (H_top, B)
    return jnp.einsum('hb,ho->ob', h_top, params.wy, precision=precision)


def init_stacked_state(params: StackedParams, x: jax.Array,
                       parameter_set: ParameterSet,
                       config: ADMMConfig = ADMMConfig()) -> StackedState:
    """Seed every layer's gate/z slabs with one forward unroll (the N-layer
    analog of the reference's init_gate_variables, lstm.py:65-88).

    Slabs are stored TIME-MAJOR, BATCH-MINOR — gates/duals (T+1, H, B),
    z/z-duals (T+1, 4, H, B), a and lam_y (O, B) — the same layout as the
    single-layer core state (core/state.py layout notes): the minor axis
    maps to the TPU's 128-wide vector lanes, and at stacked widths
    (H = 8..64) an H-minor slab would inflate every elementwise touch of
    the sweep up to 16x (round-4 VERDICT #1: the stacked sweep riding the
    legacy batch-major layout was ~70% of the epoch)."""
    from admm_lstm_tpu.core.step import rules_for
    precision = rules_for(config).precision
    params = jax.tree.map(lambda a: jnp.array(a, copy=True), params)
    batch, seq_len, _ = x.shape
    final, (hist, pres) = _scan_stack(params, x, precision, collect=True)
    h_top = final[-1][0]
    a = jnp.dot(h_top, params.wy, precision=precision).T      # (O, B)
    out = params.wy.shape[1]
    n = len(params.layers)

    gates, duals, zs, zduals = [], [], [], []
    for k, lp in enumerate(params.layers):
        hdim = lp.hidden_size
        zero = jnp.zeros((1, hdim, batch), x.dtype)
        slabs = tuple(jnp.concatenate([zero, jnp.transpose(s, (0, 2, 1))],
                                      axis=0) for s in hist[k])
        a_val = a if k == n - 1 else jnp.zeros((out, batch), x.dtype)
        gates.append(GateSlabs(*slabs, a=a_val))
        z = lambda: jnp.zeros((seq_len + 1, hdim, batch), x.dtype)
        duals.append(DualSlabs(i=z(), f=z(), g=z(), o=z(), c=z(), h=z(),
                               y=jnp.zeros((out, batch), x.dtype)))
        if k > 0:
            zrow = jnp.zeros((1, 4, hdim, batch), x.dtype)
            zs.append(jnp.concatenate(
                [zrow, jnp.transpose(pres[k - 1], (0, 1, 3, 2))], axis=0))
            zduals.append(jnp.zeros((seq_len + 1, 4, hdim, batch), x.dtype))

    rho_z = jnp.asarray(parameter_set.rho.get('z', 1.0), x.dtype)
    return StackedState(
        params=params, gates=tuple(gates), duals=tuple(duals),
        zs=tuple(zs), zduals=tuple(zduals),
        rho=penalties_from(parameter_set, x.dtype), rho_z=rho_z,
        beta=ridges_from(parameter_set, x.dtype),
        epoch=jnp.asarray(0, jnp.int32))


def _layer0_weight_phase(x_im, gates, duals, params_layer, rho, beta,
                         rules: StepRules):
    """Layer-0 weight phase against the ground-truth input design matrix.

    Default: the LM-anchored exact Gauss-Newton ridge solve
    (solvers/normal_eq.py) in the same gate-folded, batch-minor (T, 4H, B)
    layout as the single-layer core's weight phase (core/step.py
    _weight_phase) — x_im is (T, D, B), slabs (T+1, H, B).  The
    reference-faithful prox-linear search is NOT safe inside the stack on
    long horizons: measured on YahooFinance (T=60, depth 2) it takes a
    catastrophic step at ~epoch 44 (max|wh0| 0.82 -> 789 in one epoch)
    that drops the whole run onto a worse fixed point (train 0.005 ->
    0.25, never recovers) — the dip/rebound instability.  The damped
    exact solve is stable and removes it.  exact_weight_solve=False is
    ignored here deliberately: the prox path remains only for the
    single-layer variant where it is the parity-exact reference
    semantics.
    """
    precision = rules.precision
    hidden = params_layer.hidden_size
    from admm_lstm_tpu.solvers.normal_eq import gauss_newton_ridge_update_wide

    def to_wide(w):      # (4, D, H) -> (D, 4H)
        return jnp.transpose(w, (1, 0, 2)).reshape(w.shape[1], 4 * hidden)

    def from_wide(w_w):  # (D, 4H) -> (4, D, H)
        return jnp.transpose(w_w.reshape(w_w.shape[0], 4, hidden), (1, 0, 2))

    rho_g = rho.stacked_ifgo()
    target_w = jnp.concatenate(
        [d[1:] / r + g[1:] for g, d, r in
         ((gates.i, duals.i, rho.i), (gates.f, duals.f, rho.f),
          (gates.g, duals.g, rho.g), (gates.o, duals.o, rho.o))], axis=1)
    tanh_cols = jnp.repeat(jnp.asarray((False, False, True, False)), hidden)
    h_hist = gates.h[:-1]                             # (T, H, B)

    wx_w, wh_w = to_wide(params_layer.wx), to_wide(params_layer.wh)
    xproj = jnp.einsum('tdb,dk->tkb', x_im, wx_w, precision=precision)
    hproj = jnp.einsum('tdb,dk->tkb', h_hist, wh_w, precision=precision)
    solver = functools.partial(gauss_newton_ridge_update_wide,
                               precision=precision,
                               use_pallas_chol=rules.use_pallas_chol)
    wx_new_w = solver(x_im, xproj + hproj, wx_w, target_w, rho_g, beta.x,
                      tanh_cols)
    xproj_new = jnp.einsum('tdb,dk->tkb', x_im, wx_new_w,
                           precision=precision)
    wh_new_w = solver(h_hist, xproj_new + hproj, wh_w, target_w, rho_g,
                      beta.h, tanh_cols)
    return params_layer._replace(wx=from_wide(wx_new_w),
                                 wh=from_wide(wh_new_w))


def _upper_weight_solve(h_below_hist, h_own_hist, z_slab, zdual_slab,
                        params_layer, rho_z, beta, precision):
    """Proximally damped joint ridge solve for an upper layer's (wx, wh).

    min over W_g = [wx_g; wh_g]:
      rho_z/2 sum_{t,b} ||X W_g - (z_g + lam_z/rho_z)||^2 + beta/2 ||W_g||^2
      + theta/2 ||W_g - W_g_old||^2
    with X = [h_{k-1,t} ; h_{k,t-1}] shared by all 4 gates.  The proximal
    term (theta = mean Gram diagonal, i.e. a unit-curvature damping) is
    essential: the UNdamped exact solve jumps to the global optimum of a
    target that moves every epoch, which measurably oscillates and
    diverges at depth >= 3.

    Batch-minor layout: h histories (T, H, B), z slabs (T+1, 4, H, B) —
    the Gram/RHS contract over (t, b) directly, no reshape to row form.
    """
    t_len, d_below, batch = h_below_hist.shape
    d_own = h_own_hist.shape[1]
    x_rows = jnp.concatenate([h_below_hist, h_own_hist], axis=1)
    # Targets: (T, 4, H_k, B).
    target = z_slab[1:] + zdual_slab[1:] / rho_z
    gram = rho_z * jnp.einsum('tdb,teb->de', x_rows, x_rows,
                              precision=precision)
    rhs = rho_z * jnp.einsum('tdb,tghb->gdh', x_rows, target,
                             precision=precision)
    reg = jnp.concatenate([
        jnp.broadcast_to(beta.x[:, None], (4, d_below)),
        jnp.broadcast_to(beta.h[:, None], (4, d_own))], axis=1)
    dim = gram.shape[0]
    theta = jnp.trace(gram) / dim
    w_old = jnp.concatenate([params_layer.wx, params_layer.wh], axis=1)
    mats = (gram[None] + jax.vmap(jnp.diag)(reg)
            + theta * jnp.eye(dim, dtype=gram.dtype))
    sol = jnp.linalg.solve(mats, rhs + theta * w_old)   # (4, D, H_k)
    return params_layer._replace(wx=sol[:, :d_below, :],
                                 wh=sol[:, d_below:, :])


def _z_prox_update(z_old, gate_target, v, rho_g4, rho_z, is_tanh,
                   resid_max):
    """Majorized prox-linear z step (the ADMM-L device, admm_lstm.py:166-185).

    Per element: min_z rho_g/2 (u - act(z))^2 + rho_z/2 (z - v)^2 with
    u = gate + lam_gate/rho_g.  Linearize the first term at z_old with a
    global curvature bound theta >= rho_g * (act'^2 + |resid| * |act''|).

    resid_max (scalar): max |act(z_old) - u| over the (4, H, B) block.
    It depends ONLY on previous-epoch slabs, so the caller hoists all T
    maxima into one vectorized pass before the sweep instead of paying a
    global reduction inside every serial scan step (round 5).
    """
    sig = jax.nn.sigmoid(z_old)
    tanh = jnp.tanh(z_old)
    act = jnp.where(is_tanh, tanh, sig)
    d_act = jnp.where(is_tanh, 1.0 - tanh ** 2, sig * (1.0 - sig))
    resid = act - gate_target
    grad = rho_g4 * resid * d_act
    theta = rho_g4 * jnp.where(is_tanh, 1.0 + 0.8 * resid_max,
                               0.0625 + 0.1 * resid_max)
    return (theta * z_old - grad + rho_z * v) / (theta + rho_z)


def stacked_admm_step(state: StackedState, train_x: jax.Array,
                      train_y: jax.Array, rules: StepRules) -> StackedState:
    """One N-layer ADMM epoch on (B, T, I) inputs / (B, O) targets."""
    x_im = jnp.transpose(train_x, (1, 2, 0)).astype(jnp.float32)
    y_im = jnp.transpose(train_y).astype(jnp.float32)
    return stacked_admm_step_im(state, x_im, y_im, rules)


def stacked_admm_step_im(state: StackedState, x_im: jax.Array,
                         y_im: jax.Array, rules: StepRules) -> StackedState:
    """One N-layer ADMM epoch on pre-transposed (T, I, B) inputs, (O, B)
    targets — the batch-minor hot path (epoch-chunked programs transpose
    once per chain, exactly like core.step.admm_step_im)."""
    precision = rules.precision
    seq_len = x_im.shape[0]
    batch = x_im.shape[2]
    rho = state.rho
    rho_z = state.rho_z
    n = len(state.params.layers)
    top = n - 1
    g_top, d_top = state.gates[top], state.duals[top]
    rho_g4 = rho.stacked_ifgo()[:, None, None]
    is_tanh4 = jnp.asarray((False, False, True, False))[:, None, None]
    # Dual damping (trace-time constant; 1.0 = exact ADMM — XLA folds the
    # no-op multiply away).  See StepRules.stacked_dual_decay.
    decay = rules.stacked_dual_decay

    # 1. Readout on the top layer's final hidden state.
    wy_new = cf.wy_update(state.params.wy, g_top.h[-1], g_top.a, rho.y,
                          state.beta.wy, d_top.y, rules.with_dual_y,
                          precision, batch_minor=True)

    # 2. Weight phases: layer 0 exact GN ridge vs x; upper layers exact
    # ridge vs their z targets (all inputs are the stale slab histories,
    # the inter-layer analog of admm.py:298's stale h usage).
    layers_new = [_layer0_weight_phase(x_im, state.gates[0], state.duals[0],
                                       state.params.layers[0], rho,
                                       state.beta, rules)]
    for k in range(1, n):
        # z_t = wx h_{k-1,t} + wh h_{k,t-1}: the below-layer history is the
        # SAME-t rows h[1:], the own history the shifted rows h[:-1].
        layers_new.append(_upper_weight_solve(
            state.gates[k - 1].h[1:], state.gates[k].h[:-1],
            state.zs[k - 1], state.zduals[k - 1], state.params.layers[k],
            rho_z, state.beta, precision))
    layers_new = tuple(layers_new)
    params_new = StackedParams(layers=layers_new, wy=wy_new)

    # Per-epoch constants of the quadratic h solves for layers below top:
    # M_k = rho_h I + rho_z sum_g wx_{k+1,g} wx_{k+1,g}^T, inverted once.
    m_invs = []
    for k in range(top):
        wx_up = layers_new[k + 1].wx                   # (4, H_k, H_{k+1})
        m = rho.h * jnp.eye(wx_up.shape[1], dtype=x_im.dtype)
        m = m + rho_z * jnp.einsum('gdh,geh->de', wx_up, wx_up,
                                   precision=precision)
        m_invs.append(jnp.linalg.inv(m))

    # 3. Joint sweep (all per-timestep blocks are (4, H, B) / (H, B)).
    xproj0 = jnp.einsum('tdb,gdh->tghb', x_im, layers_new[0].wx,
                        precision=precision)

    def gate_rows(k, sl):
        g = state.gates[k]
        return tuple(s[sl] for s in (g.i, g.f, g.g, g.o, g.c, g.h))

    def dual_rows(k, sl):
        d = state.duals[k]
        return tuple(s[sl] for s in (d.i, d.f, d.g, d.o, d.c, d.h))

    def coupled_h_solve(k, o_n, c_n, lam_h, z_above_t, zdual_above_t,
                        h_above_prev):
        """Closed-form h_{k,t} for k < top: ridge against z_{k+1}."""
        wx_up, wh_up = layers_new[k + 1].wx, layers_new[k + 1].wh
        fixed = jnp.einsum('hb,ghk->gkb', h_above_prev, wh_up,
                           precision=precision)
        tgt = z_above_t + zdual_above_t / rho_z - fixed    # (4, H_{k+1}, B)
        rhs = (rho.h * o_n * jnp.tanh(c_n) - lam_h
               + rho_z * jnp.einsum('ghb,gdh->db', tgt, wx_up,
                                    precision=precision))
        return jnp.einsum('de,eb->db', m_invs[k], rhs, precision=precision)

    def upper_layer_block(k, old, duals_t, z_t, zdual_t, h_below_fresh,
                          h_prev, c_prev, rm_t):
        """z -> gates -> c for an upper layer at one timestep; returns the
        fresh primals, gate/c duals, fresh z and its dual, plus (o, tanh_c)
        for the caller's h treatment."""
        wx_k, wh_k = layers_new[k].wx, layers_new[k].wh
        lin = (jnp.einsum('db,gdh->ghb', h_below_fresh, wx_k,
                          precision=precision)
               + jnp.einsum('hb,ghk->gkb', h_prev, wh_k,
                            precision=precision))
        gate_old4 = jnp.stack(old[:4])
        lam_g4 = jnp.stack(duals_t[:4])
        u = gate_old4 + lam_g4 / rho_g4
        z_new = _z_prox_update(z_t, u, lin - zdual_t / rho_z, rho_g4,
                               rho_z, is_tanh4, rm_t)
        sig = jax.nn.sigmoid(z_new)
        act4 = jnp.where(is_tanh4, jnp.tanh(z_new), sig)

        i_o, f_o, g_o, o_o, c_o, h_o = old
        lam_i, lam_f, lam_g, lam_o, lam_c, lam_h = duals_t
        i_n = cf.gate_ifgo_update(lam_i, rho.i, act4[0], g_o, f_o, c_prev,
                                  c_o, rho.c, lam_c)
        f_n = cf.gate_ifgo_update(lam_f, rho.f, act4[1], c_prev, g_o, i_n,
                                  c_o, rho.c, lam_c)
        g_n = cf.gate_ifgo_update(lam_g, rho.g, act4[2], i_n, f_n, c_prev,
                                  c_o, rho.c, lam_c)
        o_n = cf.gate_ifgo_update(lam_o, rho.o, act4[3], jnp.tanh(c_o), 0.0,
                                  0.0, h_o, rho.h, lam_h)
        c_n = cf.c_update(c_o, o_n, h_o, lam_h, lam_c, rho.h, rho.c,
                          f_n, c_prev, i_n, g_n)

        lam_i_n = decay * cf.dual_ifgo_update(lam_i, rho.i, i_n, act4[0])
        lam_f_n = decay * cf.dual_ifgo_update(lam_f, rho.f, f_n, act4[1])
        lam_g_n = decay * cf.dual_ifgo_update(lam_g, rho.g, g_n, act4[2])
        lam_o_n = decay * cf.dual_ifgo_update(lam_o, rho.o, o_n, act4[3])
        lam_c_n = decay * cf.dual_c_update(lam_c, rho.c, c_n, f_n, c_prev,
                                           i_n, g_n)
        lam_z_n = decay * (zdual_t + rho_z * (z_new - lin))
        return ((i_n, f_n, g_n, o_n, c_n),
                (lam_i_n, lam_f_n, lam_g_n, lam_o_n, lam_c_n),
                z_new, lam_z_n)

    def sweep_timestep(xp0_t, olds, dus, z_ts, zdual_ts, rm_ts, h_prevs,
                       c_prevs, final_t: bool):
        """All layers at one timestep.  Returns per-layer primal 6-tuples,
        per-layer dual tuples (i,f,g,o,c[,h]), fresh z + z-duals, and for
        the final timestep the top (o, tanh_c) needed by the output prox."""
        prims, lams, z_news, zlam_news = [], [], [], []
        # Layer 0: reference single-layer treatment, batch-minor fast
        # path (pre supplied, so the legacy batch-major fallback inside
        # _timestep_primal_duals is never taken).
        pre0 = xp0_t + jnp.einsum('hb,ghk->gkb', h_prevs[0],
                                  layers_new[0].wh, precision=precision)
        (i0, f0, g0, o0, c0), lam0 = _timestep_primal_duals(
            xp0_t, olds[0], dus[0], h_prevs[0], c_prevs[0],
            layers_new[0].wh, rho, precision, pre=pre0)
        lam0 = tuple(decay * l for l in lam0)
        if top == 0:
            prims.append((i0, f0, g0, o0, c0, None))
            lams.append(lam0)
            return prims, lams, z_news, zlam_news
        h0 = coupled_h_solve(0, o0, c0, dus[0][5], z_ts[0], zdual_ts[0],
                             h_prevs[1])
        # Loose treatment: lower-layer h duals stay at zero, exactly like
        # the reference's interior-h duals (admm.py:532-534).  Letting them
        # ascend every epoch accumulates and measurably destabilizes the
        # late trajectory; the rho_h tether alone keeps h near o*tanh(c).
        lam0 = lam0 + (dus[0][5],)
        prims.append((i0, f0, g0, o0, c0, h0))
        lams.append(lam0)

        for k in range(1, n):
            (prim5, lam5, z_new, zlam_new) = upper_layer_block(
                k, olds[k], dus[k], z_ts[k - 1], zdual_ts[k - 1],
                prims[k - 1][5], h_prevs[k], c_prevs[k], rm_ts[k - 1])
            z_news.append(z_new)
            zlam_news.append(zlam_new)
            i_n, f_n, g_n, o_n, c_n = prim5
            if k < top:
                h_n = coupled_h_solve(k, o_n, c_n, dus[k][5], z_ts[k],
                                      zdual_ts[k], h_prevs[k + 1])
                lam5 = lam5 + (dus[k][5],)   # loose: see layer-0 comment
            elif not final_t:
                h_n = cf.h_interior_update(o_n, jnp.tanh(c_n), dus[k][5],
                                           rho.h)
            else:
                h_n = None   # the caller runs the output prox
            prims.append((i_n, f_n, g_n, o_n, c_n, h_n))
            lams.append(lam5)
        return prims, lams, z_news, zlam_news

    def body(carry, xs):
        h_prevs, c_prevs = carry
        xp0_t, olds, dus, z_ts, zdual_ts, rm_ts = xs
        prims, lams, z_news, zlam_news = sweep_timestep(
            xp0_t, olds, dus, z_ts, zdual_ts, rm_ts, h_prevs, c_prevs,
            final_t=False)
        if top == 0:
            h0 = cf.h_interior_update(prims[0][3], jnp.tanh(prims[0][4]),
                                      dus[0][5], rho.h)
            prims[0] = prims[0][:5] + (h0,)
        new_h = tuple(p[5] for p in prims)
        new_c = tuple(p[4] for p in prims)
        return ((new_h, new_c),
                (tuple(prims), tuple(lams), tuple(z_news), tuple(zlam_news)))

    # Hoisted z-prox curvature bounds: resid_max per (layer, t) in ONE
    # vectorized pass over previous-epoch slabs (see _z_prox_update).
    resmaxes = []
    for k in range(1, n):
        g_k, d_k = state.gates[k], state.duals[k]
        u_slab = (jnp.stack([g_k.i, g_k.f, g_k.g, g_k.o], axis=1)
                  + jnp.stack([d_k.i, d_k.f, d_k.g, d_k.o], axis=1)
                  / rho_g4[None])                      # (T+1, 4, H, B)
        z_slab = state.zs[k - 1]
        act = jnp.where(is_tanh4[None], jnp.tanh(z_slab),
                        jax.nn.sigmoid(z_slab))
        resmaxes.append(jnp.max(jnp.abs(act - u_slab), axis=(1, 2, 3)))

    interior = slice(1, seq_len)
    init = (tuple(state.gates[k].h[0] for k in range(n)),
            tuple(state.gates[k].c[0] for k in range(n)))
    xs = (xproj0[:seq_len - 1],
          tuple(gate_rows(k, interior) for k in range(n)),
          tuple(dual_rows(k, interior) for k in range(n)),
          tuple(z[interior] for z in state.zs),
          tuple(zd[interior] for zd in state.zduals),
          tuple(rm[interior] for rm in resmaxes))
    (h_prevs, c_prevs), (prims_s, lams_s, z_s, zlam_s) = lax.scan(
        body, init, xs)

    # Final timestep: lower layers keep their coupled solves; the top
    # layer's h gets the output prox + a + h-dual.
    olds_T = tuple(gate_rows(k, seq_len) for k in range(n))
    dus_T = tuple(dual_rows(k, seq_len) for k in range(n))
    zs_T = tuple(z[seq_len] for z in state.zs)
    zduals_T = tuple(zd[seq_len] for zd in state.zduals)
    rms_T = tuple(rm[seq_len] for rm in resmaxes)
    prims_T, lams_T, z_T_news, zlam_T_news = sweep_timestep(
        xproj0[seq_len - 1], olds_T, dus_T, zs_T, zduals_T, rms_T,
        h_prevs, c_prevs, final_t=True)
    o_T, c_T = prims_T[top][3], prims_T[top][4]
    tanh_c_T = jnp.tanh(c_T)
    # Batch-minor readout closures (core/step.py:463-468 rationale): h
    # tensors (H, B), output-space tensors (O, B).
    to_out = lambda v: jnp.einsum('hb,ho->ob', v, wy_new,
                                  precision=precision)
    from_out = lambda r: jnp.einsum('ob,ho->hb', r, wy_new,
                                    precision=precision)
    h_T = h_final_update(
        olds_T[top][5], o_T, tanh_c_T, dus_T[top][5], rho.h, wy_new,
        g_top.a, rho.y, d_top.y, with_dual_y=rules.with_dual_y,
        theta0=rules.h_theta0, theta_max=rules.h_theta_max,
        max_iters=rules.max_backtrack, precision=precision,
        grad_uses_rho_h=rules.h_grad_uses_rho_h,
        probe_is_grad_over_theta=rules.h_probe_grad_over_theta,
        to_out=to_out, from_out=from_out).h
    a_new = cf.a_update(y_im, to_out(h_T), rho.y, d_top.y, batch,
                        rules.with_dual_y)
    lam_h_T = decay * cf.dual_h_update(dus_T[top][5], rho.h, h_T, o_T,
                                       tanh_c_T)
    prims_T[top] = prims_T[top][:5] + (h_T,)

    # Assemble per-layer slabs: zero row 0 | scan rows | final row.
    gates_new, duals_new, zs_new, zduals_new = [], [], [], []
    for k in range(n):
        hdim = state.params.layers[k].hidden_size
        zero = jnp.zeros((1, hdim, batch), x_im.dtype)

        def assemble(mid, last):
            return jnp.concatenate([zero, mid, last[None]], axis=0)

        prim_slabs = tuple(assemble(prims_s[k][j], prims_T[k][j])
                           for j in range(6))
        if k == top:
            gates_new.append(GateSlabs(*prim_slabs, a=a_new))
            # Top layer: duals for i,f,g,o,c at every t; h only at T
            # (admm.py:532-534).
            dual_slabs = tuple(assemble(lams_s[k][j], lams_T[k][j])
                               for j in range(5))
            lam_y = d_top.y
            if rules.with_dual_y:
                lam_y = cf.dual_y_update(d_top.y, rho.y, a_new,
                                         to_out(h_T))
            duals_new.append(DualSlabs(
                *dual_slabs, h=state.duals[k].h.at[seq_len].set(lam_h_T),
                y=lam_y))
        else:
            gates_new.append(GateSlabs(*prim_slabs, a=state.gates[k].a))
            dual_slabs = tuple(assemble(lams_s[k][j], lams_T[k][j])
                               for j in range(6))
            duals_new.append(DualSlabs(*dual_slabs, y=state.duals[k].y))
        if k > 0:
            zzero = jnp.zeros((1, 4, hdim, batch), x_im.dtype)
            zs_new.append(jnp.concatenate(
                [zzero, z_s[k - 1], z_T_news[k - 1][None]], axis=0))
            zduals_new.append(jnp.concatenate(
                [zzero, zlam_s[k - 1], zlam_T_news[k - 1][None]], axis=0))

    return StackedState(params=params_new, gates=tuple(gates_new),
                        duals=tuple(duals_new), zs=tuple(zs_new),
                        zduals=tuple(zduals_new), rho=state.rho,
                        rho_z=state.rho_z, beta=state.beta,
                        epoch=state.epoch + 1)


@functools.lru_cache(maxsize=16)
def _jitted(rules: StepRules, donate: bool):
    fn = functools.partial(stacked_admm_step, rules=rules)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def make_stacked_step(config: ADMMConfig, donate: bool = True):
    from admm_lstm_tpu.core.step import rules_for
    return _jitted(rules_for(config), donate)


@functools.lru_cache(maxsize=32)
def _cached_stacked_multi_epoch(rules: StepRules, num_epochs: int,
                                donate: bool):
    def run(state, best_val, best_params, x, y, vx, vy):
        # Transpose ONCE per chain to the batch-minor hot layout (the
        # core make_multi_epoch_fn pattern): scanning the batch-major
        # (B, T, I) inputs would re-read their 128x lane-padded minor
        # axes every epoch.  Train/val losses share ONE forward over the
        # batch-concatenated inputs.
        x_im = jnp.transpose(x, (1, 2, 0)).astype(jnp.float32)
        y_im = jnp.transpose(y).astype(jnp.float32)
        vx_im = jnp.transpose(vx, (1, 2, 0)).astype(jnp.float32)
        vy_im = jnp.transpose(vy).astype(jnp.float32)
        xall_im = jnp.concatenate([x_im, vx_im], axis=-1)
        n_train = x.shape[0]

        def losses(params):
            pred = stacked_forward_im(params, xall_im, rules.precision)
            tr = jnp.mean((pred[:, :n_train] - y_im) ** 2)
            vl = jnp.mean((pred[:, n_train:] - vy_im) ** 2)
            return tr, vl

        def body(carry, _):
            state, best_val, best_params, best_epoch = carry
            state = stacked_admm_step_im(state, x_im, y_im, rules)
            tr, vl = losses(state.params)
            better = vl < best_val
            best_val = jnp.where(better, vl, best_val)
            best_params = jax.tree.map(
                lambda new, old: jnp.where(better, new, old),
                state.params, best_params)
            best_epoch = jnp.where(better, state.epoch, best_epoch)
            return (state, best_val, best_params, best_epoch), (tr, vl)

        init = (state, best_val, best_params,
                jnp.zeros((), state.epoch.dtype))
        (state, best_val, best_params, best_epoch), (tr, vl) = lax.scan(
            body, init, None, length=num_epochs)
        return state, best_val, best_params, best_epoch, tr, vl

    return jax.jit(run, donate_argnums=(0, 2) if donate else ())


def make_stacked_multi_epoch_fn(config: ADMMConfig, num_epochs: int,
                                donate: bool = True):
    """`num_epochs` stacked ADMM epochs inside ONE device program
    (`lax.scan`), with BEST-VALIDATION-iterate tracking carried in-scan
    (params are tiny next to the slabs, so the per-epoch tree-where is
    free).  Signature: (state, best_val, best_params, x, y, vx, vy) ->
    (state, best_val, best_params, best_epoch, train_traj, val_traj).
    The stacked counterpart of core.step.make_multi_epoch_fn."""
    from admm_lstm_tpu.core.step import rules_for
    return _cached_stacked_multi_epoch(rules_for(config), num_epochs, donate)


def train_stacked(train_x, train_y, val_x, val_y,
                  parameter_set: ParameterSet, config: ADMMConfig,
                  hidden2: int = 0, log_every: int = 10,
                  hiddens: Optional[Sequence[int]] = None,
                  track_best: bool = True) -> Dict[str, object]:
    """N-layer ADMM training loop (same contract as api.train).

    `hiddens` gives every layer's width explicitly; otherwise the stack is
    the 2-layer (config.hidden_size, hidden2 or config.hidden_size).

    track_best keeps the best-validation iterate and returns it as
    'params' (alongside 'final_params'): long-horizon stacks on long
    sequences can dip early and rebound (see the module docstring), and
    nonconvex ADMM has no monotonicity guarantee — the best iterate is
    the deliverable.
    """
    from admm_lstm_tpu.utils.logging import info
    from admm_lstm_tpu.utils.timer import Timer
    train_x, train_y = jnp.asarray(train_x), jnp.asarray(train_y)
    val_x, val_y = jnp.asarray(val_x), jnp.asarray(val_y)
    if hiddens is None:
        hiddens = (config.hidden_size, hidden2 or config.hidden_size)
    hiddens = tuple(int(h) for h in hiddens)
    params = init_stacked(jax.random.PRNGKey(config.seed), train_x.shape[2],
                          hiddens, train_y.shape[1])
    state = init_stacked_state(params, train_x, parameter_set, config)
    loss_fn = jax.jit(stacked_mse_loss)

    train_losses = [float(loss_fn(state.params, train_x, train_y))]
    val_losses = [float(loss_fn(state.params, val_x, val_y))]
    depth = 'x'.join(str(h) for h in hiddens)
    info(f'{len(hiddens)}-layer ADMM ({depth}). Initial loss: '
         f'train {train_losses[0]:.8f} | val {val_losses[0]:.8f}')

    # Epoch-CHUNKED loop (one lax.scan program per chunk, like api.train)
    # with the best-iterate tracking carried ON DEVICE inside the scan —
    # no per-epoch host sync.  A distinct copy of the initial params
    # seeds the best-iterate carry (state and best_params are both
    # donated, so they must not alias).
    best_val = jnp.asarray(val_losses[0], jnp.float32)
    best_params = jax.tree.map(lambda a: jnp.array(a, copy=True),
                               state.params)
    best_epoch = 0
    timer = Timer()
    timer.start()
    epoch = 0
    tr_chunks, vl_chunks = [], []
    while epoch < config.epochs:
        chunk = config.epochs - epoch
        if log_every:
            chunk = min(chunk, log_every - epoch % log_every)
        run = make_stacked_multi_epoch_fn(config, chunk, donate=True)
        state, best_val, best_params, be, tr, vl = run(
            state, best_val, best_params, train_x, train_y, val_x, val_y)
        tr_chunks.append(tr)
        vl_chunks.append(vl)
        epoch += chunk
        if int(be) > 0:  # a new global best fell inside this chunk
            best_epoch = int(be)
        if log_every and epoch % log_every == 0:
            timer.pause()
            info(f'Epoch {epoch}: train {float(tr[-1]):.8f} | '
                 f'val {float(vl[-1]):.8f}')
            timer.resume()
    jax.block_until_ready(state.params.wy)
    timer.pause()
    import numpy as np
    train_losses += list(map(float, np.asarray(jnp.concatenate(tr_chunks))))
    val_losses += list(map(float, np.asarray(jnp.concatenate(vl_chunks))))
    best_epoch = best_epoch if float(best_val) < val_losses[0] else 0
    if track_best and best_epoch != config.epochs:
        info(f'Best validation {float(best_val):.8f} at epoch {best_epoch} '
             f'(final epoch: {val_losses[-1]:.8f}); returning the best '
             f'iterate.')
    return {'name': 'Stacked ADMM-LSTM', 'train_loss': train_losses,
            'val_loss': val_losses,
            'params': best_params if track_best else state.params,
            'final_params': state.params,
            'best_epoch': best_epoch if track_best else config.epochs,
            'state': state,
            'seconds': timer.get_elapsed_time()}
