"""Stacked 2-layer LSTM trained by ADMM (the build plan's stretch config).

The reference supports only a single LSTM layer; this module extends the
fast ADMM-LSTM formulation to a 2-layer stack (layer1: I -> H1,
layer2: H1 -> H2, linear head on h2_T), designed in the same "fast/loose"
spirit as admm.py:

  * each layer carries its own gate/state auxiliaries and duals;
  * layer 2's gate constraints read layer 1's hidden trajectory where the
    single-layer problem reads train_x — so layer 2's weight-update design
    matrix is the (stale) h1 history, exactly as the reference's
    hidden-side updates use the stale h history (admm.py:298);
  * layer 1's h update keeps the closed form h1 = o1*tanh(c1) - lam/rho at
    EVERY timestep (the reference's own loose treatment of h for t < T:
    downstream couplings are handled by the duals of the consuming
    constraints, not inside the h subproblem);
  * only layer 2's final h gets the output prox-linear update, and the
    output auxiliary a / y-dual are unchanged.

Epoch order: wy -> layer-1 weights -> layer-2 weights -> joint t-sweep
(layer-1 block then layer-2 block per timestep, both in the reference's
i,f,g,o,c,h Gauss-Seidel order) -> duals fused into the sweep.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from admm_lstm_tpu.core.state import (DualSlabs, GateSlabs, Penalties,
                                      penalties_from, ridges_from, Ridges)
from admm_lstm_tpu.core.step import (StepRules, _timestep_primal_duals,
                                     _weight_phase)
from admm_lstm_tpu.models.lstm import LSTMParams, init_lstm_params
from admm_lstm_tpu.solvers import closed_form as cf
from admm_lstm_tpu.solvers.prox_linear import h_final_update, weight_stage_update
from admm_lstm_tpu.utils.config import ADMMConfig, ParameterSet


class StackedParams(NamedTuple):
    """Two LSTM layers + readout. layer2.wy is unused; wy is the head."""

    layer1: LSTMParams   # wx (4,I,H1), wh (4,H1,H1)
    layer2: LSTMParams   # wx (4,H1,H2), wh (4,H2,H2)
    wy: jax.Array        # (H2, O)


class StackedState(NamedTuple):
    params: StackedParams
    gates1: GateSlabs    # a field unused (zeros)
    duals1: DualSlabs    # y field unused
    gates2: GateSlabs    # a = output auxiliary
    duals2: DualSlabs    # y = output dual
    rho: Penalties
    beta: Ridges
    epoch: jax.Array


def init_stacked_params(key: jax.Array, input_size: int, h1: int, h2: int,
                        output_size: int) -> StackedParams:
    k1, k2, k3 = jax.random.split(key, 3)
    l1 = init_lstm_params(k1, input_size, h1, output_size)
    l2 = init_lstm_params(k2, h1, h2, output_size)
    std = jnp.sqrt(2.0 / (h2 + output_size))
    wy = std * jax.random.normal(k3, (h2, output_size))
    return StackedParams(layer1=l1, layer2=l2, wy=wy)


def stacked_forward(params: StackedParams, x: jax.Array,
                    precision=lax.Precision.HIGHEST) -> jax.Array:
    """Inference: two stacked recurrences + head."""
    from admm_lstm_tpu.models.lstm import _gate_activations, _input_projections
    batch = x.shape[0]
    h1 = jnp.zeros((batch, params.layer1.hidden_size), x.dtype)
    c1 = jnp.zeros_like(h1)
    h2 = jnp.zeros((batch, params.layer2.hidden_size), x.dtype)
    c2 = jnp.zeros_like(h2)
    xproj = _input_projections(params.layer1, x, precision)

    def cell(carry, xp_t):
        h1, c1, h2, c2 = carry
        pre1 = xp_t + jnp.einsum('bh,ghk->bgk', h1, params.layer1.wh,
                                 precision=precision)
        i, f, g, o = _gate_activations(pre1)
        c1 = f * c1 + i * g
        h1 = o * jnp.tanh(c1)
        pre2 = (jnp.einsum('bh,ghk->bgk', h1, params.layer2.wx,
                           precision=precision)
                + jnp.einsum('bh,ghk->bgk', h2, params.layer2.wh,
                             precision=precision))
        i2, f2, g2, o2 = _gate_activations(pre2)
        c2 = f2 * c2 + i2 * g2
        h2 = o2 * jnp.tanh(c2)
        return (h1, c1, h2, c2), None

    (h1, c1, h2, c2), _ = lax.scan(cell, (h1, c1, h2, c2), xproj)
    return jnp.dot(h2, params.wy, precision=precision)


def stacked_mse_loss(params: StackedParams, x, y,
                     precision=lax.Precision.HIGHEST):
    return jnp.mean((stacked_forward(params, x, precision) - y) ** 2)


def _layer_histories(params: StackedParams, x: jax.Array, precision):
    """Forward unroll seeding both layers' gate slabs (time-major)."""
    from admm_lstm_tpu.models.lstm import _gate_activations, _input_projections
    batch = x.shape[0]
    hd1, hd2 = params.layer1.hidden_size, params.layer2.hidden_size
    z1 = jnp.zeros((batch, hd1), x.dtype)
    z2 = jnp.zeros((batch, hd2), x.dtype)
    xproj = _input_projections(params.layer1, x, precision)

    def cell(carry, xp_t):
        h1, c1, h2, c2 = carry
        pre1 = xp_t + jnp.einsum('bh,ghk->bgk', h1, params.layer1.wh,
                                 precision=precision)
        i1, f1, g1, o1 = _gate_activations(pre1)
        c1n = f1 * c1 + i1 * g1
        h1n = o1 * jnp.tanh(c1n)
        pre2 = (jnp.einsum('bh,ghk->bgk', h1n, params.layer2.wx,
                           precision=precision)
                + jnp.einsum('bh,ghk->bgk', h2, params.layer2.wh,
                             precision=precision))
        i2, f2, g2, o2 = _gate_activations(pre2)
        c2n = f2 * c2 + i2 * g2
        h2n = o2 * jnp.tanh(c2n)
        return ((h1n, c1n, h2n, c2n),
                ((i1, f1, g1, o1, c1n, h1n), (i2, f2, g2, o2, c2n, h2n)))

    (h1, c1, h2, c2), (l1, l2) = lax.scan(cell, (z1, z1, z2, z2), xproj)

    def slabs(stacks, hdim):
        zero = jnp.zeros((1, batch, hdim), x.dtype)
        return tuple(jnp.concatenate([zero, s], axis=0) for s in stacks)

    a = jnp.dot(h2, params.wy, precision=precision)
    return slabs(l1, hd1), slabs(l2, hd2), a


def init_stacked_state(params: StackedParams, x: jax.Array,
                       parameter_set: ParameterSet,
                       config: ADMMConfig = ADMMConfig()) -> StackedState:
    from admm_lstm_tpu.core.step import rules_for
    precision = rules_for(config).precision
    params = jax.tree.map(lambda a: jnp.array(a, copy=True), params)
    batch, seq_len, _ = x.shape
    (l1, l2, a) = _layer_histories(params, x, precision)

    def mk_gates(slabs, a_val):
        i, f, g, o, c, h = slabs
        return GateSlabs(i=i, f=f, g=g, o=o, c=c, h=h, a=a_val)

    def mk_duals(hdim, odim):
        z = lambda: jnp.zeros((seq_len + 1, batch, hdim), x.dtype)
        return DualSlabs(i=z(), f=z(), g=z(), o=z(), c=z(), h=z(),
                         y=jnp.zeros((batch, odim), x.dtype))

    out = params.wy.shape[1]
    return StackedState(
        params=params,
        gates1=mk_gates(l1, jnp.zeros((batch, out), x.dtype)),
        duals1=mk_duals(params.layer1.hidden_size, out),
        gates2=mk_gates(l2, a),
        duals2=mk_duals(params.layer2.hidden_size, out),
        rho=penalties_from(parameter_set, x.dtype),
        beta=ridges_from(parameter_set, x.dtype),
        epoch=jnp.asarray(0, jnp.int32))


def _layer_weight_phase(m_inputs, gates, duals, params_layer, rho, beta,
                        rules: StepRules, seq_len):
    """The single-layer weight phase against an arbitrary design matrix."""
    precision = rules.precision
    gate_slab = jnp.stack([gates.i, gates.f, gates.g, gates.o])[:, 1:]
    dual_slab = jnp.stack([duals.i, duals.f, duals.g, duals.o])[:, 1:]
    rho_g = rho.stacked_ifgo()
    target = dual_slab / rho_g[:, None, None, None] + gate_slab
    is_tanh = jnp.asarray((False, False, True, False))
    h_hist = gates.h[:-1]

    fixed_h = jnp.einsum('tbd,gdh->gtbh', h_hist, params_layer.wh,
                         precision=precision)
    wx_new = weight_stage_update(m_inputs, fixed_h, params_layer.wx, target,
                                 rho_g, beta.x, is_tanh, seq_len,
                                 rules.max_backtrack, precision).weights
    fixed_x = jnp.einsum('tbd,gdh->gtbh', m_inputs, wx_new,
                         precision=precision)
    wh_new = weight_stage_update(h_hist, fixed_x, params_layer.wh, target,
                                 rho_g, beta.h, is_tanh, seq_len,
                                 rules.max_backtrack, precision).weights
    return params_layer._replace(wx=wx_new, wh=wh_new)


def stacked_admm_step(state: StackedState, train_x: jax.Array,
                      train_y: jax.Array, rules: StepRules) -> StackedState:
    """One 2-layer ADMM epoch."""
    precision = rules.precision
    x_tm = jnp.transpose(train_x, (1, 0, 2))
    seq_len = x_tm.shape[0]
    batch = x_tm.shape[1]
    rho = state.rho

    # 1. Readout on layer-2's final hidden state.
    wy_new = cf.wy_update(state.params.wy, state.gates2.h[-1],
                          state.gates2.a, rho.y, state.beta.wy,
                          state.duals2.y, rules.with_dual_y, precision)

    # 2. Weight phases: layer 1 against x, layer 2 against the stale h1
    # history (the inter-layer analog of admm.py:298's stale h usage).
    l1_new = _layer_weight_phase(x_tm, state.gates1, state.duals1,
                                 state.params.layer1, rho, state.beta,
                                 rules, seq_len)
    h1_hist = state.gates1.h[:-1]
    l2_new = _layer_weight_phase(h1_hist, state.gates2, state.duals2,
                                 state.params.layer2, rho, state.beta,
                                 rules, seq_len)
    params_new = StackedParams(layer1=l1_new, layer2=l2_new, wy=wy_new)

    # 3. Joint sweep.
    xproj1 = jnp.einsum('tbd,gdh->tgbh', x_tm, l1_new.wx, precision=precision)

    g1 = state.gates1
    d1 = state.duals1
    g2 = state.gates2
    d2 = state.duals2
    slabs1 = (g1.i, g1.f, g1.g, g1.o, g1.c, g1.h)
    dslabs1 = (d1.i, d1.f, d1.g, d1.o, d1.c, d1.h)
    slabs2 = (g2.i, g2.f, g2.g, g2.o, g2.c, g2.h)
    dslabs2 = (d2.i, d2.f, d2.g, d2.o, d2.c, d2.h)

    def rows(slabs, sl):
        return tuple(s[sl] for s in slabs)

    def layer_block(xp_t, old, duals_t, h_prev, c_prev, wh,
                    h_coupling_grad=None):
        (i_n, f_n, g_n, o_n, c_n), lam_n = _timestep_primal_duals(
            xp_t, old, duals_t, h_prev, c_prev, wh, rho, precision)
        if h_coupling_grad is None:
            h_n = cf.h_interior_update(o_n, jnp.tanh(c_n), duals_t[5], rho.h)
        else:
            # Prox-linear h update coupling layer 1 into layer 2's gate
            # constraints (the inter-layer analog of the final-h output
            # prox, admm.py:470-487, with a fixed unit step):
            #   h1 = (theta*h1_old + rho_h*o*tanh(c) - lam_h - grad)
            #        / (theta + rho_h)
            theta = jnp.asarray(1.0, o_n.dtype)
            h_n = (theta * old[5] + rho.h * o_n * jnp.tanh(c_n)
                   - duals_t[5] - h_coupling_grad(old[5])) / (theta + rho.h)
        return (i_n, f_n, g_n, o_n, c_n, h_n), lam_n

    rho_g4 = rho.stacked_ifgo()[:, None, None]
    tanh_sel = jnp.asarray((False, False, True, False))[:, None, None]

    def l2_input_coupling_grad(old2, du2, h2_prev):
        """d/d(h1_t) of layer 2's four gate-fit penalty terms, linearized
        at the previous-sweep values (consumed by layer 1's h update)."""
        def grad(h1_val):
            pre2 = (jnp.einsum('bd,gdh->gbh', h1_val, l2_new.wx,
                               precision=precision)
                    + jnp.einsum('bh,ghk->gbk', h2_prev, l2_new.wh,
                                 precision=precision))
            sig = jax.nn.sigmoid(pre2)
            act = jnp.where(tanh_sel, jnp.tanh(pre2), sig)
            d_act = jnp.where(tanh_sel, 1.0 - jnp.tanh(pre2) ** 2,
                              sig * (1.0 - sig))
            gate_old = jnp.stack(old2[:4])
            lam_old = jnp.stack(du2[:4])
            resid = (act - gate_old - lam_old / rho_g4) * d_act * rho_g4
            return jnp.einsum('gbh,gdh->bd', resid, l2_new.wx,
                              precision=precision)
        return grad

    def body(carry, xs):
        h1p, c1p, h2p, c2p = carry
        xp1, old1, du1, old2, du2 = xs
        prim1, lam1 = layer_block(
            xp1, old1, du1, h1p, c1p, l1_new.wh,
            h_coupling_grad=l2_input_coupling_grad(old2, du2, h2p))
        h1_n, c1_n = prim1[5], prim1[4]
        # With the coupled h1 update the constraint h1 = o1*tanh(c1) is no
        # longer satisfied exactly, so its dual ascends at every t.
        lam1 = lam1 + (cf.dual_h_update(du1[5], rho.h, h1_n, prim1[3],
                                        jnp.tanh(c1_n)),)
        xp2 = jnp.einsum('bd,gdh->gbh', h1_n, l2_new.wx, precision=precision)
        prim2, lam2 = layer_block(xp2, old2, du2, h2p, c2p, l2_new.wh)
        return ((h1_n, c1_n, prim2[5], prim2[4]),
                (prim1, lam1, prim2, lam2))

    interior = slice(1, seq_len)
    init = (g1.h[0], g1.c[0], g2.h[0], g2.c[0])
    xs = (xproj1[:seq_len - 1], rows(slabs1, interior), rows(dslabs1, interior),
          rows(slabs2, interior), rows(dslabs2, interior))
    (h1p, c1p, h2p, c2p), (p1_s, l1_s, p2_s, l2_s) = lax.scan(body, init, xs)

    # Final timestep: layer 1 keeps its closed forms; layer 2's h gets the
    # output prox + a + h-dual.
    old1_T = rows(slabs1, seq_len)
    du1_T = rows(dslabs1, seq_len)
    old2_T = rows(slabs2, seq_len)
    du2_T = rows(dslabs2, seq_len)
    prim1_T, lam1_T = layer_block(
        xproj1[seq_len - 1], old1_T, du1_T, h1p, c1p, l1_new.wh,
        h_coupling_grad=l2_input_coupling_grad(old2_T, du2_T, h2p))
    h1_T = prim1_T[5]
    lam1_T = lam1_T + (cf.dual_h_update(du1_T[5], rho.h, h1_T, prim1_T[3],
                                        jnp.tanh(prim1_T[4])),)
    xp2_T = jnp.einsum('bd,gdh->gbh', h1_T, l2_new.wx, precision=precision)
    (i2, f2, g2n, o2, c2), lam2_T = _timestep_primal_duals(
        xp2_T, old2_T, du2_T, h2p, c2p, l2_new.wh, rho, precision)
    tanh_c2 = jnp.tanh(c2)
    h2_T = h_final_update(
        old2_T[5], o2, tanh_c2, du2_T[5], rho.h, wy_new, g2.a, rho.y,
        d2.y, with_dual_y=rules.with_dual_y, theta0=rules.h_theta0,
        theta_max=rules.h_theta_max, max_iters=rules.max_backtrack,
        precision=precision,
        grad_uses_rho_h=rules.h_grad_uses_rho_h,
        probe_is_grad_over_theta=rules.h_probe_grad_over_theta).h
    a_new = cf.a_update(train_y, h2_T, wy_new, rho.y, d2.y, batch,
                        rules.with_dual_y, precision)
    lam_h2_T = cf.dual_h_update(du2_T[5], rho.h, h2_T, o2, tanh_c2)

    # Assemble slabs.
    def assemble(layer_scan, layer_T, hdim):
        zero = jnp.zeros((1, batch, hdim), x_tm.dtype)
        return tuple(jnp.concatenate([zero, mid, last[None]], axis=0)
                     for mid, last in zip(layer_scan, layer_T))

    hd1 = state.params.layer1.hidden_size
    hd2 = state.params.layer2.hidden_size
    gates1_new = GateSlabs(*assemble(p1_s, prim1_T, hd1), a=g1.a)
    duals1_new = DualSlabs(*assemble(l1_s, lam1_T, hd1), y=d1.y)
    gates2_new = GateSlabs(*assemble(p2_s, (i2, f2, g2n, o2, c2, h2_T), hd2),
                           a=a_new)
    duals2_new = DualSlabs(*assemble(l2_s, lam2_T, hd2),
                           h=d2.h.at[seq_len].set(lam_h2_T), y=d2.y)

    if rules.with_dual_y:
        lam_y = cf.dual_y_update(d2.y, rho.y, a_new, h2_T, wy_new, precision)
        duals2_new = duals2_new._replace(y=lam_y)

    return StackedState(params=params_new, gates1=gates1_new,
                        duals1=duals1_new, gates2=gates2_new,
                        duals2=duals2_new, rho=state.rho, beta=state.beta,
                        epoch=state.epoch + 1)


@functools.lru_cache(maxsize=16)
def _jitted(rules: StepRules, donate: bool):
    fn = functools.partial(stacked_admm_step, rules=rules)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def make_stacked_step(config: ADMMConfig, donate: bool = True):
    from admm_lstm_tpu.core.step import rules_for
    return _jitted(rules_for(config), donate)


def train_stacked(train_x, train_y, val_x, val_y,
                  parameter_set: ParameterSet, config: ADMMConfig,
                  hidden2: int = 0, log_every: int = 10) -> Dict[str, object]:
    """2-layer ADMM training loop (same contract as api.train)."""
    from admm_lstm_tpu.utils.logging import info
    from admm_lstm_tpu.utils.timer import Timer
    train_x, train_y = jnp.asarray(train_x), jnp.asarray(train_y)
    val_x, val_y = jnp.asarray(val_x), jnp.asarray(val_y)
    h1 = config.hidden_size
    h2 = hidden2 or h1
    params = init_stacked_params(jax.random.PRNGKey(config.seed),
                                 train_x.shape[2], h1, h2, train_y.shape[1])
    state = init_stacked_state(params, train_x, parameter_set, config)
    step = make_stacked_step(config, donate=True)
    loss_fn = jax.jit(stacked_mse_loss)

    train_losses = [float(loss_fn(state.params, train_x, train_y))]
    val_losses = [float(loss_fn(state.params, val_x, val_y))]
    info(f'2-layer ADMM ({h1}x{h2}). Initial loss: train {train_losses[0]:.8f}'
         f' | val {val_losses[0]:.8f}')
    timer = Timer()
    timer.start()
    for epoch in range(1, config.epochs + 1):
        state = step(state, train_x, train_y)
        train_losses.append(float(loss_fn(state.params, train_x, train_y)))
        val_losses.append(float(loss_fn(state.params, val_x, val_y)))
        if log_every and epoch % log_every == 0:
            info(f'Epoch {epoch}: train {train_losses[-1]:.8f} | '
                 f'val {val_losses[-1]:.8f}')
    timer.pause()
    return {'name': 'Stacked ADMM-LSTM', 'train_loss': train_losses,
            'val_loss': val_losses, 'params': state.params, 'state': state,
            'seconds': timer.get_elapsed_time()}
