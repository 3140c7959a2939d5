"""ADMM-LSTM-L: the Liu-et-al. formulation with explicit pre-activation
variables (reference: comparison_experiment/admm_l/{main,admm_lstm}.py).

Differences from the fast variant (SURVEY §2.3): per-gate pre-activation
auxiliaries z_f,z_i,z_o,z_g with their own duals (lambda1..8 per timestep),
a cell-recursion dual (lambda9), an h=o*tanh(c) dual (lambda10) applied at
every t, and an output dual (lambda11); weights are updated by
descent-probe line searches; several updates use *global* reductions
(max / Frobenius norms over the whole (B,H) slab) as majorization
constants — these become psums under data sharding.

TPU design mirrors core/step.py: weight phase = lockstep 4-gate
`lax.while_loop` searches (cross-gate independent, W-then-U Gauss-Seidel
preserved), time sweep = one `lax.scan` with the final timestep peeled
(its h update is the only iterative one, and `a`/lambda11 update there).

Reference quirks kept / parameterized:
  * update_a divides the data term by a HARDCODED 4224 (admm_lstm.py:263);
    `a_batch_scale=None` uses the true batch size (the fix), pass 4224 for
    bit-faithful comparison against the reference on GoogleStock.
  * update_Wy takes a ridge argument it never uses (admm_lstm.py:97-106)
    and does not halve theta after the search; update_W/update_U halve.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from admm_lstm_tpu.models.lstm import LSTMParams, lstm_forward, mse_loss
from admm_lstm_tpu.utils.logging import info
from admm_lstm_tpu.utils.timer import Timer

# Gate order for stacked arrays in THIS module: f, i, o, g (the reference's
# update order, admm_l/main.py:141-148 weights & 150-164 sweep).
GATES_L = ('f', 'i', 'o', 'g')
_IS_TANH_L = (False, False, False, True)  # only z_g uses tanh


class ADMMLState(NamedTuple):
    wx: jax.Array      # (4, I, H) input-side weights W_f,W_i,W_o,W_g
    wh: jax.Array      # (4, H, H) hidden-side weights U_*
    wy: jax.Array      # (H, O)
    z: jax.Array       # (4, T, B, H) pre-activations z_f,z_i,z_o,z_g
    gate: jax.Array    # (4, T, B, H) activations f,i,o,g
    c: jax.Array       # (T+1, B, H), row0 = t=-1 zeros
    h: jax.Array       # (T+1, B, H)
    a: jax.Array       # (B, O)
    lam_z: jax.Array   # (4, T, B, H) duals on z = xW + hU   (lambda 1,3,5,7)
    lam_g: jax.Array   # (4, T, B, H) duals on gate = act(z) (lambda 2,4,6,8)
    lam9: jax.Array    # (T, B, H) cell recursion
    lam10: jax.Array   # (T, B, H) h = o * tanh(c)
    lam11: jax.Array   # (B, O)
    epoch: jax.Array


@dataclasses.dataclass(frozen=True)
class ADMMLRules:
    """Static constants (reference admm_l/main.py:112-130)."""

    ridge_w: float = 1e-6        # lambda00
    ridge_u: float = 1e-6        # lambda02
    rho_singular: float = 1.0    # z = xW + hU penalties (lambda 1,3,5,7)
    rho_plural: float = 1.0      # gate = act(z) penalties (lambda 2,4,6,8)
    rho9: float = 1.0
    rho10: float = 1.0
    rho11: float = 1e-4
    wy_theta0: float = 0.01
    max_backtrack: int = 60
    a_batch_scale: Optional[int] = None   # None => true batch size; 4224 = quirk
    matmul_precision: str = 'highest'

    @property
    def precision(self):
        return {'highest': lax.Precision.HIGHEST, 'high': lax.Precision.HIGH,
                'default': lax.Precision.DEFAULT}[self.matmul_precision]


def _sig(x):
    return jax.nn.sigmoid(x)


def _dsig(x):
    s = _sig(x)
    return s * (1.0 - s)


def _dtanh(x):
    return 1.0 - jnp.tanh(x) ** 2


def init_weights_like_reference(key_seed: int, input_size: int,
                                hidden_size: int, output_size: int,
                                scale: float = 0.1, torch_rng: bool = True):
    """Weight init matching admm_l_demo's `torch.randn(...)*0.1` draw order
    (main.py:75-83: Wf,Uf,Wi,Ui,Wo,Uo,Wg,Ug,Wy).  Uses torch's RNG stream
    when available so seed-for-seed golden comparison is possible."""
    shapes = [(input_size, hidden_size), (hidden_size, hidden_size)] * 4 + [
        (hidden_size, output_size)]
    if torch_rng:
        try:
            import torch
            torch.manual_seed(key_seed)
            draws = [torch.randn(s).numpy() * scale for s in shapes]
        except ImportError:
            torch_rng = False
    if not torch_rng:
        key = jax.random.PRNGKey(key_seed)
        keys = jax.random.split(key, 9)
        draws = [scale * jax.random.normal(k, s) for k, s in zip(keys, shapes)]
    wf, uf, wi, ui, wo, uo, wg, ug, wy = map(jnp.asarray, draws)
    # Stack in this module's f,i,o,g order.
    return (jnp.stack([wf, wi, wo, wg]), jnp.stack([uf, ui, uo, ug]), wy)


def _to_core_params(wx, wh, wy) -> LSTMParams:
    """Map f,i,o,g stacking to the core model's i,f,g,o order for inference."""
    perm = jnp.asarray([1, 0, 3, 2])  # f,i,o,g -> i,f,g,o
    return LSTMParams(wx=wx[perm], wh=wh[perm], wy=wy)


def _forward_histories(wx, wh, wy, x_tm, precision):
    """Full unroll returning z and gate histories (main.py:85-104)."""
    batch = x_tm.shape[1]
    hidden = wh.shape[1]
    zeros = jnp.zeros((batch, hidden), x_tm.dtype)
    xproj = jnp.einsum('tbd,gdh->tgbh', x_tm, wx, precision=precision)
    tanh_sel = jnp.asarray(_IS_TANH_L)[:, None, None]

    def cell(carry, xp_t):
        h, c = carry
        z = xp_t + jnp.einsum('bh,ghk->gbk', h, wh, precision=precision)
        act = jnp.where(tanh_sel, jnp.tanh(z), _sig(z))
        f, i, o, g = act[0], act[1], act[2], act[3]
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), (z, act, c_new, h_new)

    (h_fin, _), (z_s, act_s, c_s, h_s) = lax.scan(cell, (zeros, zeros), xproj)
    a = jnp.dot(h_fin, wy, precision=precision)
    with_zero = lambda s: jnp.concatenate([zeros[None], s], axis=0)
    return (jnp.transpose(z_s, (1, 0, 2, 3)), jnp.transpose(act_s, (1, 0, 2, 3)),
            with_zero(c_s), with_zero(h_s), a)


def init_admm_l_state(wx, wh, wy, x_tm, rules: ADMMLRules) -> ADMMLState:
    z, gate, c, h, a = _forward_histories(wx, wh, wy, x_tm, rules.precision)
    seq_len, batch = x_tm.shape[0], x_tm.shape[1]
    hidden = wh.shape[1]
    zs = jnp.zeros((4, seq_len, batch, hidden), x_tm.dtype)
    return ADMMLState(
        wx=wx, wh=wh, wy=wy, z=z, gate=gate, c=c, h=h, a=a,
        lam_z=zs, lam_g=jnp.zeros_like(zs),
        lam9=jnp.zeros((seq_len, batch, hidden), x_tm.dtype),
        lam10=jnp.zeros((seq_len, batch, hidden), x_tm.dtype),
        lam11=jnp.zeros_like(a), epoch=jnp.asarray(0, jnp.int32))


def _update_wy(state: ADMMLState, rules: ADMMLRules) -> jax.Array:
    """admm_lstm.py:80-106: ascent-probe search, final Wy = probe point."""
    precision = rules.precision
    rho11 = rules.rho11
    h_last = state.h[-1]
    resid = state.a - jnp.dot(h_last, state.wy, precision=precision) \
        + state.lam11 / rho11
    grad = rho11 * jnp.dot(h_last.T, resid, precision=precision)
    f_at_w = 0.5 * rho11 * jnp.sum(resid * resid)

    # h_last @ probe(theta) assembled from two fixed products (linearity).
    hgrad = jnp.dot(h_last, grad, precision=precision)
    hw0 = jnp.dot(h_last, state.wy, precision=precision)

    def probe(theta):
        return state.wy + grad / theta

    def fails(theta):
        r = state.a - (hw0 + hgrad / theta) + state.lam11 / rho11
        obj = 0.5 * rho11 * jnp.sum(r * r)
        diff = grad / theta
        # P subtracts the inner product (admm_lstm.py:92-95).
        est = f_at_w - jnp.sum(grad * diff) + 0.5 * theta * jnp.sum(diff * diff)
        return obj > est

    def cond(carry):
        theta, k = carry
        return jnp.logical_and(fails(theta), k < rules.max_backtrack)

    def body(carry):
        theta, k = carry
        return theta * 2.0, k + 1

    theta0 = jnp.asarray(rules.wy_theta0, state.wy.dtype)
    theta, _ = lax.while_loop(cond, body, (theta0, jnp.asarray(0, jnp.int32)))
    return probe(theta)  # no halving, no ridge (reference quirk)


def _weight_stage(m_inputs, fixed_proj, weights, z_slab, lam_slab,
                  ridge, rules: ADMMLRules, grad_side_inputs):
    """update_W / update_U (admm_lstm.py:109-163), all 4 gates in lockstep.

    obj(W)  = 0.5 * rho * sum_t || -z_t + proj_t(W) + fixed_t - lam_t/rho ||^2
    grad    = rho * sum_t M_t^T resid_t
    descent probe W1 = W - grad/theta; accept when
      obj(W1) <= obj(W) + <grad, W1-W> + theta/2 |W1-W|^2
    final   W = (theta*W - grad) / (ridge + theta)
    """
    precision = rules.precision
    rho = rules.rho_singular

    def project(w):
        return jnp.einsum('tbd,gdh->gtbh', m_inputs, w, precision=precision)

    resid = -z_slab + project(weights) + fixed_proj - lam_slab / rho
    grad = rho * jnp.einsum('tbd,gtbh->gdh', grad_side_inputs, resid,
                            precision=precision)
    obj_w = 0.5 * rho * jnp.sum(resid * resid, axis=(1, 2, 3))
    # project is linear => resid(W - grad/theta) = resid - grad_proj/theta;
    # every search iteration is matmul-free.
    grad_proj = project(grad)

    def fails(theta):
        r1 = resid - grad_proj / theta[:, None, None, None]
        obj1 = 0.5 * rho * jnp.sum(r1 * r1, axis=(1, 2, 3))
        diff = -grad / theta[:, None, None]
        est = (obj_w + jnp.sum(grad * diff, axis=(1, 2))
               + 0.5 * theta * jnp.sum(diff * diff, axis=(1, 2)))
        return obj1 > est

    def cond(carry):
        theta, done, k = carry
        return jnp.logical_and(jnp.logical_not(jnp.all(done)),
                               k < rules.max_backtrack)

    def body(carry):
        theta, done, k = carry
        f = fails(theta)
        theta = jnp.where(jnp.logical_and(jnp.logical_not(done), f),
                          theta * 2.0, theta)
        done = jnp.logical_or(done, jnp.logical_not(f))
        return theta, done, k + 1

    theta0 = jnp.ones((4,), weights.dtype)
    theta, _, _ = lax.while_loop(cond, body,
                                 (theta0, jnp.zeros((4,), bool),
                                  jnp.asarray(0, jnp.int32)))
    return (theta[:, None, None] * weights - grad) / (ridge + theta)[:, None, None]


def _sweep_step_core(x_t, z_o, gate_o, c_o, h_o, duals_t, h_prev, c_prev,
                     wx, wh, rules: ADMMLRules):
    """Interior-timestep primal updates in the reference order
    (main.py:150-167): zf,f,zi,i,zo,o,zg,g,c — returns fresh values and the
    per-t dual updates except h (caller supplies h) and lambda10/9 which
    need h_n.  duals_t = (lam_z (4,B,H), lam_g (4,B,H), lam9, lam10)."""
    precision = rules.precision
    rs, rp, r9, r10 = (rules.rho_singular, rules.rho_plural, rules.rho9,
                       rules.rho10)
    lam_z, lam_g, lam9, lam10 = duals_t
    zf_o, zi_o, zo_o, zg_o = z_o[0], z_o[1], z_o[2], z_o[3]
    f_o, i_o, o_o, g_o = gate_o[0], gate_o[1], gate_o[2], gate_o[3]

    lin = (jnp.einsum('bd,gdh->gbh', x_t, wx, precision=precision)
           + jnp.einsum('bh,ghk->gbk', h_prev, wh, precision=precision))

    def update_z_sig(z_old, out, lin_g, l1, l2):
        # admm_lstm.py:166-174 — note the GLOBAL max majorization constant.
        temp = jnp.max(jnp.abs(out - l2 / rp))
        appro = 0.5 * (1.0 + temp) + 0.125
        form1 = lin_g - l1 / rs
        form2 = rp * (_sig(z_old) - out + l2 / rp) * _dsig(z_old)
        form3 = rs * form1 + 0.5 * rp * appro * z_old - form2
        return 2.0 * form3 / (2.0 * rs + rp * appro)

    def update_z_tanh(z_old, out, lin_g, l1, l2):
        # admm_lstm.py:177-185.
        temp = jnp.max(jnp.abs(out - l2 / rp))
        appro = 2.0 * (1.0 + temp) + 2.0
        form1 = lin_g - l1 / rs
        form2 = rp * (jnp.tanh(z_old) - out + l2 / rp) * _dtanh(z_old)
        form3 = rs * form1 + 0.5 * rp * appro * z_old - form2
        return 2.0 * form3 / (2.0 * rs + rp * appro)

    zf_n = update_z_sig(zf_o, f_o, lin[0], lam_z[0], lam_g[0])
    # update_f (admm_lstm.py:188-193)
    f_n = (rp * (_sig(zf_n) + lam_g[0] / rp)
           + r9 * c_prev * (c_o - g_o * i_o + lam9 / r9)) / (
        rp + r9 * c_prev * c_prev)
    zi_n = update_z_sig(zi_o, i_o, lin[1], lam_z[1], lam_g[1])
    # update_i (admm_lstm.py:196-201)
    i_n = (rp * (_sig(zi_n) + lam_g[1] / rp)
           + r9 * g_o * (c_o - c_prev * f_n + lam9 / r9)) / (
        rp + r9 * g_o * g_o)
    zo_n = update_z_sig(zo_o, o_o, lin[2], lam_z[2], lam_g[2])
    # update_o (admm_lstm.py:204-209)
    tc_o = jnp.tanh(c_o)
    o_n = (rp * (_sig(zo_n) + lam_g[2] / rp)
           + r10 * tc_o * (h_o - lam10 / r10)) / (rp + r10 * tc_o * tc_o)
    zg_n = update_z_tanh(zg_o, g_o, lin[3], lam_z[3], lam_g[3])
    # update_g (admm_lstm.py:212-217)
    g_n = (rp * (jnp.tanh(zg_n) + lam_g[3] / rp)
           + r9 * i_n * (c_o - c_prev * f_n + lam9 / r9)) / (
        rp + r9 * i_n * i_n)
    # update_c (admm_lstm.py:220-235) — global max + global fro norm of o.
    temp = jnp.max(jnp.abs((h_o - lam10 / r10) / o_n))
    appro_h = 2.0 * (1.0 + temp) + 2.0
    form1 = r9 * (g_n * i_n + c_prev * f_n - lam9 / r9)
    form2 = r10 * (jnp.tanh(c_o) * o_n - h_o + lam10 / r10) * _dtanh(c_o) * o_n
    qua_o = jnp.sum(o_n * o_n)
    form3 = 0.5 * r10 * qua_o * c_o * appro_h
    form4 = r9 + 0.5 * r10 * qua_o * appro_h
    c_n = (form1 - form2 + form3) / form4

    z_n = jnp.stack([zf_n, zi_n, zo_n, zg_n])
    gate_n = jnp.stack([f_n, i_n, o_n, g_n])

    # Dual ascent (main.py:175-191), with fresh primal values; h-dependent
    # duals (lambda10, lambda9) need h_n, returned as a closure input.
    acts_n = jnp.where(jnp.asarray(_IS_TANH_L)[:, None, None],
                       jnp.tanh(z_n), _sig(z_n))
    lam_g_n = lam_g + rp * (acts_n - gate_n)
    lam_z_n = lam_z + rs * (z_n - lin)
    lam9_n = lam9 + r9 * (c_n - g_n * i_n - c_prev * f_n)

    return z_n, gate_n, c_n, lam_z_n, lam_g_n, lam9_n


def admm_l_step(state: ADMMLState, x_tm: jax.Array, train_y: jax.Array,
                rules: ADMMLRules) -> ADMMLState:
    """One full ADMM-LSTM-L epoch (main.py:139-191)."""
    precision = rules.precision
    seq_len = x_tm.shape[0]
    batch = x_tm.shape[1]
    r10, r11 = rules.rho10, rules.rho11

    # 1. Wy, then (W,U) per gate — order Wg,Ug,Wo,Uo,Wi,Ui,Wf,Uf in the
    # reference; cross-gate independent, so lockstep-batched (W stage with
    # old U, then U stage with fresh W, preserving the in-pair order).
    wy_new = _update_wy(state, rules)
    h_hist = state.h[:-1]
    ridge_w = jnp.full((4,), rules.ridge_w, state.wx.dtype)
    ridge_u = jnp.full((4,), rules.ridge_u, state.wx.dtype)
    fixed_u = jnp.einsum('tbd,gdh->gtbh', h_hist, state.wh, precision=precision)
    wx_new = _weight_stage(x_tm, fixed_u, state.wx, state.z, state.lam_z,
                           ridge_w, rules, grad_side_inputs=x_tm)
    fixed_w = jnp.einsum('tbd,gdh->gtbh', x_tm, wx_new, precision=precision)
    # NOTE: update_U's gradient contracts against h (admm_lstm.py:147), i.e.
    # its own design side, same shape as _weight_stage expects.
    wh_new = _weight_stage(h_hist, fixed_w, state.wh, state.z, state.lam_z,
                           ridge_u, rules, grad_side_inputs=h_hist)

    # 2. Sweep t = 0..T-2 via scan, final step peeled.
    def make_duals_t(t_slice):
        return (state.lam_z[:, t_slice], state.lam_g[:, t_slice],
                state.lam9[t_slice], state.lam10[t_slice])

    def body(carry, xs):
        h_prev, c_prev = carry
        x_t, z_o, gate_o, c_o, h_o, lam_z, lam_g, lam9, lam10 = xs
        z_n, gate_n, c_n, lam_z_n, lam_g_n, lam9_n = _sweep_step_core(
            x_t, z_o, gate_o, c_o, h_o, (lam_z, lam_g, lam9, lam10),
            h_prev, c_prev, wx_new, wh_new, rules)
        o_n = gate_n[2]
        # update_h interior: h = tanh(c)*o + lam10/rho10 (admm_lstm.py:241-245)
        h_n = (r10 * (jnp.tanh(c_n) * o_n + lam10 / r10)) / r10
        lam10_n = lam10 + r10 * (jnp.tanh(c_n) * o_n - h_n)
        return (h_n, c_n), (z_n, gate_n, c_n, h_n, lam_z_n, lam_g_n, lam9_n,
                            lam10_n)

    interior = slice(0, seq_len - 1)
    xs = (x_tm[interior], jnp.moveaxis(state.z[:, interior], 1, 0),
          jnp.moveaxis(state.gate[:, interior], 1, 0),
          state.c[1:seq_len], state.h[1:seq_len],
          jnp.moveaxis(state.lam_z[:, interior], 1, 0),
          jnp.moveaxis(state.lam_g[:, interior], 1, 0),
          state.lam9[interior], state.lam10[interior])
    init_carry = (state.h[0], state.c[0])
    (h_prev, c_prev), scanned = lax.scan(body, init_carry, xs)

    # Final timestep t = T-1.
    tT = seq_len - 1
    duals_T = (state.lam_z[:, tT], state.lam_g[:, tT], state.lam9[tT],
               state.lam10[tT])
    z_T, gate_T, c_T, lam_z_T, lam_g_T, lam9_T = _sweep_step_core(
        x_tm[tT], state.z[:, tT], state.gate[:, tT], state.c[tT + 1],
        state.h[tT + 1], duals_T, h_prev, c_prev, wx_new, wh_new, rules)
    o_T = gate_T[2]
    h_old_T = state.h[tT + 1]

    # update_h at t = T-1 (admm_lstm.py:238-258): descent-probe search.
    form1 = r10 * (jnp.tanh(c_T) * o_T + state.lam10[tT] / r10)
    hw_T = jnp.dot(h_old_T, wy_new, precision=precision)
    form10 = -state.a + hw_T - state.lam11 / r11
    form11 = jnp.dot(form10, wy_new.T, precision=precision)
    # h1(theta) @ Wy assembled from fixed products (linearity).
    form11_wy = jnp.dot(form11, wy_new, precision=precision)
    f10_quad = 0.5 * r11 * jnp.sum(form10 * form10)

    def h_fails(theta):
        d = -r11 * form11 / theta
        func1 = (f10_quad + r11 * jnp.sum(form11 * d)
                 + 0.5 * theta * jnp.sum(d * d))
        form20 = state.a - (hw_T - r11 * form11_wy / theta) \
            + state.lam11 / r11
        return 0.5 * r11 * jnp.sum(form20 * form20) > func1

    def cond(carry):
        theta, k = carry
        return jnp.logical_and(h_fails(theta), k < rules.max_backtrack)

    theta_h, _ = lax.while_loop(
        cond, lambda c: (c[0] * 2.0, c[1] + 1),
        (jnp.asarray(1.0, x_tm.dtype), jnp.asarray(0, jnp.int32)))
    h_T = (form1 - r11 * form11 + theta_h * h_old_T) / (r10 + theta_h)

    # update_a + lambda11 at t = T-1 (admm_lstm.py:261-273).
    nb = rules.a_batch_scale or batch
    hw = jnp.dot(h_T, wy_new, precision=precision)
    a_new = (2.0 * train_y / nb + r11 * hw - state.lam11) / (2.0 / nb + r11)
    lam11_new = state.lam11 + r11 * (a_new - hw)

    lam10_T = state.lam10[tT] + r10 * (jnp.tanh(c_T) * o_T - h_T)

    # 3. Reassemble slabs.
    (z_s, gate_s, c_s, h_s, lam_z_s, lam_g_s, lam9_s, lam10_s) = scanned
    zeros_row = jnp.zeros((1, batch, state.c.shape[2]), x_tm.dtype)

    def slab4(mid, last):  # (T-1,4,B,H) scan stack + final -> (4,T,B,H)
        return jnp.concatenate([jnp.moveaxis(mid, 0, 1), last[:, None]], axis=1)

    def slab_t(mid, last):  # (T-1,B,H) + (B,H) -> (T,B,H)
        return jnp.concatenate([mid, last[None]], axis=0)

    return ADMMLState(
        wx=wx_new, wh=wh_new, wy=wy_new,
        z=slab4(z_s, z_T), gate=slab4(gate_s, gate_T),
        c=jnp.concatenate([zeros_row, c_s, c_T[None]], axis=0),
        h=jnp.concatenate([zeros_row, h_s, h_T[None]], axis=0),
        a=a_new,
        lam_z=slab4(lam_z_s, lam_z_T), lam_g=slab4(lam_g_s, lam_g_T),
        lam9=slab_t(lam9_s, lam9_T), lam10=slab_t(lam10_s, lam10_T),
        lam11=lam11_new, epoch=state.epoch + 1)


@functools.lru_cache(maxsize=16)
def _jitted_step(rules: ADMMLRules):
    return jax.jit(functools.partial(admm_l_step, rules=rules))


@functools.lru_cache(maxsize=16)
def _jitted_epoch(rules: ADMMLRules):
    """Step + train/val losses as ONE program (metrics stay on device)."""

    def epoch(state, x_tm, train_x, train_y, test_x, test_y):
        state = admm_l_step(state, x_tm, train_y, rules)
        params = _to_core_params(state.wx, state.wh, state.wy)
        return state, (mse_loss(params, train_x, train_y, rules.precision),
                       mse_loss(params, test_x, test_y, rules.precision))

    return jax.jit(epoch)


def admm_l_demo(num_epochs: int, n_hiddens: int, train_x, train_y,
                test_x, test_y, seed: int = 0, save: bool = False,
                rules: ADMMLRules = ADMMLRules(),
                log_every: int = 1) -> Dict[str, object]:
    """Full ADMM-LSTM-L run mirroring admm_l_demo (main.py:71-208)."""
    train_x, train_y = jnp.asarray(train_x), jnp.asarray(train_y)
    test_x, test_y = jnp.asarray(test_x), jnp.asarray(test_y)
    x_tm = jnp.transpose(train_x, (1, 0, 2))
    wx, wh, wy = init_weights_like_reference(
        seed, train_x.shape[2], n_hiddens, train_y.shape[1])

    state = init_admm_l_state(wx, wh, wy, x_tm, rules)
    epoch_fn = _jitted_epoch(rules)

    # Initial loss from the seeded forward's `a` (main.py:133-137).
    params0 = _to_core_params(state.wx, state.wh, state.wy)
    loss_train = [float(jnp.mean((train_y - state.a) ** 2))]
    loss_test = [float(mse_loss(params0, test_x, test_y))]
    info(f'Loss at the beginning: {loss_train[0]}')

    # Chunked loop (one lax.scan program per chunk; log points bound the
    # chunks) — same shape as api.train.
    import functools as _ft

    @_ft.partial(jax.jit, static_argnames='n')
    def run_chunk(state, n):
        def body(s, _):
            s, tv = epoch_fn(s, x_tm, train_x, train_y, test_x, test_y)
            return s, jnp.stack(tv)

        return jax.lax.scan(body, state, None, length=n)

    timer = Timer()
    timer.start()
    k = 0
    while k < num_epochs:
        chunk = num_epochs - k
        if log_every:
            chunk = min(chunk, log_every - k % log_every)
        state, tvs = run_chunk(state, n=chunk)
        tvs = np.asarray(tvs)
        loss_train += [float(v) for v in tvs[:, 0]]
        loss_test += [float(v) for v in tvs[:, 1]]
        k += chunk
        if log_every and k % log_every == 0:
            info(f'ADMM-LSTM-L: k = {k}, loss train = {loss_train[-1]}, '
                 f'loss test = {loss_test[-1]}')
    jax.block_until_ready(state.wy)
    timer.pause()

    params = _to_core_params(state.wx, state.wh, state.wy)
    if save:
        from admm_lstm_tpu.ckpt import save_model
        save_model('ADMM-LSTM-L', params)

    return {'name': 'ADMM-LSTM-L', 'train_loss': loss_train,
            'val_loss': loss_test, 'params': params, 'state': state,
            'seconds': timer.get_elapsed_time()}
