"""ADMM-LSTM-S: the oldest (2022) formulation — biases, a BACKWARD
timestep sweep with per-timestep weight updates, and dual ascent only on
final-timestep residuals (reference: ADMMLSTMS/{main,common}.py).

Structure recovered from the reference script:
  * every epoch begins by RE-INITIALIZING all primal trajectories from a
    full forward pass with the current weights (main.py:236) — so the
    persistent state is only the 14 weight tensors + 11 duals;
  * the sweep runs t = T-1 .. 0 (main.py:251); inside each iteration the
    update order is y,Wy,by (t=T-1 only), then h, o, z_o, W_o, U_o, b_o,
    c, f, z_f, W_f, U_f, b_f, i, z_i, W_i, U_i, b_i, c_, z_c, W_c, U_c,
    b_c — weights move a tau=2400-damped step at EVERY timestep
    (common.py:119-149), reading the mixed fresh(t'>=t)/stale(t'<t) slabs;
  * most closed forms have an undualized branch for t < T-1 and a
    dualized branch at t = T-1; update_h additionally distinguishes
    t = T-2 (common.py:62-86);
  * duals lambda1..11 update once per epoch from final-timestep residuals
    (main.py:279-289).

TPU mapping: forward `lax.scan` seeds the slabs; the backward sweep is a
`lax.scan` over reversed interior timesteps with the full slabs and all
weights in the carry (slice updates via .at[t]), with the two special
timesteps (T-1, T-2) peeled so the hot body is branch-free.  Weight naming
follows the reference: W* multiplies h, U* multiplies x.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from admm_lstm_tpu.utils.logging import info
from admm_lstm_tpu.utils.timer import Timer

# Group order used for stacked weights/duals: f, i, o, c  (c == the
# candidate-cell "g" gate, tanh; reference calls its variables zc / c_).
GROUPS_S = ('f', 'i', 'o', 'c')
_IS_TANH_S = (False, False, False, True)


class ADMMSState(NamedTuple):
    w: jax.Array    # (4, H, H) hidden-side weights W_f,W_i,W_o,W_c
    u: jax.Array    # (4, I, H) input-side weights U_*
    b: jax.Array    # (4, H) biases b_*
    wy: jax.Array   # (H, O)
    by: jax.Array   # (O,)
    # Duals (final-timestep residuals only, (B, H) each):
    lam_z: jax.Array   # (4, B, H) on z = hW + xU + b        (lambda 1,3,5,7)
    lam_g: jax.Array   # (4, B, H) on gate = act(z)          (lambda 2,4,6,8)
    lam9: jax.Array    # (B, H) cell recursion
    lam10: jax.Array   # (B, H) h = o * tanh(c)
    lam11: jax.Array   # (B, O) output fit
    epoch: jax.Array


@dataclasses.dataclass(frozen=True)
class ADMMSRules:
    """Constants from ADMMLSTMS/main.py:183-218 and common.py."""

    rho_z: float = 1.0      # rho1,3,5,7
    rho_g: float = 1.0      # rho2,4,6,8
    rho9: float = 1.0
    rho10: float = 0.1
    rho11: float = 1e-5
    mu: float = 1e-8        # weight-update history damping (main.py:214)
    alpha: float = 1.0
    r_wy: float = 0.01      # update_w_yh step (common.py:40)
    r_h: float = 100.0      # update_h damping (common.py:63)
    tau: float = 2400.0     # update_w/u step damping (common.py:122)
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


def init_weights_like_reference(seed: int, input_size: int, hidden_size: int,
                                output_size: int, torch_rng: bool = True):
    """torch.randn draw order of ADMMLSTMS/main.py:82-96:
    Wf,Uf,bf, Wi,Ui,bi, Wo,Uo,bo, Wc,Uc,bc, Wy,by."""
    shapes = []
    for _ in range(4):
        shapes += [(hidden_size, hidden_size), (input_size, hidden_size),
                   (hidden_size,)]
    shapes += [(hidden_size, output_size), (output_size,)]
    if torch_rng:
        try:
            import torch
            torch.manual_seed(seed)
            draws = [torch.randn(s).numpy() for s in shapes]
        except ImportError:
            torch_rng = False
    if not torch_rng:
        keys = jax.random.split(jax.random.PRNGKey(seed), len(shapes))
        draws = [jax.random.normal(k, s) for k, s in zip(keys, shapes)]
    draws = [jnp.asarray(d, jnp.float32) for d in draws]
    w = jnp.stack([draws[0], draws[3], draws[6], draws[9]])
    u = jnp.stack([draws[1], draws[4], draws[7], draws[10]])
    b = jnp.stack([draws[2], draws[5], draws[8], draws[11]])
    return w, u, b, draws[12], draws[13]


def _forward(state: ADMMSState, x_tm: jax.Array, precision):
    """Full unroll (main.py:159-180): returns slabs z (4,T,B,H),
    gate (4,T,B,H) [f,i,o,c_], c,h (T+1,B,H), y (B,O)."""
    batch = x_tm.shape[1]
    hidden = state.w.shape[1]
    zeros = jnp.zeros((batch, hidden), x_tm.dtype)
    xproj = (jnp.einsum('tbd,gdh->tgbh', x_tm, state.u, precision=precision)
             + state.b[None, :, None, :])
    tanh_sel = jnp.asarray(_IS_TANH_S)[:, None, None]

    def cell(carry, xp_t):
        h, c = carry
        z = xp_t + jnp.einsum('bh,ghk->gbk', h, state.w, precision=precision)
        act = jnp.where(tanh_sel, jnp.tanh(z), _sig(z))
        f, i, o, c_ = act[0], act[1], act[2], act[3]
        c_new = f * c + i * c_
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), (z, act, c_new, h_new)

    (h_fin, _), (z_s, act_s, c_s, h_s) = lax.scan(cell, (zeros, zeros), xproj)
    y = jnp.dot(h_fin, state.wy, precision=precision) + state.by
    with_zero = lambda s: jnp.concatenate([zeros[None], s], axis=0)
    return (jnp.transpose(z_s, (1, 0, 2, 3)),
            jnp.transpose(act_s, (1, 0, 2, 3)),
            with_zero(c_s), with_zero(h_s), y)


def predict(state: ADMMSState, x, precision=lax.Precision.HIGHEST):
    x_tm = jnp.transpose(jnp.asarray(x), (1, 0, 2))
    return _forward(state, x_tm, precision)[-1]


def _update_weights_group(g: int, slabs, state_w, state_u, state_b,
                          x_tm, lam_z_g, rules: ADMMSRules, seq_len):
    """update_w / update_u / update_b for one gate group (common.py:119-161).

    Sum of undualized residuals over t < T-1 (weighted mu) plus the
    dualized final-timestep term (weighted rho); tau-damped step for W and
    U, closed form for b.  Reads the carried (mixed fresh/stale) slabs.
    """
    precision = rules.precision
    z_slab, h_slab = slabs  # (T,B,H), (T+1,B,H)
    rho = rules.rho_z
    mu, tau, alpha = rules.mu, rules.tau, rules.alpha
    w_g, u_g, b_g = state_w[g], state_u[g], state_b[g]

    h_prev_all = h_slab[:-1]   # rows t-1 for t = 0..T-1
    # t < T-1 terms (no bias subtraction bug kept for update_b only).
    resid = (z_slab - jnp.einsum('tbh,hk->tbk', h_prev_all, w_g,
                                 precision=precision)
             - jnp.einsum('tbd,dk->tbk', x_tm, u_g, precision=precision))
    resid_wb = resid - b_g  # with bias: used by update_w / update_u
    final = resid_wb[seq_len - 1] + lam_z_g / rho

    # W step (common.py:119-133): interior sum contracts h^T, final term too.
    interior_w = jnp.einsum('tbh,tbk->hk', h_prev_all[:seq_len - 1],
                            resid_wb[:seq_len - 1], precision=precision)
    final_w = jnp.einsum('bh,bk->hk', h_slab[seq_len - 1], final,
                         precision=precision)
    w_new = (w_g + (mu * interior_w + rho * final_w) / tau) / alpha

    # U step (common.py:136-149) with the FRESH W (reference call order
    # W then U; update_u's residual uses the w passed in = fresh one).
    resid_u = (z_slab - jnp.einsum('tbh,hk->tbk', h_prev_all, w_new,
                                   precision=precision)
               - jnp.einsum('tbd,dk->tbk', x_tm, u_g, precision=precision)
               - b_g)
    final_u = resid_u[seq_len - 1] + lam_z_g / rho
    interior_u = jnp.einsum('tbd,tbk->dk', x_tm[:seq_len - 1],
                            resid_u[:seq_len - 1], precision=precision)
    final_u_term = jnp.einsum('bd,bk->dk', x_tm[seq_len - 1], final_u,
                              precision=precision)
    u_new = (u_g + (mu * interior_u + rho * final_u_term) / tau) / alpha

    # b step (common.py:152-161): interior terms WITHOUT bias subtraction
    # (reference quirk), final term with lam/rho but also no bias.
    resid_b = (z_slab - jnp.einsum('tbh,hk->tbk', h_prev_all, w_new,
                                   precision=precision)
               - jnp.einsum('tbd,dk->tbk', x_tm, u_new, precision=precision))
    interior_b = jnp.sum(resid_b[:seq_len - 1], axis=0)   # (B,H)
    final_b = resid_b[seq_len - 1] + lam_z_g / rho
    res = (mu * interior_b + rho * final_b) / ((seq_len - 2) * mu + rho)
    b_new = jnp.mean(res, axis=0) / alpha

    return (state_w.at[g].set(w_new), state_u.at[g].set(u_new),
            state_b.at[g].set(b_new))


def _sweep_iteration(carry, t, mode, duals, x_tm, train_y,
                     rules: ADMMSRules, seq_len):
    """One backward-sweep iteration (main.py:251-277).

    mode: 'final' (t=T-1), 'second' (t=T-2) or 'interior' — static.
    carry: (w, u, b, wy, by, z, gate, c, h, y) with z/gate (4,T,B,H),
    c/h (T+1,B,H) (row 0 = t=-1), y (B,O).
    """
    precision = rules.precision
    w, u, b, wy, by, z, gate, c, h, y = carry
    rz, rg = rules.rho_z, rules.rho_g
    r9, r10, r11 = rules.rho9, rules.rho10, rules.rho11
    alpha = rules.alpha
    batch = x_tm.shape[1]
    lam_z, lam_g, lam9, lam10, lam11 = duals

    x_t = x_tm[t]
    h_t = h[t + 1]
    c_t = c[t + 1]
    c_prev = c[t]
    h_prev = h[t]

    if mode == 'final':
        # y / Wy / by (common.py:31-53) with the stale forward h[T-1].
        hw = jnp.dot(h_t, wy, precision=precision)
        y = ((2.0 * train_y / batch + r11 * hw + r11 * by - lam11)
             / (2.0 / batch + r11))
        temp1 = y - hw - by + lam11 / r11
        wy = wy + r11 * jnp.dot(h_t.T, temp1, precision=precision) / rules.r_wy
        temp1b = y - jnp.dot(h_t, wy, precision=precision) + lam11 / r11
        by = jnp.mean(temp1b, axis=0) / alpha

    # --- h update (common.py:62-86) ---
    o_t = gate[2, t]
    if mode == 'final':
        temp1 = o_t * jnp.tanh(c_t) - lam10 / r10
        temp2 = y - jnp.dot(h_t, wy, precision=precision) - by + lam11 / r11
        h_new = ((rules.r_h - r10) * h_t + r10 * temp1
                 + r11 * jnp.dot(temp2, wy.T, precision=precision)) \
            / rules.r_h / alpha
    else:
        def fun(gi, lam0, rho0):
            # Fun(z, h, W, x, U, b, lam0, rho0, t) (common.py:56-59).
            temp1 = (z[gi, t + 1]
                     - jnp.dot(h_t, w[gi], precision=precision)
                     - jnp.dot(x_tm[t + 1], u[gi], precision=precision)
                     - b[gi] + lam0 / rho0)
            return jnp.dot(temp1, w[gi].T, precision=precision)

        if mode == 'second':
            temps = sum(rules.rho_z * fun(gi, lam_z[gi], rules.rho_z)
                        for gi in range(4))
            temp5 = rules.mu * (h_t - o_t * jnp.tanh(c_t))
        else:
            temps = sum(fun(gi, 0.0, 1.0) for gi in range(4))
            temp5 = h_t - o_t * jnp.tanh(c_t)
        h_new = (h_t + (temps - temp5) / rules.r_h) / alpha
    h = h.at[t + 1].set(h_new)

    def group_block(gi, gate_update_fn):
        """z/W/U/b updates shared by all four groups; gate first via fn."""
        nonlocal w, u, b, z, gate
        g_new = gate_update_fn()
        gate = gate.at[gi, t].set(g_new)
        # z update (common.py:102-116 sigmoid / 222-235 tanh).
        is_tanh = _IS_TANH_S[gi]
        act = jnp.tanh if is_tanh else _sig
        dact = _dtanh if is_tanh else _dsig
        z_old = z[gi, t]
        lin = (jnp.dot(h_prev, w[gi], precision=precision)
               + jnp.dot(x_t, u[gi], precision=precision) + b[gi])
        if mode == 'final':
            out_l = g_new + lam_g[gi] / rg
            norm = jnp.linalg.norm(out_l)
            temp_h = (4.0 + 2.0 * norm) if is_tanh else (0.5 * (1.0 + norm) + 0.125)
            temp1 = lin - lam_z[gi] / rz
            temp2 = (act(z_old) - out_l) * dact(z_old)
            temp3 = rz * temp1 + 0.5 * temp_h * z_old - rg * temp2
            z_new = 2.0 * temp3 / (2.0 * rz + rg * temp_h) / alpha
        else:
            norm = jnp.linalg.norm(g_new)
            temp2 = (act(z_old) - g_new) * dact(z_old)
            if is_tanh:
                temp_h = 4.0 + 2.0 * norm
                z_new = (2.0 * lin + temp_h * z_old - 2.0 * temp2) / (2.0 + temp_h)
            else:
                temp_h = 0.5 * (1.0 + norm) + 0.125
                temp3 = lin + 0.5 * temp_h * z_old - temp2
                z_new = 2.0 * temp3 / (2.0 + temp_h) / alpha
        z = z.at[gi, t].set(z_new)
        w, u, b = _update_weights_group(
            gi, (z[gi], h), w, u, b, x_tm, lam_z[gi], rules, seq_len)

    # --- o group (common.py:89-99) ---
    def update_o():
        tc = jnp.tanh(c_t)
        if mode == 'final':
            return ((rg * _sig(z[2, t]) - lam_g[2]
                     + r10 * (h[t + 1] + lam10 / r10) * tc)
                    / (rg + r10 * tc * tc) / alpha)
        return (_sig(z[2, t]) + h[t + 1] * tc) / (1.0 + tc * tc) / alpha

    group_block(2, update_o)

    # --- c update (common.py:164-178) ---
    o_new = gate[2, t]
    if mode == 'final':
        temp_h = 4.0 + 2.0 * jnp.linalg.norm((h[t + 1] + lam10 / r10) / o_new)
        temp1 = gate[0, t] * c_prev + gate[1, t] * gate[3, t] - lam9 / r9
        temp2 = o_new * o_new * temp_h
        temp3 = (o_new * jnp.tanh(c_t) - (h[t + 1] + lam10 / r10)) \
            * o_new * _dtanh(c_t)
        c_new = (2.0 * r9 * temp1 + r10 * temp2 * c_t - 2.0 * r10 * temp3) \
            / (2.0 * r9 + r10 * temp2)
    else:
        temp_h = 4.0 + 2.0 * jnp.linalg.norm(h[t + 1] / o_new)
        temp1 = gate[0, t] * c_prev + gate[1, t] * gate[3, t]
        temp2 = o_new * o_new * temp_h
        temp3 = (o_new * jnp.tanh(c_t) - h[t + 1]) * o_new * _dtanh(c_t)
        c_new = (2.0 * temp1 + temp2 * c_t - 2.0 * temp3) / (2.0 + temp2)
    c = c.at[t + 1].set(c_new)

    # --- f group (common.py:181-193) ---
    def update_f():
        if mode == 'final':
            return ((rg * _sig(z[0, t]) - lam_g[0]
                     + r9 * c_prev * (c[t + 1] - gate[1, t] * gate[3, t]
                                      + lam9 / r9))
                    / (rg + r9 * c_prev * c_prev) / alpha)
        return ((_sig(z[0, t]) + (c[t + 1] - gate[1, t] * gate[3, t]) * c_prev)
                / (1.0 + c_prev * c_prev) / alpha)

    group_block(0, update_f)

    # --- i group (common.py:196-206) ---
    def update_i():
        cc = gate[3, t]
        if mode == 'final':
            return ((rg * _sig(z[1, t]) - lam_g[1]
                     + (r9 * c[t + 1] - r9 * gate[0, t] * c_prev + lam9) * cc)
                    / (rg + r9 * cc * cc) / alpha)
        return ((_sig(z[1, t]) + (c[t + 1] - gate[0, t] * c_prev) * cc)
                / (1.0 + cc * cc) / alpha)

    group_block(1, update_i)

    # --- c_ (candidate cell) group (common.py:209-219) ---
    def update_cc():
        if mode == 'final':
            return ((rg * jnp.tanh(z[3, t]) - lam_g[3]
                     + gate[1, t] * (r9 * c[t + 1] - r9 * gate[0, t] * c_prev
                                     + lam9))
                    / (rg + r9 * gate[1, t] * gate[1, t]) / alpha)
        return ((jnp.tanh(z[3, t]) + gate[1, t] * (c[t + 1]
                                                   - gate[0, t] * c_prev))
                / (1.0 + gate[1, t] * gate[1, t]) / alpha)

    group_block(3, update_cc)

    return (w, u, b, wy, by, z, gate, c, h, y)


def admm_s_step(state: ADMMSState, x_tm: jax.Array, train_y: jax.Array,
                rules: ADMMSRules) -> ADMMSState:
    """One full ADMM-LSTM-S epoch (main.py:224-289)."""
    precision = rules.precision
    seq_len = x_tm.shape[0]

    # 1. Re-seed primal trajectories from a forward pass (main.py:236).
    z, gate, c, h, y = _forward(state, x_tm, precision)
    carry = (state.w, state.u, state.b, state.wy, state.by, z, gate, c, h, y)

    duals = (state.lam_z, state.lam_g, state.lam9, state.lam10, state.lam11)

    # 2. Backward sweep with peeled special timesteps.
    if seq_len >= 1:
        carry = _sweep_iteration(carry, seq_len - 1, 'final', duals, x_tm,
                                 train_y, rules, seq_len)
    if seq_len >= 2:
        carry = _sweep_iteration(carry, seq_len - 2, 'second', duals, x_tm,
                                 train_y, rules, seq_len)
    if seq_len >= 3:
        def scan_body(carry, t):
            return _sweep_iteration(carry, t, 'interior', duals, x_tm,
                                    train_y, rules, seq_len), None

        ts = jnp.arange(seq_len - 3, -1, -1)
        carry, _ = lax.scan(scan_body, carry, ts)

    w, u, b, wy, by, z, gate, c, h, y = carry

    # 3. Dual ascent on final-timestep residuals (main.py:279-289).
    tT = seq_len - 1
    lin_T = (jnp.einsum('bh,ghk->gbk', h[tT], w, precision=precision)
             + jnp.einsum('bd,gdh->gbh', x_tm[tT], u, precision=precision)
             + b[:, None, :])
    acts_T = jnp.where(jnp.asarray(_IS_TANH_S)[:, None, None],
                       jnp.tanh(z[:, tT]), _sig(z[:, tT]))
    lam_z_new = state.lam_z + rules.rho_z * (z[:, tT] - lin_T)
    lam_g_new = state.lam_g + rules.rho_g * (gate[:, tT] - acts_T)
    lam9_new = state.lam9 + rules.rho9 * (
        c[tT + 1] - gate[0, tT] * c[tT] - gate[1, tT] * gate[3, tT])
    lam10_new = state.lam10 + rules.rho10 * (
        h[tT + 1] - gate[2, tT] * jnp.tanh(c[tT + 1]))
    lam11_new = state.lam11 + rules.rho11 * (
        y - jnp.dot(h[tT + 1], wy, precision=precision) - by)

    return ADMMSState(w=w, u=u, b=b, wy=wy, by=by,
                      lam_z=lam_z_new, lam_g=lam_g_new, lam9=lam9_new,
                      lam10=lam10_new, lam11=lam11_new,
                      epoch=state.epoch + 1)


@functools.lru_cache(maxsize=16)
def _jitted_step(rules: ADMMSRules):
    return jax.jit(functools.partial(admm_s_step, rules=rules))


@functools.lru_cache(maxsize=16)
def _jitted_epoch(rules: ADMMSRules):
    """Step + train/val losses as ONE program (metrics stay on device)."""

    def epoch(state, x_tm, train_y, test_x_tm, test_y):
        state = admm_s_step(state, x_tm, train_y, rules)
        pred_train = _forward(state, x_tm, rules.precision)[-1]
        pred_test = _forward(state, test_x_tm, rules.precision)[-1]
        return state, (jnp.mean((pred_train - train_y) ** 2),
                       jnp.mean((pred_test - test_y) ** 2))

    return jax.jit(epoch)


def admm_s_demo(num_epochs: int, n_hiddens: int, train_x, train_y,
                test_x, test_y, seed: int = 0,
                rules: ADMMSRules = ADMMSRules(),
                log_every: int = 1, results_path: str | None = None
                ) -> Dict[str, object]:
    """Full ADMM-LSTM-S run mirroring ADMMLSTMS/main.py, including the
    comparison-cache export (main.py:344-359) when `results_path` is set."""
    train_x, train_y = jnp.asarray(train_x), jnp.asarray(train_y)
    test_x, test_y = jnp.asarray(test_x), jnp.asarray(test_y)
    x_tm = jnp.transpose(train_x, (1, 0, 2))
    w, u, b, wy, by = init_weights_like_reference(
        seed, train_x.shape[2], n_hiddens, train_y.shape[1])
    batch, hidden = train_x.shape[0], n_hiddens
    zeros4 = jnp.zeros((4, batch, hidden), jnp.float32)
    state = ADMMSState(w=w, u=u, b=b, wy=wy, by=by,
                       lam_z=zeros4, lam_g=jnp.zeros_like(zeros4),
                       lam9=jnp.zeros((batch, hidden), jnp.float32),
                       lam10=jnp.zeros((batch, hidden), jnp.float32),
                       lam11=jnp.zeros((batch, train_y.shape[1]), jnp.float32),
                       epoch=jnp.asarray(0, jnp.int32))
    epoch_fn = _jitted_epoch(rules)
    test_x_tm = jnp.transpose(test_x, (1, 0, 2))

    tl = float(jnp.mean((predict(state, train_x, rules.precision)
                         - train_y) ** 2))
    vl = float(jnp.mean((predict(state, test_x, rules.precision)
                         - test_y) ** 2))
    loss_train, loss_test = [tl], [vl]
    info(f'ADMM-LSTM-S: iter 0, loss_train: {tl:.6f}, loss_test: {vl:.6f}')

    # Chunked loop (one lax.scan program per chunk; log points bound the
    # chunks) — same shape as api.train.
    import functools as _ft

    import numpy as _np

    @_ft.partial(jax.jit, static_argnames='n_steps')
    def run_chunk(state, n_steps):
        def body(s, _):
            s, tv = epoch_fn(s, x_tm, train_y, test_x_tm, test_y)
            return s, jnp.stack(tv)

        return jax.lax.scan(body, state, None, length=n_steps)

    timer = Timer()
    timer.start()
    n = 0
    while n < num_epochs:
        chunk = num_epochs - n
        if log_every:
            chunk = min(chunk, log_every - n % log_every)
        state, tvs = run_chunk(state, n_steps=chunk)
        tvs = _np.asarray(tvs)
        loss_train += [float(v) for v in tvs[:, 0]]
        loss_test += [float(v) for v in tvs[:, 1]]
        n += chunk
        if log_every and n % log_every == 0:
            info(f'ADMM-LSTM-S: iter {n}, loss_train: {loss_train[-1]:.6f}, '
                 f'loss_test: {loss_test[-1]:.6f}')
    jax.block_until_ready(state.wy)
    timer.pause()

    if results_path:
        with open(results_path, 'w') as f:
            f.write('admm_s_loss = { \n    "name": "ADMM-LSTM-S", \n'
                    '    "train_loss": [')
            f.write(', '.join(str(v) for v in loss_train) + ', ],\n')
            f.write('    "val_loss": [')
            f.write(', '.join(str(v) for v in loss_test) + ', ]\n}')

    return {'name': 'ADMM-LSTM-S', 'train_loss': loss_train,
            'val_loss': loss_test, 'state': state,
            'seconds': timer.get_elapsed_time()}
