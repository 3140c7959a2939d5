"""The bias-free LSTM-Linear model as pure functions over a weight pytree.

Capability parity with the reference model (blocks/lstm.py:11-88):
  * weights x2{i,f,g,o} of shape (I, H), h2{i,f,g,o} of shape (H, H) and a
    readout `wy` (called `out` in the reference) of shape (H, O);
    Xavier-normal initialization (blocks/lstm.py:23-29);
  * `lstm_forward` — inference returning only the prediction `a = h_T @ wy`
    (the reference's grad_forward, blocks/lstm.py:48-63) — a single
    `lax.scan` carrying (h, c), with the input-side projections hoisted out
    of the recurrence as one large MXU matmul;
  * `lstm_forward_with_history` — returns every per-timestep gate tensor
    (the reference's init_gate_variables, blocks/lstm.py:65-88) used to seed
    the ADMM primal variables.  Unlike the reference, slabs are TIME-MAJOR
    (T+1, B, H): leading-axis slices are what `lax.scan` produces natively
    and they keep the (B, H) blocks contiguous for the TPU's (8,128) tiling.

The four gate weights are stored stacked as (4, I, H) / (4, H, H) so each
timestep needs exactly two matmuls (x_t @ Wx, h @ Wh) of width 4H — the
classic fused-LSTM layout that feeds the MXU one wide GEMM instead of eight
slivers.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Gate order everywhere in this framework: i, f, g, o.
GATE_ORDER = ('i', 'f', 'g', 'o')


class LSTMParams(NamedTuple):
    """Weight pytree. wx: (4, I, H); wh: (4, H, H); wy: (H, O)."""

    wx: jax.Array
    wh: jax.Array
    wy: jax.Array

    @property
    def input_size(self) -> int:
        return self.wx.shape[1]

    @property
    def hidden_size(self) -> int:
        return self.wh.shape[1]

    @property
    def output_size(self) -> int:
        return self.wy.shape[1]

    # Named accessors for parity with the reference's get_weight('x','i') etc.
    def weight(self, map_from: str, map_to: str) -> jax.Array:
        g = GATE_ORDER.index(map_to)
        return self.wx[g] if map_from == 'x' else self.wh[g]

    def replace_weight(self, map_from: str, map_to: str, value: jax.Array) -> 'LSTMParams':
        g = GATE_ORDER.index(map_to)
        if map_from == 'x':
            return self._replace(wx=self.wx.at[g].set(value))
        return self._replace(wh=self.wh.at[g].set(value))


def _xavier_normal(key: jax.Array, shape: Tuple[int, int], dtype) -> jax.Array:
    fan_in, fan_out = shape
    std = jnp.sqrt(2.0 / (fan_in + fan_out))
    return (std * jax.random.normal(key, shape)).astype(dtype)


def init_lstm_params(key: jax.Array, input_size: int, hidden_size: int,
                     output_size: int, dtype=jnp.float32) -> LSTMParams:
    """Xavier-normal init of all 9 weight blocks (blocks/lstm.py:23-29)."""
    keys = jax.random.split(key, 9)
    wx = jnp.stack([_xavier_normal(keys[k], (input_size, hidden_size), dtype)
                    for k in range(4)])
    wh = jnp.stack([_xavier_normal(keys[4 + k], (hidden_size, hidden_size), dtype)
                    for k in range(4)])
    wy = _xavier_normal(keys[8], (hidden_size, output_size), dtype)
    return LSTMParams(wx=wx, wh=wh, wy=wy)


def params_from_dict(weights: dict) -> LSTMParams:
    """Build LSTMParams from {'x2i': ..., 'h2i': ..., ..., 'wy': ...} arrays.

    Accepts the reference's weight naming (blocks/lstm.py:24-27) so that
    seed-0 torch initializations exported once can be loaded for golden
    parity tests.
    """
    wx = jnp.stack([jnp.asarray(weights[f'x2{g}']) for g in GATE_ORDER])
    wh = jnp.stack([jnp.asarray(weights[f'h2{g}']) for g in GATE_ORDER])
    wy = jnp.asarray(weights.get('wy', weights.get('out')))
    return LSTMParams(wx=wx, wh=wh, wy=wy)


def _gate_activations(pre: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """pre: (..., 4, H) pre-activations in gate order -> (i, f, g, o)."""
    i = jax.nn.sigmoid(pre[..., 0, :])
    f = jax.nn.sigmoid(pre[..., 1, :])
    g = jnp.tanh(pre[..., 2, :])
    o = jax.nn.sigmoid(pre[..., 3, :])
    return i, f, g, o


def _input_projections(params: LSTMParams, x: jax.Array, precision) -> jax.Array:
    """(B, T, I) -> (T, B, 4, H): x_t @ wx for all gates and timesteps at once."""
    xp = jnp.einsum('bti,gih->tbgh', x, params.wx, precision=precision)
    return xp


def lstm_forward(params: LSTMParams, x: jax.Array,
                 c0: jax.Array | None = None, h0: jax.Array | None = None,
                 precision=lax.Precision.HIGHEST) -> jax.Array:
    """Inference: (B, T, I) -> (B, O) prediction from the final hidden state.

    Equivalent to the reference's rolling-forward (blocks/lstm.py:48-63) but
    without materializing gate histories (the reference's ADMM-mode
    inference allocates O(B*T*H) only to read the last row — lstm.py:43-46).
    """
    batch, _, _ = x.shape
    hdim = params.hidden_size
    dtype = x.dtype
    h = jnp.zeros((batch, hdim), dtype) if h0 is None else h0
    c = jnp.zeros((batch, hdim), dtype) if c0 is None else c0

    xproj = _input_projections(params, x, precision)

    def cell(carry, xp_t):
        h, c = carry
        pre = xp_t + jnp.einsum('bh,ghk->bgk', h, params.wh, precision=precision)
        i, f, g, o = _gate_activations(pre)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), None

    (h, _), _ = lax.scan(cell, (h, c), xproj)
    return jnp.dot(h, params.wy, precision=precision)


def lstm_forward_with_history(params: LSTMParams, x: jax.Array,
                              precision=lax.Precision.HIGHEST) -> dict:
    """Full unroll returning all gate trajectories (blocks/lstm.py:65-88).

    Returns dict with keys 'i','f','g','o','c','h' of shape (T+1, B, H)
    (row 0 = zero initial state) and 'a' of shape (B, O).
    """
    batch, seq_len, _ = x.shape
    hdim = params.hidden_size
    dtype = x.dtype
    zeros = jnp.zeros((batch, hdim), dtype)
    xproj = _input_projections(params, x, precision)

    def cell(carry, xp_t):
        h, c = carry
        pre = xp_t + jnp.einsum('bh,ghk->bgk', h, params.wh, precision=precision)
        i, f, g, o = _gate_activations(pre)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), (i, f, g, o, c_new, h_new)

    (h_final, _), (i_s, f_s, g_s, o_s, c_s, h_s) = lax.scan(cell, (zeros, zeros), xproj)

    def with_zero_row(slab):
        return jnp.concatenate([zeros[None], slab], axis=0)

    return {
        'i': with_zero_row(i_s), 'f': with_zero_row(f_s),
        'g': with_zero_row(g_s), 'o': with_zero_row(o_s),
        'c': with_zero_row(c_s), 'h': with_zero_row(h_s),
        'a': jnp.dot(h_final, params.wy, precision=precision),
    }


def mse_loss(params: LSTMParams, x: jax.Array, y: jax.Array,
             precision=lax.Precision.HIGHEST) -> jax.Array:
    pred = lstm_forward(params, x, precision=precision)
    return jnp.mean((pred - y) ** 2)


def lstm_forward_im(params: LSTMParams, x_im: jax.Array,
                    precision=lax.Precision.HIGHEST) -> jax.Array:
    """Inference on pre-transposed (T, I, B) inputs -> (B, O).

    The BATCH-MINOR twin of `lstm_forward`, used inside epoch-chunked
    training programs: the hidden state rides the scan as (H, B), so at
    the reference's hidden sizes none of the per-step tensors lane-pad
    (see core/state.py layout notes), and x is consumed in the compact
    layout the chain hoisted once (core/step.admm_step_im).
    """
    h = final_h_im(params, x_im, precision=precision)
    return jnp.einsum('hb,ho->bo', h, params.wy, precision=precision)


def final_h_im(params: LSTMParams, x_im: jax.Array,
               precision=lax.Precision.HIGHEST) -> jax.Array:
    """(T, I, B) inputs -> final hidden state (H, B), batch-minor."""
    hdim = params.hidden_size
    batch = x_im.shape[-1]
    h = jnp.zeros((hdim, batch), x_im.dtype)
    c = jnp.zeros((hdim, batch), x_im.dtype)

    xproj = jnp.einsum('tdb,gdh->tghb', x_im, params.wx, precision=precision)

    def cell(carry, xp_t):
        h, c = carry
        pre = xp_t + jnp.einsum('hb,ghk->gkb', h, params.wh,
                                precision=precision)
        i = jax.nn.sigmoid(pre[0])
        f = jax.nn.sigmoid(pre[1])
        g = jnp.tanh(pre[2])
        o = jax.nn.sigmoid(pre[3])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), None

    (h, _), _ = lax.scan(cell, (h, c), xproj)
    return h


def train_val_mse_im(params: LSTMParams, xall_im: jax.Array,
                     y_im: jax.Array, vy_im: jax.Array,
                     precision=lax.Precision.HIGHEST):
    """Both epoch metrics from ONE forward scan.

    `xall_im` is the train and validation inputs concatenated along the
    batch (minor) axis, (T, I, B + Bv) — epoch-chunked programs build it
    once per chain.  Separate train/val forwards cost two T-step scans
    per epoch, and the small validation scan is per-op-overhead bound
    (its (H, Bv) blocks occupy a handful of lanes), so it rides along
    with the train columns for free.  Per-column math is identical to
    two `mse_loss_im` calls (the scan contracts over I/H, never B), so
    the returned losses match them bitwise.
    """
    nb = y_im.shape[-1]
    h = final_h_im(params, xall_im, precision=precision)
    pred = jnp.einsum('hb,ho->ob', h, params.wy, precision=precision)
    train = jnp.mean((pred[:, :nb] - y_im) ** 2)
    val = jnp.mean((pred[:, nb:] - vy_im) ** 2)
    return train, val


def mse_loss_im(params: LSTMParams, x_im: jax.Array, y_im: jax.Array,
                precision=lax.Precision.HIGHEST) -> jax.Array:
    """MSE on batch-minor inputs: x_im (T, I, B), y_im (O, B).

    The prediction stays out-minor (O, B) end to end so the O = 1 output
    axis never lands on the 128-wide lane dimension (a (B, 1) prediction
    or target pads every touch 128x — measured as the bulk of the round-3
    wy/metric phase, docs/ROADMAP.md)."""
    h = final_h_im(params, x_im, precision=precision)
    pred = jnp.einsum('hb,ho->ob', h, params.wy, precision=precision)
    return jnp.mean((pred - y_im) ** 2)
