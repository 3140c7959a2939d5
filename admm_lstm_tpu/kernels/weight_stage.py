"""Pallas TPU kernels: the fused prox-linear weight stage.

The gate-weight phase (reference admm.py:282-343; XLA path
solvers/prox_linear.weight_stage_update_wide) is the parity epoch's
largest bytes mover.  The XLA path materializes the pre-activation,
residual, gradient-projection and candidate slabs as separate fusions;
these kernels keep each (4H, Bt) tile VMEM-resident through the whole
computation so one stage costs exactly:

  kernel A (stats):  read  proj_self, proj_other, target, m_inputs
                     write pre                      (one slab)
                     accumulate grad (4H, D) and the per-column residual
                     sum entirely in VMEM across grid cells
  kernel B (probe):  read  pre, m_inputs, target (+ tiny grad)
                     write grad_proj                (one slab)
                     accumulate all BLOCK_K candidate objective sums for
                     the blocked line-search lattice in one pass

The theta selection, acceptance algebra, weight closed form and the
next stage's projection assembly stay in XLA (scalar / fused
elementwise) — semantics are identical to the XLA stage including the
first-acceptance-on-the-lattice rule and the max_iters cap
(tests/test_kernels.py checks agreement in interpret mode and on TPU).

Scope: D (the stage's design width) <= 16 — the reference's regime
(input features 1-4, hidden 10-16), where the cross-lane contractions
can run as D broadcast-FMA passes on the VPU instead of MXU matmuls
that would need lane-axis transposes.  Wider stages fall back to the
XLA path (core/step._weight_phase gates on the same bound).

Measured envelope (round 3, fetch-synced): TIES the XLA stage at the
GoogleStock headline shape (142.9 vs 143.8 us — both sit at the
phase's structural floor) and LOSES ~2x at T = 1024 (the grid runs one
timestep per cell; per-cell overhead dominates at long T — a
time-blocked grid like gate_sweep's would be needed).  Stays opt-in
(`ADMMConfig.use_pallas_weights`).

Layout: batch-minor throughout — slabs (T, 4H, B) with gates folded
gate-major in the sublanes and the batch in the 128-wide lanes; design
matrices (T, D, B).  Cross-gate/column reductions leave the kernels as
(4H, D) / (4H, K) tiles via one-hot lane masks (no vector transposes,
no dynamic minor-axis indexing).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_D = 16


def _col_constants(four_h: int, hidden: int, dtype=jnp.float32):
    """Per-column activation constants from the gate id (g = column // H):
    sigmoid(x) = 0.5 + 0.5*tanh(0.5 x); tanh gate is g-index 2.
    Returns (s, a, b, c) as (4H, 1) arrays: act = a + b*tanh(s*x),
    act' = c*(1 - tanh(s*x)^2)."""
    gate_id = lax.broadcasted_iota(jnp.int32, (four_h, 1), 0) // hidden
    is_tanh = gate_id == 2
    s = jnp.where(is_tanh, 1.0, 0.5).astype(dtype)
    b = jnp.where(is_tanh, 1.0, 0.5).astype(dtype)
    a = jnp.where(is_tanh, 0.0, 0.5).astype(dtype)
    c = jnp.where(is_tanh, 1.0, 0.25).astype(dtype)
    return s, a, b, c


def _stats_kernel(ps_ref, po_ref, tg_ref, m_ref,
                  pre_out, grad_out, fsum_out, *,
                  hidden: int, dim: int, batch: int, tile: int):
    """Grid (T, B/tile).  Accumulates grad (4H, D) and the per-column
    residual square-sum (4H, 1) across all cells; writes the pre slab."""
    t = pl.program_id(0)
    b = pl.program_id(1)
    four_h = ps_ref.shape[1]

    @pl.when(jnp.logical_and(t == 0, b == 0))
    def _():
        grad_out[:] = jnp.zeros_like(grad_out)
        fsum_out[:] = jnp.zeros_like(fsum_out)

    s, a, bb, c = _col_constants(four_h, hidden)
    lane = lax.broadcasted_iota(jnp.int32, (1, tile), 1) + b * tile
    valid = lane < batch                                    # (1, tile)

    pre = ps_ref[0] + po_ref[0]                             # (4H, tile)
    pre_out[0] = pre
    u = jnp.tanh(s * pre)
    resid = a + bb * u - tg_ref[0]
    rd = jnp.where(valid, resid * (c * (1.0 - u * u)), 0.0)
    r2 = jnp.where(valid, resid * resid, 0.0)

    fsum_out[:, 0:1] += jnp.sum(r2, axis=1, keepdims=True)
    lane_d = lax.broadcasted_iota(jnp.int32, (1, grad_out.shape[1]), 1)
    acc = jnp.zeros_like(grad_out)
    for d in range(dim):
        m_row = m_ref[0, d:d + 1, :]                        # (1, tile)
        col = jnp.sum(rd * m_row, axis=1, keepdims=True)    # (4H, 1)
        acc = acc + col * (lane_d == d).astype(col.dtype)
    grad_out[:] += acc


def _probe_kernel(th_ref, pre_ref, tg_ref, m_ref, gt_ref,
                  gp_out, orig_out, *,
                  hidden: int, dim: int, batch: int, tile: int,
                  block_k: int):
    """Grid (T, B/tile).  Writes the gradient-projection slab and
    accumulates the BLOCK_K candidate objective sums (4H, K): candidate
    j probes theta_base * 2^j per gate (the blocked lattice of
    prox_linear.weight_stage_update_wide)."""
    t = pl.program_id(0)
    b = pl.program_id(1)
    four_h = pre_ref.shape[1]

    @pl.when(jnp.logical_and(t == 0, b == 0))
    def _():
        orig_out[:] = jnp.zeros_like(orig_out)

    s, a, bb, _ = _col_constants(four_h, hidden)
    lane = lax.broadcasted_iota(jnp.int32, (1, tile), 1) + b * tile
    valid = lane < batch

    gp = jnp.zeros((four_h, tile), jnp.float32)
    for d in range(dim):
        gp = gp + gt_ref[:, d:d + 1] * m_ref[0, d:d + 1, :]
    gp_out[0] = gp

    # Per-column theta_base from the per-gate SMEM scalars.
    gate_id = lax.broadcasted_iota(jnp.int32, (four_h, 1), 0) // hidden
    th_cols = jnp.full((four_h, 1), th_ref[0, 0], jnp.float32)
    for g in (1, 2, 3):
        th_cols = jnp.where(gate_id == g, th_ref[0, g], th_cols)

    pre = pre_ref[0]
    tg = tg_ref[0]
    lane_k = lax.broadcasted_iota(jnp.int32, (1, orig_out.shape[1]), 1)
    acc = jnp.zeros_like(orig_out)
    for j in range(block_k):
        inv_th = 1.0 / (th_cols * (2.0 ** j))
        u = jnp.tanh(s * (pre + gp * inv_th))
        r = a + bb * u - tg
        r2 = jnp.where(valid, r * r, 0.0)
        col = jnp.sum(r2, axis=1, keepdims=True)            # (4H, 1)
        acc = acc + col * (lane_k == j).astype(col.dtype)
    orig_out[:] += acc


def _pick_tile(batch: int, four_h: int,
               vmem_budget: int = 10 * 1024 * 1024) -> int:
    """Lane tile: whole (8-padded) batch when it fits, else the largest
    VMEM-fitting 128-multiple divisor of the 128-padded batch."""
    bytes_per_lane = four_h * 4 * 12        # ~6 live blocks, double-buffered
    limit = max(8, vmem_budget // bytes_per_lane)
    if batch <= limit:
        return max(8, -(-batch // 8) * 8)
    limit = max(128, limit // 128 * 128)
    bpad = -(-batch // 128) * 128
    for cand in range(limit, 127, -128):
        if bpad % cand == 0:
            return cand
    return 128


@functools.partial(jax.jit, static_argnames=('hidden', 'interpret'))
def _stats_call(proj_self, proj_other, target, m_inputs, hidden: int,
                interpret: bool = False):
    seq_len, four_h, batch = proj_self.shape
    dim = m_inputs.shape[1]
    tile = _pick_tile(batch, four_h)
    pad = (-batch) % tile
    if pad:
        pad_b = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, pad)))
        proj_self, proj_other = pad_b(proj_self), pad_b(proj_other)
        target, m_inputs = pad_b(target), pad_b(m_inputs)
    bpad = batch + pad

    slab = pl.BlockSpec((1, four_h, tile), lambda t, b: (t, 0, b),
                        memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, dim, tile), lambda t, b: (t, 0, b),
                         memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(shape, lambda t, b: (0, 0),
                                     memory_space=pltpu.VMEM)

    pre, grad_t, fsum = pl.pallas_call(
        functools.partial(_stats_kernel, hidden=hidden, dim=dim,
                          batch=batch, tile=tile),
        grid=(seq_len, bpad // tile),
        in_specs=[slab, slab, slab, mspec],
        out_specs=[slab, acc((four_h, dim)), acc((four_h, 8))],
        out_shape=[jax.ShapeDtypeStruct((seq_len, four_h, bpad), jnp.float32),
                   jax.ShapeDtypeStruct((four_h, dim), jnp.float32),
                   jax.ShapeDtypeStruct((four_h, 8), jnp.float32)],
        interpret=interpret,
    )(proj_self, proj_other, target, m_inputs)
    return pre, grad_t, fsum[:, 0]


@functools.partial(jax.jit, static_argnames=('hidden', 'batch', 'block_k',
                                             'interpret'))
def _probe_call(theta_base, pre_pad, target_pad, m_pad, grad_t,
                hidden: int, batch: int, block_k: int = 8,
                interpret: bool = False):
    seq_len, four_h, bpad = pre_pad.shape
    dim = m_pad.shape[1]
    tile = _pick_tile(batch, four_h)

    slab = pl.BlockSpec((1, four_h, tile), lambda t, b: (t, 0, b),
                        memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, dim, tile), lambda t, b: (t, 0, b),
                         memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(shape, lambda t, b: (0, 0),
                                     memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 8), lambda t, b: (0, 0),
                        memory_space=pltpu.SMEM)

    th_pad = jnp.zeros((1, 8), jnp.float32).at[0, :4].set(theta_base)
    gp, orig = pl.pallas_call(
        functools.partial(_probe_kernel, hidden=hidden, dim=dim,
                          batch=batch, tile=tile, block_k=block_k),
        grid=(seq_len, bpad // tile),
        in_specs=[smem, slab, slab, mspec, acc((four_h, dim))],
        out_specs=[slab, acc((four_h, max(8, block_k)))],
        out_shape=[jax.ShapeDtypeStruct((seq_len, four_h, bpad), jnp.float32),
                   jax.ShapeDtypeStruct((four_h, max(8, block_k)),
                                        jnp.float32)],
        interpret=interpret,
    )(th_pad, pre_pad, target_pad, m_pad, grad_t)
    return gp, orig[:, :block_k]


def pallas_weight_stage(m_inputs: jax.Array, proj_self: jax.Array,
                        proj_other: jax.Array, weights_w: jax.Array,
                        target_w: jax.Array, rho_g: jax.Array,
                        beta_g: jax.Array, seq_len: int, max_iters: int,
                        block_k: int = 8, interpret: bool = False):
    """Drop-in fused twin of prox_linear.weight_stage_update_wide.

    Same arguments minus tanh_cols/precision (the gate pattern i,f,g,o
    with tanh at g is fixed, and all in-kernel math is f32); returns
    (weights (D, 4H), proj_new (T, 4H, B), theta (4,), iters (4,)).
    """
    dim = m_inputs.shape[1]
    hidden = weights_w.shape[-1] // 4
    if dim > MAX_D:
        raise ValueError(f'pallas weight stage supports D <= {MAX_D}, '
                         f'got {dim} (use the XLA stage)')
    batch = proj_self.shape[-1]
    dtype = weights_w.dtype

    pad = (-batch) % _pick_tile(batch, 4 * hidden)
    pre_pad, grad_t, fsum = _stats_call(
        proj_self, proj_other, target_w, m_inputs, hidden,
        interpret=interpret)
    # The kernel accumulates the raw residual-weighted sums; the per-gate
    # penalty scaling (rho_cols * einsum, prox_linear.py grad) applies
    # here on the tiny (4H, D) tile.
    grad_t = grad_t * jnp.repeat(rho_g, hidden)[:, None]
    if pad:
        m_pad = jnp.pad(m_inputs, ((0, 0), (0, 0), (0, pad)))
        tg_pad = jnp.pad(target_w, ((0, 0), (0, 0), (0, pad)))
    else:
        m_pad, tg_pad = m_inputs, target_w
    grad = grad_t.T                                          # (D, 4H)

    def per_gate(v):
        return v.reshape(4, hidden).sum(-1)

    f_at_w = 0.5 * rho_g * per_gate(fsum)
    grad_sq = per_gate(jnp.sum(grad * grad, axis=0))
    est_coef = (1.0 + 0.5 * seq_len) * grad_sq

    def probe(theta_base):
        gp_pad, orig_cols = _probe_call(theta_base, pre_pad, tg_pad, m_pad,
                                        grad_t, hidden, batch, block_k,
                                        interpret=interpret)
        original = 0.5 * rho_g[:, None] * jnp.stack(
            [per_gate(orig_cols[:, j]) for j in range(block_k)], axis=1)
        return gp_pad, original

    # Identical blocked first-acceptance lattice + cap semantics to the
    # XLA stage (see weight_stage_update_wide).  The first candidate
    # block is peeled out of the while_loop so its kernel run also
    # yields the (theta-independent) gradient-projection slab; searches
    # needing more than BLOCK_K doublings loop on the probe kernel
    # alone.
    def advance(original, theta_base, theta_acc, done, k):
        ks = k + jnp.arange(block_k)
        theta_j = theta_base[:, None] * (2.0 ** jnp.arange(block_k))
        fails = jnp.logical_or(
            original > f_at_w[:, None] + est_coef[:, None] / theta_j,
            ks[None, :] >= max_iters)
        accepts = jnp.logical_not(fails)
        found = jnp.any(accepts, axis=1)
        first = jnp.argmax(accepts, axis=1)
        theta_hit = theta_base * (2.0 ** first.astype(dtype))
        newly = jnp.logical_and(jnp.logical_not(done), found)
        theta_acc = jnp.where(newly, theta_hit, theta_acc)
        done = jnp.logical_or(done, found)
        step = jnp.minimum(block_k, max_iters - k).astype(dtype)
        theta_base = jnp.where(done, theta_base, theta_base * (2.0 ** step))
        return theta_base, theta_acc, done, k + block_k

    ones = jnp.ones((4,), dtype)
    grad_proj_pad, orig0 = probe(ones)
    carry = advance(orig0, ones, ones, jnp.zeros((4,), bool),
                    jnp.asarray(0, jnp.int32))

    def cond(carry):
        _, _, done, k = carry
        return jnp.logical_and(jnp.logical_not(jnp.all(done)), k < max_iters)

    def body(carry):
        theta_base, theta_acc, done, k = carry
        _, original = probe(theta_base)
        return advance(original, theta_base, theta_acc, done, k)

    theta_base, theta_acc, done, iters = lax.while_loop(cond, body, carry)
    theta = jnp.where(done, theta_acc, theta_base) / 2.0

    grad_proj = grad_proj_pad[:, :, :batch] if pad else grad_proj_pad

    scale = 0.5 * rho_g * seq_len * theta
    scale_cols = jnp.repeat(scale, hidden)
    denom_cols = jnp.repeat(beta_g + scale, hidden)
    new_w = (scale_cols * weights_w - grad) / denom_cols
    proj_new = ((scale_cols[:, None] * proj_self - grad_proj)
                / denom_cols[:, None])
    return new_w, proj_new, theta, iters
