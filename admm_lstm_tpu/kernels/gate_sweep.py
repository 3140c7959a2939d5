"""Pallas TPU kernel: the fused interior timestep sweep of the fast ADMM
variant (primal i,f,g,o,c,h + dual i,f,g,o,c updates for t = 1..T-1).

One `pallas_call` executes the whole recurrence.  The grid is
(batch_tiles, ceil((T-1)/K)) with time as the LAST (fastest, sequential)
dimension: TPU grid cells run in order, so the (h, c) recurrence carries
live in VMEM scratch that persists across the time steps of a batch tile
and resets at t == 0 (the standard sequential-scan-as-grid pattern).
Each grid cell processes a block of K consecutive timesteps (K unrolled
in-kernel iterations) — amortizing the fixed per-grid-step cost that
dominates at small H / long T.

BATCH-MINOR tiles (round 3): every block is (K, H, Bt) with the batch in
the 128-wide lane axis and the hidden size in sublanes.  The round-2
kernels tiled (K, Bt, H) — at the reference's hidden sizes that padded
the lane axis 128/H-fold (12.8x at H=10), and the kernel lost to the XLA
scan at every measured shape for exactly that reason (docs/ROADMAP.md
round-2 correction).  Batch-minor tiles carry no lane padding (B is
large and 128-aligned at the bundled shapes) and only the benign
sublane pad H -> ceil(H/8)*8.  Gate-separated blocks (4, H, Bt) avoid
sublane-misaligned slicing of a (4H, Bt) block when H % 8 != 0.

The math is identical to solvers/closed_form.py (admm.py:353-436,456,
512-530); tests/test_kernels.py checks bit-level agreement with the
`lax.scan` XLA path in interpret mode and on device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _timestep_math(pre4, hp, cp, olds, lams, rhos):
    """One interior timestep's primal+dual closed forms, shared by the
    sequential and Jacobi kernels.  `pre4` is a 4-tuple of per-gate
    (H, Bt) pre-activation blocks; everything else is (H, Bt).  Math
    identical to solvers/closed_form.py (admm.py:353-436,456,512-530)."""
    rho_i, rho_f, rho_g, rho_o, rho_c, rho_h = rhos
    i_o, f_o, g_o, o_o, c_o, h_o = olds
    li, lf, lg, lo, lc, lh = lams

    act_i = jax.nn.sigmoid(pre4[0])
    act_f = jax.nn.sigmoid(pre4[1])
    act_g = jnp.tanh(pre4[2])
    act_o = jax.nn.sigmoid(pre4[3])

    # Gauss-Seidel closed forms (admm.py:353-386).
    i_n = -(li - rho_i * act_i + (rho_c * (f_o * cp - c_o) - lc) * g_o) / (
        rho_i + rho_c * g_o * g_o)
    f_n = -(lf - rho_f * act_f + (rho_c * (g_o * i_n - c_o) - lc) * cp) / (
        rho_f + rho_c * cp * cp)
    g_n = -(lg - rho_g * act_g + (rho_c * (f_n * cp - c_o) - lc) * i_n) / (
        rho_g + rho_c * i_n * i_n)
    tc_o = jnp.tanh(c_o)
    o_n = -(lo - rho_o * act_o + (rho_h * (0.0 - h_o) - lh) * tc_o) / (
        rho_o + rho_h * tc_o * tc_o)

    # c prox-linear with constant theta = 1/2 (admm.py:388-436).
    z = h_o + lh / rho_h
    grad_c = (tc_o * o_n - z) * o_n * (1.0 - tc_o * tc_o)
    a_term = lc / rho_c - f_n * cp - i_n * g_n
    c_n = (0.5 * c_o - grad_c - rho_c * a_term) / (rho_c + 0.5)

    # interior h closed form (admm.py:456).
    h_n = (rho_h * o_n * jnp.tanh(c_n) - lh) / rho_h

    # Dual ascent i,f,g,o,c (admm.py:512-530).
    duals_n = (li + rho_i * (i_n - act_i),
               lf + rho_f * (f_n - act_f),
               lg + rho_g * (g_n - act_g),
               lo + rho_o * (o_n - act_o),
               lc + rho_c * (c_n - (f_n * cp + i_n * g_n)))
    return (i_n, f_n, g_n, o_n, c_n, h_n), duals_n


def _sweep_kernel(rho_ref, xproj_ref, wh_t_ref,
                  i_ref, f_ref, g_ref, o_ref, c_ref, h_ref,
                  li_ref, lf_ref, lg_ref, lo_ref, lc_ref, lh_ref,
                  i_out, f_out, g_out, o_out, c_out, h_out,
                  li_out, lf_out, lg_out, lo_out, lc_out,
                  h_prev, c_prev, *, time_block: int):
    t = pl.program_id(1)

    # Reset the recurrence carries at the start of each batch tile
    # (initial state h_0 = c_0 = 0, blocks/lstm.py:69-72).
    @pl.when(t == 0)
    def _():
        h_prev[:] = jnp.zeros_like(h_prev)
        c_prev[:] = jnp.zeros_like(c_prev)

    rhos = tuple(rho_ref[0, k] for k in range(6))

    for j in range(time_block):
        hp = h_prev[:]
        cp = c_prev[:]

        # Recurrent projection per gate: (H, H) @ (H, Bt) on the MXU;
        # wh_t[g] = wh[g]^T so this is a plain row-major matmul.  The
        # input-side projections were hoisted outside the kernel.
        # Full-f32 passes to match the HIGHEST-precision XLA path — bf16
        # MXU drift compounds over T and over epochs in the ADMM fixed
        # point.
        pre4 = tuple(
            xproj_ref[j, g] + jnp.dot(wh_t_ref[g], hp,
                                      preferred_element_type=jnp.float32,
                                      precision=jax.lax.Precision.HIGHEST)
            for g in range(4))
        olds = (i_ref[j], f_ref[j], g_ref[j], o_ref[j], c_ref[j], h_ref[j])
        lams = (li_ref[j], lf_ref[j], lg_ref[j], lo_ref[j], lc_ref[j],
                lh_ref[j])
        prim, duals_n = _timestep_math(pre4, hp, cp, olds, lams, rhos)
        i_out[j], f_out[j], g_out[j], o_out[j], c_out[j], h_out[j] = prim
        li_out[j], lf_out[j], lg_out[j], lo_out[j], lc_out[j] = duals_n
        h_prev[:] = prim[5]
        c_prev[:] = prim[4]


def _jacobi_kernel(rho_ref, pre_ref,
                   i_ref, f_ref, g_ref, o_ref, c_ref, h_ref,
                   li_ref, lf_ref, lg_ref, lo_ref, lc_ref, lh_ref,
                   hp_ref, cp_ref,
                   i_out, f_out, g_out, o_out, c_out, h_out,
                   li_out, lf_out, lg_out, lo_out, lc_out,
                   *, time_block: int):
    """Jacobi (time-parallel) variant: previous-sweep (h, c) arrive as
    inputs, so there is no carry, no matmul (the recurrent projection is
    hoisted into one wide MXU matmul outside), and the grid cells are
    independent — one fused elementwise pass over every (t, b) block
    instead of XLA's ~30 materialized (T-1, H, B) intermediates."""
    rhos = tuple(rho_ref[0, k] for k in range(6))
    for j in range(time_block):
        pre4 = tuple(pre_ref[j, g] for g in range(4))
        olds = (i_ref[j], f_ref[j], g_ref[j], o_ref[j], c_ref[j], h_ref[j])
        lams = (li_ref[j], lf_ref[j], lg_ref[j], lo_ref[j], lc_ref[j],
                lh_ref[j])
        prim, duals_n = _timestep_math(pre4, hp_ref[j], cp_ref[j],
                                       olds, lams, rhos)
        i_out[j], f_out[j], g_out[j], o_out[j], c_out[j], h_out[j] = prim
        li_out[j], lf_out[j], lg_out[j], lo_out[j], lc_out[j] = duals_n


def _pick_batch_tile(batch: int, hidden: int = 10, time_block: int = 1,
                     vmem_budget: int = 8 * 1024 * 1024) -> int:
    """Lane tile for a given K.  Mosaic requires the lane block to be a
    multiple of 128 OR equal to the (padded) array dimension, so: small
    batches get one whole-array tile (rounded to 8), large ones the
    biggest VMEM-fitting 128-multiple divisor of the 128-padded batch."""
    h_pad = max(8, -(-hidden // 8) * 8)  # sublanes pad to 8
    # 12 input slabs + 11 output slabs + pre/xproj (4 gate blocks) +
    # carries, double-buffered across grid steps; blocks carry K time rows.
    bytes_per_lane = h_pad * 4 * (27 * time_block + 2) * 2
    limit = max(8, min(4096, vmem_budget // bytes_per_lane))
    if batch <= limit:
        return max(8, -(-batch // 8) * 8)   # single whole-array lane tile
    if limit < 128:
        return 0                            # infeasible at this K
    limit = limit // 128 * 128
    bpad128 = -(-batch // 128) * 128
    for cand in range(limit, 127, -128):
        if bpad128 % cand == 0:
            return cand
    return 128


def _pick_tiles(steps: int, hidden: int, batch: int) -> Tuple[int, int]:
    """Jointly choose (time_block K, lane tile): the largest K whose
    VMEM working set still admits a legal lane tile."""
    for k in (8, 4, 2, 1):
        if k > 1 and (steps < 2 * k or hidden > 128):
            continue
        tile = _pick_batch_tile(batch, hidden, k)
        if tile:
            return k, tile
    return 1, 128


@functools.partial(jax.jit, static_argnames=('interpret', 'time_block'))
def pallas_interior_sweep(xproj: jax.Array, wh: jax.Array,
                          gates: Tuple[jax.Array, ...],
                          duals: Tuple[jax.Array, ...],
                          rho_vec: jax.Array,
                          interpret: bool = False,
                          time_block: int = 0):
    """Run interior timesteps t = 1..T-1 of the fast-variant sweep.

    Args:
      xproj:  (T-1, 4, H, B) hoisted input projections for t = 1..T-1.
      wh:     (4, H, H) recurrent weights (gate-stacked, as stored).
      gates:  6 slabs (T-1, H, B): old i,f,g,o,c,h rows 1..T-1.
      duals:  6 slabs (T-1, H, B): lambda i,f,g,o,c,h rows 1..T-1.
      rho_vec: (6,) [rho_i, rho_f, rho_g, rho_o, rho_c, rho_h] float32.
      time_block: timesteps per grid cell (0 = auto heuristic).
    Returns:
      (new_gates (6 slabs incl. h), new_duals (5 slabs: i,f,g,o,c)),
      each (T-1, H, B).
    """
    steps, _, hidden, batch = xproj.shape
    if time_block:
        k = time_block
        tile = _pick_batch_tile(batch, hidden, k) or 128
    else:
        k, tile = _pick_tiles(steps, hidden, batch)
    pad = (-batch) % tile
    tpad = (-steps) % k
    if pad or tpad:
        # Batch pad divides the tile; time pad fills the trailing time
        # block.  Padded TIME rows run garbage through the carries, but
        # time is the fastest grid dim: the carries reset at the next
        # batch tile's t == 0, so garbage never reaches real outputs.
        pad_s = lambda a: jnp.pad(a, ((0, tpad), (0, 0), (0, pad)))
        xproj = jnp.pad(xproj, ((0, tpad), (0, 0), (0, 0), (0, pad)))
        gates = tuple(pad_s(a) for a in gates)
        duals = tuple(pad_s(a) for a in duals)
    bpad = batch + pad
    spad = steps + tpad
    n_tiles = bpad // tile

    slab_spec = pl.BlockSpec((k, hidden, tile), lambda b, t: (t, 0, b),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 8), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((k, 4, hidden, tile), lambda b, t: (t, 0, 0, b),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4, hidden, hidden), lambda b, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [slab_spec] * 12
    out_specs = [slab_spec] * 11

    out_shape = [jax.ShapeDtypeStruct((spad, hidden, bpad), xproj.dtype)
                 for _ in range(11)]

    rho_pad = jnp.zeros((1, 8), jnp.float32).at[0, :6].set(rho_vec)
    wh_t = jnp.transpose(wh, (0, 2, 1))  # wh_t[g] = wh[g]^T

    outs = pl.pallas_call(
        functools.partial(_sweep_kernel, time_block=k),
        grid=(n_tiles, spad // k),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((hidden, tile), jnp.float32),
                        pltpu.VMEM((hidden, tile), jnp.float32)],
        interpret=interpret,
    )(rho_pad, xproj, wh_t, *gates, *duals)

    if pad or tpad:
        outs = [o[:steps, :, :batch] for o in outs]
    new_gates = tuple(outs[:6])
    new_duals = tuple(outs[6:])
    return new_gates, new_duals


@functools.partial(jax.jit, static_argnames=('interpret', 'time_block'))
def pallas_jacobi_sweep(pre: jax.Array,
                        gates: Tuple[jax.Array, ...],
                        duals: Tuple[jax.Array, ...],
                        h_prev: jax.Array, c_prev: jax.Array,
                        rho_vec: jax.Array,
                        interpret: bool = False,
                        time_block: int = 0):
    """Jacobi mode: all interior timesteps updated in parallel from the
    previous sweep's (h, c).

    Args:
      pre:    (T-1, 4, H, B) full pre-activations (input + hoisted
              recurrent projection of the previous sweep's h).
      gates/duals: 6 slabs each, (T-1, H, B).
      h_prev, c_prev: (T-1, H, B) previous-sweep h[t-1], c[t-1].
    Returns the same (new_gates, new_duals) contract as
    pallas_interior_sweep.
    """
    steps, _, hidden, batch = pre.shape
    if time_block:
        k = time_block
        tile = _pick_batch_tile(batch, hidden, k) or 128
    else:
        k, tile = _pick_tiles(steps, hidden, batch)
    pad = (-batch) % tile
    tpad = (-steps) % k
    if pad or tpad:
        pad_s = lambda a: jnp.pad(a, ((0, tpad), (0, 0), (0, pad)))
        pre = jnp.pad(pre, ((0, tpad), (0, 0), (0, 0), (0, pad)))
        gates = tuple(pad_s(a) for a in gates)
        duals = tuple(pad_s(a) for a in duals)
        h_prev, c_prev = pad_s(h_prev), pad_s(c_prev)
    bpad, spad = batch + pad, steps + tpad
    n_tiles = bpad // tile

    slab_spec = pl.BlockSpec((k, hidden, tile), lambda b, t: (t, 0, b),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 8), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((k, 4, hidden, tile), lambda b, t: (t, 0, 0, b),
                     memory_space=pltpu.VMEM),
    ] + [slab_spec] * 14
    out_specs = [slab_spec] * 11
    out_shape = [jax.ShapeDtypeStruct((spad, hidden, bpad), pre.dtype)
                 for _ in range(11)]
    rho_pad = jnp.zeros((1, 8), jnp.float32).at[0, :6].set(rho_vec)

    outs = pl.pallas_call(
        functools.partial(_jacobi_kernel, time_block=k),
        grid=(n_tiles, spad // k),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(rho_pad, pre, *gates, *duals, h_prev, c_prev)

    if pad or tpad:
        outs = [o[:steps, :, :batch] for o in outs]
    return tuple(outs[:6]), tuple(outs[6:])
