"""Pallas TPU kernel: the fused interior timestep sweep of the fast ADMM
variant (primal i,f,g,o,c,h + dual i,f,g,o,c updates for t = 1..T-1).

One `pallas_call` executes the whole recurrence.  The grid is
(batch_tiles, ceil((T-1)/K)) with time as the LAST (fastest, sequential)
dimension: TPU grid cells run in order, so the (h, c) recurrence carries
live in VMEM scratch that persists across the time steps of a batch tile
and resets at t == 0 (the standard sequential-scan-as-grid pattern).
Each grid cell processes a block of K consecutive timesteps (K unrolled
in-kernel iterations) — amortizing the fixed per-grid-step cost that
dominates at small H / long T.  Every per-timestep block — the 4-gate
input projection, the six old gate rows, five dual rows — streams through
VMEM in (K, Bt, H) blocks that Pallas double-buffers automatically, and
the ~40 elementwise ops plus the recurrent (Bt,H)x(H,4H) MXU matmul all
fuse into a single kernel with zero HBM round-trips between operations
of a timestep.

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


def _timestep_math(pre, hp, cp, olds, lams, rhos):
    """One interior timestep's primal+dual closed forms, shared by the
    sequential and Jacobi kernels.  Math identical to
    solvers/closed_form.py (admm.py:353-436,456,512-530)."""
    rho_i, rho_f, rho_g, rho_o, rho_c, rho_h = rhos
    i_o, f_o, g_o, o_o, c_o, h_o = olds
    li, lf, lg, lo, lc, lh = lams
    hidden = hp.shape[-1]

    act_i = jax.nn.sigmoid(pre[:, 0 * hidden:1 * hidden])
    act_f = jax.nn.sigmoid(pre[:, 1 * hidden:2 * hidden])
    act_g = jnp.tanh(pre[:, 2 * hidden:3 * hidden])
    act_o = jax.nn.sigmoid(pre[:, 3 * hidden:4 * hidden])

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


def _sweep_kernel(rho_ref, xproj_ref, wh_ref,
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

        # Recurrent projection: (Bt, H) @ (H, 4H) on the MXU; input-side
        # projections were hoisted outside the kernel (one wide matmul).
        # Full-f32 passes to match the HIGHEST-precision XLA path — bf16
        # MXU drift compounds over T and over epochs in the ADMM fixed
        # point.
        pre = xproj_ref[j] + jnp.dot(hp, wh_ref[:],
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.HIGHEST)
        olds = (i_ref[j], f_ref[j], g_ref[j], o_ref[j], c_ref[j], h_ref[j])
        lams = (li_ref[j], lf_ref[j], lg_ref[j], lo_ref[j], lc_ref[j],
                lh_ref[j])
        prim, duals_n = _timestep_math(pre, hp, cp, olds, lams, rhos)
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
    instead of XLA's ~30 materialized (T-1,B,H) intermediates."""
    rhos = tuple(rho_ref[0, k] for k in range(6))
    for j in range(time_block):
        olds = (i_ref[j], f_ref[j], g_ref[j], o_ref[j], c_ref[j], h_ref[j])
        lams = (li_ref[j], lf_ref[j], lg_ref[j], lo_ref[j], lc_ref[j],
                lh_ref[j])
        prim, duals_n = _timestep_math(pre_ref[j], hp_ref[j], cp_ref[j],
                                       olds, lams, rhos)
        i_out[j], f_out[j], g_out[j], o_out[j], c_out[j], h_out[j] = prim
        li_out[j], lf_out[j], lg_out[j], lo_out[j], lc_out[j] = duals_n


def _pick_batch_tile(batch: int, hidden: int = 128, time_block: int = 1,
                     vmem_budget: int = 8 * 1024 * 1024) -> int:
    """Largest multiple-of-8 batch tile whose double-buffered working set
    (~30 slab blocks of (K, tile, H_eff) + the 4H-wide projection) fits the
    VMEM budget; batch is padded up to a tile multiple."""
    h_eff = max(128, -(-hidden // 128) * 128)  # lanes pad to 128
    # 12 input slabs + 11 output slabs + xproj (4 slabs wide) + carries,
    # double-buffered across grid steps; slab blocks carry K time rows.
    bytes_per_row = h_eff * 4 * 30 * 2 * time_block
    limit = max(8, min(512, vmem_budget // bytes_per_row // 8 * 8))
    if batch <= limit:
        return max(8, -(-batch // 8) * 8)
    for cand in range(limit, 7, -8):
        if batch % cand == 0:
            return cand
    return limit  # fall back to padding


def _pick_time_block(steps: int, hidden: int) -> int:
    """Heuristic K: amortize per-grid-step overhead where it dominates
    (small H, long T); larger H gets smaller K (VMEM blocks scale with
    K*H).  Measured on TPU v5e: K=8 best through H=128, K=4 at H=256."""
    if steps < 8 or hidden > 128:
        return 1
    for k in (8, 4, 2):
        if steps >= 2 * k:
            return k
    return 1


@functools.partial(jax.jit, static_argnames=('interpret', 'time_block'))
def pallas_interior_sweep(xproj: jax.Array, wh_flat: jax.Array,
                          gates: Tuple[jax.Array, ...],
                          duals: Tuple[jax.Array, ...],
                          rho_vec: jax.Array,
                          interpret: bool = False,
                          time_block: int = 0):
    """Run interior timesteps t = 1..T-1 of the fast-variant sweep.

    Args:
      xproj:  (T-1, B, 4H) hoisted input projections for t = 1..T-1.
      wh_flat: (H, 4H) recurrent weights, gate-concatenated (i|f|g|o).
      gates:  6 slabs (T-1, B, H): old i,f,g,o,c,h rows 1..T-1.
      duals:  6 slabs (T-1, B, H): lambda i,f,g,o,c,h rows 1..T-1.
      rho_vec: (6,) [rho_i, rho_f, rho_g, rho_o, rho_c, rho_h] float32.
      time_block: timesteps per grid cell (0 = auto heuristic).
    Returns:
      (new_gates (6 slabs incl. h), new_duals (5 slabs: i,f,g,o,c)),
      each (T-1, B, H).
    """
    steps, batch, hidden4 = xproj.shape
    hidden = hidden4 // 4
    k = time_block or _pick_time_block(steps, hidden)
    tile = _pick_batch_tile(batch, hidden, k)
    pad = (-batch) % tile
    tpad = (-steps) % k
    if pad or tpad:
        # Batch pad divides the tile; time pad fills the trailing time
        # block.  Padded TIME rows run garbage through the carries, but
        # time is the fastest grid dim: the carries reset at the next
        # batch tile's t == 0, so garbage never reaches real outputs.
        pad_b = lambda a: jnp.pad(a, ((0, tpad), (0, pad), (0, 0)))
        xproj = pad_b(xproj)
        gates = tuple(pad_b(a) for a in gates)
        duals = tuple(pad_b(a) for a in duals)
    bpad = batch + pad
    spad = steps + tpad
    n_tiles = bpad // tile

    slab_spec = pl.BlockSpec((k, tile, hidden), lambda b, t: (t, b, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 8), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((k, tile, hidden4), lambda b, t: (t, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden, hidden4), lambda b, t: (0, 0),
                     memory_space=pltpu.VMEM),
    ] + [slab_spec] * 12
    out_specs = [slab_spec] * 11

    out_shape = [jax.ShapeDtypeStruct((spad, bpad, hidden), xproj.dtype)
                 for _ in range(11)]

    rho_pad = jnp.zeros((1, 8), jnp.float32).at[0, :6].set(rho_vec)

    outs = pl.pallas_call(
        functools.partial(_sweep_kernel, time_block=k),
        grid=(n_tiles, spad // k),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((tile, hidden), jnp.float32),
                        pltpu.VMEM((tile, hidden), jnp.float32)],
        interpret=interpret,
    )(rho_pad, xproj, wh_flat, *gates, *duals)

    if pad or tpad:
        outs = [o[:steps, :batch] for o in outs]
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
      pre:    (T-1, B, 4H) full pre-activations (input + hoisted recurrent
              projection of the previous sweep's h).
      gates/duals: 6 slabs each, (T-1, B, H).
      h_prev, c_prev: (T-1, B, H) previous-sweep h[t-1], c[t-1].
    Returns the same (new_gates, new_duals) contract as
    pallas_interior_sweep.
    """
    steps, batch, hidden4 = pre.shape
    hidden = hidden4 // 4
    k = time_block or _pick_time_block(steps, hidden)
    tile = _pick_batch_tile(batch, hidden, k)
    pad = (-batch) % tile
    tpad = (-steps) % k
    if pad or tpad:
        pad_b = lambda a: jnp.pad(a, ((0, tpad), (0, pad), (0, 0)))
        pre = pad_b(pre)
        gates = tuple(pad_b(a) for a in gates)
        duals = tuple(pad_b(a) for a in duals)
        h_prev, c_prev = pad_b(h_prev), pad_b(c_prev)
    bpad, spad = batch + pad, steps + tpad
    n_tiles = bpad // tile

    slab_spec = pl.BlockSpec((k, tile, hidden), lambda b, t: (t, b, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 8), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((k, tile, hidden4), lambda b, t: (t, b, 0),
                     memory_space=pltpu.VMEM),
    ] + [slab_spec] * 14
    out_specs = [slab_spec] * 11
    out_shape = [jax.ShapeDtypeStruct((spad, bpad, hidden), pre.dtype)
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
        outs = [o[:steps, :batch] for o in outs]
    return tuple(outs[:6]), tuple(outs[6:])
