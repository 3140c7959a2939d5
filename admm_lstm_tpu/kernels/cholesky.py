"""Pallas TPU kernel: batched small Cholesky ridge solves.

Solves G SPD systems A x = b per kernel instance, entirely in VMEM — the
"per-block normal-equation solves (small Cholesky/ridge factorizations)
fused into Pallas kernels" tier of the build plan.  Used by the exact
weight solver (solvers/normal_eq.py) whose per-output-column Gram systems
are (D x D) with D = input or hidden width (D <= 128 handled here; larger
D falls back to XLA's blocked Cholesky).

TPU-shaped algorithm (vectorized over the G systems of a block):
  * right-looking unblocked Cholesky: the pivot column of the symmetric
    trailing matrix is read as ROW j (a sublane-dynamic `pl.ds` ref load —
    minor-axis dynamic indexing is avoided everywhere); diagonal elements
    are extracted by mask+reduce; a full rank-1 VPU update advances the
    trailing block.  R[j, :] := column j of L (i.e. R = L^T), so both
    substitutions below also touch only rows.
  * forward solve (L y = b), right-looking: subtract y_j * R[j, :] from
    the residual; y accumulates via one-hot masks (no lane scatter).
  * backward solve (L^T x = y), left-looking: x_j needs
    sum_k L[k, j] x_k = dot(R[j, :], x) — a row read again.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_solve_kernel(a_ref, b_ref, x_ref, s_ref, r_ref, *,
                       dim: int, group: int):
    col_ids = lax.broadcasted_iota(jnp.int32, (group, dim), 1)
    s_ref[:] = a_ref[0]

    def lane(vals, j):
        """Extract lane j of (G, D) as (G, 1) via mask+reduce."""
        return jnp.sum(jnp.where(col_ids == j, vals, 0.0), axis=-1,
                       keepdims=True)

    # --- factorization: R = L^T, row by row ---
    def chol_step(j, _):
        row = s_ref[:, pl.ds(j, 1), :][:, 0, :]          # (G, D)
        diag = lane(row, j)
        lcol = jnp.where(col_ids >= j, row * lax.rsqrt(diag), 0.0)
        r_ref[:, pl.ds(j, 1), :] = lcol[:, None, :]
        s_ref[:] = s_ref[:] - lcol[:, :, None] * lcol[:, None, :]
        return 0

    lax.fori_loop(0, dim, chol_step, 0)

    # --- forward solve L y = b (right-looking) ---
    def fwd_step(j, carry):
        resid, y = carry
        row = r_ref[:, pl.ds(j, 1), :][:, 0, :]
        diag = lane(row, j)
        yj = lane(resid, j) / diag
        y = y + jnp.where(col_ids == j, yj, 0.0)
        resid = resid - yj * row
        return resid, y

    b0 = b_ref[0]
    _, y = lax.fori_loop(0, dim, fwd_step, (b0, jnp.zeros_like(b0)))

    # --- backward solve L^T x = y (left-looking) ---
    def bwd_step(i, x):
        j = dim - 1 - i
        row = r_ref[:, pl.ds(j, 1), :][:, 0, :]
        diag = lane(row, j)
        yj = lane(y, j)
        acc = jnp.sum(row * x, axis=-1, keepdims=True)  # only k > j nonzero
        xj = (yj - acc) / diag
        return x + jnp.where(col_ids == j, xj, 0.0)

    x_ref[0] = lax.fori_loop(0, dim, bwd_step, jnp.zeros_like(b0))


def _chol_solve_kernel_gminor(a_ref, b_ref, x_ref, s_ref, r_ref, v_ref, *,
                              dim: int, group: int):
    """G-minor SPD solve: blocks (dim, dim, G) / vectors (dim, G) with
    the G systems in the lane axis (same layout rationale as
    _chol_inverse_kernel_gminor below: direct pivot slices, full-lane
    rank-1 updates).  v_ref holds the forward residual, then y, then x
    — three dim-step loops sharing one (dim, G) scratch."""
    row_ids = lax.broadcasted_iota(jnp.int32, (dim, group), 0)
    s_ref[:] = a_ref[0]

    def chol_step(j, _):
        col = s_ref[:, pl.ds(j, 1), :][:, 0, :]
        diag = s_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0, :]
        lcol = jnp.where(row_ids >= j, col * lax.rsqrt(diag)[None, :], 0.0)
        r_ref[:, pl.ds(j, 1), :] = lcol[:, None, :]
        s_ref[:] = s_ref[:] - lcol[:, None, :] * lcol[None, :, :]
        return 0

    lax.fori_loop(0, dim, chol_step, 0)

    # Forward: L y = b (right-looking on the residual in v_ref); y rows
    # land in x_ref (reused as y storage until the backward pass).
    v_ref[:] = b_ref[0]

    def fwd_step(j, _):
        lcol = r_ref[:, pl.ds(j, 1), :][:, 0, :]
        diag = r_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0, :]
        yj = v_ref[pl.ds(j, 1), :][0] / diag
        x_ref[0, pl.ds(j, 1), :] = yj[None]
        v_ref[:] = v_ref[:] - lcol * yj[None, :]
        return 0

    lax.fori_loop(0, dim, fwd_step, 0)

    # Backward: L^T x = y, built bottom-up in v_ref (zeros mean rows
    # > j-under-construction contribute nothing to the column dot).
    v_ref[:] = jnp.zeros_like(v_ref)

    def bwd_step(i, _):
        j = dim - 1 - i
        lcol = r_ref[:, pl.ds(j, 1), :][:, 0, :]         # L[:, j]
        diag = r_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0, :]
        yj = x_ref[0, pl.ds(j, 1), :][0]
        acc = jnp.sum(lcol * v_ref[:], axis=0)           # sum_k>j L[k,j] x_k
        v_ref[pl.ds(j, 1), :] = ((yj - acc) / diag)[None]
        return 0

    lax.fori_loop(0, dim, bwd_step, 0)
    x_ref[0] = v_ref[:]


@functools.partial(jax.jit, static_argnames=('interpret', 'group'))
def _chol_solve_gminor(a: jax.Array, b: jax.Array,
                       interpret: bool = False,
                       group: int = 128) -> jax.Array:
    n, dim, _ = a.shape
    pad = (-n) % group
    if pad:
        eye = jnp.broadcast_to(jnp.eye(dim, dtype=a.dtype), (pad, dim, dim))
        a = jnp.concatenate([a, eye], axis=0)
        b = jnp.concatenate([b, jnp.zeros((pad, dim), b.dtype)], axis=0)
    n_pad = n + pad
    at = jnp.transpose(a.reshape(n_pad // group, group, dim, dim),
                       (0, 2, 3, 1))
    bt = jnp.transpose(b.reshape(n_pad // group, group, dim), (0, 2, 1))
    kernel = functools.partial(_chol_solve_kernel_gminor, dim=dim,
                               group=group)
    x = pl.pallas_call(
        kernel,
        grid=(n_pad // group,),
        in_specs=[pl.BlockSpec((1, dim, dim, group), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, dim, group), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, dim, group), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad // group, dim, group),
                                       a.dtype),
        scratch_shapes=[pltpu.VMEM((dim, dim, group), jnp.float32),
                        pltpu.VMEM((dim, dim, group), jnp.float32),
                        pltpu.VMEM((dim, group), jnp.float32)],
        interpret=interpret,
    )(at, bt)
    return jnp.transpose(x, (0, 2, 1)).reshape(n_pad, dim)[:n]


@functools.partial(jax.jit, static_argnames=('interpret',))
def pallas_chol_solve(a: jax.Array, b: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """Batched SPD solve: a (N, D, D), b (N, D) -> x (N, D), D <= 128.

    Dispatch (round-5 measurements, v5e):
      * D <= 64 — the G-minor kernel (systems in the lane axis, see
        _chol_inverse_kernel_gminor's layout notes): 0.23 ms at
        (256, 64, 64), err vs cho_solve 3e-8.
      * 64 < D <= 128 — the blocked column-strip factorization
        (solvers/blocked_chol) whose 64-wide diagonals use the G-minor
        inverse: 0.73 ms at (512, 128, 128) vs 8.0 ms for the
        monolithic systems-major kernel below (whose (G, D, D) layout
        cannot fit the lane-major scratch in the 16 MB scoped VMEM at
        D = 128), err 2e-8.  The systems-major kernel is kept only as
        the interpret-mode/CPU fallback for this range."""
    n, dim, _ = a.shape
    if dim > 128:
        raise ValueError(f'pallas_chol_solve handles D <= 128, got {dim}; '
                         f'use the XLA fallback for larger blocks')
    if dim <= 64:
        return _chol_solve_gminor(a, b, interpret=interpret)
    if not interpret:
        from admm_lstm_tpu.solvers.blocked_chol import blocked_spd_solve
        return blocked_spd_solve(a, b, block=64)
    group = 8
    pad = (-n) % group
    if pad:
        eye = jnp.broadcast_to(jnp.eye(dim, dtype=a.dtype), (pad, dim, dim))
        a = jnp.concatenate([a, eye], axis=0)
        b = jnp.concatenate([b, jnp.zeros((pad, dim), b.dtype)], axis=0)
    n_pad = n + pad

    kernel = functools.partial(_chol_solve_kernel, dim=dim, group=group)
    x = pl.pallas_call(
        kernel,
        grid=(n_pad // group,),
        in_specs=[
            pl.BlockSpec((1, group, dim, dim), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, group, dim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad // group, group, dim), a.dtype),
        scratch_shapes=[pltpu.VMEM((group, dim, dim), jnp.float32),
                        pltpu.VMEM((group, dim, dim), jnp.float32)],
        interpret=interpret,
    )(a.reshape(n_pad // group, group, dim, dim),
      b.reshape(n_pad // group, group, dim))
    return x.reshape(n_pad, dim)[:n]


def _chol_inverse_kernel(a_ref, linv_out, s_ref, r_ref, *,
                         dim: int, group: int):
    """Per grid cell: G systems' lower-triangular inverse Linv = L^-1
    where A = L L^T — factorization identical to _chol_solve_kernel,
    then a right-looking forward solve L X = I with the (G, dim, dim)
    residual block living in s_ref (reused after factorization)."""
    col_ids = lax.broadcasted_iota(jnp.int32, (group, dim), 1)
    s_ref[:] = a_ref[0]

    def lane(vals, j):
        return jnp.sum(jnp.where(col_ids == j, vals, 0.0), axis=-1,
                       keepdims=True)

    def chol_step(j, _):
        row = s_ref[:, pl.ds(j, 1), :][:, 0, :]
        diag = lane(row, j)
        lcol = jnp.where(col_ids >= j, row * lax.rsqrt(diag), 0.0)
        r_ref[:, pl.ds(j, 1), :] = lcol[:, None, :]
        s_ref[:] = s_ref[:] - lcol[:, :, None] * lcol[:, None, :]
        return 0

    lax.fori_loop(0, dim, chol_step, 0)

    # Residual block <- I; consumed row-by-row (rows < j hold garbage
    # after step j, but only rows > j are ever read again).
    rows3 = lax.broadcasted_iota(jnp.int32, (group, dim, dim), 1)
    cols3 = lax.broadcasted_iota(jnp.int32, (group, dim, dim), 2)
    s_ref[:] = (rows3 == cols3).astype(jnp.float32)

    def fwd_step(j, _):
        row = r_ref[:, pl.ds(j, 1), :][:, 0, :]          # L[:, j] as row
        diag = lane(row, j)                              # L[j, j]
        xj = s_ref[:, pl.ds(j, 1), :][:, 0, :] / diag    # (G, dim) rhs row
        linv_out[0, :, pl.ds(j, 1), :] = xj[:, None, :]
        s_ref[:] = s_ref[:] - row[:, :, None] * xj[:, None, :]
        return 0

    lax.fori_loop(0, dim, fwd_step, 0)


def _chol_inverse_kernel_gminor(a_ref, out_ref, s_ref, r_ref, *,
                                dim: int, group: int):
    """G-MINOR layout variant: blocks are (dim, dim, G) with the G
    systems in the 128-wide lane axis.

    The original kernel's (G, dim, dim) layout puts dim in the lanes —
    at the blocked solve's 64-wide diagonal that wastes half the lanes
    and pays a mask+lane-reduce per serial step to extract the pivot.
    With the systems in the lanes the pivot diagonal is a direct
    (1, 1, G) slice, the rank-1 update runs on full 128-lane rows, and
    the masks live on the sublane/outer axes.  Measured on v5e at
    N=256, c=64: 0.58 ms vs 1.83 ms (old kernel, best group) vs 2.9 ms
    (XLA chol+triangular_solve) — this diagonal factor+inverse was ~70%
    of the whole D=561 blocked normal-equation solve in round 4.
    """
    row_ids = lax.broadcasted_iota(jnp.int32, (dim, group), 0)
    s_ref[:] = a_ref[0]

    def chol_step(j, _):
        col = s_ref[:, pl.ds(j, 1), :][:, 0, :]              # (dim, G)
        diag = s_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0, :]   # (G,)
        lcol = jnp.where(row_ids >= j, col * lax.rsqrt(diag)[None, :], 0.0)
        r_ref[:, pl.ds(j, 1), :] = lcol[:, None, :]
        s_ref[:] = s_ref[:] - lcol[:, None, :] * lcol[None, :, :]
        return 0

    lax.fori_loop(0, dim, chol_step, 0)

    rows3 = lax.broadcasted_iota(jnp.int32, (dim, dim, group), 0)
    cols3 = lax.broadcasted_iota(jnp.int32, (dim, dim, group), 1)
    s_ref[:] = (rows3 == cols3).astype(jnp.float32)

    def fwd_step(j, _):
        lcol = r_ref[:, pl.ds(j, 1), :][:, 0, :]             # col j of L
        diag = r_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0, :]
        rowj = s_ref[pl.ds(j, 1), :, :][0]                   # resid row j
        xj = rowj / diag[None, :]
        out_ref[0, pl.ds(j, 1), :, :] = xj[None, :, :]
        s_ref[:] = s_ref[:] - lcol[:, None, :] * xj[None, :, :]
        return 0

    lax.fori_loop(0, dim, fwd_step, 0)


@functools.partial(jax.jit, static_argnames=('interpret', 'group'))
def _chol_inverse_gminor(a: jax.Array, interpret: bool = False,
                         group: int = 128) -> jax.Array:
    """G-minor dispatch of pallas_chol_inverse for c <= 64 (at c = 128
    the four (c, c, 128) VMEM buffers exceed the 16 MB scoped limit)."""
    n, dim, _ = a.shape
    pad = (-n) % group
    if pad:
        eye = jnp.broadcast_to(jnp.eye(dim, dtype=a.dtype), (pad, dim, dim))
        a = jnp.concatenate([a, eye], axis=0)
    n_pad = n + pad
    at = jnp.transpose(a.reshape(n_pad // group, group, dim, dim),
                       (0, 2, 3, 1))
    kernel = functools.partial(_chol_inverse_kernel_gminor, dim=dim,
                               group=group)
    linv = pl.pallas_call(
        kernel,
        grid=(n_pad // group,),
        in_specs=[pl.BlockSpec((1, dim, dim, group), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, dim, dim, group), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad // group, dim, dim, group),
                                       a.dtype),
        scratch_shapes=[pltpu.VMEM((dim, dim, group), jnp.float32),
                        pltpu.VMEM((dim, dim, group), jnp.float32)],
        interpret=interpret,
    )(at)
    out = jnp.transpose(linv, (0, 3, 1, 2)).reshape(n_pad, dim, dim)
    return out[:n]


@functools.partial(jax.jit, static_argnames=('interpret', 'group'))
def pallas_chol_inverse(a: jax.Array, interpret: bool = False,
                        group: int = 128) -> jax.Array:
    """Batched triangular inverse of SPD blocks: a (N, c, c) ->
    Linv (N, c, c) with A = L L^T, c <= 128.

    Exists because XLA's batched Cholesky + triangular_solve run at
    ~0.5 TFLOP/s-class rates on v5e at these shapes and dominate the
    blocked D > 128 normal-equation solve (solvers/blocked_chol.py);
    the in-VMEM factor+forward-substitution keeps every intermediate
    on-core (same algorithm family as _chol_solve_kernel above).

    Dispatch (round-5 measurement at N=256, c=64, the blocked solve's
    diagonal shape): c <= 64 uses the G-MINOR kernel above (0.58 ms);
    larger c falls back to the systems-major kernel, where `group`
    (systems per grid cell) only trades grid cells for serial loop work
    — measured 2.32 ms at group 8 down to just 1.83 ms at 128, because
    the 2*dim serial rank-1 steps dominate regardless.  VMEM per
    G-minor cell is 4 buffers * c^2 * 128 lanes * 4 B (c = 64: 8 MB);
    c = 128 would need 32 MB against the 16 MB scoped limit, hence the
    dispatch boundary.
    """
    n, dim, _ = a.shape
    if dim > 128:
        raise ValueError(f'pallas_chol_inverse handles c <= 128, got {dim}')
    if dim <= 64:
        return _chol_inverse_gminor(a, interpret=interpret, group=group)
    # Systems-major branch: honor `group` up to the scoped-VMEM cap
    # (4 buffers of group*dim^2 f32 must stay within ~14 MB).
    vmem_cap = max(8, (14 * 1024 * 1024 // (16 * dim * dim)) // 8 * 8)
    group = max(1, min(group, vmem_cap, max(8, n)))
    pad = (-n) % group
    if pad:
        eye = jnp.broadcast_to(jnp.eye(dim, dtype=a.dtype), (pad, dim, dim))
        a = jnp.concatenate([a, eye], axis=0)
    n_pad = n + pad

    kernel = functools.partial(_chol_inverse_kernel, dim=dim, group=group)
    linv = pl.pallas_call(
        kernel,
        grid=(n_pad // group,),
        in_specs=[pl.BlockSpec((1, group, dim, dim), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, group, dim, dim), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad // group, group, dim, dim),
                                       a.dtype),
        scratch_shapes=[pltpu.VMEM((group, dim, dim), jnp.float32),
                        pltpu.VMEM((group, dim, dim), jnp.float32)],
        interpret=interpret,
    )(a.reshape(n_pad // group, group, dim, dim))
    return linv.reshape(n_pad, dim, dim)[:n]
