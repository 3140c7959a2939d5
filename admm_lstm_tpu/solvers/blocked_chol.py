"""Blocked batched SPD solve for wide normal-equation systems (D > 128).

XLA's batched Cholesky collapses at HAR scale: factoring the K = 4H
Gram systems at D = 561 measured ~0.3 TFLOP/s on v5e (48 ms for 1.5e10
FLOPs at H = 64 — benchmarks/bench_exact_anatomy.py), turning the
Cholesky into the exact weight stage's dominant cost even though its
FLOP count is ~50x below the Gram's.  The classic fix is the LAPACK
blocked right-looking factorization, expressed so that everything but
the 128-wide diagonal blocks is a batched MXU matmul:

  for each 128-wide panel j:
    L_jj      = chol(A_jj)                (batched 128-block Cholesky)
    Linv_jj   = L_jj^-1                   (batched triangular inverse)
    L_ij      = A_ij @ Linv_jj^T          (panel: MXU)
    A_trail  -= L_panel @ L_panel^T       (trailing update: MXU)

Both substitutions then apply Linv_jj blocks with matmuls — no
triangular solves against the full D ever happen.  The D^3/3 factor
FLOPs land almost entirely in the panel/trailing matmuls; the extra
inverse work is nb * 128^3-ish, negligible.

Used by solvers/normal_eq for dim > 128 (the Pallas in-VMEM kernel,
kernels/cholesky.py, covers dim <= 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=('block',))
def blocked_spd_solve(a: jax.Array, b: jax.Array,
                      block: int = 128) -> jax.Array:
    """Solve K SPD systems a[k] x[k] = b[k]; a (K, D, D), b (K, D).

    Exact (up to f32 rounding) blocked Cholesky; matches
    jax.scipy.linalg.cho_solve to reduction-order tolerance
    (tests/test_solvers.py::test_blocked_spd_solve_matches_cho).
    """
    k_sys, dim, _ = a.shape
    nb = -(-dim // block)
    dpad = nb * block - dim
    if dpad:
        # Identity-pad the diagonal so the padded systems stay SPD and
        # the padded solution coordinates are exactly zero.
        a = jnp.pad(a, ((0, 0), (0, dpad), (0, dpad)))
        eye_pad = jnp.eye(dpad, dtype=a.dtype)
        a = a.at[:, dim:, dim:].add(eye_pad)
        b = jnp.pad(b, ((0, 0), (0, dpad)))
    c = block

    def blk(m, i, j):
        return jax.lax.dynamic_slice(
            m, (0, i * c, j * c), (k_sys, c, c))

    # Factor: lists of per-panel blocks (python loops over nb <= ~6
    # unroll at trace time; every op is batched over the K systems).
    l_blocks = [[None] * nb for _ in range(nb)]
    linv = [None] * nb
    eye = jnp.broadcast_to(jnp.eye(c, dtype=a.dtype), (k_sys, c, c))
    trail = a
    for j in range(nb):
        a_jj = blk(trail, j, j)
        l_jj = jax.lax.linalg.cholesky(a_jj)
        linv_j = jax.lax.linalg.triangular_solve(
            l_jj, eye, left_side=True, lower=True)
        linv[j] = linv_j   # diagonal blocks participate only via Linv
        if j + 1 < nb:
            # Panel: L_ij = A_ij @ Linv_jj^T for all i > j at once.
            a_panel = jax.lax.dynamic_slice(
                trail, (0, (j + 1) * c, j * c),
                (k_sys, (nb - 1 - j) * c, c))
            l_panel = jnp.einsum('krc,kdc->krd', a_panel, linv_j)
            for i in range(j + 1, nb):
                l_blocks[i][j] = l_panel[:, (i - j - 1) * c:(i - j) * c]
            # Trailing update: A[j+1:, j+1:] -= L_panel @ L_panel^T.
            update = jnp.einsum('krc,ksc->krs', l_panel, l_panel)
            r0 = (j + 1) * c
            trail_block = jax.lax.dynamic_slice(
                trail, (0, r0, r0),
                (k_sys, (nb - 1 - j) * c, (nb - 1 - j) * c))
            trail = jax.lax.dynamic_update_slice(
                trail, trail_block - update, (0, r0, r0))

    bb = [b[:, j * c:(j + 1) * c] for j in range(nb)]

    # Forward: L y = b.
    y = [None] * nb
    for j in range(nb):
        r = bb[j]
        for k in range(j):
            r = r - jnp.einsum('kab,kb->ka', l_blocks[j][k], y[k])
        y[j] = jnp.einsum('kab,kb->ka', linv[j], r)

    # Backward: L^T x = y.
    x = [None] * nb
    for j in reversed(range(nb)):
        r = y[j]
        for k in range(j + 1, nb):
            r = r - jnp.einsum('kba,kb->ka', l_blocks[k][j], x[k])
        x[j] = jnp.einsum('kba,kb->ka', linv[j], r)

    out = jnp.concatenate(x, axis=1)
    return out[:, :dim] if dpad else out
