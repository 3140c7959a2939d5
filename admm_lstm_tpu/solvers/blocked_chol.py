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


@functools.partial(jax.jit,
                   static_argnames=('block', 'use_pallas_diag', 'precision'))
def blocked_spd_solve(a: jax.Array, b: jax.Array,
                      block: int = 64,
                      use_pallas_diag: object = 'auto',
                      precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Solve K SPD systems a[k] x[k] = b[k]; a (K, D, D), b (K, D).

    Exact (up to f32 rounding at precision=HIGHEST, the default) blocked
    Cholesky; matches jax.scipy.linalg.cho_solve to reduction-order
    tolerance (tests/test_solvers.py::test_blocked_spd_solve_matches_cho).

    `precision` governs every panel/trailing/substitution einsum and must
    be threaded by callers that configure matmul precision (advisor
    round-4 finding: under DEFAULT precision the MXU runs bf16 passes,
    silently degrading the factorization — an ill-conditioned trailing
    block can even go indefinite and NaN in the diagonal rsqrt).  All
    einsums also pin preferred_element_type=f32 so accumulation stays f32
    regardless of the multiply precision.

    use_pallas_diag: 'auto' (the Pallas in-VMEM diagonal factor+inverse
    on TPU — XLA's batched cholesky/triangular_solve are what make the
    XLA diagonal path slow), True/False to force.  The panel and
    trailing matmuls are XLA either way.
    """
    if use_pallas_diag == 'auto':
        use_pallas_diag = jax.default_backend() == 'tpu'
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

    # Factor, COLUMN-STRIP storage: the trailing matrix lives as nb
    # contiguous (K, rows, c) strips instead of one (K, D_t, D_t) array.
    # Rationale (round-5 measurement, v5e): the shrinking 2-D strided
    # slices trail[:, c:, :c] / trail[:, c:, c:] of the monolithic
    # layout moved ~36 MB at ~9 GB/s-class strided-DMA rates and were
    # ~4.6 ms of the 12.1 ms factorization at D = 561 — with strips,
    # every slice is a leading-rows slice (contiguous per system) and
    # every einsum operand/result is a dense strip.  Python loops over
    # nb <= ~9 unroll at trace time; every op is batched over K systems.
    # (K, D, D) -> nb strips (K, D_pad, c): one padded reshape+unstack.
    strips = [a[:, :, j * c:(j + 1) * c] for j in range(nb)]
    l_blocks = [[None] * nb for _ in range(nb)]
    linv = [None] * nb
    eye = jnp.broadcast_to(jnp.eye(c, dtype=a.dtype), (k_sys, c, c))
    for j in range(nb):
        a_jj = strips[j][:, :c, :]
        if use_pallas_diag:
            from admm_lstm_tpu.kernels.cholesky import pallas_chol_inverse
            interpret = jax.default_backend() != 'tpu'
            linv_j = pallas_chol_inverse(a_jj, interpret=interpret)
        else:
            l_jj = jax.lax.linalg.cholesky(a_jj)
            linv_j = jax.lax.linalg.triangular_solve(
                l_jj, eye, left_side=True, lower=True)
        linv[j] = linv_j   # diagonal blocks participate only via Linv
        if j + 1 < nb:
            # Panel: L_ij = A_ij @ Linv_jj^T for all i > j at once
            # (contiguous rows of strip j below its diagonal block).
            a_panel = strips[j][:, c:, :]     # (K, (nb-1-j)*c, c)
            l_panel = jnp.einsum('krc,kdc->krd', a_panel, linv_j,
                                 precision=precision,
                                 preferred_element_type=jnp.float32)
            for i in range(j + 1, nb):
                l_blocks[i][j] = l_panel[:, (i - j - 1) * c:(i - j) * c]
            # Trailing update per remaining strip i:
            #   strip_i <- strip_i[rows c:] - L_panel @ L_i^T
            # where L_i is panel j's row block for strip i's columns —
            # all contiguous leading-rows slices.
            for i in range(j + 1, nb):
                strips[i] = (strips[i][:, c:, :]
                             - jnp.einsum('krc,ksc->krs', l_panel,
                                          l_blocks[i][j],
                                          precision=precision,
                                          preferred_element_type=jnp.float32))

    bb = [b[:, j * c:(j + 1) * c] for j in range(nb)]

    # Substitutions, LEVEL-BATCHED: the (K, c)-sized vector math makes
    # the solve op-count-bound, not FLOP-bound (90 tiny einsums at
    # nb = 9 measured as the solve's dominant cost on v5e) — so each
    # block-row's inner sum runs as ONE concatenated matmul, ~4 ops per
    # level instead of O(nb).

    # Forward: L y = b.
    y = []
    for j in range(nb):
        r = bb[j]
        if j:
            row = jnp.concatenate([l_blocks[j][k] for k in range(j)],
                                  axis=2)               # (K, c, j*c)
            ycat = jnp.concatenate(y, axis=1)           # (K, j*c)
            r = r - jnp.einsum('kab,kb->ka', row, ycat, precision=precision,
                               preferred_element_type=jnp.float32)
        y.append(jnp.einsum('kab,kb->ka', linv[j], r, precision=precision,
                    preferred_element_type=jnp.float32))

    # Backward: L^T x = y.  The column strip below diagonal j IS panel
    # j's l_panel (its row blocks are contiguous slices of it).
    x = [None] * nb
    for j in reversed(range(nb)):
        r = y[j]
        if j + 1 < nb:
            col = jnp.concatenate([l_blocks[k][j]
                                   for k in range(j + 1, nb)],
                                  axis=1)               # (K, (nb-1-j)c, c)
            xcat = jnp.concatenate([x[k] for k in range(j + 1, nb)],
                                   axis=1)
            r = r - jnp.einsum('kba,kb->ka', col, xcat, precision=precision,
                               preferred_element_type=jnp.float32)
        x[j] = jnp.einsum('kba,kb->ka', linv[j], r, precision=precision,
                  preferred_element_type=jnp.float32)

    out = jnp.concatenate(x, axis=1)
    return out[:, :dim] if dpad else out
