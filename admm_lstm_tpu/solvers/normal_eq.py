"""Exact ridge / Gauss-Newton weight solves (performance & quality mode).

The reference's weight update takes a single linearized prox step per epoch
(admm.py:340-343).  On TPU we can afford the *exact* solution of the
linearized subproblem: per output column h, a (D x D) ridge-regularized
normal-equation solve via Cholesky, batched over (gate, column) with vmap —
small dense solves are exactly what the MXU + XLA batching do well.

This is an opt-in mode (`ADMMConfig.exact_weight_solve`); parity mode keeps
the reference-faithful prox-linear step in prox_linear.py.

Memory at scale (round-4 fix): the naive three-operand Gram einsum
`'tkb,tdb,teb->kde'` makes XLA materialize a (4H, D, T, B) intermediate —
77 GB at HAR scale (H = 256, D = 561, B = 7352), which is what OOM'd the
relay worker in round 3.  `_gram_bvec` below replaces it with the
ONE-WIDE-CONTRACTION layout: flatten (T, B) -> N rows, scale the design
matrix by each column's linearization slope, and run the Gram as a
column-chunked stack of (D, N) x (N, D) matmuls — real MXU shapes, and
the live intermediate is bounded at `chunk` columns x D x N floats
regardless of H and D.  The final Gram stack (4H, D, D) itself is
~1.3 GB f32 at H = 256 / D = 561, which fits HBM comfortably once the
intermediates are streamed.  For truly enormous 4H * D^2, shard the
columns over a 'model' mesh axis (parallel/sharding.state_shardings).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Keep XLA's fused three-operand einsum when its (4H, D, T*B)-sized
# intermediate stays below this many elements (it wins at the bundled
# small shapes where everything fits in cache-like footprints); switch to
# the chunked wide contraction above it.
_EINSUM_MAX_ELEMS = 1 << 25          # 33.5M f32 = 134 MB
_CHUNK_BUDGET_ELEMS = 1 << 26        # 67M f32 = 268 MB live per chunk


def _gram_bvec(s2: jax.Array, wres: jax.Array, m_inputs: jax.Array,
               precision):
    """Gram stack (K, D, D) and first-order term (K, D) from batch-minor
    slabs s2/wres (T, K, B) and design slab m_inputs (T, D, B).

      gram[k] = sum_{t,b} s2[t,k,b] * m[t,:,b] m[t,:,b]^T
      bvec[k] = sum_{t,b} wres[t,k,b] * m[t,:,b]

    Small shapes keep the fused einsum; large shapes flatten (T, B) -> N
    and stream the Gram as K/chunk batched (D, N) x (N, D) MXU matmuls
    with a bounded live intermediate (see module docstring).
    """
    steps, n_cols, batch = s2.shape
    dim = m_inputs.shape[1]
    n_rows = steps * batch
    strategy = _gram_strategy(n_cols, dim, n_rows)
    if strategy == 'einsum':
        gram = jnp.einsum('tkb,tdb,teb->kde', s2, m_inputs, m_inputs,
                          precision=precision)
        bvec = jnp.einsum('tkb,tdb->kd', wres, m_inputs,
                          precision=precision)
        return gram, bvec

    # (D, N) / (K, N) row-flattened views; one transpose each per stage.
    m2 = jnp.transpose(m_inputs, (1, 0, 2)).reshape(dim, n_rows)
    s2f = jnp.transpose(s2, (1, 0, 2)).reshape(n_cols, n_rows)
    wresf = jnp.transpose(wres, (1, 0, 2)).reshape(n_cols, n_rows)

    bvec = jnp.einsum('kn,dn->kd', wresf, m2, precision=precision)

    chunk = max(1, min(n_cols, _CHUNK_BUDGET_ELEMS // (dim * n_rows)))
    while n_cols % chunk:
        chunk -= 1

    # Under DEFAULT matmul precision (the turbo preset) the MXU runs
    # bf16 passes anyway, so materializing the matmul operands in bf16
    # loses nothing numerically the matmul wasn't already losing — and
    # the intermediates' HBM traffic halves.  Accumulation stays f32 via
    # preferred_element_type.  HIGHEST/HIGH precision (parity-leaning
    # modes) keep f32 operands.
    bf16 = precision in (lax.Precision.DEFAULT, None)
    m2c = m2.astype(jnp.bfloat16) if bf16 else m2

    if strategy == 'pair':
        return _gram_pair(s2f, m2c, dim, n_cols, n_rows,
                          precision), bvec

    if strategy == 'blocktri':
        # Blocktri's live per-matmul intermediate is one 128-row block,
        # not the full (chunk, D, N) slab — size the column chunk by the
        # block width so the lax.map trip count (and with it the number
        # of small batched matmuls) shrinks ~D/128-fold at the same
        # memory budget.
        chunk_bt = max(1, min(n_cols,
                              _CHUNK_BUDGET_ELEMS // (_BLOCKTRI_BLK
                                                      * n_rows)))
        while n_cols % chunk_bt:
            chunk_bt -= 1
        gram = _gram_blocktri(s2f, m2c, dim, n_cols, n_rows, chunk_bt,
                              precision)
        return gram, bvec

    def gram_chunk(s2_c):
        # s2_c: (chunk, N).  A = slope-scaled design rows, then a batched
        # (D, N) x (N, D) contraction — M = N = D on the MXU with a long
        # K-dimension, instead of the einsum's per-column D~10 matmuls.
        a = (s2_c.astype(m2c.dtype))[:, None, :] * m2c[None]  # (chunk,D,N)
        return jnp.einsum('kdn,en->kde', a, m2c, precision=precision,
                          preferred_element_type=jnp.float32)

    gram = lax.map(gram_chunk, s2f.reshape(n_cols // chunk, chunk, n_rows))
    return gram.reshape(n_cols, dim, dim), bvec


_BLOCKTRI_BLK = 128                  # MXU-native tile width


def _gram_blocktri(s2f: jax.Array, m2c: jax.Array, dim: int, n_cols: int,
                   n_rows: int, chunk: int, precision) -> jax.Array:
    """Gram stack exploiting symmetry at the BLOCK level.

    gram[k] = M diag(s2_k) M^T is symmetric, so only the lower-triangular
    128-row-block products B_ij = A_i M_j^T (i >= j, A = slope-scaled
    design rows) need MXU work; the upper blocks are transposes.  With
    nb = ceil(D/128) blocks this does (nb(nb+1)/2 + ragged-edge) of the
    nb^2 block products — ~61% of the full-Gram MACs at D = 561 — with
    STATIC per-block shapes (the last block is simply narrower), so
    there are no per-element pair gathers (the measured killer of the
    symmetric pair-product path, see _gram_pair / docs/ROADMAP.md).
    Output assembly is plain concatenation: the same (K, D, D) f32 write
    traffic every strategy pays.
    """
    bounds = list(range(0, dim, _BLOCKTRI_BLK)) + [dim]

    def gram_chunk(s2_c):
        s2_cc = s2_c.astype(m2c.dtype)
        blocks = {}
        for bi in range(len(bounds) - 1):
            i0, i1 = bounds[bi], bounds[bi + 1]
            # Slope-scaled rows for this row block only; XLA fuses the
            # broadcast-multiply into the dot operand.
            a_i = s2_cc[:, None, :] * m2c[None, i0:i1]    # (chunk,bi,N)
            for bj in range(bi + 1):
                j0, j1 = bounds[bj], bounds[bj + 1]
                blocks[(bi, bj)] = jnp.einsum(
                    'kdn,en->kde', a_i, m2c[j0:j1], precision=precision,
                    preferred_element_type=jnp.float32)
        rows = []
        for bi in range(len(bounds) - 1):
            row = [blocks[(bi, bj)] if bj <= bi
                   else jnp.transpose(blocks[(bj, bi)], (0, 2, 1))
                   for bj in range(len(bounds) - 1)]
            rows.append(jnp.concatenate(row, axis=2))
        return jnp.concatenate(rows, axis=1)              # (chunk, D, D)

    gram = lax.map(gram_chunk, s2f.reshape(n_cols // chunk, chunk, n_rows))
    return gram.reshape(n_cols, dim, dim)


def _gram_strategy(n_cols: int, dim: int, n_rows: int) -> str:
    """Pick the Gram implementation for a (K=n_cols, D=dim, N=n_rows)
    instance — a TRACE-TIME decision (baked into the compiled program;
    changing the env var after a trainer compiled has no effect).

    Measured dispatch (v5e, benchmarks/bench_gram_ab.py + the HAR
    sweep): the fused three-operand einsum wins at small shapes (its
    (K, D, T, B) intermediate stays cache-resident — 69.4 us at the
    headline shape vs wide 83.6 / pair 102.1); the chunked wide
    contraction wins beyond (its live intermediate is bounded, fixing
    the HAR-scale OOM).  The pair-product path (symmetric half-FLOP
    Gram) LOSES everywhere measured — its per-chunk row gathers cost
    more than the saved matmul FLOPs — and stays selectable only via
    ADMM_GRAM_STRATEGY for shapes where K >> D might flip the verdict.
    """
    forced = os.environ.get('ADMM_GRAM_STRATEGY')
    if forced in ('einsum', 'pair', 'wide', 'blocktri'):
        return forced
    if n_cols * dim * n_rows <= _EINSUM_MAX_ELEMS:
        return 'einsum'
    # Beyond one MXU tile of design columns the block-level symmetry pays
    # (measured: see docs/ROADMAP.md round-5 blocktri table); at D <= 128
    # there is only one block and blocktri degenerates to wide.
    return 'blocktri' if dim > _BLOCKTRI_BLK else 'wide'


def _gram_pair(s2f: jax.Array, m2c: jax.Array, dim: int, n_cols: int,
               n_rows: int, precision) -> jax.Array:
    """Gram stack via the symmetric pair-product contraction.

      P[(d,e), n] = m2[d, n] * m2[e, n]   for the D*(D+1)/2 pairs d <= e
      packed      = s2f @ P^T             ONE (K, N) x (N, P) MXU matmul
      gram[k,d,e] = packed[k, pair(d,e)]  symmetric unpack (gather)

    P is built and consumed in pair-chunks bounded by
    _CHUNK_BUDGET_ELEMS, so the live intermediate stays ~256 MB at any
    D (HAR's D = 561 has 157,641 pairs x N rows ~ 13 GB — streamed,
    never materialized at once).
    """
    iu, ju = np.triu_indices(dim)
    n_pairs = iu.shape[0]
    chunk = max(1, min(n_pairs, _CHUNK_BUDGET_ELEMS // n_rows))
    pad = (-n_pairs) % chunk
    # Padded pair slots repeat pair 0; their packed columns are dropped
    # by the unpack gather below.
    iu_p = jnp.asarray(np.concatenate([iu, np.zeros(pad, iu.dtype)]))
    ju_p = jnp.asarray(np.concatenate([ju, np.zeros(pad, ju.dtype)]))
    s2c = s2f.astype(m2c.dtype)

    def pair_chunk(idx):
        i_c, j_c = idx
        p = m2c[i_c] * m2c[j_c]                       # (chunk, N)
        return jnp.einsum('kn,pn->kp', s2c, p, precision=precision,
                          preferred_element_type=jnp.float32)

    packed = lax.map(pair_chunk, (iu_p.reshape(-1, chunk),
                                  ju_p.reshape(-1, chunk)))
    packed = jnp.moveaxis(packed, 0, 1).reshape(n_cols, n_pairs + pad)

    # (D, D) -> packed index: pair(d, e) with d <= e.
    pair_of = np.zeros((dim, dim), np.int32)
    pair_of[iu, ju] = np.arange(n_pairs)
    pair_of[ju, iu] = np.arange(n_pairs)
    return packed[:, jnp.asarray(pair_of)]            # (K, D, D)


def gauss_newton_ridge_update_wide(m_inputs: jax.Array, pre: jax.Array,
                                   weights_w: jax.Array, target_w: jax.Array,
                                   rho_g: jax.Array, beta_g: jax.Array,
                                   tanh_cols: jax.Array, precision,
                                   damping: float = 1e-6,
                                   prox: float = 0.25,
                                   use_pallas_chol: bool = False) -> jax.Array:
    """Gate-folded, BATCH-MINOR variant of `gauss_newton_ridge_update`.

    Identical math in the (T, 4H, B) layout used by the wide weight phase
    (see prox_linear.weight_stage_update_wide for the layout rationale:
    batch in the vector lanes removes the minor-axis padding, and the
    elementwise slab traffic — act / d_act / resid over (T, B)-sized
    blocks — dominates the phase).  The caller supplies the already
    assembled pre-activation `pre = m_inputs @ weights_w + other_proj`,
    so the frozen side is never re-projected here.

    Shapes: m_inputs (T,D,B); pre, target_w (T,4H,B); weights_w (D,4H)
    gate-major columns.  Returns (D,4H).
    """
    hidden = weights_w.shape[-1] // 4
    rho_cols = jnp.repeat(rho_g, hidden)     # (4H,)
    beta_cols = jnp.repeat(beta_g, hidden)
    dim = m_inputs.shape[1]
    tanh_b = tanh_cols[:, None]              # (4H, 1), broadcast over B

    # One transcendental for act AND d_act (see prox_linear wide stage):
    # sigmoid(x) = (1 + tanh(x/2))/2 => act = a + b*u, act' = c*(1-u^2)
    # with u = tanh(s*x) and per-column constants.
    u = jnp.tanh(jnp.where(tanh_b, 1.0, 0.5) * pre)
    act = jnp.where(tanh_b, 0.0, 0.5) + jnp.where(tanh_b, 1.0, 0.5) * u
    d_act = jnp.where(tanh_b, 1.0, 0.25) * (1.0 - u * u)

    resid = act - target_w
    s2 = d_act * d_act

    # Gram stack (4H, D, D) and first-order term (4H, D).  Small shapes
    # use XLA's fused three-operand einsum (a fused Pallas accumulation
    # was built and honestly benched in round 3 and LOST 3.2x — the
    # per-column weighted Gram matmuls run at M = N = D ~ 10, <2% MXU
    # occupancy, while XLA's einsum strategy batches the contraction);
    # large shapes stream the Gram as chunked wide MXU contractions,
    # which is what makes HAR scale (D = 561, H = 256) runnable at all
    # (see _gram_bvec and the module docstring).
    gram, bvec = _gram_bvec(s2, d_act * resid, m_inputs, precision)
    eye = jnp.eye(dim, dtype=weights_w.dtype)

    # Same LM proximal anchor as the stacked-layout solver (see below).
    trace = jnp.einsum('kdd->k', gram) / dim              # (4H,)
    mu = prox * rho_cols * trace + damping                # (4H,)
    lhs = (beta_cols[:, None, None] * eye + rho_cols[:, None, None] * gram
           + mu[:, None, None] * eye)

    w_cols = weights_w.T                                  # (4H, D)
    rhs = (rho_cols[:, None] * (jnp.einsum('kde,ke->kd', gram, w_cols,
                                           precision=precision) - bvec)
           + mu[:, None] * w_cols)

    if use_pallas_chol == 'auto':
        use_pallas_chol = jax.default_backend() == 'tpu'
    if use_pallas_chol and dim <= 128:
        from admm_lstm_tpu.kernels.cholesky import pallas_chol_solve
        interpret = jax.default_backend() != 'tpu'
        solved = pallas_chol_solve(lhs, rhs, interpret=interpret)
    elif dim > 128:
        # XLA's batched Cholesky runs at ~0.3 TFLOP/s at D = 561 (it was
        # the exact stage's DOMINANT cost at HAR scale); the blocked
        # factorization keeps the D^3 work in batched MXU matmuls.
        from admm_lstm_tpu.solvers.blocked_chol import blocked_spd_solve
        solved = blocked_spd_solve(lhs, rhs, precision=precision)
    else:
        def solve_one(a, b):
            cho = jax.scipy.linalg.cho_factor(a)
            return jax.scipy.linalg.cho_solve(cho, b)

        solved = jax.vmap(solve_one)(lhs, rhs)            # (4H, D)
    return solved.T                                       # (D, 4H)


def gauss_newton_ridge_update(m_inputs: jax.Array, fixed_proj: jax.Array,
                              weights: jax.Array, gate_target: jax.Array,
                              rho_g: jax.Array, beta_g: jax.Array,
                              is_tanh: jax.Array, precision,
                              damping: float = 1e-6,
                              prox: float = 0.25,
                              use_pallas_chol: bool = False) -> jax.Array:
    """Solve the linearized weight subproblem exactly, all 4 gates at once.

    Linearizing act at the current pre-activation P = M W + fixed:
        act(P + M dW) ~= act(P) + act'(P) * (M dW)
    the subproblem  min_W  beta/2 |W|^2 + rho/2 sum (act - target)^2
    becomes, per gate g and output column h, the ridge system
        (beta I + rho G_h + damping I) (w_h + dw_h) = rho bvec_h + beta*0 ...
    concretely with r = act(P) - target and s = act'(P):
        G_h    = sum_{t,b} s_{tbh}^2 m_{tb} m_{tb}^T
        rhs_h  = rho * (G_h w_h - sum_{t,b} s_{tbh} r_{tbh} m_{tb})
        w_h^+  = solve(beta I + rho G_h, rhs_h)

    Shapes: m_inputs (T,B,D); fixed_proj, gate_target (4,T,B,H);
    weights (4,D,H).  Returns (4,D,H).
    """
    tanh_b = is_tanh[:, None, None, None]

    pre = jnp.einsum('tbd,gdh->gtbh', m_inputs, weights, precision=precision) + fixed_proj
    sig = jax.nn.sigmoid(pre)
    act = jnp.where(tanh_b, jnp.tanh(pre), sig)
    d_act = jnp.where(tanh_b, 1.0 - jnp.tanh(pre) ** 2, sig * (1.0 - sig))

    resid = act - gate_target
    s2 = d_act * d_act

    # Gram stack: (4, H, D, D); weighted by the squared linearization slope.
    gram = jnp.einsum('gtbh,tbd,tbe->ghde', s2, m_inputs, m_inputs,
                      precision=precision)
    # First-order term: (4, H, D)
    bvec = jnp.einsum('gtbh,tbd->ghd', d_act * resid, m_inputs,
                      precision=precision)

    dim = m_inputs.shape[-1]
    eye = jnp.eye(dim, dtype=weights.dtype)
    rho_b = rho_g[:, None, None, None]

    # Levenberg-Marquardt proximal anchor: the Gauss-Newton system solves
    # a LOCAL linearization of the sigmoid/tanh residual, and the full
    # (prox-free) step overshoots wherever the gates saturate (d_act -> 0
    # makes the Gram near-singular); measured on GoogleStock h=10 the
    # undamped solve drives max|wh| past 300 and NaNs on TPU.  Anchoring
    # with mu = prox * mean(diag(rho G)) per (gate, column) keeps the
    # update inside the linearization's trust region while remaining an
    # exact solve of the damped subproblem.
    trace = jnp.einsum('ghdd->gh', gram) / dim            # (4, H)
    mu = prox * rho_b[..., 0, 0] * trace + damping        # (4, H)
    lhs = (beta_g[:, None, None, None] * eye + rho_b * gram
           + mu[..., None, None] * eye)

    w_cols = jnp.transpose(weights, (0, 2, 1))  # (4, H, D)
    rhs = (rho_b[..., 0] * (jnp.einsum('ghde,ghe->ghd', gram, w_cols,
                                       precision=precision) - bvec)
           + mu[..., None] * w_cols)

    hidden = weights.shape[2]
    if use_pallas_chol == 'auto':
        # Shape-based default: the Pallas solve is a measured ~1.1x win on
        # TPU at dim <= 128 (docs/ROADMAP.md round-2 table); interpret
        # mode on CPU would be a large loss, so 'auto' is TPU-only.
        use_pallas_chol = jax.default_backend() == 'tpu'
    if use_pallas_chol and dim <= 128:
        from admm_lstm_tpu.kernels.cholesky import pallas_chol_solve
        interpret = jax.default_backend() != 'tpu'
        solved = pallas_chol_solve(lhs.reshape(4 * hidden, dim, dim),
                                   rhs.reshape(4 * hidden, dim),
                                   interpret=interpret)
        solved = solved.reshape(4, hidden, dim)
    else:
        def solve_one(a, b):
            cho = jax.scipy.linalg.cho_factor(a)
            return jax.scipy.linalg.cho_solve(cho, b)

        solved = jax.vmap(jax.vmap(solve_one))(lhs, rhs)  # (4, H, D)
    return jnp.transpose(solved, (0, 2, 1))
