"""Pallas TPU kernels.

Shipped: the fused gate-sweep kernels (gate_sweep.py — the measured
long-T/DP winners) and the batched Cholesky solve (cholesky.py).

Retired with recorded negative results (docs/ROADMAP.md):
* fused Gram accumulator for the exact weight solve (round 3, 3.2x
  loss — per-column D~10 matmuls under-occupy the MXU vs XLA's batched
  einsum; superseded by the chunked wide contraction in
  solvers/normal_eq).
* fused prox-linear weight stage (round 4 removal): the stage
  structurally needs TWO full slab passes (the gradient must complete
  before any line-search candidate can be evaluated), and the XLA stage
  was measured AT that floor (143.8 vs kernel 142.9 us at the headline
  shape) — so the kernel could only ever tie where it applied (D <= 16)
  and lost 2x at long T from per-cell overhead; a time-blocked grid
  would have amortized it back to the same floor XLA already achieves.
  333 LoC with no winning envelope, deleted.
"""

from admm_lstm_tpu.kernels.gate_sweep import (pallas_interior_sweep,
                                              pallas_jacobi_sweep)

__all__ = ['pallas_interior_sweep', 'pallas_jacobi_sweep']
