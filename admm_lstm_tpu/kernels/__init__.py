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
* fused whole-turbo-epoch kernel (round 5 kill, measured before
  building): the round-4 "~2x ceiling" premise compared the 150 us
  turbo epoch to an 86 us all-passes skeleton, but the structure-
  respecting floor is much higher — the weight phase's TWO-pass
  requirement (~47 us, the round-4 retirement above), the final
  timestep's serial bounded search with global batch reductions
  (in the measured 20 us final+assemble delta), the metric forward's
  serial T-step recurrence (16 us fused in-context), and the 12.7 us
  epoch-carry cost sum to ~112-125 us, capping any fused kernel at
  ~1.2-1.33x, not 2x.  And the vehicle loses where it must win: the
  Pallas Jacobi elementwise pass measures 78.0 us vs 36.6 us for
  XLA's own fused vmapped block at the headline (T-1=9, H=10,
  B=4224) shape (round-5 re-measurement of the round-4 negative) —
  a fused epoch kernel would have to recover >40 us of fusion wins
  through a pass that starts 2.1x behind.  Not built; the headline
  turbo epoch stays on the XLA path, measured at ~84-89% of its
  structure-respecting floor.
"""

from admm_lstm_tpu.kernels.gate_sweep import (pallas_interior_sweep,
                                              pallas_jacobi_sweep)

__all__ = ['pallas_interior_sweep', 'pallas_jacobi_sweep']
