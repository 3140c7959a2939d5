"""Unified configuration for the ADMM-LSTM TPU framework.

The reference scattered configuration over argparse flags (demo.py:37-70),
a constants dict (parameters.py) and module-level booleans (admm.py:12,
comparison.py:33-34).  Here everything lives in two frozen dataclasses
consumable from both the Python API and the CLI.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

GATE_KEYS = ('i', 'f', 'g', 'o')
RHO_KEYS = ('i', 'f', 'g', 'o', 'c', 'h', 'y')
# Weight-decay keys: w* = input-side (x2*), v* = hidden-side (h2*), wy = readout.
BETA_KEYS = ('wi', 'vi', 'wf', 'vf', 'wg', 'vg', 'wo', 'vo', 'wy')

VARIANTS = ('fast', 'no_dual_y', 'admm_l', 'admm_s')

# The measured auto() composition — the single source consumed by both
# ADMMConfig.auto() and api.derive_auto_config (preset='best' probes it).
AUTO_FIELDS = dict(sweep_mode='jacobi', exact_weight_solve=True,
                   matmul_precision='default', adaptive_rho=True,
                   adapt_stop_epoch=10)


@dataclasses.dataclass(frozen=True)
class ParameterSet:
    """Per-dataset tuned ADMM constants (reference: parameters.py:11-91).

    rho:  7 penalty coefficients keyed i,f,g,o,c,h,y.
    beta: 9 ridge (weight-decay) coefficients keyed wi,vi,...,wy.
    """

    rho: Dict[str, float]
    beta: Dict[str, float]

    def __post_init__(self) -> None:
        missing_rho = set(RHO_KEYS) - set(self.rho)
        missing_beta = set(BETA_KEYS) - set(self.beta)
        if missing_rho:
            raise ValueError(f'rho missing keys: {sorted(missing_rho)}')
        if missing_beta:
            raise ValueError(f'beta missing keys: {sorted(missing_beta)}')
        for k, v in {**self.rho, **self.beta}.items():
            if not isinstance(v, (int, float)):
                raise TypeError(f'parameter {k} must be numeric, got {type(v)}')
            if v < 0:
                raise ValueError(f'parameter {k} must be non-negative, got {v}')

    @classmethod
    def from_dict(cls, d: Dict[str, Dict[str, float]]) -> 'ParameterSet':
        return cls(rho=dict(d['rho']), beta=dict(d['beta']))

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {'rho': dict(self.rho), 'beta': dict(self.beta)}


@dataclasses.dataclass(frozen=True)
class ADMMConfig:
    """Everything that shapes one training run."""

    variant: str = 'fast'           # one of VARIANTS
    with_dual_y: bool = False       # reference: admm.py:12 module flag
    epochs: int = 100               # reference: parameters.py:9 default_epoch
    hidden_size: int = 10
    seed: int = 0
    # STORAGE dtype of the gate/dual slabs ('float32' or 'bfloat16').
    # bf16 halves the HBM slab traffic that dominates the epoch; all math
    # still runs in f32 (core/step.admm_step up/downcasts at the epoch
    # boundary, where XLA fuses the converts away).  Quality-gate any
    # bf16 run: the ADMM fixed point tolerates it on the shipped
    # problems (see docs/ROADMAP.md) but it is not parity-exact.
    dtype: str = 'float32'
    # 'highest' matches the reference's f32 torch math bit-for-bit-ish;
    # 'default' lets the MXU use faster passes (use for large hidden sizes).
    matmul_precision: str = 'highest'
    # Cap on backtracking line-search doublings (the reference caps only the
    # final-h search at theta_max=1, admm.py:449; we bound every while_loop so
    # it is compilable and cannot spin on NaNs).
    max_backtrack: int = 60
    # Final-timestep h line search bounds (reference: admm.py:447-449).
    h_theta0: float = 0.1
    h_theta_max: float = 1.0
    # Mesh: axis names and sizes; None => single device.
    mesh_shape: Optional[Tuple[int, ...]] = None
    mesh_axes: Tuple[str, ...] = ('data',)
    # Exact ridge/normal-equation weight solver instead of the reference's
    # single linearized prox step (performance/quality mode, off for parity).
    exact_weight_solve: bool = False
    # Widest design dimension D a weight stage may solve exactly; stages
    # wider than this fall back to the prox-linear step even under
    # exact_weight_solve.  The default keeps the measured turbo sweet
    # spot (every small-feature dataset's x side and the hidden side up
    # to H = 160); raise it (e.g. 1024) to solve HAR's D = 561 input
    # side exactly — the chunked Gram builder (solvers/normal_eq.py)
    # keeps memory bounded at any D, but the Gram FLOPs grow as
    # O(4H * D^2 * T * B), ~500x the prox-linear step at D = 561, so the
    # widening is a deliberate quality-for-time trade.
    exact_solve_max_dim: int = 160
    # Fused Pallas kernel for the interior timestep sweep (kernels/gate_sweep).
    # 'auto' (default) enables the GAUSS-SEIDEL kernel on TPU when
    # seq_len >= 16 and hidden <= 128: the time-blocked grid amortizes the
    # scan's per-step overhead and wins 1.2x (T=16) to 3.3x (T=1024/2048)
    # at bit-matched quality — near-Jacobi throughput with EXACT
    # Gauss-Seidel semantics (round-3 measurements, docs/ROADMAP.md).  At
    # short T (the GoogleStock T=10 headline) the XLA scan ties, and the
    # Jacobi-mode kernel loses to the vmapped XLA block, so 'auto' leaves
    # both alone.  True/False force it.  Data-parallel sharded trainers
    # COMPOSE with the kernel (round 4): parallel/sharding wraps the
    # pallas_call in shard_map over the batch axis, so 'auto' resolves
    # exactly as on one device and the kernel's wins carry over to DP
    # runs.  Time- or model-sharded layouts (hand-rolled jit over
    # state_shardings(shard_time/model_axis)) should keep this False —
    # those layouts cut through the kernel's grid.
    use_pallas_sweep: object = 'auto'
    # (A fused Pallas weight-stage kernel existed through round 3 and was
    # REMOVED in round 4: the stage structurally needs two full slab
    # passes and the XLA stage already sits at that floor, so the kernel
    # had no winning envelope — see kernels/__init__.py for the record.)
    # Pallas batched Cholesky for the exact weight solves (kernels/cholesky).
    # 'auto' (default) enables it on TPU when exact_weight_solve=True and
    # the block dim is <= 128 — a measured ~1.1x win on the solve-heavy
    # path; True/False force it.
    use_pallas_chol: object = 'auto'
    # 'gauss_seidel' (reference-exact sequential sweep) or 'jacobi'
    # (time-parallel block update; see core/step.StepRules.sweep_mode).
    sweep_mode: str = 'gauss_seidel'
    # Lipschitz-safeguarded readout step (see core/step.StepRules
    # wy_lipschitz): stabilizes the loose variant when
    # rho_y * ||h||^2 exceeds the reference's fixed theta.  Off by
    # default for reference parity.
    wy_lipschitz: bool = False
    # Residual-balancing rho adaptation (core/residuals.balanced_rho):
    # per-family rho *= tau when the primal residual dominates the dual
    # residual by factor mu, /= tau in the reverse case.  Off by default
    # (reference parity: rho stays at the shipped constants forever).
    #
    # Round-3 diagnosis of the round-2 "adaptive x turbo non-composition":
    # the degradation was CONTINUED adaptation, not the adapted values —
    # the balancing keeps cycling rho around the deadband and every jolt
    # knocks the ADMM iterate off its fixed-point approach.  Freezing the
    # adaptation after a short warmup (adapt_stop_epoch) repairs it:
    # GoogleStock turbo+adaptive goes from val 0.148 (never freeze) to
    # 0.0126@30 / 0.0030@100, monotone, with tau=2 frozen at epoch 10
    # (tools/diag_adaptive_turbo.py).  adapt_stop_epoch=0 keeps the
    # round-2 behavior (adapt forever).
    adaptive_rho: bool = False
    adapt_mu: float = 10.0
    adapt_tau: float = 2.0
    adapt_stop_epoch: int = 0
    # Stacked-variant dual damping (core/step.StepRules.stacked_dual_decay):
    # lam <- decay * (lam + rho * resid) in every stacked dual ascent.
    stacked_dual_decay: float = 1.0

    def __post_init__(self) -> None:
        if self.variant not in VARIANTS:
            raise ValueError(f'variant must be one of {VARIANTS}, got {self.variant!r}')
        if self.variant == 'no_dual_y' and self.with_dual_y:
            raise ValueError('no_dual_y variant cannot run with_dual_y=True')
        if self.matmul_precision not in ('highest', 'high', 'default'):
            raise ValueError(f'bad matmul_precision {self.matmul_precision!r}')
        if self.use_pallas_chol not in (True, False, 'auto'):
            raise ValueError(f'use_pallas_chol must be True, False or '
                             f"'auto', got {self.use_pallas_chol!r}")
        if self.use_pallas_sweep not in (True, False, 'auto'):
            raise ValueError(f'use_pallas_sweep must be True, False or '
                             f"'auto', got {self.use_pallas_sweep!r}")
        if self.dtype not in ('float32', 'bfloat16'):
            raise ValueError(f"dtype must be 'float32' or 'bfloat16', "
                             f'got {self.dtype!r}')

    def replace(self, **kw) -> 'ADMMConfig':
        return dataclasses.replace(self, **kw)

    @classmethod
    def turbo(cls, **kw) -> 'ADMMConfig':
        """The speed preset: Jacobi (time-parallel) sweep + LM-anchored
        exact weight solve + default MXU precision.  Matches or beats the
        reference-parity mode's quality on every bundled dataset at ~2.2x
        the rate (docs/ROADMAP.md measured table)."""
        base = dict(sweep_mode='jacobi', exact_weight_solve=True,
                    matmul_precision='default')
        base.update(kw)
        return cls(**base)

    @classmethod
    def auto(cls, **kw) -> 'ADMMConfig':
        """The speed+quality composition: turbo plus residual-balancing
        rho adaptation with a 10-epoch warmup freeze.  Rule (measured,
        tools/diag_adaptive_turbo.py): adapt hard early (tau=2) while
        the residual scales sort themselves out, then freeze so the ADMM
        fixed-point iteration is not perturbed late.  GoogleStock:
        val30 0.0126 / val100 0.0030 vs the shipped tuning's 0.3469."""
        base = dict(AUTO_FIELDS)
        base.update(kw)
        return cls(**base)
