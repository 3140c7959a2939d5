"""The ADMM optimizer state as a single JAX pytree.

The reference keeps this state scattered across a torch module and two dicts
of mutable tensors (admm.py:51-60: model weights, `gates`, `duals`).  Here it
is one immutable pytree, so the whole epoch update is a pure function
``ADMMState -> ADMMState`` that jit/pjit can compile and shard, and orbax can
checkpoint wholesale (a capability the reference lacks — it only pickles the
final model, demo.py:302-308).

Layout decisions (TPU-first):
  * Gate/dual slabs are TIME-MAJOR, BATCH-MINOR ``(T+1, H, B)``.  Time-major
    because `lax.scan` produces and consumes leading-axis stacks natively.
    Batch-minor because the minor-most axis maps to the TPU's 128-wide
    vector lanes: at the reference's hidden sizes (H = 10..100) an H-minor
    slab pads H up to 128 and inflates every HBM touch up to 12.8x, while
    the batch axis is large (GoogleStock B = 4224 = 33 * 128) and pads to
    ~0% waste.  Measured on TPU v5e (benchmarks/bench_layout.py): an
    elementwise pass over a (T, B, 10) slab moves bytes at ~24 GB/s
    effective vs several hundred GB/s for the (T, 10, B) layout — the
    round-3 redesign that removed the round-2 roofline gap.
    (The reference uses (B, T+1, H), admm.py:171; converters below restore
    that layout at API boundaries.)
  * Row 0 of every slab is the zero initial state and is never written
    (admm.py:187-195 semantics).
  * The four gate weights are stacked (4, I, H)/(4, H, H) so weight-phase
    updates vmap over gates and the sweep does two wide matmuls per step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from admm_lstm_tpu.models.lstm import LSTMParams
from admm_lstm_tpu.utils.config import ParameterSet, RHO_KEYS


class GateSlabs(NamedTuple):
    """Primal auxiliary variables. i,f,g,o,c,h: (T+1, H, B); a: (O, B).

    (The stacked variant keeps its own batch-at-axis-1 convention; these
    NamedTuples are layout-free containers — the layout contract lives in
    the code that builds and consumes them.)
    """

    i: jax.Array
    f: jax.Array
    g: jax.Array
    o: jax.Array
    c: jax.Array
    h: jax.Array
    a: jax.Array

    def stacked_ifgo(self) -> jax.Array:
        """(4, T+1, B, H) in the canonical gate order i,f,g,o."""
        return jnp.stack([self.i, self.f, self.g, self.o])


class DualSlabs(NamedTuple):
    """Lagrange multipliers. i..h: (T+1, H, B); y: (O, B)."""

    i: jax.Array
    f: jax.Array
    g: jax.Array
    o: jax.Array
    c: jax.Array
    h: jax.Array
    y: jax.Array

    def stacked_ifgo(self) -> jax.Array:
        return jnp.stack([self.i, self.f, self.g, self.o])


class Penalties(NamedTuple):
    """The 7 rho penalty coefficients as 0-d arrays."""

    i: jax.Array
    f: jax.Array
    g: jax.Array
    o: jax.Array
    c: jax.Array
    h: jax.Array
    y: jax.Array

    def stacked_ifgo(self) -> jax.Array:
        return jnp.stack([self.i, self.f, self.g, self.o])


class Ridges(NamedTuple):
    """The 9 beta ridge coefficients: per-gate input/hidden sides + readout."""

    x: jax.Array   # (4,) for x2i, x2f, x2g, x2o
    h: jax.Array   # (4,) for h2i, h2f, h2g, h2o
    wy: jax.Array  # scalar


class ADMMState(NamedTuple):
    params: LSTMParams
    gates: GateSlabs
    duals: DualSlabs
    rho: Penalties
    beta: Ridges
    epoch: jax.Array  # scalar int32

    @property
    def seq_len(self) -> int:
        return self.gates.i.shape[0] - 1

    @property
    def batch_size(self) -> int:
        return self.gates.i.shape[2]

    @property
    def hidden_size(self) -> int:
        return self.gates.i.shape[1]


def penalties_from(params: ParameterSet, dtype=jnp.float32) -> Penalties:
    # Extra rho keys (e.g. 'z' for the stacked variant's pre-activation
    # penalty) are consumed by their variants, not by the 7-key core.
    return Penalties(**{k: jnp.asarray(v, dtype)
                        for k, v in params.rho.items() if k in RHO_KEYS})


def ridges_from(params: ParameterSet, dtype=jnp.float32) -> Ridges:
    b = params.beta
    return Ridges(
        x=jnp.asarray([b['wi'], b['wf'], b['wg'], b['wo']], dtype),
        h=jnp.asarray([b['vi'], b['vf'], b['vg'], b['vo']], dtype),
        wy=jnp.asarray(b['wy'], dtype),
    )


def to_batch_major(slab: jax.Array) -> jax.Array:
    """(T+1, H, B) -> (B, T+1, H): the reference's layout (admm.py:171)."""
    return jnp.transpose(slab, (2, 0, 1))


def from_batch_major(slab: jax.Array) -> jax.Array:
    """(B, T+1, H) -> (T+1, H, B)."""
    return jnp.transpose(slab, (1, 2, 0))
