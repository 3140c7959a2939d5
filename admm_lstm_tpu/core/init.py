"""ADMM state initialization.

Mirrors the reference optimizer's constructor (admm.py:34-60): one full
forward pass seeds every primal gate trajectory (admm.py:164-167 via
blocks/lstm.py:65-88) and all duals start at zero (admm.py:169-173).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from admm_lstm_tpu.core.state import (ADMMState, DualSlabs, GateSlabs,
                                      penalties_from, ridges_from)
from admm_lstm_tpu.models.lstm import LSTMParams, lstm_forward_with_history
from admm_lstm_tpu.utils.config import ADMMConfig, ParameterSet

_PRECISIONS = {
    'highest': lax.Precision.HIGHEST,
    'high': lax.Precision.HIGH,
    'default': lax.Precision.DEFAULT,
}


def init_admm_state(params: LSTMParams, train_x: jax.Array,
                    parameter_set: ParameterSet,
                    config: ADMMConfig = ADMMConfig()) -> ADMMState:
    """Seed gates with a forward pass; zero duals; load rho/beta constants."""
    batch, seq_len, input_size = train_x.shape
    if input_size != params.input_size:
        raise ValueError(f'train_x feature dim {input_size} != model input '
                         f'size {params.input_size}')
    dtype = params.wx.dtype
    # STORAGE dtype of the big (T+1, B, H) slabs (ADMMConfig.dtype):
    # 'bfloat16' halves the HBM traffic that dominates the epoch (the
    # state is read+written wholesale each epoch); the step upcasts to
    # f32 for ALL math and downcasts only at the epoch boundary.  The
    # small (O, B) tensors `a`/`y` and the weights stay in the param
    # dtype regardless.
    slab_dtype = jnp.dtype(config.dtype)
    precision = _PRECISIONS[config.matmul_precision]
    # Private copy of the weights: the jitted step donates its input state,
    # which would otherwise invalidate the caller's param buffers.
    params = jax.tree.map(lambda a: jnp.array(a, copy=True), params)

    hist = lstm_forward_with_history(params, train_x, precision=precision)

    def to_slab(a):
        # Model histories are (T+1, B, H); state slabs are BATCH-MINOR
        # (T+1, H, B) — see core/state.py layout notes.  One-time cost.
        return jnp.transpose(a, (0, 2, 1)).astype(slab_dtype)

    # a / dual y are OUT-MINOR (O, B): the tiny output axis (O = 1 on
    # every bundled regression set) must stay off the 128-wide lane axis.
    gates = GateSlabs(i=to_slab(hist['i']), f=to_slab(hist['f']),
                      g=to_slab(hist['g']), o=to_slab(hist['o']),
                      c=to_slab(hist['c']), h=to_slab(hist['h']),
                      a=jnp.transpose(hist['a']))

    # Distinct buffers per dual (aliasing one zeros array would make the
    # donated step fail with "donate the same buffer twice").
    def zero_slab():
        return jnp.zeros((seq_len + 1, params.hidden_size, batch),
                         slab_dtype)

    duals = DualSlabs(i=zero_slab(), f=zero_slab(), g=zero_slab(),
                      o=zero_slab(), c=zero_slab(), h=zero_slab(),
                      y=jnp.zeros((params.output_size, batch), dtype))

    return ADMMState(params=params, gates=gates, duals=duals,
                     rho=penalties_from(parameter_set, dtype),
                     beta=ridges_from(parameter_set, dtype),
                     epoch=jnp.asarray(0, jnp.int32))
