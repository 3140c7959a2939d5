"""Pallas kernel tests (interpret mode on CPU): the fused interior sweep
must match the XLA lax.scan path exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admm_lstm_tpu import ADMMConfig
from admm_lstm_tpu.core.init import init_admm_state
from admm_lstm_tpu.core.step import make_admm_step
from admm_lstm_tpu.data.synthetic import load as synth
from admm_lstm_tpu.models.lstm import init_lstm_params
from admm_lstm_tpu.params import parameter_set


@pytest.mark.parametrize('batch,seq,hidden', [(24, 6, 5), (17, 3, 4)])
def test_pallas_sweep_matches_scan(batch, seq, hidden):
    tx, ty, _, _ = synth(batch=batch, seq_len=seq, input_size=2,
                         output_size=1, val_batch=4)
    tx, ty = jnp.asarray(tx), jnp.asarray(ty)
    params = init_lstm_params(jax.random.PRNGKey(1), 2, hidden, 1)
    ps = parameter_set('Synthetic')

    ref_state = init_admm_state(params, tx, ps, ADMMConfig())
    pal_state = init_admm_state(params, tx, ps,
                                ADMMConfig(use_pallas_sweep=True))
    ref_step = make_admm_step(ADMMConfig(), donate=False)
    pal_step = make_admm_step(ADMMConfig(use_pallas_sweep=True), donate=False)

    for s in range(3):
        ref_state = ref_step(ref_state, tx, ty)
        pal_state = pal_step(pal_state, tx, ty)
        for name in ('i', 'f', 'g', 'o', 'c', 'h'):
            np.testing.assert_allclose(
                np.asarray(getattr(pal_state.gates, name)),
                np.asarray(getattr(ref_state.gates, name)),
                atol=1e-6, err_msg=f'step {s} gate {name}')
            np.testing.assert_allclose(
                np.asarray(getattr(pal_state.duals, name)),
                np.asarray(getattr(ref_state.duals, name)),
                atol=1e-6, err_msg=f'step {s} dual {name}')
        np.testing.assert_allclose(np.asarray(pal_state.params.wx),
                                   np.asarray(ref_state.params.wx), atol=1e-6)


def test_pallas_batch_tile_picker():
    from admm_lstm_tpu.kernels.gate_sweep import _pick_batch_tile
    assert _pick_batch_tile(24) == 24
    assert _pick_batch_tile(17) == 24   # rounded up to a multiple of 8
    assert _pick_batch_tile(4224) in range(8, 513)
    assert 4224 % _pick_batch_tile(4224) == 0
