"""Parallel rho-search tests (vmapped whole-training grid)."""

import jax.numpy as jnp
import numpy as np
import pytest

from admm_lstm_tpu import ADMMConfig
from admm_lstm_tpu.data.synthetic import load as synth
from admm_lstm_tpu.params import parameter_set
from admm_lstm_tpu.tune import candidate_grid, search_rho


def test_candidate_grid_shape():
    grid = candidate_grid(parameter_set('Synthetic'), multipliers=(0.5, 1, 2))
    assert grid.shape == (27, 7)
    # Gate penalties untouched.
    np.testing.assert_allclose(grid[:, 0], 1.0)


def test_search_rho_finds_no_worse_than_base():
    tx, ty, vx, vy = synth(batch=48, seq_len=5, input_size=1, output_size=1,
                           val_batch=16)
    base = parameter_set('Synthetic')
    grid = candidate_grid(base, multipliers=(0.3, 1.0, 3.0), keys=('c', 'h'))
    out = search_rho(tx, ty, vx, vy, base, ADMMConfig(), candidates=grid,
                     epochs=15)
    assert out['val_losses'].shape == (9,)
    assert np.isfinite(out['best_val_loss'])
    # The base tuning (multiplier 1,1) is in the grid, so the winner cannot
    # be worse than it.
    base_idx = 4  # (1.0, 1.0) in the 3x3 product
    assert out['best_val_loss'] <= out['val_losses'][base_idx] + 1e-6
    assert set(out['best_rho']) == {'i', 'f', 'g', 'o', 'c', 'h', 'y'}


def test_refine_rho_monotone_history():
    from admm_lstm_tpu.tune import refine_rho
    tx, ty, vx, vy = synth(batch=32, seq_len=5, input_size=1, output_size=1,
                           val_batch=16)
    base = parameter_set('Synthetic')
    out = refine_rho(tx, ty, vx, vy, base, ADMMConfig(), epochs=10,
                     rounds=2, keys=('c', 'h'))
    assert len(out['history']) == 2
    # Re-centering on the winner can only improve (same seed/initials).
    assert (out['history'][1]['best_val_loss']
            <= out['history'][0]['best_val_loss'] + 1e-6)


def test_search_rho_stacked():
    from admm_lstm_tpu.tune import search_rho_stacked
    tx, ty, vx, vy = synth(batch=32, seq_len=5, input_size=1, output_size=1,
                           val_batch=16)
    base = parameter_set('Stacked')
    grid = candidate_grid(base, multipliers=(0.5, 1.0, 2.0), keys=('h',))
    out = search_rho_stacked(tx, ty, vx, vy, base, hiddens=(5, 4),
                             config=ADMMConfig(), candidates=grid, epochs=10,
                             z_candidates=np.asarray([0.5, 1.0, 2.0]))
    assert out['val_losses'].shape == (3,)
    assert np.isfinite(out['best_val_loss'])
    assert out['best_z'] in (0.5, 1.0, 2.0)


def test_run_in_groups_oom_fallback():
    """Round-5: an HBM-capacity compile failure on the full vmapped
    candidate batch falls back to halved groups and concatenates; a
    non-OOM error propagates unchanged."""
    from admm_lstm_tpu.tune import _run_in_groups

    calls, ok_sizes = [], []

    def vrun(batch):
        calls.append(batch.shape[0])
        if batch.shape[0] > 7:
            raise RuntimeError('RESOURCE_EXHAUSTED: Ran out of memory '
                               'in memory space hbm.')
        ok_sizes.append(batch.shape[0])
        return batch * 2.0, batch + 1.0

    x = jnp.arange(27, dtype=jnp.float32)
    tr, vl = _run_in_groups(vrun, x, 27)
    np.testing.assert_allclose(np.asarray(tr), np.arange(27) * 2.0)
    np.testing.assert_allclose(np.asarray(vl), np.arange(27) + 1.0)
    # First attempt is the full batch; the groups that actually ran are
    # all within the fake capacity and cover all 27 candidates in order.
    assert calls[0] == 27
    assert max(ok_sizes) <= 7 and sum(ok_sizes) == 27

    def vrun_bad(batch):
        raise ValueError('not an oom')

    with pytest.raises(ValueError):
        _run_in_groups(vrun_bad, x, 27)
