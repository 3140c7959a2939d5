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


@pytest.mark.parametrize('time_block', [2, 4, 8])
def test_pallas_sweep_time_block_matches(time_block):
    """Time-blocked grid (K timesteps per cell, incl. trailing time pad)
    must agree with the K=1 kernel and the scan path."""
    from admm_lstm_tpu.kernels.gate_sweep import pallas_interior_sweep
    rng = np.random.default_rng(0)
    steps, batch, hidden = 13, 24, 5   # steps % K != 0 for every K
    xproj = jnp.asarray(rng.standard_normal((steps, 4, hidden, batch)),
                        jnp.float32) * 0.3
    wh = jnp.asarray(rng.standard_normal((4, hidden, hidden)),
                     jnp.float32) * 0.3
    gates = tuple(jnp.asarray(rng.standard_normal((steps, hidden, batch)),
                              jnp.float32) * 0.2 for _ in range(6))
    duals = tuple(jnp.asarray(rng.standard_normal((steps, hidden, batch)),
                              jnp.float32) * 0.01 for _ in range(6))
    rho = jnp.asarray([1., 1., 1., 1., 0.01, 0.001], jnp.float32)
    ref_g, ref_d = pallas_interior_sweep(xproj, wh, gates, duals, rho,
                                         interpret=True, time_block=1)
    blk_g, blk_d = pallas_interior_sweep(xproj, wh, gates, duals, rho,
                                         interpret=True,
                                         time_block=time_block)
    for a, b in zip(ref_g + ref_d, blk_g + blk_d):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)


@pytest.mark.parametrize('batch,seq,hidden', [(24, 9, 5), (17, 4, 4)])
def test_pallas_jacobi_matches_vmap(batch, seq, hidden):
    """The fused Jacobi kernel must match the vmapped XLA Jacobi path."""
    tx, ty, _, _ = synth(batch=batch, seq_len=seq, input_size=2,
                         output_size=1, val_batch=4)
    tx, ty = jnp.asarray(tx), jnp.asarray(ty)
    params = init_lstm_params(jax.random.PRNGKey(1), 2, hidden, 1)
    ps = parameter_set('Synthetic')

    ref_state = init_admm_state(params, tx, ps,
                                ADMMConfig(sweep_mode='jacobi'))
    pal_state = init_admm_state(params, tx, ps,
                                ADMMConfig(sweep_mode='jacobi',
                                           use_pallas_sweep=True))
    ref_step = make_admm_step(ADMMConfig(sweep_mode='jacobi'), donate=False)
    pal_step = make_admm_step(ADMMConfig(sweep_mode='jacobi',
                                         use_pallas_sweep=True), donate=False)
    for s in range(3):
        ref_state = ref_step(ref_state, tx, ty)
        pal_state = pal_step(pal_state, tx, ty)
        for name in ('i', 'f', 'g', 'o', 'c', 'h'):
            np.testing.assert_allclose(
                np.asarray(getattr(pal_state.gates, name)),
                np.asarray(getattr(ref_state.gates, name)),
                atol=1e-6, err_msg=f'step {s} gate {name}')


def test_pallas_batch_tile_picker():
    from admm_lstm_tpu.kernels.gate_sweep import _pick_batch_tile
    assert _pick_batch_tile(24) == 24
    assert _pick_batch_tile(17) == 24   # rounded up to a multiple of 8
    tile = _pick_batch_tile(4224)
    assert 4224 % tile == 0
    assert tile % 128 == 0              # full-lane tiles for big batches
    # VMEM budget respected: bigger K shrinks the tile.
    assert _pick_batch_tile(4224, 10, 8) <= tile


def test_pallas_chol_solve_matches_numpy():
    from admm_lstm_tpu.kernels.cholesky import pallas_chol_solve
    rng = np.random.default_rng(0)
    for n, dim in ((12, 8), (5, 16), (9, 64)):
        m = rng.standard_normal((n, dim, dim)).astype(np.float32)
        a = m @ np.transpose(m, (0, 2, 1)) + 3 * np.eye(dim, dtype=np.float32)
        b = rng.standard_normal((n, dim)).astype(np.float32)
        x = np.asarray(pallas_chol_solve(jnp.asarray(a), jnp.asarray(b),
                                         interpret=True))
        want = np.stack([np.linalg.solve(a[i], b[i]) for i in range(n)])
        np.testing.assert_allclose(x, want, atol=5e-4, err_msg=f'D={dim}')


def test_pallas_chol_rejects_large_blocks():
    from admm_lstm_tpu.kernels.cholesky import pallas_chol_solve
    with pytest.raises(ValueError, match='D <= 128'):
        pallas_chol_solve(jnp.eye(256)[None], jnp.ones((1, 256)),
                          interpret=True)


def test_exact_solve_with_pallas_chol():
    tx, ty, _, _ = synth(batch=32, seq_len=5, input_size=2, output_size=1,
                         val_batch=4)
    tx, ty = jnp.asarray(tx), jnp.asarray(ty)
    params = init_lstm_params(jax.random.PRNGKey(2), 2, 6, 1)
    ps = parameter_set('Synthetic')
    ref_cfg = ADMMConfig(exact_weight_solve=True)
    pal_cfg = ADMMConfig(exact_weight_solve=True, use_pallas_chol=True)
    s_ref = init_admm_state(params, tx, ps, ref_cfg)
    s_pal = init_admm_state(params, tx, ps, pal_cfg)
    step_ref = make_admm_step(ref_cfg, donate=False)
    step_pal = make_admm_step(pal_cfg, donate=False)
    for _ in range(2):
        s_ref = step_ref(s_ref, tx, ty)
        s_pal = step_pal(s_pal, tx, ty)
    np.testing.assert_allclose(np.asarray(s_pal.params.wx),
                               np.asarray(s_ref.params.wx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_pal.params.wh),
                               np.asarray(s_ref.params.wh), atol=1e-4)


def test_auto_pallas_sweep_resolution(monkeypatch):
    """'auto' resolves per backend/shape: gs kernel on TPU at
    T >= 16 and H <= 128 only; never for jacobi; forced flags win."""
    from admm_lstm_tpu.core import step as S
    gs_auto = S.rules_for(ADMMConfig())
    jac_auto = S.rules_for(ADMMConfig(sweep_mode='jacobi'))

    # On the CPU test backend 'auto' is always off.
    assert S._sweep_uses_pallas(gs_auto, 256, 16) is False

    monkeypatch.setattr(S.jax, 'default_backend', lambda: 'tpu')
    assert S._sweep_uses_pallas(gs_auto, 16, 16) is True
    assert S._sweep_uses_pallas(gs_auto, 15, 16) is False      # below T floor
    assert S._sweep_uses_pallas(gs_auto, 256, 129) is False    # H too large
    assert S._sweep_uses_pallas(jac_auto, 256, 16) is False    # jacobi never
    forced_on = S.rules_for(ADMMConfig(sweep_mode='jacobi',
                                       use_pallas_sweep=True))
    forced_off = S.rules_for(ADMMConfig(use_pallas_sweep=False))
    assert S._sweep_uses_pallas(forced_on, 4, 5) is True
    assert S._sweep_uses_pallas(forced_off, 1024, 16) is False
