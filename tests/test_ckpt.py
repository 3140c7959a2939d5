"""Checkpoint/resume tests: orbax round-trip and exact trajectory resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admm_lstm_tpu import ADMMConfig
from admm_lstm_tpu.ckpt import CheckpointManager, load_model, save_model
from admm_lstm_tpu.core.init import init_admm_state
from admm_lstm_tpu.core.step import make_admm_step
from admm_lstm_tpu.data.synthetic import load as synth
from admm_lstm_tpu.models.lstm import init_lstm_params
from admm_lstm_tpu.params import parameter_set


@pytest.fixture(scope='module')
def setup():
    tx, ty, _, _ = synth(batch=32, seq_len=5, input_size=2, output_size=1)
    tx, ty = jnp.asarray(tx), jnp.asarray(ty)
    params = init_lstm_params(jax.random.PRNGKey(3), 2, 4, 1)
    cfg = ADMMConfig()
    state = init_admm_state(params, tx, parameter_set('Synthetic'), cfg)
    return tx, ty, cfg, state


def test_model_npz_roundtrip(tmp_path, setup):
    _, _, _, state = setup
    path = save_model('test-model', state.params, save_dir=str(tmp_path))
    loaded = load_model(path)
    np.testing.assert_array_equal(np.asarray(loaded.wx),
                                  np.asarray(state.params.wx))
    np.testing.assert_array_equal(np.asarray(loaded.wy),
                                  np.asarray(state.params.wy))


def test_checkpoint_resume_exact_trajectory(tmp_path, setup):
    tx, ty, cfg, state0 = setup
    step = make_admm_step(cfg, donate=False)

    # Run 6 epochs straight through.
    state_a = state0
    for _ in range(6):
        state_a = step(state_a, tx, ty)

    # Run 3 epochs, checkpoint, restore, run 3 more.
    mgr = CheckpointManager(str(tmp_path / 'ckpt'))
    state_b = state0
    for _ in range(3):
        state_b = step(state_b, tx, ty)
    mgr.save(state_b)
    assert mgr.latest_step() == 3

    restored = mgr.restore(jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state_b))
    for _ in range(3):
        restored = step(restored, tx, ty)
    mgr.close()

    assert int(restored.epoch) == 6
    np.testing.assert_allclose(np.asarray(restored.params.wy),
                               np.asarray(state_a.params.wy), atol=1e-7)
    np.testing.assert_allclose(np.asarray(restored.gates.c),
                               np.asarray(state_a.gates.c), atol=1e-7)
    np.testing.assert_allclose(np.asarray(restored.duals.c),
                               np.asarray(state_a.duals.c), atol=1e-7)


def test_train_resume_from_matches_straight_run(tmp_path, setup):
    """api.train(resume_from=...) continues the exact trajectory."""
    from admm_lstm_tpu.api import train
    tx, ty, _, _ = setup
    vx, vy = tx[:8], ty[:8]
    ps = parameter_set('Synthetic')

    full = train(tx, ty, vx, vy, ps, ADMMConfig(epochs=6), log_every=0)

    ckpt_dir = str(tmp_path / 'resume_ckpt')
    train(tx, ty, vx, vy, ps, ADMMConfig(epochs=3), log_every=0,
          checkpoint_dir=ckpt_dir, checkpoint_every=3)
    resumed = train(tx, ty, vx, vy, ps, ADMMConfig(epochs=6), log_every=0,
                    resume_from=ckpt_dir)

    assert int(resumed['state'].epoch) == 6
    # Resumed run trains epochs 4..6 only and ends at the same weights.
    assert len(resumed['train_loss']) == 4  # initial-at-resume + 3 epochs
    np.testing.assert_allclose(np.asarray(resumed['params'].wy),
                               np.asarray(full['params'].wy), atol=1e-7)
    np.testing.assert_allclose(resumed['train_loss'][-1],
                               full['train_loss'][-1], atol=1e-7)


def test_async_checkpoint_saves_and_restores(tmp_path, setup):
    tx, ty, cfg, state0 = setup
    step = make_admm_step(cfg, donate=False)
    mgr = CheckpointManager(str(tmp_path / 'async_ckpt'), async_save=True)
    state = step(state0, tx, ty)
    mgr.save(state)
    mgr.wait()
    assert mgr.latest_step() == 1
    restored = mgr.restore(jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state))
    mgr.close()
    np.testing.assert_array_equal(np.asarray(restored.params.wy),
                                  np.asarray(state.params.wy))


def test_stacked_model_npz_roundtrip(tmp_path):
    """StackedParams save/load (the CLI's --layers N --save path)."""
    from admm_lstm_tpu.ckpt import load_model, save_model
    from admm_lstm_tpu.variants.stacked import (init_stacked,
                                                stacked_forward)
    params = init_stacked(jax.random.PRNGKey(2), 3, (5, 4), 2)
    path = save_model('stacked-test', params, save_dir=str(tmp_path))
    loaded = load_model(path)
    assert len(loaded.layers) == 2
    np.testing.assert_array_equal(np.asarray(loaded.layers[1].wx),
                                  np.asarray(params.layers[1].wx))
    np.testing.assert_array_equal(np.asarray(loaded.wy),
                                  np.asarray(params.wy))
    x = np.random.default_rng(0).standard_normal((6, 4, 3)).astype('float32')
    np.testing.assert_allclose(np.asarray(stacked_forward(loaded, x)),
                               np.asarray(stacked_forward(params, x)),
                               atol=1e-6)
