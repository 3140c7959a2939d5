"""Tests for the stacked 2-layer ADMM variant (new capability, not in the
reference — the build plan's stretch config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admm_lstm_tpu import ADMMConfig
from admm_lstm_tpu.data.synthetic import load as synth
from admm_lstm_tpu.params import parameter_set
from admm_lstm_tpu.variants.stacked import (init_stacked_params,
                                            init_stacked_state,
                                            make_stacked_step,
                                            stacked_forward,
                                            stacked_mse_loss)


@pytest.fixture(scope='module')
def problem():
    tx, ty, vx, vy = synth(batch=48, seq_len=6, input_size=2, output_size=1,
                           val_batch=8)
    params = init_stacked_params(jax.random.PRNGKey(0), 2, 6, 5, 1)
    return tuple(jnp.asarray(a) for a in (tx, ty, vx, vy)), params


def test_stacked_forward_shapes(problem):
    (tx, _, _, _), params = problem
    out = stacked_forward(params, tx)
    assert out.shape == (48, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_stacked_state_seeding(problem):
    (tx, ty, _, _), params = problem
    state = init_stacked_state(params, tx, parameter_set('Stacked'),
                               ADMMConfig())
    # The seeded output auxiliary equals the forward prediction.
    np.testing.assert_allclose(np.asarray(state.gates2.a),
                               np.asarray(stacked_forward(params, tx)),
                               atol=1e-5)
    # Row 0 of all slabs is the zero initial state.
    assert np.all(np.asarray(state.gates1.h)[0] == 0.0)
    assert np.all(np.asarray(state.gates2.c)[0] == 0.0)


def test_stacked_admm_converges(problem):
    (tx, ty, _, _), params = problem
    cfg = ADMMConfig()
    state = init_stacked_state(params, tx, parameter_set('Stacked'), cfg)
    step = make_stacked_step(cfg, donate=False)
    l0 = float(stacked_mse_loss(state.params, tx, ty))
    for _ in range(100):
        state = step(state, tx, ty)
    l1 = float(stacked_mse_loss(state.params, tx, ty))
    assert np.isfinite(l1)
    assert l1 < l0, (l0, l1)
    assert int(state.epoch) == 100


def test_stacked_grad_baseline(problem):
    """The same 2-layer model trains with plain BPTT via optax (sanity
    anchor for the architecture)."""
    import optax
    (tx, ty, _, _), params = problem

    opt = optax.adam(0.02)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(stacked_mse_loss)(params, tx, ty)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    p = params
    losses = []
    for _ in range(60):
        p, opt_state, loss = step(p, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5
