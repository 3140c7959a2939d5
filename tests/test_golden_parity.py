"""Golden parity: the jitted step vs recorded reference trajectories.

Fixtures in tests/golden/ were produced by tools/make_golden.py driving the
REFERENCE implementation (torch eager, /root/reference/admm.py) with seed-0
weights; these tests assert the TPU-native step reproduces every state
tensor within float32 cross-backend tolerance, and the 30-epoch GoogleStock
loss trajectory within the reference's own optimality envelope.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from admm_lstm_tpu import ADMMConfig
from admm_lstm_tpu.core.init import init_admm_state
from admm_lstm_tpu.core.state import to_batch_major
from admm_lstm_tpu.core.step import make_admm_step
from admm_lstm_tpu.models.lstm import mse_loss, params_from_dict
from admm_lstm_tpu.params import parameter_set

GOLDEN = os.path.join(os.path.dirname(__file__), 'golden')

STATE_ATOL = 2e-4   # f32, torch-eager vs XLA, 3 steps of accumulation
VARIANTS = [
    ('fast', dict(variant='fast')),
    ('fast_wide', dict(variant='fast')),   # H=64, I=9 instance
    ('fast_dual_y', dict(variant='fast', with_dual_y=True)),
    ('no_dual_y', dict(variant='no_dual_y')),
]


def _load(name):
    path = os.path.join(GOLDEN, name)
    if not os.path.isfile(path):
        pytest.skip(f'golden fixture {name} missing (run tools/make_golden.py)')
    return np.load(path)


@pytest.mark.parametrize('variant,cfgkw', VARIANTS)
def test_three_step_full_state_parity(variant, cfgkw):
    g = _load(f'small_{variant}_3steps.npz')
    x, y = jnp.asarray(g['x']), jnp.asarray(g['y'])
    params = params_from_dict({k[3:]: g[k] for k in g.files
                               if k.startswith('w0_')})
    cfg = ADMMConfig(**cfgkw)
    state = init_admm_state(params, x, parameter_set('Synthetic'), cfg)

    for k in ('i', 'f', 'g', 'o', 'c', 'h'):
        np.testing.assert_allclose(
            np.asarray(to_batch_major(getattr(state.gates, k))),
            g[f's0_gate_{k}'], atol=1e-4, err_msg=f'init gate {k}')

    step = make_admm_step(cfg, donate=False)
    for s in (1, 2, 3):
        state = step(state, x, y)
        for k in ('i', 'f', 'g', 'o', 'c', 'h'):
            np.testing.assert_allclose(
                np.asarray(to_batch_major(getattr(state.gates, k))),
                g[f's{s}_gate_{k}'], atol=STATE_ATOL,
                err_msg=f'{variant} step {s} gate {k}')
            np.testing.assert_allclose(
                np.asarray(to_batch_major(getattr(state.duals, k))),
                g[f's{s}_dual_{k}'], atol=STATE_ATOL,
                err_msg=f'{variant} step {s} dual {k}')
        # a / dual y are stored out-minor (O, B); goldens are (B, O).
        np.testing.assert_allclose(np.asarray(state.gates.a).T,
                                   g[f's{s}_gate_a'], atol=STATE_ATOL)
        np.testing.assert_allclose(np.asarray(state.duals.y).T,
                                   g[f's{s}_dual_y'], atol=STATE_ATOL)
        for gi, gate in enumerate(('i', 'f', 'g', 'o')):
            np.testing.assert_allclose(np.asarray(state.params.wx[gi]),
                                       g[f'w{s}_x2{gate}'], atol=STATE_ATOL)
            np.testing.assert_allclose(np.asarray(state.params.wh[gi]),
                                       g[f'w{s}_h2{gate}'], atol=STATE_ATOL)
        np.testing.assert_allclose(np.asarray(state.params.wy), g[f'w{s}_wy'],
                                   atol=STATE_ATOL)


@pytest.mark.slow
def test_googlestock_loss_trajectory():
    g = _load('googlestock_fast.npz')
    x, y = jnp.asarray(g['train_x']), jnp.asarray(g['train_y'])
    vx, vy = jnp.asarray(g['test_x']), jnp.asarray(g['test_y'])
    params = params_from_dict({k[3:]: g[k] for k in g.files
                               if k.startswith('w0_')})
    cfg = ADMMConfig()
    state = init_admm_state(params, x, parameter_set('GoogleStock'), cfg)
    step = make_admm_step(cfg, donate=False)

    epochs = min(len(g['train_loss']) - 1, 30)
    train_losses = [float(mse_loss(state.params, x, y))]
    val_losses = [float(mse_loss(state.params, vx, vy))]
    for _ in range(epochs):
        state = step(state, x, y)
        train_losses.append(float(mse_loss(state.params, x, y)))
        val_losses.append(float(mse_loss(state.params, vx, vy)))

    np.testing.assert_allclose(train_losses, g['train_loss'][:epochs + 1],
                               rtol=0.05, atol=1e-4)
    np.testing.assert_allclose(val_losses, g['val_loss'][:epochs + 1],
                               rtol=0.05, atol=1e-4)
    # And the headline: final loss at least as good as the reference (5% slack).
    assert train_losses[-1] <= g['train_loss'][epochs] * 1.05


@pytest.mark.parametrize('dataset', ['yahoofinance', 'dna1'])
def test_dataset_loss_trajectory(dataset):
    """Fast-variant loss trajectories on YahooFinance / DNA1 vs the
    reference optimizer run with the same seed-0 weights."""
    from admm_lstm_tpu.data import load_dataset
    g = _load(f'{dataset}_fast.npz')
    name = {'yahoofinance': 'YahooFinance', 'dna1': 'DNA1'}[dataset]
    try:
        (tx, ty, vx, vy), ps, _ = load_dataset(name)
    except FileNotFoundError:
        pytest.skip(f'{name} data not present')
    x, y = jnp.asarray(tx), jnp.asarray(ty)
    vx, vy = jnp.asarray(vx), jnp.asarray(vy)
    params = params_from_dict({k[3:]: g[k] for k in g.files
                               if k.startswith('w0_')})
    cfg = ADMMConfig()
    state = init_admm_state(params, x, ps, cfg)
    step = make_admm_step(cfg, donate=False)
    epochs = len(g['train_loss']) - 1
    train_losses = [float(mse_loss(state.params, x, y))]
    val_losses = [float(mse_loss(state.params, vx, vy))]
    for _ in range(epochs):
        state = step(state, x, y)
        train_losses.append(float(mse_loss(state.params, x, y)))
        val_losses.append(float(mse_loss(state.params, vx, vy)))
    np.testing.assert_allclose(train_losses, g['train_loss'], rtol=0.05,
                               atol=1e-4)
    np.testing.assert_allclose(val_losses, g['val_loss'], rtol=0.05,
                               atol=1e-4)
