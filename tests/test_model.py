"""LSTM-Linear model tests: scan forward vs history forward vs numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admm_lstm_tpu.models.lstm import (GATE_ORDER, LSTMParams, init_lstm_params,
                                       lstm_forward, lstm_forward_with_history,
                                       mse_loss, params_from_dict)


def _numpy_forward(params: LSTMParams, x: np.ndarray):
    """Independent eager-numpy oracle of the reference recurrence
    (blocks/lstm.py:48-63)."""
    wx, wh, wy = map(np.asarray, (params.wx, params.wh, params.wy))
    B, T, _ = x.shape
    H = wh.shape[1]
    h = np.zeros((B, H), np.float32)
    c = np.zeros((B, H), np.float32)

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    hist = {k: [np.zeros((B, H), np.float32)] for k in 'ifgoch'}
    for t in range(T):
        pre = x[:, t] @ wx + h @ wh  # (4?, no) -> wx (4,I,H): do per gate
        i = sig(x[:, t] @ wx[0] + h @ wh[0])
        f = sig(x[:, t] @ wx[1] + h @ wh[1])
        g = np.tanh(x[:, t] @ wx[2] + h @ wh[2])
        o = sig(x[:, t] @ wx[3] + h @ wh[3])
        c = f * c + i * g
        h = o * np.tanh(c)
        for k, v in zip('ifgoch', (i, f, g, o, c, h)):
            hist[k].append(v)
    return h @ wy, {k: np.stack(v) for k, v in hist.items()}


@pytest.fixture(scope='module')
def setup():
    key = jax.random.PRNGKey(42)
    kx, kp = jax.random.split(key)
    x = jax.random.normal(kx, (9, 6, 3), jnp.float32)
    params = init_lstm_params(kp, 3, 5, 2)
    return params, x


def test_forward_matches_numpy_oracle(setup):
    params, x = setup
    expected, _ = _numpy_forward(params, np.asarray(x))
    got = np.asarray(lstm_forward(params, x))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_history_matches_numpy_oracle(setup):
    params, x = setup
    a_ref, hist_ref = _numpy_forward(params, np.asarray(x))
    hist = lstm_forward_with_history(params, x)
    for k in 'ifgoch':
        np.testing.assert_allclose(np.asarray(hist[k]),
                                   np.transpose(hist_ref[k], (0, 1, 2)),
                                   atol=1e-5, err_msg=k)
    np.testing.assert_allclose(np.asarray(hist['a']), a_ref, atol=1e-5)


def test_forward_agrees_with_history_a(setup):
    params, x = setup
    a1 = lstm_forward(params, x)
    a2 = lstm_forward_with_history(params, x)['a']
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)


def test_history_row0_is_zero(setup):
    params, x = setup
    hist = lstm_forward_with_history(params, x)
    for k in 'ifgoch':
        assert np.all(np.asarray(hist[k])[0] == 0.0), k


def test_params_from_dict_roundtrip(setup):
    params, _ = setup
    d = {}
    for gi, g in enumerate(GATE_ORDER):
        d[f'x2{g}'] = np.asarray(params.wx[gi])
        d[f'h2{g}'] = np.asarray(params.wh[gi])
    d['out'] = np.asarray(params.wy)  # reference naming
    rebuilt = params_from_dict(d)
    np.testing.assert_array_equal(np.asarray(rebuilt.wx), np.asarray(params.wx))
    np.testing.assert_array_equal(np.asarray(rebuilt.wy), np.asarray(params.wy))


def test_xavier_init_statistics():
    params = init_lstm_params(jax.random.PRNGKey(0), 128, 256, 64)
    std = float(jnp.std(params.wh))
    expected = np.sqrt(2.0 / (256 + 256))
    assert abs(std - expected) / expected < 0.1


def test_mse_loss_jit_grad():
    params = init_lstm_params(jax.random.PRNGKey(1), 2, 4, 1)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 5, 2))
    y = jax.random.normal(jax.random.PRNGKey(3), (8, 1))
    loss, grads = jax.jit(jax.value_and_grad(mse_loss))(params, x, y)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in grads)


def test_train_val_mse_fused_matches_separate():
    """The fused train+val metric forward (one scan over the
    concatenated batch) must match two separate mse_loss_im calls
    BITWISE: the forward contracts over I/H, never over B, so per-column
    values are independent of which other columns ride along."""
    from admm_lstm_tpu.models.lstm import mse_loss_im, train_val_mse_im
    params = init_lstm_params(jax.random.PRNGKey(4), 3, 6, 2)
    kx, kv, ky, kw = jax.random.split(jax.random.PRNGKey(5), 4)
    x_im = jax.random.normal(kx, (7, 3, 24))     # (T, I, B)
    vx_im = jax.random.normal(kv, (7, 3, 9))     # (T, I, Bv)
    y_im = jax.random.normal(ky, (2, 24))        # (O, B)
    vy_im = jax.random.normal(kw, (2, 9))
    sep_train = mse_loss_im(params, x_im, y_im)
    sep_val = mse_loss_im(params, vx_im, vy_im)
    xall = jnp.concatenate([x_im, vx_im], axis=-1)
    fused_train, fused_val = train_val_mse_im(params, xall, y_im, vy_im)
    np.testing.assert_array_equal(np.asarray(fused_train),
                                  np.asarray(sep_train))
    np.testing.assert_array_equal(np.asarray(fused_val),
                                  np.asarray(sep_val))
