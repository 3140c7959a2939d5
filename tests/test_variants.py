"""Variant tests: ADMM-L / ADMM-S golden parity + gradient baselines."""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), 'golden')


def _load(name):
    path = os.path.join(GOLDEN, name)
    if not os.path.isfile(path):
        pytest.skip(f'golden fixture {name} missing')
    return np.load(path)


def test_admm_l_golden_trajectory():
    from admm_lstm_tpu.variants.admm_l import ADMMLRules, admm_l_demo
    g = _load('admm_l_small.npz')
    res = admm_l_demo(len(g['train_loss']) - 1, 4, g['x'], g['y'],
                      g['test_x'], g['test_y'], seed=0,
                      rules=ADMMLRules(a_batch_scale=4224),  # reference quirk
                      log_every=0)
    np.testing.assert_allclose(res['train_loss'], g['train_loss'],
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(res['val_loss'], g['val_loss'],
                               rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_admm_s_golden_trajectory_googlestock():
    from admm_lstm_tpu.data import load_dataset
    from admm_lstm_tpu.variants.admm_s import admm_s_demo
    g = _load('admm_s_googlestock.npz')
    try:
        (tx, ty, vx, vy), _, _ = load_dataset('GoogleStock')
    except FileNotFoundError:
        pytest.skip('GoogleStock data missing')
    epochs = len(g['train_loss']) - 1
    res = admm_s_demo(epochs, 10, tx, ty, vx, vy, seed=0, log_every=0)
    np.testing.assert_allclose(res['train_loss'], g['train_loss'],
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(res['val_loss'], g['val_loss'],
                               rtol=2e-4, atol=1e-6)


def test_admm_s_small_synthetic_runs():
    from admm_lstm_tpu.data.synthetic import load as synth
    from admm_lstm_tpu.variants.admm_s import admm_s_demo
    tx, ty, vx, vy = synth(batch=16, seq_len=4, input_size=1, output_size=1,
                           val_batch=8)
    res = admm_s_demo(3, 3, tx, ty, vx, vy, seed=0, log_every=0)
    assert all(np.isfinite(res['train_loss']))
    assert res['train_loss'][-1] < res['train_loss'][0]


def test_admm_s_seq_len_edge_cases():
    from admm_lstm_tpu.data.synthetic import load as synth
    from admm_lstm_tpu.variants.admm_s import admm_s_demo
    for T in (2, 3):
        tx, ty, vx, vy = synth(batch=8, seq_len=T, input_size=1,
                               output_size=1, val_batch=4)
        res = admm_s_demo(2, 3, tx, ty, vx, vy, seed=0, log_every=0)
        assert all(np.isfinite(res['train_loss'])), f'T={T}'


def test_grad_based_methods_reduce_loss():
    from admm_lstm_tpu.data.synthetic import load as synth
    from admm_lstm_tpu.variants.grad_based import train_grad_based
    tx, ty, vx, vy = synth(batch=64, seq_len=6, input_size=2, output_size=1)
    for method, lr in (('sgd', 0.3), ('adam', 0.05), ('adagrad', 0.3)):
        res = train_grad_based(method, tx, ty, vx, vy, epochs=20,
                               hidden_size=5, lr=lr)
        assert res['train_loss'][-1] < res['train_loss'][0], method
        assert len(res['train_loss']) == 21


def test_grad_based_gradient_recording():
    from admm_lstm_tpu.data.synthetic import load as synth
    from admm_lstm_tpu.variants.grad_based import train_grad_based
    tx, ty, vx, vy = synth(batch=16, seq_len=4, input_size=1, output_size=1)
    res = train_grad_based('sgd', tx, ty, vx, vy, epochs=3, hidden_size=3,
                           lr=0.1, record_gradients=True)
    assert len(res['gradients']['wx']) == 3
    assert all(v >= 0 for v in res['gradients']['wh'])


def test_comparison_harness_small():
    from admm_lstm_tpu.comparison import run_comparison
    from admm_lstm_tpu.data.synthetic import load as synth
    from admm_lstm_tpu.params import parameter_set
    tx, ty, vx, vy = synth(batch=32, seq_len=4, input_size=1, output_size=1)
    results = run_comparison(2, 4, tx, ty, vx, vy, parameter_set('Synthetic'),
                             include_admm_l=True, include_admm_s=True)
    names = [r['name'] for r in results]
    assert names == ['Fast ADMM-LSTM', 'ADMM-LSTM-L', 'ADMM-LSTM-S',
                     'SGD', 'Adam', 'Adagrad']
    for r in results:
        assert len(r['train_loss']) == 3
        assert all(np.isfinite(r['train_loss']))
