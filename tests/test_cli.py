"""CLI and plotting smoke tests (headless)."""

import os

import numpy as np
import pytest


def test_cli_synthetic_end_to_end(tmp_path, monkeypatch):
    from admm_lstm_tpu import cli
    monkeypatch.chdir(tmp_path)
    rc = cli.main(['-d', 'Synthetic', '-e', '2', '--hidden', '4', '-y',
                   '--no-plot'])
    assert rc == 0


def test_cli_auto_preset(tmp_path, monkeypatch):
    """--auto (turbo + adapt-then-freeze) and the guards run end to end."""
    from admm_lstm_tpu import cli
    monkeypatch.chdir(tmp_path)
    rc = cli.main(['-d', 'Synthetic', '-e', '3', '--hidden', '4', '-y',
                   '--auto', '--track_best', '--stop_divergence', '50',
                   '--no-plot'])
    assert rc == 0


def test_cli_admm_l_variant(tmp_path, monkeypatch):
    from admm_lstm_tpu import cli
    monkeypatch.chdir(tmp_path)
    rc = cli.main(['-d', 'Synthetic', '-e', '1', '--hidden', '3', '-y',
                   '--variant', 'admm_l', '--no-plot'])
    assert rc == 0


def test_cli_rejects_bad_dataset(tmp_path, monkeypatch):
    from admm_lstm_tpu import cli
    monkeypatch.chdir(tmp_path)
    rc = cli.main(['-d', 'NoSuchDataset', '-y', '--no-plot'])
    assert rc != 0


def test_cli_save_model(tmp_path, monkeypatch):
    from admm_lstm_tpu import cli
    monkeypatch.chdir(tmp_path)
    rc = cli.main(['-d', 'Synthetic', '-e', '1', '--hidden', '3', '-y',
                   '--save', '--no-plot'])
    assert rc == 0
    assert os.path.isfile(tmp_path / 'SAVED_MODELS' / 'Fast ADMM-LSTM.npz')


def test_plotting_outputs(tmp_path):
    from admm_lstm_tpu.utils.plotting import (LossCurvePlotter,
                                              plot_comparison,
                                              plot_predictions)
    plotter = LossCurvePlotter(title='T', save_dir=str(tmp_path),
                               constant_dicts=({'wy': 1e-7}, {'c': 0.01}))
    for e in range(5):
        plotter.update(e, 1.0 / (e + 1))
    p1 = plotter.plot(save_name='loss')
    assert p1 and os.path.isfile(p1)
    # dedup: second save gets a suffixed name
    p2 = plotter.plot(save_name='loss')
    assert p2 != p1 and os.path.isfile(p2)

    fake = [{'name': 'A', 'train_loss': [1, .5, .2], 'val_loss': [1, .6, .3]},
            {'name': 'B', 'train_loss': [1, .4, .1], 'val_loss': [1, .5, .2]}]
    paths = plot_comparison(fake, 2, save_dir=str(tmp_path))
    assert all(os.path.isfile(p) for p in paths)

    p3 = plot_predictions({'m': np.ones(10)}, np.zeros(10),
                          save_dir=str(tmp_path))
    assert os.path.isfile(p3)


def test_matlab_export(tmp_path):
    import scipy.io as sio
    from admm_lstm_tpu.comparison import export_matlab
    fake = [{'name': 'Fast ADMM-LSTM', 'val_loss': [1.0, 0.5]},
            {'name': 'ADMM-LSTM-L', 'val_loss': [1.0, 0.6]}]
    path = export_matlab(fake, save_dir=str(tmp_path))
    data = sio.loadmat(path)
    assert 'FastADMMLSTM' in data and 'ADMMLSTML' in data
    np.testing.assert_allclose(data['FastADMMLSTM'].ravel(), [1.0, 0.5])


def test_visualize_roundtrip(tmp_path, monkeypatch):
    import jax
    from admm_lstm_tpu import visualize
    from admm_lstm_tpu.ckpt import save_model
    from admm_lstm_tpu.models.lstm import init_lstm_params
    monkeypatch.chdir(tmp_path)
    params = init_lstm_params(jax.random.PRNGKey(0), 1, 4, 1)
    save_model('model-a', params, save_dir='SAVED_MODELS')
    save_model('model-b', params, save_dir='SAVED_MODELS')
    models = visualize.load_models('SAVED_MODELS')
    assert set(models) == {'model-a', 'model-b'}
    x = np.zeros((6, 5, 1), np.float32)
    preds = visualize.predict_all(models, x)
    assert preds['model-a'].shape == (6, 1)
    path = visualize.plot_all(preds, np.zeros((6, 1)))
    assert os.path.isfile(path)


def test_cli_stacked_two_layers(tmp_path, monkeypatch):
    from admm_lstm_tpu import cli
    monkeypatch.chdir(tmp_path)
    rc = cli.main(['-d', 'Synthetic', '-e', '2', '--hidden', '4',
                   '--layers', '2', '--hidden2', '3', '-y', '--no-plot'])
    assert rc == 0


def test_cli_har_parity_path_with_data_dir(tmp_path, monkeypatch):
    """The one-command HAR parity path (round-4 VERDICT #7): the moment
    the raw files exist, `--data_dir <dir>` trains end to end.  Smoke
    against synthesized stand-in files with the real layout."""
    from admm_lstm_tpu import cli

    data = tmp_path / 'har'
    data.mkdir()
    rng = np.random.default_rng(0)
    labels = [1] * 12 + [2] * 15 + [1] * 11
    n = len(labels)
    feats = rng.standard_normal((n, 561))
    for split in ('train', 'test'):
        np.savetxt(data / f'X_{split}.txt', feats, fmt='%.6e')
        np.savetxt(data / f'y_{split}.txt', np.asarray(labels), fmt='%d')
    monkeypatch.chdir(tmp_path)
    rc = cli.main(['-d', 'HAR', '--data_dir', str(data), '-e', '2',
                   '--hidden', '4', '-y', '--no-plot'])
    assert rc == 0


def test_cli_gefcom_parity_path_with_data_dir(tmp_path, monkeypatch):
    """Same for GEFCOM2012 Load: --data_dir pointed at a directory with
    Load/Load_history.csv trains end to end (synthesized stand-in)."""
    from admm_lstm_tpu import cli

    data = tmp_path / 'gefcom'
    (data / 'Load').mkdir(parents=True)
    rng = np.random.default_rng(0)
    n_days = 34
    with open(data / 'Load' / 'Load_history.csv', 'w') as f:
        f.write(','.join(['zone_id', 'year', 'month', 'day']
                         + [f'h{i}' for i in range(1, 25)]) + '\n')
        for d in range(n_days):
            vals = (1000 + 500 * rng.random(24)).round(1)
            f.write(','.join(['1', '2004', '1', str(d + 1)]
                             + [str(v) for v in vals]) + '\n')
    monkeypatch.chdir(tmp_path)
    rc = cli.main(['-d', 'GEFCOM2012', '--data_dir', str(data), '-e', '2',
                   '--hidden', '4', '-y', '--no-plot'])
    assert rc == 0


def test_cli_data_dir_rejected_for_bundled_dataset(tmp_path, monkeypatch):
    from admm_lstm_tpu import cli
    monkeypatch.chdir(tmp_path)
    rc = cli.main(['-d', 'Synthetic', '--data_dir', str(tmp_path), '-y',
                   '--no-plot'])
    assert rc != 0
