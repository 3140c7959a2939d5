"""Data layer tests: native XLS reader and dataset loader shapes/semantics."""

import os

import numpy as np
import pytest

from admm_lstm_tpu.data import load_dataset
from admm_lstm_tpu.data.xls import open_workbook

GOOG = '/root/reference/datasets/GoogleStock/GOOG.xls'
needs_goog = pytest.mark.skipif(not os.path.isfile(GOOG),
                                reason='bundled GOOG.xls not present')


@needs_goog
def test_xls_reader_known_cells():
    sheet = open_workbook(GOOG).sheet_by_index(0)
    assert sheet.nrows == 4706
    # Header strings via the shared-string table.
    assert sheet.cell_value(0, 4) == 'Close'
    assert sheet.cell_value(0, 5) == 'Adj Close'
    # First data row: GOOG IPO-era prices (column 4 = Close, 5 = Adj Close).
    assert sheet.cell_value(1, 4) == pytest.approx(2.499133, abs=1e-6)
    assert sheet.cell_value(1, 5) == pytest.approx(2.499133, abs=1e-6)
    assert sheet.cell_value(4705, 4) == pytest.approx(108.370003, abs=1e-5)


@needs_goog
def test_google_stock_shapes_and_normalization():
    # Reference shapes: dataset.py:425-440.
    (tx, ty, vx, vy), ps, title = load_dataset('GoogleStock')
    assert tx.shape == (4224, 10, 1) and ty.shape == (4224, 1)
    assert vx.shape == (461, 10, 1) and vy.shape == (461, 1)
    assert tx.dtype == np.float32
    assert 0.0 < tx.max() <= 1.0 and 0.0 < ty.max() <= 1.0
    assert ps.rho['c'] == pytest.approx(0.008)
    # Window w for sample k is the series positions [k, k+10); target row k+10:
    # consecutive samples overlap by 9 elements.
    np.testing.assert_allclose(tx[1, :9, 0], tx[0, 1:, 0])


def test_google_stock_num_train_clip():
    if not os.path.isfile(GOOG):
        pytest.skip('GOOG.xls not present')
    (tx, ty, vx, vy), _, _ = load_dataset('GoogleStock', num_train=100, num_val=7)
    assert tx.shape[0] == 100 and vy.shape[0] == 7


def test_yahoo_finance_cached_shapes():
    try:
        (tx, ty, vx, vy), ps, _ = load_dataset('YahooFinance')
    except FileNotFoundError:
        pytest.skip('YahooFinance cache not present')
    # Reference cache shapes (dataset.py:466-492, verified in SURVEY).
    assert tx.shape == (1360, 60, 1) and vx.shape == (340, 60, 1)
    assert ps.beta['wy'] == pytest.approx(1e-8)


def test_dna1_shapes_and_onehot():
    try:
        (tx, ty, vx, vy), _, _ = load_dataset('DNA1')
    except FileNotFoundError:
        pytest.skip('promoters.data not present')
    # 106 sequences, 4:1 split (dataset.py:919-971).
    assert tx.shape == (85, 57, 4) and vx.shape == (21, 57, 4)
    np.testing.assert_allclose(tx.sum(-1), 1.0)  # one-hot rows
    assert set(np.unique(ty)) <= {0.0, 1.0}


def test_synthetic_deterministic():
    (a, _, _, _), _, _ = load_dataset('Synthetic', batch=64)
    (b, _, _, _), _, _ = load_dataset('Synthetic', batch=64)
    np.testing.assert_array_equal(a, b)


def test_har_missing_data_message():
    from admm_lstm_tpu.data import har
    if os.path.isfile('datasets/HAR/X_train.txt'):
        pytest.skip('HAR data present')
    with pytest.raises(FileNotFoundError, match='HAR'):
        har.load()


def test_gefcom_missing_data_message():
    from admm_lstm_tpu.data import gefcom2012
    if os.path.isfile('/root/reference/datasets/GEFCOM2012_Data/Load/Load_history.csv'):
        pytest.skip('GEFCOM2012 load history present')
    with pytest.raises(FileNotFoundError, match='GEFCOM2012'):
        gefcom2012.load()


def test_gefcom_windowing_from_synthetic_csv(tmp_path):
    """Validate the GEFCOM2012 loader semantics on a synthesized
    Load_history.csv (the real file is a large blob absent from the
    mount): 24 windows per day, each 24 long, crossing into the next day,
    target = next-day value at the window's start hour, max-normalized."""
    import csv as csv_mod
    from admm_lstm_tpu.data import gefcom2012

    load_dir = tmp_path / 'Load'
    load_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    n_days = 8
    data = np.round(rng.uniform(100, 1000, size=(n_days, 24)), 1)
    with open(load_dir / 'Load_history.csv', 'w', newline='') as f:
        writer = csv_mod.writer(f)
        writer.writerow(['zone_id', 'year', 'month', 'day']
                        + [f'h{i}' for i in range(1, 25)])
        for day in range(n_days):
            writer.writerow([1, 2004, 1, day + 1]
                            + [f'{v:.1f}' for v in data[day]])

    tx, ty, vx, vy = gefcom2012.load(str(tmp_path), train_days=(1, 3),
                                     val_days=(4, 6))
    # day2 - day1 = 2 window-days x 24 start hours (the reference also
    # yields day2-day1 days, dataset.py:247-249).
    assert tx.shape == (2 * 24, 24, 1) and ty.shape == (48, 1)
    # First window of day 1 = hours 0..23 of day 1 normalized by the max
    # over the parsed range (days 1..day2+2 rows).
    maximum = data[0:5].max()
    np.testing.assert_allclose(tx[0, :, 0], data[0] / maximum, rtol=1e-5)
    np.testing.assert_allclose(ty[0, 0], data[1, 0] / maximum, rtol=1e-5)
    # Window at start hour 5 spans day1[5:] + day2[:5].
    expected = np.concatenate([data[0, 5:], data[1, :5]]) / maximum
    np.testing.assert_allclose(tx[5, :, 0], expected, rtol=1e-5)


def test_har_segmentation_from_synthetic_files(tmp_path):
    """Validate the HAR loader on synthesized files: per-activity constant
    runs resampled to a fixed window via linspace (dataset.py:693-721)."""
    from admm_lstm_tpu.data import har

    # Three segments: 12x act1, 5x act2 (dropped: < window), 20x act3.
    labels = [1] * 12 + [2] * 5 + [3] * 20
    n = len(labels)
    feats = np.arange(n * 4, dtype=np.float64).reshape(n, 4) / 10.0
    for split in ('train', 'test'):
        np.savetxt(tmp_path / f'X_{split}.txt', feats, fmt='%.6e')
        np.savetxt(tmp_path / f'y_{split}.txt', np.asarray(labels), fmt='%d')

    tx, ty, vx, vy = har.load(str(tmp_path), minimal_window=10)
    assert tx.shape == (2, 10, 4)          # the 5-long segment is dropped
    assert ty.shape[0] == 2 and ty.shape[1] == 4  # classes 0..3 one-hot
    np.testing.assert_allclose(ty[0], np.eye(4)[1])
    np.testing.assert_allclose(ty[1], np.eye(4)[3])
    # First segment: rows linspace(0, 11, 10) of the features.
    idx = np.linspace(0, 11, 10).astype(int)
    np.testing.assert_allclose(tx[0], feats[idx], rtol=1e-5)


def test_sms_spam_loader():
    """Working SMSSpam loader (the reference ships the raw data but only a
    dead stub, dataset.py:974-983)."""
    from admm_lstm_tpu.data.sms_spam import load
    tx, ty, vx, vy = load()
    assert tx.ndim == 3 and tx.shape[2] == 95 and tx.shape[1] <= 25
    assert ty.shape == (tx.shape[0], 2) and vy.shape == (vx.shape[0], 2)
    # 4:1 split of the kept messages.
    total = tx.shape[0] + vx.shape[0]
    assert abs(tx.shape[0] - round(total * 0.8)) <= 1
    # One-hot rows: each timestep has at most one active character.
    assert float(tx.max()) == 1.0 and set(np.unique(ty)) <= {0.0, 1.0}
    assert (tx.sum(axis=2) <= 1.0 + 1e-6).all()
    # Clipping hooks.
    sx, sy, svx, svy = load(num_train=32, num_val=8)
    assert sx.shape[0] == 32 and svx.shape[0] == 8


def test_gefcom_wind_loader():
    """GEFCOM2012 Wind track: real data the reference bundles but never
    loads (its GEFCOM class reads only the absent Load_history.csv)."""
    from admm_lstm_tpu.data.gefcom_wind import load, load_scenarios
    tx, ty, vx, vy = load(num_train=100, num_val=50, farm=3)
    assert tx.shape == (100, 24, 1) and ty.shape == (100, 1)
    assert vx.shape == (50, 24, 1)
    assert 0.0 <= float(tx.min()) and float(tx.max()) <= 1.0
    # Chronological split: no validation window may predate the last
    # training window (leakage-free by construction).
    full = load(farm=3)
    assert full[0].shape[0] + full[2].shape[0] == 13176 - 24
    xs, ys, vxs, vys = load_scenarios(num_train=64, num_val=16)
    assert xs.shape == (7, 64, 24, 1) and vys.shape == (7, 16, 1)
    import pytest
    with pytest.raises(ValueError):
        load(farm=8)
