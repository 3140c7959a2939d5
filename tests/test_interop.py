"""Interop with the reference's shipped artifacts: cached ADMM-S
trajectories (both on-disk formats) and converted saved models."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get('ADMM_REFERENCE_PATH', '/root/reference')


def test_parse_results_py_format(tmp_path):
    from admm_lstm_tpu.data.admm_s_cache import load_admm_s_cache
    p = tmp_path / 'results.py'
    p.write_text('# recorded\nadmm_s_loss = {\n  "name": "ADMM-LSTM-S",\n'
                 '  "train_loss": [5.0, 3.0, 1.0],\n'
                 '  "val_loss": [4.5, 3.2, 1.2],\n}\n')
    out = load_admm_s_cache(str(p))
    assert out['name'] == 'ADMM-LSTM-S'
    assert out['train_loss'] == [5.0, 3.0, 1.0]
    assert out['val_loss'] == [4.5, 3.2, 1.2]


def test_parse_pair_format(tmp_path):
    from admm_lstm_tpu.data.admm_s_cache import load_admm_s_cache
    p = tmp_path / 'ADMM-LSTM.Synthetic'
    p.write_text('5.0 4.5\n3.0 3.2\n\n1.0 1.2\n')
    out = load_admm_s_cache(str(p))
    assert out['train_loss'] == [5.0, 3.0, 1.0]
    assert out['val_loss'] == [4.5, 3.2, 1.2]
    with pytest.raises(ValueError):
        bad = tmp_path / 'bad'
        bad.write_text('1.0 2.0 3.0\n')
        load_admm_s_cache(str(bad))


@pytest.mark.skipif(
    not os.path.isfile(os.path.join(
        REFERENCE, 'comparison_experiment', 'admm_s',
        'ADMM-LSTM.GEFCOM2012')),
    reason='reference mount absent')
def test_shipped_gefcom_oracle_loads():
    """The one published numeric trajectory in the whole reference
    (101 GEFCOM2012 rows) parses and agrees with its results.py twin."""
    from admm_lstm_tpu.data.admm_s_cache import load_admm_s_cache
    base = os.path.join(REFERENCE, 'comparison_experiment', 'admm_s')
    pairs = load_admm_s_cache(os.path.join(base, 'ADMM-LSTM.GEFCOM2012'))
    literal = load_admm_s_cache(os.path.join(base, 'results.py'))
    assert len(pairs['train_loss']) == 101
    np.testing.assert_allclose(pairs['train_loss'], literal['train_loss'],
                               rtol=1e-6)
    np.testing.assert_allclose(pairs['val_loss'], literal['val_loss'],
                               rtol=1e-6)
    assert pairs['train_loss'][0] == pytest.approx(5.0499, abs=1e-3)


def test_comparison_consumes_cache_path(tmp_path):
    from admm_lstm_tpu.comparison import run_comparison
    from admm_lstm_tpu.data.synthetic import load as synth
    from admm_lstm_tpu.params import parameter_set
    p = tmp_path / 'ADMM-LSTM.Synthetic'
    p.write_text('\n'.join(f'{5.0 / (i + 1)} {4.5 / (i + 1)}'
                           for i in range(11)) + '\n')
    tx, ty, vx, vy = synth(batch=32, seq_len=5, input_size=1, output_size=1)
    results = run_comparison(3, 4, tx, ty, vx, vy,
                             parameter_set('Synthetic'),
                             include_admm_l=False, admm_s_cached=str(p))
    names = [r['name'] for r in results]
    assert 'ADMM-LSTM-S' in names
    cached = results[names.index('ADMM-LSTM-S')]
    assert len(cached['train_loss']) == 4  # truncated to num_epochs + 1


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, 'SAVED_MODELS')),
    reason='reference mount absent')
@pytest.mark.slow
def test_convert_reference_models(tmp_path):
    """All five shipped .pt artifacts convert to loadable .npz params whose
    predictions are finite at the model's native shapes."""
    pytest.importorskip('torch')
    out_dir = str(tmp_path / 'converted')
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools',
                                      'convert_reference_models.py'),
         '--out', out_dir],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert 'Converted 5/5' in proc.stdout, proc.stdout[-2000:]

    import jax.numpy as jnp
    from admm_lstm_tpu.ckpt import load_model
    from admm_lstm_tpu.models.lstm import lstm_forward
    import glob
    files = sorted(glob.glob(os.path.join(out_dir, '*.npz')))
    assert len(files) == 5
    for f in files:
        params = load_model(f)
        x = jnp.zeros((3, 7, params.input_size), jnp.float32)
        pred = np.asarray(lstm_forward(params, x))
        assert pred.shape == (3, params.output_size)
        assert np.all(np.isfinite(pred))


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason='reference mount absent')
@pytest.mark.slow
def test_make_golden_smoke(tmp_path):
    """The golden-fixture generator must keep driving the reference in
    place (it is the source of every parity oracle): regenerate the
    small fast-variant golden into a scratch dir and check its schema
    matches the committed fixture."""
    env = dict(os.environ, JAX_PLATFORMS='cpu', JAX_PLATFORM_NAME='cpu')
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'make_golden.py'),
         '--steps', '1', '--skip-googlestock',
         '--workdir', str(tmp_path / 'refrun')],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stdout[-1500:] + proc.stderr[-1500:]
    # Outputs are step-count-suffixed, so the committed 3-step fixtures
    # are never clobbered; the regenerated 1-step files must carry the
    # same schema (initial weights w0_*, per-step states, data arrays).
    regen = {}
    try:
        for variant in ('small_fast', 'small_fast_dual_y',
                        'small_no_dual_y'):
            path = os.path.join(REPO, 'tests', 'golden',
                                f'{variant}_1steps.npz')
            assert os.path.isfile(path), variant
            data = np.load(path)
            regen[variant] = set(data.files)
            assert 'x' in data.files and 'y' in data.files
            assert any(k.startswith('w0_') for k in data.files)
            assert any(k.startswith('s1_') for k in data.files)
        committed = np.load(os.path.join(REPO, 'tests', 'golden',
                                         'small_fast_3steps.npz'))
        # Same schema family as the committed fixture (modulo step keys).
        base_keys = {k for k in committed.files if not k.startswith(
            ('s1_', 's2_', 's3_'))}
        assert base_keys <= regen['small_fast'] | {
            k for k in committed.files}
    finally:
        for variant in ('small_fast', 'small_fast_dual_y',
                        'small_no_dual_y'):
            path = os.path.join(REPO, 'tests', 'golden',
                                f'{variant}_1steps.npz')
            if os.path.isfile(path):
                os.remove(path)
