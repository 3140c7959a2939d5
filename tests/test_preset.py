"""train(preset='best') — the per-dataset quality recipe as one entry point.

Gate (round-4 VERDICT #5): on every bundled dataset the preset must end
at-or-below the shipped-tuning run's final validation loss, WITHOUT the
user knowing which regime the dataset is in.  The two regimes it must
navigate (docs/ROADMAP.md measured table):

* GoogleStock / DNA1: the shipped tuning is poor; auto() (residual-
  balancing warmup) wins by 27x / ~25% — the probe must commit to auto.
* YahooFinance: the shipped tuning is excellent but rebound-prone
  (0.00061@30 -> 0.239@100); auto() LOSES 67x — the probe must commit to
  shipped, and the best-iterate carry + divergence guard must return the
  pre-rebound minimum.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admm_lstm_tpu import ADMMConfig
from admm_lstm_tpu.api import train
from admm_lstm_tpu.data import load_dataset
from admm_lstm_tpu.params import parameter_set


@pytest.mark.parametrize('dataset,epochs', [
    ('GoogleStock', 30),
    ('YahooFinance', 30),
    ('DNA1', 30),
    ('SMSSpam', 40),   # THE rebound dataset — divergence-guard path
])
def test_preset_best_dominates_shipped(dataset, epochs):
    (tx, ty, vx, vy), _, _ = load_dataset(dataset)
    tx, ty, vx, vy = map(jnp.asarray, (tx, ty, vx, vy))
    ps = parameter_set(dataset)
    cfg = ADMMConfig(epochs=epochs)

    shipped = train(tx, ty, vx, vy, ps, config=cfg, log_every=0)
    shipped_final = shipped['val_loss'][-1]

    best = train(tx, ty, vx, vy, ps, config=cfg, log_every=0,
                 preset='best')
    best_val = min(best['val_loss'])

    assert np.isfinite(best_val)
    assert best_val <= shipped_final * 1.02, (
        f'{dataset}: preset best {best_val} vs shipped final '
        f'{shipped_final} (chose {best["preset_choice"]}, '
        f'probe {best["probe_val"]})')


def test_preset_best_with_search_budget():
    """The recipe's third leg: search_rounds>0 adds a refine_rho'd
    candidate; on DNA1 one round of search beats both the shipped
    tuning and auto() at the probe horizon and the committed run ends
    at-or-below the no-search preset."""
    from admm_lstm_tpu.api import train_best

    (tx, ty, vx, vy), _, _ = load_dataset('DNA1')
    tx, ty, vx, vy = map(jnp.asarray, (tx, ty, vx, vy))
    cfg = ADMMConfig(epochs=20)
    res = train_best(tx, ty, vx, vy, parameter_set('DNA1'), config=cfg,
                     probe_epochs=8, search_rounds=1, log_every=0)
    assert 'tuned' in res['probe_val']
    assert np.isfinite(min(res['val_loss']))
    assert min(res['val_loss']) <= res['probe_val']['shipped']


def test_preset_best_rejects_resume_from(tmp_path):
    """Advisor round-4: probes retrain from scratch and may commit to a
    different candidate than the checkpoint's dynamics — resuming under
    preset='best' must be an explicit error, not silent corruption."""
    from admm_lstm_tpu.data.synthetic import load as synth_load

    tx, ty, vx, vy = synth_load(batch=16, seq_len=4, input_size=2,
                                output_size=1, val_batch=8)
    with pytest.raises(ValueError, match='resume_from'):
        train(tx, ty, vx, vy, parameter_set('Synthetic'),
              config=ADMMConfig(epochs=4), preset='best',
              resume_from=str(tmp_path))


def test_best_iterate_nonfinite_trajectory_falls_back():
    """Advisor round-4: a NaN trajectory (divergence that never tripped
    stop_divergence — NaN comparisons are all False) must not raise the
    drift error; the carry's best finite iterate is returned."""
    from admm_lstm_tpu.api import _best_iterate

    sentinel = object()
    traj = [1.0, 0.5, float('nan'), float('nan')]
    params, best_epoch = _best_iterate({'val': 0.5, 'params': sentinel},
                                       traj, None, announce=False)
    assert params is sentinel
    assert best_epoch == 1


def test_best_iterate_drift_raises():
    """The drift check must survive python -O (raise, not assert)."""
    from admm_lstm_tpu.api import _best_iterate

    with pytest.raises(RuntimeError, match='drifted'):
        _best_iterate({'val': 0.7, 'params': None}, [1.0, 0.5], None,
                      announce=False)


@pytest.mark.parametrize('variant', ['admm_l', 'admm_s'])
def test_preset_best_legacy_variants(variant):
    """Round-4 VERDICT #5: preset='best' must cover the legacy
    re-derivations.  Probe-and-commit over each variant's own rule
    candidates; the committed run must be at-or-below the reference
    candidate's probe value (ties allowed when 'reference' wins)."""
    from admm_lstm_tpu.data.synthetic import load as synth_load

    tx, ty, vx, vy = synth_load(batch=32, seq_len=5, input_size=2,
                                output_size=1, val_batch=16)
    cfg = ADMMConfig(variant=variant, epochs=10, hidden_size=6)
    res = train(tx, ty, vx, vy, parameter_set('Synthetic'), config=cfg,
                log_every=0, preset='best')
    assert res['preset_choice'] in res['probe_val']
    assert np.isfinite(min(res['val_loss']))
    assert min(res['val_loss']) <= res['probe_val']['reference'] * 1.001


def test_preset_best_stacked():
    """train_best_stacked: probe shipped vs searched tuning, commit the
    winner; committed best val must dominate the shipped probe."""
    from admm_lstm_tpu.api import train_best_stacked
    from admm_lstm_tpu.data.synthetic import load as synth_load

    tx, ty, vx, vy = synth_load(batch=32, seq_len=5, input_size=2,
                                output_size=1, val_batch=16)
    res = train_best_stacked(tx, ty, vx, vy, parameter_set('Stacked'),
                             config=ADMMConfig(epochs=12, hidden_size=5),
                             hiddens=(5, 4), probe_epochs=6,
                             search_rounds=1, log_every=0)
    assert res['preset_choice'] in ('shipped', 'tuned')
    assert np.isfinite(min(res['val_loss']))
    assert min(res['val_loss']) <= res['probe_val']['shipped'] * 1.001


def test_stacked_probe_budget_scaling(monkeypatch):
    """Round-5: the stacked probe scales with the training budget
    (max(probe_epochs, epochs//4)) and ranks candidates by trajectory
    nan-min — a dive-then-diverge candidate reports its minimum instead
    of poisoning the ranking with NaN (measured motivation: GoogleStock
    (16,16)/2000ep, docs/ROADMAP.md round-5 continuation #3)."""
    from admm_lstm_tpu import api as api_mod
    from admm_lstm_tpu.api import train_best_stacked

    seen = {}

    def fake_train_stacked(tx, ty, vx, vy, pset, config, hiddens=None,
                           log_every=1):
        seen.setdefault('epochs', []).append(config.epochs)
        n = len(seen['epochs'])
        if config.epochs < 400:                      # a probe run
            # First probe (shipped): flat 0.5.  Second probe (tuned):
            # dives to 0.01 then diverges to NaN — nan-min must rank it
            # the winner.
            traj = ([0.5] * config.epochs if n % 2 == 1
                    else [0.4, 0.01] + [float('nan')] * (config.epochs - 2))
        else:                                        # the committed run
            traj = [0.3, 0.01] + [float('nan')] * (config.epochs - 2)
        return {'name': 'Stacked ADMM-LSTM', 'train_loss': list(traj),
                'val_loss': list(traj), 'params': None,
                'final_params': None, 'best_epoch': 1, 'state': None,
                'seconds': 0.0}

    import admm_lstm_tpu.tune as tune_mod
    import admm_lstm_tpu.variants.stacked as stacked_mod
    monkeypatch.setattr(stacked_mod, 'train_stacked', fake_train_stacked)
    monkeypatch.setattr(
        tune_mod, 'refine_rho_stacked',
        lambda *a, **kw: {'best_parameter_set': parameter_set('Stacked'),
                          'history': []})

    tx = np.zeros((4, 3, 2), np.float32)
    ty = np.zeros((4, 1), np.float32)
    res = train_best_stacked(tx, ty, tx[:2], ty[:2],
                             parameter_set('Stacked'),
                             config=ADMMConfig(epochs=400, hidden_size=4),
                             hiddens=(4, 4), probe_epochs=15,
                             search_rounds=1, log_every=0)
    # Budget scaling: probes ran at 400 // 4 = 100 epochs, commit at 400.
    assert seen['epochs'][:-1] == [100, 100]
    assert seen['epochs'][-1] == 400
    # nan-min ranking: the diverging-but-deeper candidate wins.
    assert res['probe_val']['shipped'] == 0.5
    assert res['probe_val']['tuned'] == pytest.approx(0.01)
    assert res['preset_choice'] == 'tuned'
