"""High-level Python API.

`ADMMBasedOptimizer` mirrors the reference optimizer's usage contract
(admm.py:22-78; used as `optimizer.step()` once per epoch, demo.py:352-356)
while delegating all math to the jitted functional core.  `train` is the
one-call training loop used by the CLI and the comparison harness.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

from admm_lstm_tpu.core.init import init_admm_state
from admm_lstm_tpu.core.residuals import admm_residuals
from admm_lstm_tpu.core.state import ADMMState
from admm_lstm_tpu.core.step import make_admm_step
from admm_lstm_tpu.models.lstm import (LSTMParams, init_lstm_params,
                                       lstm_forward, mse_loss)
from admm_lstm_tpu.utils.config import ADMMConfig, ParameterSet
from admm_lstm_tpu.utils.logging import info, log_assert, warning
from admm_lstm_tpu.utils.timer import Timer


class ADMMBasedOptimizer:
    """Drop-in-feeling optimizer object around the functional core.

    Usage (mirrors demo.py:317-356):
        opt = ADMMBasedOptimizer(params, (train_x, train_y), parameter_set)
        for epoch in range(epochs):
            opt.step()
        trained = opt.params
    """

    def __init__(self, params: LSTMParams,
                 training_samples: Tuple[jax.Array, jax.Array],
                 parameter_set: ParameterSet | Dict,
                 config: ADMMConfig = ADMMConfig(),
                 verbose: bool = False) -> None:
        train_x, train_y = training_samples
        log_assert(train_x.ndim == 3 and train_y.ndim == 2,
                   f'Expected train_x (B,T,I) and train_y (B,O); got '
                   f'{train_x.shape}, {train_y.shape}')
        log_assert(train_x.shape[0] == train_y.shape[0],
                   f'Batch size mismatch: {train_x.shape[0]} vs {train_y.shape[0]}')
        log_assert(train_x.shape[2] == params.input_size
                   and train_y.shape[1] == params.output_size,
                   'Sample feature sizes must match the model')
        if isinstance(parameter_set, dict):
            parameter_set = ParameterSet.from_dict(parameter_set)
        self.config = config
        self.train_x = jnp.asarray(train_x)
        self.train_y = jnp.asarray(train_y)
        self.state: ADMMState = init_admm_state(params, self.train_x,
                                                parameter_set, config)
        self._step_fn = make_admm_step(config)
        if verbose:
            info(f'ADMMBasedOptimizer[{config.variant}] B={train_x.shape[0]} '
                 f'T={train_x.shape[1]} I={train_x.shape[2]} '
                 f'H={params.hidden_size} O={params.output_size}')

    @property
    def params(self) -> LSTMParams:
        return self.state.params

    def step(self) -> None:
        """One ADMM epoch (the reference's optimizer.step(), admm.py:62)."""
        self.state = self._step_fn(self.state, self.train_x, self.train_y)

    def residuals(self) -> Dict[str, jax.Array]:
        return admm_residuals(self.state, self.train_x)


def _open_checkpointing(state: ADMMState, resume_from: Optional[str],
                        checkpoint_dir: Optional[str], checkpoint_every: int,
                        async_checkpoint: bool):
    """Shared resume/checkpoint bring-up.  Returns (mgr, state, start_epoch).

    `state` doubles as the restore template, so a sharded state restores
    directly into its mesh shardings.
    """
    ckpt_mgr = None
    start_epoch = 0
    if resume_from or (checkpoint_dir and checkpoint_every):
        from admm_lstm_tpu.ckpt.checkpoint import CheckpointManager
        ckpt_mgr = CheckpointManager(resume_from or checkpoint_dir,
                                     async_save=async_checkpoint)
    if resume_from:
        if ckpt_mgr.latest_step() is None:
            info(f'No checkpoint found under {resume_from}; '
                 f'starting from scratch.')
        else:
            state = ckpt_mgr.restore(state)
            start_epoch = int(state.epoch)
            info(f'Resumed from {resume_from} at epoch {start_epoch}.')
        if resume_from != checkpoint_dir or not checkpoint_every:
            ckpt_mgr.close()
            ckpt_mgr = None
            if checkpoint_dir and checkpoint_every:
                from admm_lstm_tpu.ckpt.checkpoint import CheckpointManager
                ckpt_mgr = CheckpointManager(checkpoint_dir,
                                             async_save=async_checkpoint)
    return ckpt_mgr, state, start_epoch


def _run_chunked(state, make_run, run_args, epochs: int, start_epoch: int,
                 log_every: int, checkpoint_every: int, ckpt_mgr,
                 timer: Timer, stop_tol: Optional[float] = None,
                 stop_check_every: int = 25,
                 stop_divergence: Optional[float] = None):
    """The epoch-CHUNKED production loop shared by train / train_sharded.

    Each chunk is ONE device program (`lax.scan` over epochs inside jit),
    so the host dispatches once per chunk instead of once per ~0.1 ms
    epoch.  Host sync points — log lines (log_every) and checkpoint saves
    (checkpoint_every) — bound the chunk length; with log_every=0 and no
    checkpointing the whole run is a single program.  (The reference pays
    one Python dispatch per epoch, demo.py:352-356.)

    make_run(chunk) -> callable(state, *run_args) -> (state, metrics with
    a leading (chunk,) axis).  Returns (state, metric_hist).

    stop_tol: ADMM convergence stopping — end training once every
    primal AND dual residual (the r_*/s_* metrics; requires the metrics
    to include them) falls below this tolerance, checked at chunk
    boundaries (at least every `stop_check_every` epochs).

    stop_divergence: ADMM divergence guard — end training once the
    maximum residual has grown past `stop_divergence` x its running
    minimum.  On problems where the nonconvex fixed point rebounds
    (measured: SMSSpam at every stable rho, docs/ROADMAP.md) this stops
    the run near its best iterate instead of burning the budget
    diverging; pair with train(track_best=True) to return that iterate.
    """
    metric_hist = []
    timer.start()
    epoch = start_epoch
    resid_floor = None
    while epoch < epochs:
        chunk = epochs - epoch
        if log_every:
            chunk = min(chunk, log_every - epoch % log_every)
        if ckpt_mgr and checkpoint_every:
            chunk = min(chunk, checkpoint_every - epoch % checkpoint_every)
        if stop_tol is not None or stop_divergence is not None:
            chunk = min(chunk, stop_check_every)
        state, metrics = make_run(chunk)(state, *run_args)
        metric_hist.append(metrics)  # each value: (chunk,) device array
        epoch += chunk
        if stop_tol is not None or stop_divergence is not None:
            resid = [float(v[-1]) for k, v in metrics.items()
                     if k.startswith(('r_', 's_'))]
            if stop_tol is not None and resid and max(resid) < stop_tol:
                info(f'Converged at epoch {epoch}: every ADMM residual '
                     f'below {stop_tol} (max {max(resid):.3e}).')
                break
            if stop_divergence is not None and resid:
                peak = max(resid)
                resid_floor = (peak if resid_floor is None
                               else min(resid_floor, peak))
                if peak > stop_divergence * resid_floor:
                    info(f'Stopping at epoch {epoch}: max ADMM residual '
                         f'{peak:.3e} grew past {stop_divergence:g}x its '
                         f'running minimum {resid_floor:.3e} (divergence '
                         f'guard).')
                    break
        if log_every and epoch % log_every == 0:
            timer.pause()
            done = epoch - start_epoch
            info(f'Epoch {epoch} has done in '
                 f'{timer.get_elapsed_time() * 1e3 / done:.3f} ms (avg). '
                 f'Present loss: Training: '
                 f'{float(metrics["train_loss"][-1]):.8f} '
                 f'| Validation: {float(metrics["val_loss"][-1]):.8f}.')
            timer.resume()
        if ckpt_mgr and epoch % checkpoint_every == 0:
            ckpt_mgr.save(state, step=epoch)
    jax.block_until_ready(state.params.wy)
    if ckpt_mgr:
        ckpt_mgr.close()
    timer.pause()
    return state, metric_hist


def _collect_metrics(metric_hist, initial, record_residuals):
    """Stack per-chunk metric trajectories into host lists (one device
    concat + one transfer per metric)."""
    stacked = {k: np.asarray(jnp.concatenate([m[k] for m in metric_hist]))
               for k in metric_hist[0]} if metric_hist else {}
    train_losses = [initial[0]] + list(map(float,
                                           stacked.get('train_loss', [])))
    val_losses = [initial[1]] + list(map(float, stacked.get('val_loss', [])))
    residual_log = []
    if record_residuals and metric_hist:
        keys = [k for k in metric_hist[0] if k.startswith(('r_', 's_'))]
        for j in range(len(stacked[keys[0]]) if keys else 0):
            residual_log.append({k: float(stacked[k][j]) for k in keys})
    return train_losses, val_losses, residual_log


def _best_iterate(best, val_losses, final_params, announce=True):
    """Shared track_best epilogue: the on-device carry's best params ARE
    the min-validation iterate by construction (it starts at the initial
    loss and updates over exactly the recorded epochs), so return them
    with best_epoch = argmin.  A drift between the carry and the
    recorded trajectory would be a bug — raise instead of silently
    returning the final iterate.  A NON-FINITE trajectory (divergence
    that never tripped stop_divergence: NaN comparisons are all False)
    is not drift — fall back to the carry, which still holds the best
    finite iterate seen before the blow-up."""
    bv = float(best['val'])
    finite = [v for v in val_losses if np.isfinite(v)]
    if len(finite) != len(val_losses):
        warning(f'validation trajectory contains non-finite losses '
                f'({len(val_losses) - len(finite)} of {len(val_losses)}); '
                f'returning the best finite iterate (val {bv:.8f}).')
        # best_epoch must describe the RETURNED params: the carry holds
        # the minimum finite iterate, so report the epoch of the min
        # finite loss; if even that disagrees with the carry (drift),
        # say so rather than silently pairing mismatched epoch/params.
        best_epoch = int(np.nanargmin(np.asarray(val_losses))) \
            if finite else 0
        if finite and bv < min(finite) - 1e-12:
            warning(f'best-iterate carry ({bv}) is below the recorded '
                    f'finite minimum ({min(finite)}); best_epoch is '
                    f'approximate.')
        return best['params'], best_epoch
    if bv > min(val_losses) + 1e-12:
        raise RuntimeError(
            f'best-iterate carry ({bv}) drifted above the recorded '
            f'trajectory minimum ({min(val_losses)})')
    best_epoch = int(np.argmin(val_losses))
    if announce and best_epoch != len(val_losses) - 1:
        info(f'Best validation {bv:.8f} at epoch {best_epoch} '
             f'(final: {val_losses[-1]:.8f}); returning the best iterate.')
    return best['params'], best_epoch


def train(train_x, train_y, val_x, val_y,
          parameter_set: ParameterSet | Dict,
          config: ADMMConfig = ADMMConfig(),
          params: Optional[LSTMParams] = None,
          log_every: int = 1,
          record_residuals: bool = False,
          checkpoint_dir: Optional[str] = None,
          checkpoint_every: int = 0,
          resume_from: Optional[str] = None,
          async_checkpoint: bool = True,
          stop_tol: Optional[float] = None,
          stop_divergence: Optional[float] = None,
          track_best: bool = False,
          preset: Optional[str] = None) -> Dict[str, object]:
    """Full training loop: returns loss trajectories + final params.

    preset='best' applies the measured per-dataset quality recipe
    instead of trusting one tuning everywhere (docs/ROADMAP.md round-3
    table: `ADMMConfig.auto()` beats the shipped tuning 27x on
    GoogleStock but LOSES 67x on YahooFinance, whose shipped tuning is
    excellent and rebound-prone): probe a few epochs of BOTH the given
    config (shipped tuning) and its auto() derivation, commit to
    whichever reached the lower validation loss, and run it to the full
    budget with the best-iterate carry and the divergence guard on.
    See `train_best` for the knobs; other train() arguments pass through.

    track_best: carry the best-validation iterate ON DEVICE through the
    epoch scan and return it as 'params' (final weights stay available
    as 'final_params', with 'best_epoch' recorded).  Nonconvex ADMM can
    rebound after its minimum (SMSSpam does at every stable rho —
    docs/ROADMAP.md); the best iterate is then the deliverable.
    stop_divergence: stop once the max residual grows past this factor
    of its running minimum (see _run_chunked; implies residual
    recording).

    stop_tol: ADMM convergence criterion — stop once every primal and
    dual residual falls below this tolerance (a capability the reference
    lacks: it always runs the fixed epoch budget).  Implies residual
    recording.

    Parity shape with the reference's admm_demo return value
    (demo.py:371-376): dict with 'name', 'train_loss', 'val_loss'.

    TPU-native loop shape: epochs run in CHUNKS, each chunk one compiled
    program (`lax.scan` over epochs with the ADMM step + both losses fused
    per iteration).  Host sync points — log lines (log_every) and
    checkpoint saves (checkpoint_every) — bound the chunk length; between
    them the device runs free.  At sub-100us epochs a per-epoch host
    dispatch would dominate wall time (the reference's loop shape,
    demo.py:352-356).  Set log_every=0 for a single-program run.

    resume_from: checkpoint directory to restore the latest full optimizer
    state from; training continues at the restored epoch and reproduces
    the uninterrupted trajectory exactly (the reference cannot resume at
    all — it only pickles final weights, demo.py:302-308).
    """
    if preset is not None:
        if preset != 'best':
            raise ValueError(f"preset must be None or 'best', got {preset!r}")
        return train_best(
            train_x, train_y, val_x, val_y, parameter_set, config=config,
            params=params, log_every=log_every,
            divergence_guard=(stop_divergence if stop_divergence is not None
                              else 3.0),
            record_residuals=record_residuals,
            checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
            resume_from=resume_from, async_checkpoint=async_checkpoint,
            stop_tol=stop_tol)
    train_x, train_y = jnp.asarray(train_x), jnp.asarray(train_y)
    val_x, val_y = jnp.asarray(val_x), jnp.asarray(val_y)
    if isinstance(parameter_set, dict):
        parameter_set = ParameterSet.from_dict(parameter_set)
    if params is None:
        key = jax.random.PRNGKey(config.seed)
        params = init_lstm_params(key, train_x.shape[2], config.hidden_size,
                                  train_y.shape[1])

    state = init_admm_state(params, train_x, parameter_set, config)
    loss_fn = jax.jit(mse_loss)

    ckpt_mgr, state, start_epoch = _open_checkpointing(
        state, resume_from, checkpoint_dir, checkpoint_every,
        async_checkpoint)

    initial = (float(loss_fn(state.params, train_x, train_y)),
               float(loss_fn(state.params, val_x, val_y)))
    info(f'Training has started. Initial loss: train {initial[0]:.8f} | '
         f'val {initial[1]:.8f}')

    from admm_lstm_tpu.core.step import (make_multi_epoch_best_fn,
                                         make_multi_epoch_fn)
    if stop_tol is not None or stop_divergence is not None:
        record_residuals = True
    best = None
    if track_best:
        best = {'val': jnp.asarray(initial[1], jnp.float32),
                'params': jax.tree.map(lambda a: jnp.array(a, copy=True),
                                       state.params)}

    def make_run(chunk):
        if not track_best:
            return make_multi_epoch_fn(config, chunk, donate=True,
                                       with_residuals=record_residuals)
        fn = make_multi_epoch_best_fn(config, chunk,
                                      with_residuals=record_residuals)

        def run(st, *args):
            st, bv, bp, metrics = fn(st, best['val'], best['params'], *args)
            best['val'], best['params'] = bv, bp
            return st, metrics

        return run

    timer = Timer()
    state, metric_hist = _run_chunked(
        state, make_run,
        (train_x, train_y, val_x, val_y), config.epochs, start_epoch,
        log_every, checkpoint_every, ckpt_mgr, timer, stop_tol=stop_tol,
        stop_divergence=stop_divergence)

    train_losses, val_losses, residual_log = _collect_metrics(
        metric_hist, initial, record_residuals)

    out_params = state.params
    best_epoch = len(val_losses) - 1
    if track_best:
        out_params, best_epoch = _best_iterate(best, val_losses,
                                               state.params)

    info(f'Training has finished. Total time elapsed: '
         f'{timer.get_elapsed_time():.2f} seconds.')
    return {
        'name': 'Fast ADMM-LSTM' if config.variant == 'fast' else config.variant,
        'train_loss': train_losses,
        'val_loss': val_losses,
        'residuals': residual_log,
        'params': out_params,
        'final_params': state.params,
        'best_epoch': best_epoch,
        'state': state,
        'seconds': timer.get_elapsed_time(),
    }


def derive_auto_config(config: ADMMConfig) -> ADMMConfig:
    """`config` with the auto() composition applied on top while
    preserving every problem-shaping field (hidden size, epochs, seed,
    dtype, mesh, variant).  The recipe itself lives in ONE place
    (utils.config.AUTO_FIELDS, shared with ADMMConfig.auto())."""
    from admm_lstm_tpu.utils.config import AUTO_FIELDS
    return config.replace(**AUTO_FIELDS)


def _train_best_legacy(train_x, train_y, val_x, val_y,
                       config: ADMMConfig, probe_epochs: int,
                       log_every: int) -> Dict[str, object]:
    """preset='best' for the ADMM-L / ADMM-S re-derivations: probe a
    small per-variant candidate set of their own rule constants from the
    same seed, commit the winner for the full budget.

    Candidate choice is measured, not guessed (GoogleStock, 20-epoch
    probes, round 5): ADMM-L's decisive knob is the output-fit penalty
    rho11 (reference 1e-4 ends 0.0050; 1e-3 ends 0.00072; 1e-2 and 1e-5
    both regress >0.13), ADMM-S's is the h-update damping r_h (reference
    100 ends 1.66; r_h=25 reaches 0.033 by 60 epochs; r_h=10 probes
    best at short horizons; tau and rho11 either do nothing or explode).
    """
    if config.variant == 'admm_l':
        from admm_lstm_tpu.variants.admm_l import ADMMLRules, admm_l_demo
        candidates = {'reference': ADMMLRules(),
                      'rho11_1e-3': ADMMLRules(rho11=1e-3),
                      'rho11_1e-5': ADMMLRules(rho11=1e-5)}
        runner = functools.partial(admm_l_demo, n_hiddens=config.hidden_size,
                                   train_x=train_x, train_y=train_y,
                                   test_x=val_x, test_y=val_y,
                                   seed=config.seed)
    else:
        from admm_lstm_tpu.variants.admm_s import ADMMSRules, admm_s_demo
        candidates = {'reference': ADMMSRules(),
                      'r_h_25': ADMMSRules(r_h=25.0),
                      'r_h_10': ADMMSRules(r_h=10.0)}
        runner = functools.partial(admm_s_demo, n_hiddens=config.hidden_size,
                                   train_x=train_x, train_y=train_y,
                                   test_x=val_x, test_y=val_y,
                                   seed=config.seed)
    n_probe = max(1, min(probe_epochs, config.epochs))
    probe_val = {}
    for name, rules in candidates.items():
        res = runner(n_probe, rules=rules, log_every=0)
        probe_val[name] = float(min(res['val_loss']))
    winner = min(probe_val, key=probe_val.get)
    info(f"preset='best' [{config.variant}]: probe {n_probe} epochs -> "
         + ', '.join(f'{k} {v:.6g}' for k, v in probe_val.items())
         + f'; committing to {winner}.')
    result = runner(config.epochs, rules=candidates[winner],
                    log_every=log_every)
    result['preset_choice'] = winner
    result['probe_val'] = probe_val
    return result


def train_best_stacked(train_x, train_y, val_x, val_y,
                       parameter_set: ParameterSet | Dict,
                       config: ADMMConfig = ADMMConfig(),
                       hiddens=None,
                       probe_epochs: int = 15,
                       search_rounds: int = 1,
                       log_every: int = 1) -> Dict[str, object]:
    """preset='best' for the stacked N-layer variant: probe the shipped
    Stacked tuning against a vmapped rho search (tune.search_rho_stacked
    over the c/h/y penalties, the knobs that move the stack — gate
    penalties sit at 1 in every tuning), commit the winner for the full
    budget with the in-scan best-iterate carry.

    The probe/search budget SCALES with the training budget
    (`max(probe_epochs, epochs // 4)`, and a second recentering round
    once the probe affords >= 100 epochs): stacked quality at long
    budgets is NOT predicted by short probes — measured on GoogleStock
    (16, 16), the shipped tuning ends at val 0.0204 after 2000 epochs
    while a 300-epoch 2-round search finds rho_c/h two decades softer
    reaching val 6.7e-4 (with the best-iterate carry catching the
    pre-divergence minimum); a 15-epoch probe ranks that tuning LAST.
    Probe ranking uses the trajectory's nan-min so a candidate that
    dives then diverges still reports its minimum (the commit phase's
    best-iterate carry returns exactly that iterate)."""
    from admm_lstm_tpu.variants.stacked import train_stacked
    train_x, train_y = jnp.asarray(train_x), jnp.asarray(train_y)
    val_x, val_y = jnp.asarray(val_x), jnp.asarray(val_y)
    if isinstance(parameter_set, dict):
        parameter_set = ParameterSet.from_dict(parameter_set)
    if hiddens is None:
        hiddens = (config.hidden_size, config.hidden_size)
    hiddens = tuple(int(h) for h in hiddens)
    n_probe = max(1, min(config.epochs,
                         max(probe_epochs, config.epochs // 4)))

    candidates = {'shipped': parameter_set}
    if search_rounds:
        from admm_lstm_tpu.tune import refine_rho_stacked
        n_rounds = max(search_rounds, 2) if n_probe >= 100 else search_rounds
        tuned = refine_rho_stacked(train_x, train_y, val_x, val_y,
                                   parameter_set, hiddens, config=config,
                                   epochs=n_probe, rounds=n_rounds)
        candidates['tuned'] = tuned['best_parameter_set']
    probe_val = {}
    for name, pset in candidates.items():
        res = train_stacked(train_x, train_y, val_x, val_y, pset,
                            config.replace(epochs=n_probe),
                            hiddens=hiddens, log_every=0)
        v = float(np.nanmin(np.asarray(res['val_loss'])))
        probe_val[name] = v if np.isfinite(v) else float('inf')
    winner = min(probe_val, key=probe_val.get)
    info(f"preset='best' [stacked {hiddens}]: probe {n_probe} epochs -> "
         + ', '.join(f'{k} {v:.6g}' for k, v in probe_val.items())
         + f'; committing to {winner}.')
    result = train_stacked(train_x, train_y, val_x, val_y,
                           candidates[winner], config, hiddens=hiddens,
                           log_every=log_every)
    result['preset_choice'] = winner
    result['probe_val'] = probe_val
    return result


def train_best(train_x, train_y, val_x, val_y,
               parameter_set: ParameterSet | Dict,
               config: ADMMConfig = ADMMConfig(),
               params: Optional[LSTMParams] = None,
               probe_epochs: int = 15,
               divergence_guard: float = 3.0,
               search_rounds: int = 0,
               log_every: int = 1,
               **train_kw) -> Dict[str, object]:
    """The per-dataset quality recipe as ONE entry point (train(preset=
    'best')).

    Measured reality (docs/ROADMAP.md round-3 "auto() across datasets"):
    no single tuning dominates.  The shipped per-dataset rho/beta are
    excellent where they exist and were tuned (YahooFinance 0.00061@30,
    rebounding later — track_best recovers 0.00029) and poor elsewhere
    (GoogleStock 0.347@30); `ADMMConfig.auto()`'s residual-balancing
    warmup is the reverse (GoogleStock 0.0126@30, Yahoo 0.041).  The
    recipe, encoded: probe `probe_epochs` of each candidate from the
    SAME initial weights, commit to whichever reached the lower
    validation loss, rerun it for the full budget with the on-device
    best-iterate carry and the divergence guard (so rebound-prone
    problems return their minimum, not their endpoint).

    Returns the committed run's train() result dict, annotated with
    'preset_choice' (the winning candidate name) and 'probe_val'
    (each candidate's probe-phase best validation loss).
    """
    if config.variant in ('admm_l', 'admm_s'):
        # The legacy re-derivations have their own rule constants and
        # training loops; the probe-and-commit recipe generalizes
        # (round-4 VERDICT #5) but the candidates are per-variant.
        if train_kw.get('resume_from') or train_kw.get('checkpoint_dir'):
            raise ValueError("preset='best' checkpointing is a "
                             'fast/no_dual_y feature; the legacy variants '
                             'do not persist optimizer state')
        return _train_best_legacy(train_x, train_y, val_x, val_y, config,
                                  probe_epochs, log_every)
    if config.variant not in ('fast', 'no_dual_y'):
        raise ValueError("preset='best' supports the fast/no_dual_y/"
                         f'admm_l/admm_s variants, got {config.variant!r} '
                         "(stacked: api.train_best_stacked)")
    if train_kw.get('resume_from'):
        # The probe phase retrains from scratch and may commit to a
        # DIFFERENT candidate (auto vs shipped) than the config that
        # wrote the checkpoint — resuming state under mismatched
        # dynamics would be silent corruption.  Resume through plain
        # train() with the dynamics the checkpoint was written under.
        raise ValueError(
            "resume_from is incompatible with preset='best': the probe "
            'phase may commit to a different candidate than the config '
            'that wrote the checkpoint.  Resume via train(...) with the '
            "run's recorded preset_choice applied explicitly.")
    train_x, train_y = jnp.asarray(train_x), jnp.asarray(train_y)
    val_x, val_y = jnp.asarray(val_x), jnp.asarray(val_y)
    if isinstance(parameter_set, dict):
        parameter_set = ParameterSet.from_dict(parameter_set)
    if params is None:
        key = jax.random.PRNGKey(config.seed)
        params = init_lstm_params(key, train_x.shape[2], config.hidden_size,
                                  train_y.shape[1])

    candidates = {'shipped': (config, parameter_set),
                  'auto': (derive_auto_config(config), parameter_set)}
    # Probe budget scales with the training budget (same round-5
    # measurement as train_best_stacked: short probes misrank tunings
    # whose advantage only appears past a few hundred epochs; probes
    # are epoch-chunked device programs, so a quarter-budget probe
    # costs ~quarter of one candidate's training).
    n_probe = max(1, min(config.epochs,
                         max(probe_epochs, config.epochs // 4)))
    if search_rounds:
        # The recipe's third leg — rho search under an explicit budget
        # (docs/ROADMAP.md: "refine_rho when search budget exists").
        # The vmapped successive-halving search trains whole candidate
        # grids as single programs, so `search_rounds` rounds at probe
        # length cost ~5 * rounds probe-trainings of wall time.
        from admm_lstm_tpu.tune import refine_rho
        tuned = refine_rho(train_x, train_y, val_x, val_y, parameter_set,
                           config=config, epochs=n_probe,
                           rounds=search_rounds, params=params)
        candidates['tuned'] = (config, tuned['best_parameter_set'])
    probe_val: Dict[str, float] = {}
    for name, (cand, pset) in candidates.items():
        # Probes run under the SAME divergence guard as the committed
        # run (round-5 review finding: a guard-stopped committed run
        # compared against unguarded probe minima can fail the
        # dominance gate with no real quality regression).
        res = train(train_x, train_y, val_x, val_y, pset,
                    config=cand.replace(epochs=n_probe), params=params,
                    log_every=0, track_best=True,
                    stop_divergence=divergence_guard)
        v = float(np.nanmin(np.asarray(res['val_loss'])))
        probe_val[name] = v if np.isfinite(v) else float('inf')
    winner = min(probe_val, key=probe_val.get)
    info(f"preset='best': probe {n_probe} epochs -> "
         + ', '.join(f'{k} {v:.6g}' for k, v in probe_val.items())
         + f'; committing to {winner}.')

    win_cfg, win_pset = candidates[winner]
    result = train(train_x, train_y, val_x, val_y, win_pset,
                   config=win_cfg, params=params,
                   log_every=log_every, track_best=True,
                   stop_divergence=divergence_guard, **train_kw)
    result['preset_choice'] = winner
    result['probe_val'] = probe_val
    return result


def train_scenarios(xs, ys, vxs, vys,
                    parameter_set: ParameterSet | Dict,
                    config: ADMMConfig = ADMMConfig()) -> Dict[str, object]:
    """Train S independent ADMM instances in ONE vmapped compiled program
    on one chip (BASELINE config: 'multi-ticker scenario batch of
    sequences vmapped on one chip, loose ADMM variant').

    xs (S,B,T,I), ys (S,B,O), vxs (S,Bv,T,I), vys (S,Bv,O): one training
    problem per scenario (ticker / market regime / augmentation).  Each
    scenario gets its own seed-split initial weights; line-search
    `while_loop`s vectorize across scenarios with per-instance masking.
    Returns per-scenario loss trajectories (S, epochs+1) and stacked
    final params (leading S axis).
    """
    from admm_lstm_tpu.core.step import admm_step, rules_for
    xs, ys = jnp.asarray(xs), jnp.asarray(ys)
    vxs, vys = jnp.asarray(vxs), jnp.asarray(vys)
    if isinstance(parameter_set, dict):
        parameter_set = ParameterSet.from_dict(parameter_set)
    n_scen = xs.shape[0]
    rules = rules_for(config)

    keys = jax.random.split(jax.random.PRNGKey(config.seed), n_scen)
    params = jax.vmap(
        lambda k: init_lstm_params(k, xs.shape[3], config.hidden_size,
                                   ys.shape[2]))(keys)
    states = jax.vmap(
        lambda p, x: init_admm_state(p, x, parameter_set, config))(params, xs)

    def run_one(state, x, y, vx, vy):
        l0 = (mse_loss(state.params, x, y, rules.precision),
              mse_loss(state.params, vx, vy, rules.precision))

        def body(s, _):
            s = admm_step(s, x, y, rules)
            return s, (mse_loss(s.params, x, y, rules.precision),
                       mse_loss(s.params, vx, vy, rules.precision))

        s, (tr, vl) = jax.lax.scan(body, state, None, length=config.epochs)
        return s, (jnp.concatenate([l0[0][None], tr]),
                   jnp.concatenate([l0[1][None], vl]))

    timer = Timer()
    timer.start()
    final, (train_traj, val_traj) = jax.jit(jax.vmap(run_one))(
        states, xs, ys, vxs, vys)
    jax.block_until_ready(val_traj)
    timer.pause()
    info(f'{n_scen} scenarios x {config.epochs} epochs in one program: '
         f'{timer.get_elapsed_time():.2f}s; final val '
         f'{[round(float(v), 6) for v in val_traj[:, -1]]}')
    return {
        'name': f'Scenario ADMM-LSTM [{config.variant}]',
        'train_loss': np.asarray(train_traj),
        'val_loss': np.asarray(val_traj),
        'params': final.params,
        'state': final,
        'seconds': timer.get_elapsed_time(),
    }


def train_sharded(train_x, train_y, val_x, val_y,
                  parameter_set: ParameterSet | Dict,
                  config: ADMMConfig = ADMMConfig(),
                  params: Optional[LSTMParams] = None,
                  log_every: int = 1, record_residuals: bool = False,
                  checkpoint_dir: Optional[str] = None,
                  checkpoint_every: int = 0,
                  resume_from: Optional[str] = None,
                  async_checkpoint: bool = True,
                  stop_tol: Optional[float] = None,
                  stop_divergence: Optional[float] = None,
                  track_best: bool = False) -> Dict[str, object]:
    """Data-parallel training over a device mesh (config.mesh_shape).

    Same surface as `train`: epoch-CHUNKED device programs (one sharded
    `lax.scan` per chunk, all consensus psums inside), primal+dual
    residual recording, orbax checkpointing of the sharded state,
    on-device best-iterate tracking (`track_best` — the tracked params
    are replicated under DP so the carry is consistent across devices),
    and exact resume (`resume_from`) — the checkpoint restores straight
    into the mesh shardings.
    """
    from admm_lstm_tpu.core.init import init_admm_state as _init
    from admm_lstm_tpu.parallel import make_mesh, shard_batch, shard_state
    from admm_lstm_tpu.parallel.sharding import (
        make_sharded_multi_epoch_best_fn, make_sharded_multi_epoch_fn)

    train_x, train_y = jnp.asarray(train_x), jnp.asarray(train_y)
    val_x, val_y = jnp.asarray(val_x), jnp.asarray(val_y)
    if isinstance(parameter_set, dict):
        parameter_set = ParameterSet.from_dict(parameter_set)
    if params is None:
        key = jax.random.PRNGKey(config.seed)
        params = init_lstm_params(key, train_x.shape[2], config.hidden_size,
                                  train_y.shape[1])

    mesh = make_mesh(config.mesh_shape, config.mesh_axes)
    n_dev = int(np.prod(mesh.devices.shape)) if hasattr(mesh.devices, 'shape') else mesh.devices.size
    if train_x.shape[0] % n_dev:
        pad = n_dev - train_x.shape[0] % n_dev
        info(f'Padding batch {train_x.shape[0]} -> {train_x.shape[0] + pad} '
             f'to divide the {n_dev}-way data axis (duplicated tail samples).')
        idx = jnp.concatenate([jnp.arange(train_x.shape[0]),
                               jnp.arange(pad) % train_x.shape[0]])
        train_x, train_y = train_x[idx], train_y[idx]

    state = shard_state(_init(params, train_x, parameter_set, config), mesh)
    sx, sy = shard_batch(train_x, train_y, mesh)
    svx, svy = val_x, val_y  # replicated by the epoch fn's in_shardings
    loss_fn = jax.jit(mse_loss)

    # The sharded state doubles as the restore template, so the
    # checkpoint lands directly in the mesh shardings.
    ckpt_mgr, state, start_epoch = _open_checkpointing(
        state, resume_from, checkpoint_dir, checkpoint_every,
        async_checkpoint)

    initial = (float(loss_fn(state.params, sx, sy)),
               float(loss_fn(state.params, val_x, val_y)))
    if stop_tol is not None or stop_divergence is not None:
        record_residuals = True
    run_cache: Dict[int, object] = {}
    best = None
    if track_best:
        best = {'val': jnp.asarray(initial[1], jnp.float32),
                'params': jax.tree.map(lambda a: jnp.array(a, copy=True),
                                       state.params)}

    def make_run(chunk):
        if chunk not in run_cache:
            if track_best:
                run_cache[chunk] = make_sharded_multi_epoch_best_fn(
                    config, mesh, chunk, with_residuals=record_residuals)
            else:
                run_cache[chunk] = make_sharded_multi_epoch_fn(
                    config, mesh, chunk, donate=True,
                    with_residuals=record_residuals)
        fn = run_cache[chunk]
        if not track_best:
            return fn

        def run(st, *args):
            st, bv, bp, metrics = fn(st, best['val'], best['params'], *args)
            best['val'], best['params'] = bv, bp
            return st, metrics

        return run

    timer = Timer()
    state, metric_hist = _run_chunked(
        state, make_run, (sx, sy, svx, svy), config.epochs, start_epoch,
        log_every, checkpoint_every, ckpt_mgr, timer, stop_tol=stop_tol,
        stop_divergence=stop_divergence)

    train_losses, val_losses, residual_log = _collect_metrics(
        metric_hist, initial, record_residuals)

    out_params = state.params
    best_epoch = len(val_losses) - 1
    if track_best:
        out_params, best_epoch = _best_iterate(best, val_losses,
                                               state.params)

    return {
        'name': 'Fast ADMM-LSTM',
        'train_loss': train_losses,
        'val_loss': val_losses,
        'residuals': residual_log,
        'params': out_params,
        'final_params': state.params,
        'best_epoch': best_epoch,
        'state': state,
        'seconds': timer.get_elapsed_time(),
        'mesh': mesh,
    }
