"""Parallel hyperparameter (rho) search — a TPU-native capability.

The reference tunes its 7 penalty coefficients by hand, editing source
between runs (README.md:79-83).  Because this framework's whole training
run is a pure function of an `ADMMState` whose rho lives in the state
pytree, a WHOLE GRID of candidate tunings trains simultaneously in one
compiled program via `vmap`: N complete ADMM trainings batched on one
chip (line-search `while_loop`s vectorize with per-candidate masking).

At ~0.1 ms/epoch for GoogleStock-sized problems, a 27-point, 30-epoch
grid costs well under a second of device time — and routinely finds
tunings far better than the reference's shipped constants (e.g. on
GoogleStock: val MSE 0.026 vs the reference tuning's 0.347 at 30 epochs).
"""

from __future__ import annotations

import itertools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from admm_lstm_tpu.core.init import init_admm_state
from admm_lstm_tpu.core.state import Penalties
from admm_lstm_tpu.core.step import admm_step, rules_for
from admm_lstm_tpu.models.lstm import init_lstm_params, mse_loss
from admm_lstm_tpu.utils.config import ADMMConfig, ParameterSet, RHO_KEYS


def candidate_grid(base: ParameterSet,
                   multipliers: Sequence[float] = (0.2, 1.0, 5.0),
                   keys: Sequence[str] = ('c', 'h', 'y')) -> np.ndarray:
    """Log-grid of rho candidates: the base tuning scaled per key.

    Returns (N, 7) in canonical i,f,g,o,c,h,y order; gate penalties stay at
    their base values (they are ~1 in every shipped tuning).
    """
    base_vec = np.asarray([base.rho[k] for k in RHO_KEYS], np.float32)
    out = []
    for combo in itertools.product(multipliers, repeat=len(keys)):
        vec = base_vec.copy()
        for k, m in zip(keys, combo):
            vec[RHO_KEYS.index(k)] *= m
        out.append(vec)
    return np.stack(out)


def search_rho(train_x, train_y, val_x, val_y, base: ParameterSet,
               config: ADMMConfig = ADMMConfig(),
               candidates: Optional[np.ndarray] = None,
               epochs: int = 30, params=None) -> Dict[str, object]:
    """Train every rho candidate in parallel; return ranked results.

    candidates: (N, 7) rho vectors (see candidate_grid).  All candidates
    share the same seed-0 initial weights and gate seeding, so the ranking
    isolates the effect of the penalties.
    """
    train_x, train_y = jnp.asarray(train_x), jnp.asarray(train_y)
    val_x, val_y = jnp.asarray(val_x), jnp.asarray(val_y)
    if params is None:
        params = init_lstm_params(jax.random.PRNGKey(config.seed),
                                  train_x.shape[2], config.hidden_size,
                                  train_y.shape[1])
    if candidates is None:
        candidates = candidate_grid(base)
    base_state = init_admm_state(params, train_x, base, config)
    rules = rules_for(config)
    step_fn = lambda s, x, y: admm_step(s, x, y, rules)
    loss_fn = lambda p, x, y: mse_loss(p, x, y, rules.precision)
    return _vmapped_rho_search(base_state, step_fn, loss_fn, candidates,
                               train_x, train_y, val_x, val_y, epochs, base)


def _vmapped_rho_search(base_state, step_fn, loss_fn, candidates,
                        train_x, train_y, val_x, val_y, epochs,
                        base: ParameterSet,
                        extra_fields: Optional[Dict] = None
                        ) -> Dict[str, object]:
    """Shared core: broadcast a state over N rho candidates and train all
    of them in one compiled program.  Works for any state NamedTuple whose
    `rho` field is a `Penalties` and whose `params` feeds `loss_fn`.
    extra_fields: per-candidate (N,) arrays for additional scalar state
    fields (e.g. the stacked variant's rho_z)."""
    candidates = jnp.asarray(candidates, jnp.float32)
    n = candidates.shape[0]

    def broadcast(leaf):
        return jnp.broadcast_to(leaf[None], (n,) + leaf.shape)

    stacked = jax.tree.map(broadcast, base_state)
    stacked = stacked._replace(rho=Penalties(
        *[candidates[:, k] for k in range(7)]))
    if extra_fields:
        stacked = stacked._replace(**extra_fields)

    def run_one(state):
        def body(s, _):
            return step_fn(s, train_x, train_y), None

        s, _ = jax.lax.scan(body, state, None, length=epochs)
        return (loss_fn(s.params, train_x, train_y),
                loss_fn(s.params, val_x, val_y))

    train_losses, val_losses = _run_in_groups(jax.jit(jax.vmap(run_one)),
                                              stacked, n)
    train_losses = np.asarray(train_losses)
    val_losses = np.asarray(val_losses)
    val_rank = np.where(np.isfinite(val_losses), val_losses, np.inf)
    order = np.argsort(val_rank)

    best_rho = {k: float(candidates[order[0], i])
                for i, k in enumerate(RHO_KEYS)}
    return {
        'order': order,
        'train_losses': train_losses,
        'val_losses': val_losses,
        'candidates': np.asarray(candidates),
        'best_rho': best_rho,
        'best_val_loss': float(val_rank[order[0]]),
        'best_parameter_set': ParameterSet(rho=best_rho,
                                           beta=dict(base.beta)),
    }


def search_rho_stacked(train_x, train_y, val_x, val_y, base: ParameterSet,
                       hiddens, config: ADMMConfig = ADMMConfig(),
                       candidates: Optional[np.ndarray] = None,
                       epochs: int = 30,
                       z_candidates: Optional[np.ndarray] = None
                       ) -> Dict[str, object]:
    """Parallel rho search for the stacked N-layer variant.

    z_candidates: optional (N,) per-candidate values of the stacked
    variant's pre-activation penalty rho_z (aligned with `candidates`).
    """
    from admm_lstm_tpu.variants.stacked import (init_stacked,
                                                init_stacked_state,
                                                stacked_admm_step,
                                                stacked_mse_loss)
    train_x, train_y = jnp.asarray(train_x), jnp.asarray(train_y)
    val_x, val_y = jnp.asarray(val_x), jnp.asarray(val_y)
    params = init_stacked(jax.random.PRNGKey(config.seed), train_x.shape[2],
                          tuple(hiddens), train_y.shape[1])
    if candidates is None:
        candidates = candidate_grid(base)

    base_state = init_stacked_state(params, train_x, base, config)
    rules = rules_for(config)
    step_fn = lambda s, x, y: stacked_admm_step(s, x, y, rules)
    loss_fn = lambda p, x, y: stacked_mse_loss(p, x, y, rules.precision)
    extra = None
    if z_candidates is not None:
        extra = {'rho_z': jnp.asarray(z_candidates, jnp.float32)}
    out = _vmapped_rho_search(base_state, step_fn, loss_fn, candidates,
                              train_x, train_y, val_x, val_y, epochs, base,
                              extra_fields=extra)
    if z_candidates is not None:
        out['best_z'] = float(z_candidates[out['order'][0]])
        # Fold the winning rho_z back into the returned parameter set so
        # training with `best_parameter_set` reproduces the best run.
        ps = out['best_parameter_set']
        out['best_parameter_set'] = ParameterSet(
            rho={**ps.rho, 'z': out['best_z']}, beta=dict(ps.beta))
        out['best_rho']['z'] = out['best_z']
    return out


def _run_in_groups(vrun, batched, n_cand: int):
    """Run `vrun` (a jitted vmap over the leading candidate axis) on
    `batched`; on a compiler HBM-capacity failure, halve the candidate
    axis and recurse (round-5 finding: 27 vmapped stacked candidates at
    YahooFinance scale ask for ~17.5 GB — the vmapped wide-Gram
    intermediates scale with the candidate axis, which the per-instance
    chunk budget in normal_eq cannot see).  Each group size compiles
    once; halving costs extra compiles only on problems that could not
    run at all before."""
    try:
        return vrun(batched)
    except Exception as e:                      # jax.errors.JaxRuntimeError
        msg = str(e)
        oom = ('RESOURCE_EXHAUSTED' in msg or 'Ran out of memory' in msg
               or 'hbm capacity' in msg)
        if not oom or n_cand <= 1:
            raise
        half = n_cand // 2
        left = _run_in_groups(vrun, jax.tree.map(lambda a: a[:half], batched),
                              half)
        right = _run_in_groups(vrun, jax.tree.map(lambda a: a[half:], batched),
                               n_cand - half)
        return jax.tree.map(lambda l, r: jnp.concatenate([l, r]), left, right)


def _refine_loop(search_call, base: ParameterSet, rounds: int,
                 keys: Sequence[str], span: float,
                 points_per_key: int = 5) -> Dict[str, object]:
    """Shared successive-halving recentering loop (refine_rho /
    refine_rho_stacked): each round trains a full log-grid of candidates
    via `search_call(center, candidates)` (one vmapped program),
    recenters on the winner, and narrows the per-key span by sqrt.

    points_per_key: 5 (the single-layer default) or 3 — the stacked
    variant uses 3 because 5^3 = 125 vmapped copies of a ~50 MB stacked
    state OOM the 16 GB HBM at GoogleStock scale; 3^3 = 27 fits and two
    recentering rounds cover the same span."""
    best = base
    result: Dict[str, object] = {}
    history = []
    for r in range(rounds):
        mult = ((1.0 / span, span ** -0.5, 1.0, span ** 0.5, span)
                if points_per_key == 5 else (1.0 / span, 1.0, span))
        cands = candidate_grid(best, multipliers=mult, keys=keys)
        result = search_call(best, cands)
        best = result['best_parameter_set']
        history.append({'round': r, 'span': span,
                        'best_rho': dict(result['best_rho']),
                        'best_val_loss': result['best_val_loss']})
        span = span ** 0.5
    result['history'] = history
    return result


def refine_rho(train_x, train_y, val_x, val_y, base: ParameterSet,
               config: ADMMConfig = ADMMConfig(), epochs: int = 30,
               rounds: int = 3, keys: Sequence[str] = ('c', 'h', 'y'),
               span: float = 10.0, params=None) -> Dict[str, object]:
    """Successive-halving rho refinement around the best grid point.

    `rounds` rounds at span 10 end within a factor ~2 of the per-key
    optimum.
    """
    return _refine_loop(
        lambda best, cands: search_rho(train_x, train_y, val_x, val_y,
                                       best, config=config,
                                       candidates=cands, epochs=epochs,
                                       params=params),
        base, rounds, keys, span)


def refine_rho_stacked(train_x, train_y, val_x, val_y, base: ParameterSet,
                       hiddens, config: ADMMConfig = ADMMConfig(),
                       epochs: int = 30, rounds: int = 2,
                       keys: Sequence[str] = ('c', 'h', 'y'),
                       span: float = 10.0) -> Dict[str, object]:
    """Successive-halving rho refinement for the stacked variant.

    Same recentering loop as `refine_rho`, driving `search_rho_stacked`;
    the shipped base tuning keeps its rho_z (searching z jointly with
    c/h/y quintuples the grid for a knob that moved <2x in round-3
    measurements — pass z_candidates to search_rho_stacked directly for
    an explicit z sweep).
    """
    def search_call(best, cands):
        result = search_rho_stacked(train_x, train_y, val_x, val_y, best,
                                    hiddens, config=config,
                                    candidates=cands, epochs=epochs)
        # candidate_grid / search cover the 7 canonical keys; re-attach
        # the base tuning's rho_z so the returned set trains identically.
        ps = result['best_parameter_set']
        if 'z' in base.rho and 'z' not in ps.rho:
            result['best_parameter_set'] = ParameterSet(
                rho={**ps.rho, 'z': base.rho['z']}, beta=dict(ps.beta))
        return result

    return _refine_loop(search_call, base, rounds, keys, span,
                        points_per_key=3)
