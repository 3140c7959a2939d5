"""Sharding specs and the data-parallel (consensus-ADMM) step.

Strategy (SURVEY §2.2 / §5): shard the sample axis B of every per-sample
tensor (train_x/train_y, all gate and dual slabs, the output auxiliary `a`
and its dual) across the mesh 'data' axis; replicate the 9 weight blocks
and scalar penalties.  Because every weight-update reduction in the solver
is a `jnp.sum`/einsum over the batch axis, GSPMD lowers them to `psum`s
over ICI — this IS consensus ADMM on the shared weights: each shard
accumulates its local gradient/objective contribution and the all-reduce
closes the consensus, bit-matching the single-device computation (up to
reduction order).

The line-search `lax.while_loop` predicates reduce over the full batch too,
so every device sees the same globally-reduced objective and takes the same
number of doublings — the loops stay coherent across the mesh by
construction.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from admm_lstm_tpu.core.state import ADMMState, DualSlabs, GateSlabs
from admm_lstm_tpu.core.step import admm_step, rules_for
from admm_lstm_tpu.utils.config import ADMMConfig


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0,
                   data_axis: str = 'data') -> NamedSharding:
    spec = [None] * ndim
    spec[batch_axis] = data_axis
    return NamedSharding(mesh, P(*spec))


def state_shardings(mesh: Mesh, data_axis: str = 'data',
                    shard_time: bool = False,
                    model_axis: str | None = None) -> ADMMState:
    """An ADMMState-shaped pytree of NamedShardings.

    Default (data parallel): slabs (T+1, H, B) shard on the batch axis 2
    (the minor/lane axis — sharding the lane axis keeps each shard's
    batch block lane-aligned as long as B/devices stays a multiple of
    128, which every bundled dataset satisfies on <= 8 devices);
    the out-minor (O, B) tensors a/y on axis 1; weights/penalties/epoch
    replicated.

    shard_time=True shards the slabs' TIME axis instead — the sequence-
    parallel layout for long sequences.  Pair it with sweep_mode='jacobi'
    (no time recurrence); the weight-phase reductions over t become psums
    over the mesh axis.  (B,O) tensors stay replicated in this layout.

    model_axis (tensor parallelism, for large hidden sizes): additionally
    shards the HIDDEN axis — slab H axis 1, weight output columns
    (wx/wh (4, D, H) on the H axis) and the readout's contraction rows
    (wy (H, O) on H).  Composable with the batch sharding into a 2-D
    (data, model) mesh; GSPMD inserts the hidden-contraction collectives
    (the h2* recurrence matmuls and h @ wy become psums over the model
    axis) while all elementwise gate math stays local.
    """
    m = model_axis
    if shard_time:
        slab = NamedSharding(mesh, P(data_axis, m, None))
        vec = NamedSharding(mesh, P())
    else:
        slab = NamedSharding(mesh, P(None, m, data_axis))
        vec = NamedSharding(mesh, P(None, data_axis))
    rep = NamedSharding(mesh, P())

    gates = GateSlabs(i=slab, f=slab, g=slab, o=slab, c=slab, h=slab, a=vec)
    duals = DualSlabs(i=slab, f=slab, g=slab, o=slab, c=slab, h=slab, y=vec)
    if m is None:
        params_sh = jax.tree.map(lambda _: rep, _PARAMS_TREE)
    else:
        params_sh = LSTMParams(
            wx=NamedSharding(mesh, P(None, None, m)),
            wh=NamedSharding(mesh, P(None, None, m)),
            wy=NamedSharding(mesh, P(m, None)))
    return ADMMState(
        params=params_sh,
        gates=gates, duals=duals,
        rho=jax.tree.map(lambda _: rep, _RHO_TREE),
        beta=jax.tree.map(lambda _: rep, _BETA_TREE),
        epoch=rep)


# Template pytrees used only for their structure.
from admm_lstm_tpu.core.state import Penalties, Ridges  # noqa: E402
from admm_lstm_tpu.models.lstm import LSTMParams  # noqa: E402

_PARAMS_TREE = LSTMParams(wx=0, wh=0, wy=0)
_RHO_TREE = Penalties(i=0, f=0, g=0, o=0, c=0, h=0, y=0)
_BETA_TREE = Ridges(x=0, h=0, wy=0)


def shard_state(state: ADMMState, mesh: Mesh,
                data_axis: str = 'data') -> ADMMState:
    """Place an existing state onto the mesh with the DP shardings."""
    return jax.tree.map(jax.device_put, state,
                        state_shardings(mesh, data_axis))


def shard_batch(train_x, train_y, mesh: Mesh, data_axis: str = 'data'):
    x = jax.device_put(train_x, batch_sharding(mesh, 3, 0, data_axis))
    y = jax.device_put(train_y, batch_sharding(mesh, 2, 0, data_axis))
    return x, y


def _sharded_rules(config: ADMMConfig, mesh: Mesh, data_axis: str):
    """StepRules for a plain-DP sharded program.

    The gate-sweep Pallas kernels COMPOSE with data parallelism: the
    sharded builders attach the mesh to the rules, and core.step._sweep
    wraps each pallas_call in `jax.shard_map` over the batch/lane axis —
    every device runs the kernel on its local batch shard, which is
    bit-equal to the unsharded kernel because the sweep math is
    elementwise + per-batch-column independent (tests/test_sharding.py::
    test_dp_pallas_sweep_matches_unsharded).  use_pallas_sweep='auto'
    therefore resolves exactly as on a single device.
    """
    rules = rules_for(config)
    import dataclasses
    return dataclasses.replace(rules, pallas_shard_mesh=mesh,
                               pallas_shard_axis=data_axis)


def make_sharded_step(config: ADMMConfig, mesh: Mesh,
                      data_axis: str = 'data', donate: bool = True):
    """Jit the epoch update with explicit DP shardings over `mesh`.

    The returned function has the same (state, x, y) -> state signature as
    the single-device step; XLA inserts all cross-device collectives.
    """
    rules = _sharded_rules(config, mesh, data_axis)
    st_sh = state_shardings(mesh, data_axis)
    fn = functools.partial(admm_step, rules=rules)
    return jax.jit(
        fn,
        in_shardings=(st_sh, batch_sharding(mesh, 3, 0, data_axis),
                      batch_sharding(mesh, 2, 0, data_axis)),
        out_shardings=st_sh,
        donate_argnums=(0,) if donate else ())


def make_sharded_epoch_fn(config: ADMMConfig, mesh: Mesh,
                          data_axis: str = 'data', donate: bool = True):
    """Sharded fused epoch program: step + train/val losses in ONE
    executable (see core.step.make_epoch_fn for why this matters).
    Signature: (state, x, y, vx, vy) -> (state, metrics)."""
    from admm_lstm_tpu.core.step import admm_step_im
    from admm_lstm_tpu.models.lstm import mse_loss_im
    rules = _sharded_rules(config, mesh, data_axis)
    st_sh = state_shardings(mesh, data_axis)
    x_sh = batch_sharding(mesh, 3, 0, data_axis)
    y_sh = batch_sharding(mesh, 2, 0, data_axis)
    rep = NamedSharding(mesh, P())

    def epoch(state, x, y, vx, vy):
        x_im = jnp.transpose(x, (1, 2, 0)).astype(jnp.float32)
        vx_im = jnp.transpose(vx, (1, 2, 0)).astype(jnp.float32)
        y_im = jnp.transpose(y).astype(jnp.float32)
        vy_im = jnp.transpose(vy).astype(jnp.float32)
        state = admm_step_im(state, x_im, y_im, rules)
        return state, {
            'train_loss': mse_loss_im(state.params, x_im, y_im,
                                      rules.precision),
            'val_loss': mse_loss_im(state.params, vx_im, vy_im,
                                    rules.precision),
        }

    # Validation arrays are replicated: their batch need not divide the
    # mesh, and the redundant eval is negligible next to the train step.
    return jax.jit(
        epoch,
        in_shardings=(st_sh, x_sh, y_sh, rep, rep),
        out_shardings=(st_sh, {'train_loss': rep, 'val_loss': rep}),
        donate_argnums=(0,) if donate else ())


def make_sharded_multi_epoch_fn(config: ADMMConfig, mesh: Mesh,
                                num_epochs: int, data_axis: str = 'data',
                                donate: bool = True,
                                with_residuals: bool = False):
    """Sharded epoch-chunked program: `num_epochs` ADMM epochs inside ONE
    device program (`lax.scan` over epochs), the distributed counterpart
    of core.step.make_multi_epoch_fn.  All consensus psums stay inside
    the single program; the host dispatches once per chunk.
    Signature: (state, x, y, vx, vy) -> (state, metric trajectories)."""
    from jax import lax

    from admm_lstm_tpu.core.residuals import admm_residuals_im, dual_residuals
    from admm_lstm_tpu.core.step import admm_step_im
    from admm_lstm_tpu.models.lstm import mse_loss_im
    rules = _sharded_rules(config, mesh, data_axis)
    st_sh = state_shardings(mesh, data_axis)
    x_sh = batch_sharding(mesh, 3, 0, data_axis)
    y_sh = batch_sharding(mesh, 2, 0, data_axis)
    rep = NamedSharding(mesh, P())

    def run(state, x, y, vx, vy):
        # Hoist the batch-minor transposes out of the epoch scan (see
        # core.step._cached_multi_epoch).  GSPMD keeps the batch shard
        # local: the transpose just moves the sharded axis to minor.
        x_im = jnp.transpose(x, (1, 2, 0)).astype(jnp.float32)
        vx_im = jnp.transpose(vx, (1, 2, 0)).astype(jnp.float32)
        y_im = jnp.transpose(y).astype(jnp.float32)
        vy_im = jnp.transpose(vy).astype(jnp.float32)

        def body(state, _):
            prev_gates = state.gates
            state = admm_step_im(state, x_im, y_im, rules)
            metrics = {
                'train_loss': mse_loss_im(state.params, x_im, y_im,
                                          rules.precision),
                'val_loss': mse_loss_im(state.params, vx_im, vy_im,
                                        rules.precision),
            }
            if with_residuals:
                metrics.update(admm_residuals_im(state, x_im,
                                                 rules.precision))
                metrics.update(dual_residuals(state, prev_gates))
            return state, metrics

        return lax.scan(body, state, None, length=num_epochs)

    return jax.jit(run,
                   in_shardings=(st_sh, x_sh, y_sh, rep, rep),
                   out_shardings=(st_sh, None),
                   donate_argnums=(0,) if donate else ())


def make_sharded_multi_epoch_best_fn(config: ADMMConfig, mesh: Mesh,
                                     num_epochs: int,
                                     data_axis: str = 'data',
                                     with_residuals: bool = False):
    """Sharded epoch-chunked program WITH the on-device best-validation
    iterate carry — the distributed twin of
    core.step.make_multi_epoch_best_fn.  The tracked params are
    replicated (weights are replicated under DP), so the per-epoch
    tree-where costs nothing next to the slab work and the carried best
    params stay consistent across devices by construction.

    Signature: (state, best_val, best_params, x, y, vx, vy) ->
    (state, best_val, best_params, metrics); state and best_params are
    DONATED.
    """
    from jax import lax

    from admm_lstm_tpu.core.residuals import admm_residuals_im, dual_residuals
    from admm_lstm_tpu.core.step import admm_step_im
    from admm_lstm_tpu.models.lstm import mse_loss_im
    rules = _sharded_rules(config, mesh, data_axis)
    st_sh = state_shardings(mesh, data_axis)
    x_sh = batch_sharding(mesh, 3, 0, data_axis)
    y_sh = batch_sharding(mesh, 2, 0, data_axis)
    rep = NamedSharding(mesh, P())
    params_rep = jax.tree.map(lambda _: rep, _PARAMS_TREE)

    def run(state, best_val, best_params, x, y, vx, vy):
        x_im = jnp.transpose(x, (1, 2, 0)).astype(jnp.float32)
        vx_im = jnp.transpose(vx, (1, 2, 0)).astype(jnp.float32)
        y_im = jnp.transpose(y).astype(jnp.float32)
        vy_im = jnp.transpose(vy).astype(jnp.float32)

        def body(carry, _):
            state, best_val, best_params = carry
            prev_gates = state.gates
            state = admm_step_im(state, x_im, y_im, rules)
            tl = mse_loss_im(state.params, x_im, y_im, rules.precision)
            vl = mse_loss_im(state.params, vx_im, vy_im, rules.precision)
            metrics = {'train_loss': tl, 'val_loss': vl}
            if with_residuals:
                metrics.update(admm_residuals_im(state, x_im,
                                                 rules.precision))
                metrics.update(dual_residuals(state, prev_gates))
            better = vl < best_val
            best_val = jnp.where(better, vl, best_val)
            best_params = jax.tree.map(
                lambda new, old: jnp.where(better, new, old),
                state.params, best_params)
            return (state, best_val, best_params), metrics

        (state, best_val, best_params), metrics = lax.scan(
            body, (state, best_val, best_params), None, length=num_epochs)
        return state, best_val, best_params, metrics

    return jax.jit(run,
                   in_shardings=(st_sh, rep, params_rep, x_sh, y_sh, rep,
                                 rep),
                   out_shardings=(st_sh, rep, params_rep, None),
                   donate_argnums=(0, 2))
