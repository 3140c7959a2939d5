"""Distributed-without-a-cluster tests: 8 virtual CPU devices.

The consensus property under test: the data-parallel sharded step must
produce the same state trajectory as the single-device step (up to
reduction reassociation), because every cross-sample reduction becomes a
psum over the mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admm_lstm_tpu import ADMMConfig
from admm_lstm_tpu.core.init import init_admm_state
from admm_lstm_tpu.core.step import make_admm_step
from admm_lstm_tpu.data.synthetic import load as synth
from admm_lstm_tpu.models.lstm import init_lstm_params, mse_loss
from admm_lstm_tpu.parallel import (make_mesh, make_sharded_step, shard_batch,
                                    shard_state)
from admm_lstm_tpu.params import parameter_set

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 (virtual) devices')


@pytest.fixture(scope='module')
def problem():
    tx, ty, vx, vy = synth(batch=64, seq_len=6, input_size=2, output_size=1)
    params = init_lstm_params(jax.random.PRNGKey(0), 2, 5, 1)
    return (jnp.asarray(tx), jnp.asarray(ty)), params


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ('data',)
    mesh2 = make_mesh((2, 4), ('data', 'model'))
    assert mesh2.axis_names == ('data', 'model')
    with pytest.raises(ValueError):
        make_mesh((1000,))


def test_sharded_step_matches_single_device(problem):
    (tx, ty), params = problem
    cfg = ADMMConfig()
    ps = parameter_set('Synthetic')

    ref_state = init_admm_state(params, tx, ps, cfg)
    ref_step = make_admm_step(cfg, donate=False)

    mesh = make_mesh()
    dp_state = shard_state(init_admm_state(params, tx, ps, cfg), mesh)
    sx, sy = shard_batch(tx, ty, mesh)
    dp_step = make_sharded_step(cfg, mesh, donate=False)

    for step_i in range(5):
        ref_state = ref_step(ref_state, tx, ty)
        dp_state = dp_step(dp_state, sx, sy)

    for name in ('i', 'f', 'g', 'o', 'c', 'h'):
        np.testing.assert_allclose(
            np.asarray(getattr(dp_state.gates, name)),
            np.asarray(getattr(ref_state.gates, name)),
            atol=1e-5, err_msg=f'gate {name}')
        np.testing.assert_allclose(
            np.asarray(getattr(dp_state.duals, name)),
            np.asarray(getattr(ref_state.duals, name)),
            atol=1e-5, err_msg=f'dual {name}')
    np.testing.assert_allclose(np.asarray(dp_state.params.wx),
                               np.asarray(ref_state.params.wx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dp_state.params.wh),
                               np.asarray(ref_state.params.wh), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dp_state.params.wy),
                               np.asarray(ref_state.params.wy), atol=1e-5)


def test_sharded_placement(problem):
    (tx, ty), params = problem
    mesh = make_mesh()
    state = shard_state(init_admm_state(params, tx,
                                        parameter_set('Synthetic'),
                                        ADMMConfig()), mesh)
    # Slabs are sharded over batch; weights replicated.
    assert not state.gates.i.sharding.is_fully_replicated
    assert state.params.wx.sharding.is_fully_replicated


def test_sharded_training_reduces_loss(problem):
    (tx, ty), params = problem
    cfg = ADMMConfig()
    mesh = make_mesh()
    state = shard_state(init_admm_state(params, tx, parameter_set('Synthetic'),
                                        cfg), mesh)
    sx, sy = shard_batch(tx, ty, mesh)
    step = make_sharded_step(cfg, mesh, donate=False)
    l0 = float(mse_loss(state.params, tx, ty))
    for _ in range(20):
        state = step(state, sx, sy)
    l1 = float(mse_loss(state.params, tx, ty))
    assert np.isfinite(l1) and l1 < l0


def test_time_sharded_jacobi_matches_unsharded(problem):
    """Sequence parallelism: slabs sharded on the TIME axis under the
    Jacobi sweep produce the same trajectory as unsharded execution."""
    import functools
    from admm_lstm_tpu.core.step import admm_step, rules_for
    from admm_lstm_tpu.parallel.sharding import state_shardings

    (tx, ty), params = problem
    cfg = ADMMConfig(sweep_mode='jacobi')
    ps = parameter_set('Synthetic')

    ref_state = init_admm_state(params, tx, ps, cfg)
    ref_step = make_admm_step(cfg, donate=False)

    # Time axis T+1 = 7 is not divisible by 8; use a 7-device mesh slice.
    mesh = make_mesh((7,), devices=jax.devices()[:7])
    st_sh = state_shardings(mesh, shard_time=True)
    ts_state = jax.tree.map(jax.device_put,
                            init_admm_state(params, tx, ps, cfg), st_sh)
    rules = rules_for(cfg)
    ts_step = jax.jit(functools.partial(admm_step, rules=rules),
                      in_shardings=(st_sh, None, None), out_shardings=st_sh)

    for _ in range(3):
        ref_state = ref_step(ref_state, tx, ty)
        ts_state = ts_step(ts_state, tx, ty)

    np.testing.assert_allclose(np.asarray(ts_state.gates.c),
                               np.asarray(ref_state.gates.c), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ts_state.params.wh),
                               np.asarray(ref_state.params.wh), atol=1e-5)


def test_train_sharded_api(problem):
    from admm_lstm_tpu.api import train_sharded
    (tx, ty), params = problem
    # Odd validation batch exercises the replicated-val path.
    vx, vy = tx[:13], ty[:13]
    out = train_sharded(tx, ty, vx, vy, parameter_set('Synthetic'),
                        ADMMConfig(epochs=3, mesh_shape=(8,)),
                        params=params, log_every=0)
    assert len(out['train_loss']) == 4
    assert np.isfinite(out['val_loss'][-1])


def test_train_scenarios_vmapped():
    """S independent ADMM trainings in one vmapped program
    (BASELINE config 3: scenario batch on one chip, loose variant)."""
    import numpy as np
    from admm_lstm_tpu.api import train_scenarios
    from admm_lstm_tpu.data.synthetic import load as synth
    from admm_lstm_tpu.params import parameter_set
    from admm_lstm_tpu.utils.config import ADMMConfig

    scen = [synth(batch=32, seq_len=5, input_size=1, output_size=1,
                  val_batch=8, seed=s) for s in range(3)]
    xs = np.stack([s[0] for s in scen])
    ys = np.stack([s[1] for s in scen])
    vxs = np.stack([s[2] for s in scen])
    vys = np.stack([s[3] for s in scen])
    cfg = ADMMConfig(variant='no_dual_y', epochs=15, hidden_size=5,
                     wy_lipschitz=True)
    out = train_scenarios(xs, ys, vxs, vys, parameter_set('Synthetic'), cfg)
    assert out['train_loss'].shape == (3, 16)
    assert np.isfinite(out['val_loss']).all()
    # Every scenario improves on its initial loss.
    assert (out['train_loss'][:, -1] < out['train_loss'][:, 0]).all()
    # Scenario params are independent (different seeds/data -> different wy).
    wy = np.asarray(out['params'].wy)
    assert wy.shape[0] == 3
    assert not np.allclose(wy[0], wy[1])


def test_train_sharded_resume_and_residuals(problem, tmp_path):
    """First-class train_sharded: checkpoint mid-run, resume on the mesh,
    reproduce the uninterrupted trajectory exactly; dual+primal residual
    recording works through the sharded chunked loop."""
    from admm_lstm_tpu.api import train_sharded
    (tx, ty), params = problem
    vx, vy = tx[:13], ty[:13]
    ps = parameter_set('Synthetic')
    cfg = ADMMConfig(epochs=6, mesh_shape=(8,))

    full = train_sharded(tx, ty, vx, vy, ps, cfg, params=params,
                         log_every=0, record_residuals=True)
    assert len(full['residuals']) == 6
    assert all(np.isfinite(v) for d in full['residuals'] for v in d.values())

    ckpt = str(tmp_path / 'shard_ckpt')
    part = train_sharded(tx, ty, vx, vy, ps, cfg.replace(epochs=3),
                         params=params, log_every=0, checkpoint_dir=ckpt,
                         checkpoint_every=3, async_checkpoint=False)
    resumed = train_sharded(tx, ty, vx, vy, ps, cfg, params=params,
                            log_every=0, resume_from=ckpt)
    # Epochs 4..6 of the resumed run match the uninterrupted run.
    np.testing.assert_allclose(resumed['val_loss'][-3:],
                               full['val_loss'][-3:], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(resumed['params'].wy),
                               np.asarray(full['params'].wy), atol=1e-6)


def test_tensor_parallel_hidden_sharding(problem):
    """P4 (tensor parallelism): hidden axis sharded over a 'model' mesh
    axis composed with batch DP on a 2-D (data, model) mesh.  GSPMD
    inserts the hidden-contraction collectives (h2* recurrence, h @ wy);
    the trajectory must match single-device execution."""
    import functools
    from admm_lstm_tpu.core.step import admm_step, rules_for
    from admm_lstm_tpu.parallel.sharding import state_shardings

    (tx, ty), _ = problem
    params = init_lstm_params(jax.random.PRNGKey(0), 2, 8, 1)  # H = 8 = 2*4
    cfg = ADMMConfig(hidden_size=8)
    ps = parameter_set('Synthetic')

    ref_state = init_admm_state(params, tx, ps, cfg)
    ref_step = make_admm_step(cfg, donate=False)

    mesh = make_mesh((2, 4), ('data', 'model'))
    st_sh = state_shardings(mesh, model_axis='model')
    tp_state = jax.tree.map(jax.device_put,
                            init_admm_state(params, tx, ps, cfg), st_sh)
    rules = rules_for(cfg)
    tp_step = jax.jit(functools.partial(admm_step, rules=rules),
                      in_shardings=(st_sh, None, None), out_shardings=st_sh)

    for _ in range(3):
        ref_state = ref_step(ref_state, tx, ty)
        tp_state = tp_step(tp_state, tx, ty)

    assert not tp_state.gates.h.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(tp_state.params.wh),
                               np.asarray(ref_state.params.wh), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tp_state.params.wy),
                               np.asarray(ref_state.params.wy), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tp_state.gates.c),
                               np.asarray(ref_state.gates.c), atol=1e-5)


def test_adaptive_rho_sharded_matches_single_device(problem):
    """Residual-balancing rho adaptation runs INSIDE the jitted step, so
    under the data-sharded mesh its residual reductions become global
    psums — every device must adapt rho identically and the trajectory
    must match single-device execution."""
    (tx, ty), params = problem
    cfg = ADMMConfig(adaptive_rho=True)
    ps = parameter_set('Synthetic')

    ref_state = init_admm_state(params, tx, ps, cfg)
    ref_step = make_admm_step(cfg, donate=False)

    mesh = make_mesh()
    dp_state = shard_state(init_admm_state(params, tx, ps, cfg), mesh)
    sx, sy = shard_batch(tx, ty, mesh)
    dp_step = make_sharded_step(cfg, mesh, donate=False)

    for _ in range(8):
        ref_state = ref_step(ref_state, tx, ty)
        dp_state = dp_step(dp_state, sx, sy)

    for k in 'ifgochy':
        np.testing.assert_allclose(float(getattr(dp_state.rho, k)),
                                   float(getattr(ref_state.rho, k)),
                                   rtol=1e-6, err_msg=f'rho_{k}')
    np.testing.assert_allclose(np.asarray(dp_state.params.wy),
                               np.asarray(ref_state.params.wy), atol=1e-5)


def test_sharded_turbo_matches_single_device(problem):
    """The headline turbo config (Jacobi sweep + exact Gauss-Newton
    weight solve) under the data-sharded mesh: the Gram stack and
    first-order term are reductions over the sharded batch axis, so
    GSPMD must psum them for the per-column solves to see the global
    normal equations."""
    (tx, ty), params = problem
    cfg = ADMMConfig(sweep_mode='jacobi', exact_weight_solve=True)
    ps = parameter_set('Synthetic')

    ref_state = init_admm_state(params, tx, ps, cfg)
    ref_step = make_admm_step(cfg, donate=False)

    mesh = make_mesh()
    dp_state = shard_state(init_admm_state(params, tx, ps, cfg), mesh)
    sx, sy = shard_batch(tx, ty, mesh)
    dp_step = make_sharded_step(cfg, mesh, donate=False)

    for _ in range(5):
        ref_state = ref_step(ref_state, tx, ty)
        dp_state = dp_step(dp_state, sx, sy)

    np.testing.assert_allclose(np.asarray(dp_state.params.wx),
                               np.asarray(ref_state.params.wx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dp_state.params.wh),
                               np.asarray(ref_state.params.wh), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dp_state.gates.h),
                               np.asarray(ref_state.gates.h), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dp_state.duals.c),
                               np.asarray(ref_state.duals.c), atol=1e-5)


@pytest.mark.parametrize('sweep_mode', ['gauss_seidel', 'jacobi'])
def test_dp_pallas_sweep_matches_unsharded(sweep_mode):
    """Round-4: the gate-sweep Pallas kernels compose with data
    parallelism via shard_map — the sharded-with-kernel trajectory must
    be BIT-equal to the unsharded-with-kernel one (the kernel math is
    elementwise + per-batch-column independent, so sharding the lane
    axis changes nothing)."""
    tx, ty, _, _ = synth(batch=256, seq_len=20, input_size=2,
                         output_size=1, val_batch=32)
    tx, ty = jnp.asarray(tx), jnp.asarray(ty)
    params = init_lstm_params(jax.random.PRNGKey(0), 2, 8, 1)
    ps = parameter_set('Synthetic')
    cfg = ADMMConfig(hidden_size=8, use_pallas_sweep=True,
                     sweep_mode=sweep_mode)

    ref_state = init_admm_state(params, tx, ps, cfg)
    ref_step = make_admm_step(cfg, donate=False)

    mesh = make_mesh()
    dp_state = shard_state(init_admm_state(params, tx, ps, cfg), mesh)
    sx, sy = shard_batch(tx, ty, mesh)
    dp_step = make_sharded_step(cfg, mesh, donate=False)

    for _ in range(3):
        ref_state = ref_step(ref_state, tx, ty)
        dp_state = dp_step(dp_state, sx, sy)

    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         ref_state, dp_state)
    assert max(jax.tree.leaves(diffs)) == 0.0, diffs


def test_tensor_parallel_exact_solve_h128():
    """Round-4 VERDICT #7: TP at the scale it exists for.  H = 128 hidden
    sharded 4-way over the 'model' axis (2-D mesh with 2-way DP), with
    the EXACT normal-equation weight solve on — the configuration
    normal_eq.py documents as the H-at-scale remedy (the Gram stack's
    columns shard over the model axis).  Both the fused-einsum and the
    chunked wide-contraction Gram paths must match the single-device
    trajectory."""
    import functools
    from admm_lstm_tpu.core.step import admm_step, rules_for
    from admm_lstm_tpu.parallel.sharding import state_shardings
    from admm_lstm_tpu.solvers import normal_eq as ne

    H = 128
    tx, ty, _, _ = synth(batch=64, seq_len=4, input_size=3, output_size=1,
                         val_batch=8)
    tx, ty = jnp.asarray(tx), jnp.asarray(ty)
    params = init_lstm_params(jax.random.PRNGKey(1), 3, H, 1)
    cfg = ADMMConfig(hidden_size=H, exact_weight_solve=True,
                     use_pallas_chol=False)
    ps = parameter_set('Synthetic')

    for force_chunked in (False, True):
        orig = ne._EINSUM_MAX_ELEMS
        ne._EINSUM_MAX_ELEMS = 0 if force_chunked else orig
        try:
            ref_state = init_admm_state(params, tx, ps, cfg)
            ref_step = jax.jit(functools.partial(admm_step,
                                                 rules=rules_for(cfg)))

            mesh = make_mesh((2, 4), ('data', 'model'))
            st_sh = state_shardings(mesh, model_axis='model')
            tp_state = jax.tree.map(jax.device_put,
                                    init_admm_state(params, tx, ps, cfg),
                                    st_sh)
            tp_step = jax.jit(functools.partial(admm_step,
                                                rules=rules_for(cfg)),
                              in_shardings=(st_sh, None, None),
                              out_shardings=st_sh)
            for _ in range(2):
                ref_state = ref_step(ref_state, tx, ty)
                tp_state = tp_step(tp_state, tx, ty)

            assert not tp_state.params.wh.sharding.is_fully_replicated
            np.testing.assert_allclose(
                np.asarray(tp_state.params.wh),
                np.asarray(ref_state.params.wh), atol=5e-5,
                err_msg=f'chunked={force_chunked}')
            np.testing.assert_allclose(
                np.asarray(tp_state.gates.h),
                np.asarray(ref_state.gates.h), atol=5e-5,
                err_msg=f'chunked={force_chunked}')
        finally:
            ne._EINSUM_MAX_ELEMS = orig


def test_tensor_parallel_exact_solve_blocktri(monkeypatch):
    """Round-5: the block-triangular Gram (default at D > 128) under a
    2-D (data, model) mesh — the mirrored-transpose block assembly must
    survive GSPMD column sharding of the Gram stack's K axis exactly
    like the wide path does.  D = 160 spans a full 128-block plus a
    ragged 32-tail."""
    import functools
    from admm_lstm_tpu.core.step import admm_step, rules_for
    from admm_lstm_tpu.parallel.sharding import state_shardings
    from admm_lstm_tpu.solvers import normal_eq as ne

    I, H = 160, 32
    tx, ty, _, _ = synth(batch=64, seq_len=4, input_size=I, output_size=1,
                         val_batch=8)
    tx, ty = jnp.asarray(tx), jnp.asarray(ty)
    params = init_lstm_params(jax.random.PRNGKey(1), I, H, 1)
    cfg = ADMMConfig(hidden_size=H, exact_weight_solve=True,
                     exact_solve_max_dim=512, use_pallas_chol=False)
    ps = parameter_set('Synthetic')

    # Force past the small-shape einsum threshold so the x-stage
    # (D = 160) actually routes to blocktri.
    monkeypatch.setattr(ne, '_EINSUM_MAX_ELEMS', 0)
    assert ne._gram_strategy(4 * H, I, 4 * 64) == 'blocktri'

    ref_state = init_admm_state(params, tx, ps, cfg)
    ref_step = jax.jit(functools.partial(admm_step, rules=rules_for(cfg)))

    mesh = make_mesh((2, 4), ('data', 'model'))
    st_sh = state_shardings(mesh, model_axis='model')
    tp_state = jax.tree.map(jax.device_put,
                            init_admm_state(params, tx, ps, cfg), st_sh)
    tp_step = jax.jit(functools.partial(admm_step, rules=rules_for(cfg)),
                      in_shardings=(st_sh, None, None),
                      out_shardings=st_sh)
    for _ in range(2):
        ref_state = ref_step(ref_state, tx, ty)
        tp_state = tp_step(tp_state, tx, ty)

    np.testing.assert_allclose(np.asarray(tp_state.params.wx),
                               np.asarray(ref_state.params.wx), atol=5e-5)
    np.testing.assert_allclose(np.asarray(tp_state.gates.h),
                               np.asarray(ref_state.gates.h), atol=5e-5)


def test_sharded_track_best_matches_single_device(problem):
    """Round-4: on-device best-iterate tracking in the SHARDED loop —
    same best epoch and best params as the single-device tracker."""
    from admm_lstm_tpu.api import train, train_sharded

    (tx, ty), params = problem
    vx, vy = tx[:16], ty[:16]
    ps = parameter_set('Synthetic')
    cfg = ADMMConfig(epochs=12, mesh_shape=(8,))

    ref = train(tx, ty, vx, vy, ps, config=cfg, params=params,
                log_every=0, track_best=True)
    dp = train_sharded(tx, ty, vx, vy, ps, config=cfg, params=params,
                       log_every=0, track_best=True)

    assert dp['best_epoch'] == ref['best_epoch']
    np.testing.assert_allclose(np.asarray(dp['params'].wy),
                               np.asarray(ref['params'].wy), atol=1e-5)
    np.testing.assert_allclose(dp['val_loss'], ref['val_loss'],
                               rtol=1e-5, atol=1e-7)
