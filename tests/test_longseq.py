"""Long-sequence capability (SURVEY §5 long-context; round-2 verdict #3).

The reference's longest shipped sequence is T=60 (YahooFinance) with a
dead PTB path at T=1000 (demo.py:220).  These tests exercise the build's
long-T tiers on PTB-scale synthetic sequences:

  * Gauss-Seidel (scan) vs Jacobi (time-parallel) QUALITY at T=256:
    the Jacobi relaxation's fixed point must stay in the scan's
    neighborhood at long horizons, not just at T<=60.
  * Time-SHARDED Jacobi == unsharded Jacobi at T=255 on a virtual
    8-device mesh (the sequence-parallel layout for long T).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admm_lstm_tpu import ADMMConfig
from admm_lstm_tpu.core.init import init_admm_state
from admm_lstm_tpu.core.step import make_multi_epoch_fn
from admm_lstm_tpu.data.synthetic import load as synth
from admm_lstm_tpu.models.lstm import init_lstm_params
from admm_lstm_tpu.params import parameter_set


def _problem(batch, seq, hidden, input_size=2):
    tx, ty, vx, vy = synth(batch=batch, seq_len=seq, input_size=input_size,
                           output_size=1, val_batch=16)
    params = init_lstm_params(jax.random.PRNGKey(0), input_size, hidden, 1)
    return (tuple(jnp.asarray(a) for a in (tx, ty, vx, vy)), params)


@pytest.mark.slow
def test_jacobi_quality_tracks_scan_at_long_t():
    """30-epoch Jacobi loss within 5% of Gauss-Seidel at T=256."""
    (tx, ty, vx, vy), params = _problem(batch=64, seq=256, hidden=8)
    ps = parameter_set('Synthetic')
    vals = {}
    for sweep in ('gauss_seidel', 'jacobi'):
        cfg = ADMMConfig(sweep_mode=sweep, hidden_size=8)
        run = make_multi_epoch_fn(cfg, 30, donate=True)
        state = init_admm_state(params, tx, ps, cfg)
        _, m = run(state, tx, ty, vx, vy)
        tr = np.asarray(m['train_loss'])
        assert np.all(np.isfinite(tr)), sweep
        assert tr[-1] < tr[0], f'{sweep} must make progress at T=256'
        vals[sweep] = float(tr[-1])
    assert vals['jacobi'] <= vals['gauss_seidel'] * 1.05, vals


@pytest.mark.slow
def test_time_sharded_jacobi_matches_unsharded_long_t():
    """Sequence parallelism at long T: slabs sharded over the TIME axis
    across 8 virtual devices reproduce the unsharded Jacobi trajectory.
    T+1 = 256 divides the mesh."""
    from admm_lstm_tpu.parallel import make_mesh
    from admm_lstm_tpu.parallel.sharding import state_shardings
    import functools

    from admm_lstm_tpu.core.step import admm_step, rules_for

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices (conftest sets XLA_FLAGS)')
    (tx, ty, _, _), params = _problem(batch=32, seq=255, hidden=4)
    ps = parameter_set('Synthetic')
    cfg = ADMMConfig(sweep_mode='jacobi', hidden_size=4)

    ref = init_admm_state(params, tx, ps, cfg)
    step = functools.partial(admm_step, rules=rules_for(cfg))
    jstep = jax.jit(step)
    for _ in range(3):
        ref = jstep(ref, tx, ty)

    mesh = make_mesh((8,), ('data',))
    st_sh = state_shardings(mesh, shard_time=True)
    ts = jax.tree.map(jax.device_put,
                      init_admm_state(params, tx, ps, cfg), st_sh)
    ts_step = jax.jit(step, in_shardings=(st_sh, None, None),
                      out_shardings=st_sh)
    for _ in range(3):
        ts = ts_step(ts, tx, ty)

    np.testing.assert_allclose(np.asarray(ts.gates.c),
                               np.asarray(ref.gates.c), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ts.params.wh),
                               np.asarray(ref.params.wh), atol=1e-5)
