"""Observability utilities tests."""

import os
import time

from admm_lstm_tpu.utils.observe import ThroughputMeter, annotate, profile_trace


def test_throughput_meter():
    meter = ThroughputMeter(window=10)
    for _ in range(5):
        meter.update()
        time.sleep(0.001)
    assert meter.total == 5
    assert meter.iters_per_s > 0
    meter.report('test ')


def test_profile_trace_noop():
    with profile_trace(None):
        pass


def test_profile_trace_capture(tmp_path):
    import jax.numpy as jnp
    with profile_trace(str(tmp_path)):
        with annotate('test-region'):
            _ = jnp.ones(8).sum().block_until_ready()
    # A trace directory should have been produced.
    assert any(os.scandir(tmp_path))


def test_multi_epoch_fn_matches_loop():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from admm_lstm_tpu import ADMMConfig
    from admm_lstm_tpu.core.init import init_admm_state
    from admm_lstm_tpu.core.step import (make_admm_step, make_epoch_fn,
                                         make_multi_epoch_fn)
    from admm_lstm_tpu.data.synthetic import load as synth
    from admm_lstm_tpu.models.lstm import init_lstm_params
    from admm_lstm_tpu.params import parameter_set

    tx, ty, vx, vy = synth(batch=24, seq_len=4, input_size=1, output_size=1,
                           val_batch=8)
    tx, ty, vx, vy = map(jnp.asarray, (tx, ty, vx, vy))
    params = init_lstm_params(jax.random.PRNGKey(0), 1, 3, 1)
    cfg = ADMMConfig()
    ps = parameter_set('Synthetic')

    # Reference: plain step loop.
    step = make_admm_step(cfg, donate=False)
    s1 = init_admm_state(params, tx, ps, cfg)
    for _ in range(4):
        s1 = step(s1, tx, ty)

    # Fused per-epoch program.
    epoch_fn = make_epoch_fn(cfg, donate=False)
    s2 = init_admm_state(params, tx, ps, cfg)
    for _ in range(4):
        s2, metrics2 = epoch_fn(s2, tx, ty, vx, vy)

    # Device-resident multi-epoch scan.
    run4 = make_multi_epoch_fn(cfg, 4, donate=False)
    s3, metrics3 = run4(init_admm_state(params, tx, ps, cfg), tx, ty, vx, vy)

    np.testing.assert_allclose(np.asarray(s2.params.wy),
                               np.asarray(s1.params.wy), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s3.params.wy),
                               np.asarray(s1.params.wy), atol=1e-6)
    assert metrics3['train_loss'].shape == (4,)
    np.testing.assert_allclose(float(metrics3['train_loss'][-1]),
                               float(metrics2['train_loss']), atol=1e-6)


def test_runtime_util_parity():
    """Reference _global.py runtime utilities (C6): decorators + probes."""
    from admm_lstm_tpu.utils.logging import (callback, current_memory_usage,
                                             deprecated, device_memory_stats,
                                             total_memory)

    @deprecated('old thing')
    def legacy(a):
        return a + 1

    assert legacy(1) == 2

    calls = []

    @callback(calls.append, 'done')
    def work(a):
        return a * 2

    assert work(3) == 6
    assert calls == ['done']

    assert current_memory_usage() > 1024 ** 2      # at least 1 MB resident
    assert 0.5 < total_memory() < 100000           # plausible GB figure
    assert isinstance(device_memory_stats(), dict)
