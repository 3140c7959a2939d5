"""Multi-process (multi-host analogue) bring-up test.

Spawns TWO real OS processes, each owning 2 virtual CPU devices, joined by
`initialize_multihost` (parallel/mesh.py) into one 4-device 'data' mesh.
The sharded ADMM step's consensus psums then cross a genuine process
boundary (gloo), proving the `jax.distributed` path the framework uses on
multi-host TPU pods — a subsystem the reference lacks entirely (SURVEY
§2.2: no torch.distributed anywhere).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, 'multihost_worker.py')


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def _run_procs(nprocs, out):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS', 'JAX_PLATFORM_NAME')}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), str(nprocs), str(port), out],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(nprocs)]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout)
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, f'worker failed:\n{text[-4000:]}'


@pytest.mark.slow
def test_two_process_distributed_step(tmp_path):
    out = str(tmp_path / 'proc0.npz')
    _run_procs(2, out)

    # Single-process oracle: the same 3 steps on one device.
    import jax
    import jax.numpy as jnp
    from admm_lstm_tpu import ADMMConfig
    from admm_lstm_tpu.core.init import init_admm_state
    from admm_lstm_tpu.core.step import make_admm_step
    from admm_lstm_tpu.data.synthetic import load as synth
    from admm_lstm_tpu.models.lstm import init_lstm_params, mse_loss
    from admm_lstm_tpu.params import parameter_set

    tx, ty, _, _ = synth(batch=16, seq_len=5, input_size=2, output_size=1)
    tx, ty = jnp.asarray(tx), jnp.asarray(ty)
    params = init_lstm_params(jax.random.PRNGKey(0), 2, 4, 1)
    cfg = ADMMConfig()
    state = init_admm_state(params, tx, parameter_set('Synthetic'), cfg)
    step = make_admm_step(cfg, donate=False)
    for _ in range(3):
        state = step(state, tx, ty)

    got = np.load(out)
    np.testing.assert_allclose(got['wy'], np.asarray(state.params.wy),
                               atol=1e-5)
    np.testing.assert_allclose(got['wx'], np.asarray(state.params.wx),
                               atol=1e-5)
    np.testing.assert_allclose(got['wh'], np.asarray(state.params.wh),
                               atol=1e-5)
    np.testing.assert_allclose(got['loss'],
                               float(mse_loss(state.params, tx, ty)),
                               atol=1e-5)
    assert float(got['chunk_secs']) > 0
    assert np.isfinite(float(got['chunk_final']))

    # Round-4: the shard_map'd Pallas sweep across the process boundary
    # must match the single-process kernel-forced trajectory.
    cfg_k = ADMMConfig(use_pallas_sweep=True)
    state_k = init_admm_state(params, tx, parameter_set('Synthetic'),
                              cfg_k)
    step_k = make_admm_step(cfg_k, donate=False)
    for _ in range(2):
        state_k = step_k(state_k, tx, ty)
    np.testing.assert_allclose(got['wy_kernel'],
                               np.asarray(state_k.params.wy), atol=1e-5)
    np.testing.assert_allclose(got['wh_kernel'],
                               np.asarray(state_k.params.wh), atol=1e-5)


@pytest.mark.slow
def test_four_process_distributed_step(tmp_path):
    """Scaling the bring-up path to FOUR real processes (4 x 2 virtual
    devices = an 8-way data mesh): the consensus psums cross three
    process boundaries, and the 20-epoch chunked program's wall time is
    recorded (the chunk-dispatch overhead datum for docs/ROADMAP.md —
    not an efficiency claim; these are CPU gloo processes on one host).
    """
    out = str(tmp_path / 'proc0_4.npz')
    _run_procs(4, out)
    got = np.load(out)
    assert np.all(np.isfinite(got['wy']))
    assert np.isfinite(float(got['chunk_final']))
    # Correctness oracle: the 4-process replicated weights match the
    # single-process run (same global batch, finer shards).
    import jax
    import jax.numpy as jnp
    from admm_lstm_tpu import ADMMConfig
    from admm_lstm_tpu.core.init import init_admm_state
    from admm_lstm_tpu.core.step import make_admm_step
    from admm_lstm_tpu.data.synthetic import load as synth
    from admm_lstm_tpu.models.lstm import init_lstm_params
    from admm_lstm_tpu.params import parameter_set

    tx, ty, _, _ = synth(batch=16, seq_len=5, input_size=2, output_size=1)
    tx, ty = jnp.asarray(tx), jnp.asarray(ty)
    params = init_lstm_params(jax.random.PRNGKey(0), 2, 4, 1)
    state = init_admm_state(params, tx, parameter_set('Synthetic'),
                            ADMMConfig())
    step = make_admm_step(ADMMConfig(), donate=False)
    for _ in range(3):
        state = step(state, tx, ty)
    np.testing.assert_allclose(got['wy'], np.asarray(state.params.wy),
                               atol=1e-5)
    np.testing.assert_allclose(got['wh'], np.asarray(state.params.wh),
                               atol=1e-5)
