"""admm_lstm_tpu — a TPU-native ADMM training framework for LSTM networks.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
ADMM-LSTM codebase (Frederick2309/ADMM-LSTM): training a single-layer
LSTM + linear head *without backpropagation-through-time* via an ADMM
fixed-point iteration over a block-separable reformulation of the LSTM.

Layout (see docs/ARCHITECTURE.md):
  core/      ADMMState pytree + the jitted functional `admm_step`
  solvers/   closed-form / prox-linear subproblem solvers
  kernels/   Pallas TPU kernels for the fused hot paths
  models/    the LSTM-Linear model as pure functions (lax.scan forward)
  variants/  fast / no-dual-y / ADMM-L / ADMM-S / gradient baselines
  parallel/  jax.sharding Mesh construction + data-parallel consensus
  data/      dataset loaders (GoogleStock, GEFCOM2012, YahooFinance, HAR, DNA1)
  utils/     logging, timing, plotting, config
  ckpt/      orbax checkpoint/resume of the full ADMM state
"""

__version__ = '0.1.0'

import os as _os

# Persistent XLA compilation cache: on remote-compile TPU environments a
# cold compile of the epoch program costs minutes; with the cache it is
# sub-second on every later run.  Opt out with ADMM_TPU_NO_COMPILATION_CACHE.
if not _os.environ.get('ADMM_TPU_NO_COMPILATION_CACHE'):
    try:
        import jax as _jax
        _cache_dir = _os.environ.get(
            'ADMM_TPU_COMPILATION_CACHE_DIR',
            _os.path.join(_os.path.expanduser('~'), '.cache',
                          'admm_lstm_tpu_xla'))
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update('jax_compilation_cache_dir', _cache_dir)
        _jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass

from admm_lstm_tpu.utils.config import ADMMConfig, ParameterSet
from admm_lstm_tpu.params import example_parameter_dictionary, default_epoch
from admm_lstm_tpu.core.state import ADMMState
from admm_lstm_tpu.core.step import admm_step, make_admm_step
from admm_lstm_tpu.core.init import init_admm_state
from admm_lstm_tpu.models.lstm import LSTMParams, lstm_forward, init_lstm_params
from admm_lstm_tpu.api import (ADMMBasedOptimizer, train, train_scenarios,
                               train_sharded)

__all__ = [
    'ADMMConfig', 'ParameterSet', 'ADMMState',
    'admm_step', 'make_admm_step', 'init_admm_state',
    'LSTMParams', 'lstm_forward', 'init_lstm_params',
    'ADMMBasedOptimizer', 'train', 'train_sharded', 'train_scenarios',
    'example_parameter_dictionary', 'default_epoch',
]
