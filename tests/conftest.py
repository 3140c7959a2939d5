"""Test harness configuration.

Tests run on CPU with 8 virtual devices (the standard JAX idiom for testing
multi-chip sharding without hardware); must run before jax is imported.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
# The axon TPU plugin in this image ignores JAX_PLATFORMS; the legacy
# variable does take effect, so set both.
os.environ.setdefault('JAX_PLATFORM_NAME', 'cpu')
os.environ.setdefault('ADMM_TPU_NO_FILELOG', '1')
_flag = '--xla_force_host_platform_device_count=8'
if _flag not in os.environ.get('XLA_FLAGS', ''):
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') + ' ' + _flag).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize imports jax and registers the axon TPU
# backend before conftest runs, so env vars alone are too late; flip the
# platform at the config level (backends initialize lazily, so this wins as
# long as no test module touched a device yet).
import jax

jax.config.update('jax_platforms', 'cpu')
