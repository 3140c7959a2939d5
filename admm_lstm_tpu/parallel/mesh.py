"""Device mesh construction and multi-host bring-up.

The reference is strictly single-process/single-device (SURVEY §2.2: no
torch.distributed anywhere); this module is the new TPU-native distribution
layer: a `jax.sharding.Mesh` over the chips of one or many hosts, with the
ADMM batch axis sharded over the 'data' axis and XLA/GSPMD inserting the
ICI/DCN collectives (psums of gradient/objective reductions) automatically.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ('data',),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    shape=None uses all devices on a single 'data' axis.  For hybrid
    DP x TP meshes pass shape=(n_data, n_model), axis_names=('data','model').
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),)
        axis_names = tuple(axis_names)[:1]
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f'mesh shape {shape} needs {n} devices, '
                         f'have {len(devices)}')
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Single-controller multi-host bring-up (jax.distributed).

    On TPU pods the arguments are discovered from the environment; pass them
    explicitly for manual clusters.  Safe to call once per process before
    any collective computation.
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
