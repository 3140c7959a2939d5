"""Checkpoint / resume of the full ADMM optimizer state via orbax.

The reference can only pickle the final trained module (`torch.save(model)`,
demo.py:302-308) and never persists optimizer state, so training cannot
resume.  Here the complete ADMMState pytree — weights, every gate/dual
slab, `a`, the penalty constants, and the epoch counter — round-trips, so
an interrupted run resumes exactly where it stopped (same trajectory,
deterministic).

Also provides `save_model`/`load_model` for final-weights-only artifacts
(the reference's SAVED_MODELS/*.pt analogue) as portable .npz files.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from admm_lstm_tpu.core.state import ADMMState
from admm_lstm_tpu.models.lstm import GATE_ORDER, LSTMParams, params_from_dict
from admm_lstm_tpu.utils.logging import info


class CheckpointManager:
    """Orbax-backed manager for ADMMState checkpoints under a directory.

    With `async_save=True` the device->disk write happens on a background
    thread: `save` enqueues and returns immediately (training continues on
    device while the previous epoch's state serializes), and completion is
    awaited at the next save / `wait` / `close`.
    """

    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = False) -> None:
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self._async = async_save
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, state: ADMMState, step: Optional[int] = None) -> None:
        step = int(state.epoch) if step is None else step
        self._mgr.save(step, args=self._ocp.args.StandardSave(state))
        if not self._async:
            self._mgr.wait_until_finished()
        info(f'Checkpoint {"enqueued" if self._async else "saved"} at step '
             f'{step} -> {self.directory}')

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: ADMMState,
                step: Optional[int] = None) -> ADMMState:
        """Restore into the structure/shardings of `template`."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f'no checkpoints in {self.directory}')
        restored = self._mgr.restore(
            step, args=self._ocp.args.StandardRestore(template))
        return restored

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_model(name: str, params,
               save_dir: str = 'SAVED_MODELS') -> str:
    """Portable final-model artifact (reference: demo.py:302-308).

    Accepts single-layer LSTMParams or the stacked variant's
    StackedParams (saved as per-layer l{k}_* blocks + the shared head).
    """
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, f'{name}.npz')
    arrays = {}
    if hasattr(params, 'layers'):   # StackedParams
        for k, layer in enumerate(params.layers):
            for gi, g in enumerate(GATE_ORDER):
                arrays[f'l{k}_x2{g}'] = np.asarray(layer.wx[gi])
                arrays[f'l{k}_h2{g}'] = np.asarray(layer.wh[gi])
            arrays[f'l{k}_wy'] = np.asarray(layer.wy)
        arrays['wy'] = np.asarray(params.wy)
    else:
        for gi, g in enumerate(GATE_ORDER):
            arrays[f'x2{g}'] = np.asarray(params.wx[gi])
            arrays[f'h2{g}'] = np.asarray(params.wh[gi])
        arrays['wy'] = np.asarray(params.wy)
    np.savez(path, **arrays)
    info(f'{name}: Saved model to {path}.')
    return path


def load_model(path: str):
    """Inverse of save_model; returns LSTMParams or StackedParams."""
    data = np.load(path)
    if any(k.startswith('l0_') for k in data.files):
        from admm_lstm_tpu.variants.stacked import StackedParams
        layers = []
        k = 0
        while f'l{k}_x2i' in data.files:
            layers.append(params_from_dict(
                {name[len(f'l{k}_'):]: data[name] for name in data.files
                 if name.startswith(f'l{k}_')}))
            k += 1
        import jax.numpy as jnp
        return StackedParams(layers=tuple(layers),
                             wy=jnp.asarray(data['wy']))
    return params_from_dict({k: data[k] for k in data.files})
