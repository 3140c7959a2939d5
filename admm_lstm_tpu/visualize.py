"""Prediction visualization over saved models.

Reference parity: comparison_experiment/visualization.py — load every model
artifact in SAVED_MODELS/, run inference on a dataset's test split, and
overlay predictions against the ground truth.

Run: python -m admm_lstm_tpu.visualize [-d GoogleStock]
"""

from __future__ import annotations

import glob
import os
import sys
from typing import Dict

import jax.numpy as jnp
import numpy as np

from admm_lstm_tpu.ckpt.checkpoint import load_model
from admm_lstm_tpu.models.lstm import LSTMParams, lstm_forward
from admm_lstm_tpu.utils.logging import ADMMError, info, warning


def load_models(save_dir: str = 'SAVED_MODELS') -> Dict[str, LSTMParams]:
    """Load all saved model artifacts (visualization.py:47-54)."""
    models: Dict[str, LSTMParams] = {}
    for path in sorted(glob.glob(os.path.join(save_dir, '*.npz'))):
        name = os.path.splitext(os.path.basename(path))[0]
        try:
            models[name] = load_model(path)
        except Exception as e:  # noqa: BLE001 - report and continue
            warning(f'Cannot load {path}: {e}')
    info(f'Loaded {len(models)} model(s) from {save_dir}.')
    return models


def predict_all(models: Dict[str, LSTMParams], test_x) -> Dict[str, np.ndarray]:
    """Run every model on the test inputs (visualization.py:102-109)."""
    test_x = jnp.asarray(test_x)
    return {name: np.asarray(lstm_forward(params, test_x))
            for name, params in models.items()}


def plot_all(predictions: Dict[str, np.ndarray], test_y,
             save_dir: str = 'plots') -> str:
    from admm_lstm_tpu.utils.plotting import plot_predictions
    return plot_predictions(predictions, test_y, save_dir=save_dir)


def main(argv=None) -> int:
    import argparse
    from admm_lstm_tpu.data import load_dataset, supported_datasets
    parser = argparse.ArgumentParser(prog='admm-lstm-tpu-visualize')
    parser.add_argument('--dataset', '-d', default='GoogleStock',
                        choices=supported_datasets)
    parser.add_argument('--save_dir', default='SAVED_MODELS')
    args = parser.parse_args(argv)
    try:
        (_, _, test_x, test_y), _, _ = load_dataset(args.dataset)
        models = load_models(args.save_dir)
        if not models:
            warning('No saved models found; train with --save first.')
            return 1
        plot_all(predict_all(models, test_x), test_y)
        return 0
    except ADMMError as e:
        return e.code


if __name__ == '__main__':
    sys.exit(main())
