"""Convert the reference's shipped SAVED_MODELS/*.pt into this framework's
portable .npz model artifacts.

The reference pickles WHOLE torch modules (demo.py:302-308;
comparison_experiment/visualization.py:47-54 reloads them), which ties the
artifacts to torch + the reference's class definitions.  This tool unpickles
them once (importing the reference in place, never copying its code) and
re-saves just the weights through ckpt.save_model, so `visualize.py`
overlays the reference's five shipped trained models next to models trained
here — a direct head-to-head prediction comparison.

Weight-name mapping:
  blocks/lstm.LSTM      (Fast ADMM-LSTM / SGD / Adam / Adagrad .pt):
      x2{i,f,g,o}, h2{i,f,g,o}, out          -> same names (out -> wy)
  admm_l/main.LSTM_L    (ADMM-LSTM-L.pt):
      W_i{i,f,g,o} -> x2*, W_h{i,f,g,o} -> h2*, W_y -> wy
      (admm_l/main.py:28-46)

Usage:  python tools/convert_reference_models.py \
            [--reference /root/reference] [--out SAVED_MODELS]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_LSTM_L_MAP = {
    'W_ii': 'x2i', 'W_hi': 'h2i', 'W_if': 'x2f', 'W_hf': 'h2f',
    'W_ig': 'x2g', 'W_hg': 'h2g', 'W_io': 'x2o', 'W_ho': 'h2o',
    'W_y': 'wy',
}


def _setup_reference_import(reference: str) -> None:
    """Make the reference's pickled classes importable in place.

    blocks/lstm.LSTM imports cleanly; admm_l.main is a SCRIPT-style module
    whose import would start a training run (admm_l/main.py body), so the
    pickle's `admm_l.main.LSTM_L` is satisfied with an empty nn.Module
    stub instead — unpickling only needs the class object to allocate and
    fill, never its __init__.
    """
    import types

    import torch.nn as nn

    sys.path.insert(0, reference)

    class LSTM_L(nn.Module):  # noqa: D401 - unpickle target only
        pass

    pkg = types.ModuleType('admm_l')
    mainmod = types.ModuleType('admm_l.main')
    mainmod.LSTM_L = LSTM_L
    pkg.main = mainmod
    sys.modules.setdefault('admm_l', pkg)
    sys.modules.setdefault('admm_l.main', mainmod)
    # The reference's _global module creates a log file on import; keep it
    # quiet and out of the repo.
    os.chdir('/tmp')


def convert_file(path: str, out_dir: str) -> str | None:
    import torch

    from admm_lstm_tpu.ckpt import save_model

    name = os.path.splitext(os.path.basename(path))[0]
    module = torch.load(path, map_location='cpu', weights_only=False)
    state = {k: np.asarray(v.detach().cpu(), np.float32)
             for k, v in module.state_dict().items()}
    if 'W_y' in state:           # LSTM_L naming
        weights = {_LSTM_L_MAP[k]: v for k, v in state.items()
                   if k in _LSTM_L_MAP}
    else:                        # blocks/lstm.LSTM naming
        weights = {('wy' if k == 'out' else k): v for k, v in state.items()}

    from admm_lstm_tpu.models.lstm import params_from_dict
    params = params_from_dict(weights)
    os.makedirs(out_dir, exist_ok=True)
    return save_model(f'{name} (reference)', params, save_dir=out_dir)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument('--reference', default=os.environ.get(
        'ADMM_REFERENCE_PATH', '/root/reference'))
    parser.add_argument('--out', default=os.path.join(REPO, 'SAVED_MODELS'))
    args = parser.parse_args()
    try:
        import torch  # noqa: F401
    except ImportError:
        print('torch is required to read the reference .pt artifacts; '
              'install it or run inside the reference environment.')
        return 1
    _setup_reference_import(args.reference)
    pts = sorted(glob.glob(os.path.join(args.reference, 'SAVED_MODELS',
                                        '*.pt')))
    if not pts:
        print(f'No .pt files under {args.reference}/SAVED_MODELS')
        return 1
    ok = 0
    for path in pts:
        try:
            out = convert_file(path, args.out)
            print(f'{path} -> {out}')
            ok += 1
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f'FAILED {path}: {type(e).__name__}: {e}')
    print(f'Converted {ok}/{len(pts)} models.')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
