"""Generate golden parity fixtures by driving the REFERENCE implementation.

Runs the reference optimizer (imported in place from /root/reference, never
copied) on controlled inputs and records:

  * small synthetic one/multi-step state trajectories for each solver
    variant (fast, fast+dual_y, no_dual_y) -> tests/golden/*.npz
  * the GoogleStock seed-0 loss trajectory + per-epoch CPU timing
    -> tests/golden/googlestock_fast.npz and BASELINE_MEASURED.json

The reference needs xlrd; we inject admm_lstm_tpu.data.xls as a drop-in
stand-in, which doubles as an end-to-end validation of the native reader.

Usage:  python tools/make_golden.py [--epochs 30] [--skip-googlestock]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get('ADMM_REFERENCE_PATH', '/root/reference')
GOLDEN_DIR = os.path.join(REPO, 'tests', 'golden')

sys.path.insert(0, REPO)


def _setup_reference_import(workdir: str) -> None:
    """Make the reference importable and runnable without touching its mount.

    The workdir's datasets/ is a REAL directory of per-dataset symlinks:
    each dataset resolves to the REPO copy when present (tools/
    fetch_data.sh downloads HAR / GEFCOM2012 there — the reference mount
    is read-only and missing those blobs, .MISSING_LARGE_BLOBS) and to
    the reference's copy otherwise.
    """
    os.makedirs(workdir, exist_ok=True)
    datasets_dir = os.path.join(workdir, 'datasets')
    if os.path.islink(datasets_dir):   # migrate the old whole-dir symlink
        os.unlink(datasets_dir)
    os.makedirs(datasets_dir, exist_ok=True)
    ref_ds = os.path.join(REFERENCE, 'datasets')
    repo_ds = os.path.join(REPO, 'datasets')
    names = set(os.listdir(ref_ds)) | (
        set(os.listdir(repo_ds)) if os.path.isdir(repo_ds) else set())
    for name in names:
        link = os.path.join(datasets_dir, name)
        if os.path.islink(link):
            os.unlink(link)
        repo_copy = os.path.join(repo_ds, name)
        os.symlink(repo_copy if os.path.exists(repo_copy)
                   else os.path.join(ref_ds, name), link)
    os.chdir(workdir)  # reference writes logs/ relative to cwd
    sys.path.insert(0, REFERENCE)

    # xlrd stand-in backed by our native BIFF reader.
    from admm_lstm_tpu.data import xls as native_xls
    shim = types.ModuleType('xlrd')
    shim.open_workbook = native_xls.open_workbook
    sys.modules.setdefault('xlrd', shim)


def _model_weights(model) -> dict:
    out = {}
    for g in ('i', 'f', 'g', 'o'):
        out[f'x2{g}'] = model.get_weight('x', g).detach().cpu().numpy().copy()
        out[f'h2{g}'] = model.get_weight('h', g).detach().cpu().numpy().copy()
    out['wy'] = model.get_wy().detach().cpu().numpy().copy()
    return out


def _optimizer_state(opt) -> dict:
    out = {}
    for k in ('i', 'f', 'g', 'o', 'c', 'h'):
        out[f'gate_{k}'] = opt.gates[k].detach().cpu().numpy().copy()
        out[f'dual_{k}'] = opt.duals[k].detach().cpu().numpy().copy()
    out['gate_a'] = opt.gates['a'].detach().cpu().numpy().copy()
    out['dual_y'] = opt.duals['y'].detach().cpu().numpy().copy()
    return out


def make_small_golden(variant: str, steps: int = 3,
                      dims: tuple = (16, 7, 3, 5, 2), tag: str = '') -> None:
    import torch
    import importlib.util
    from blocks.lstm import LSTM

    if variant == 'no_dual_y':
        spec = importlib.util.spec_from_file_location(
            'admm_no_dual_y', os.path.join(REFERENCE, 'admm.no_dual_y.py'))
        admm_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(admm_mod)
    else:
        import admm as admm_mod
        admm_mod.with_dual_y = (variant == 'fast_dual_y')

    from admm_lstm_tpu.params import example_parameter_dictionary
    params = example_parameter_dictionary['Synthetic']

    B, T, I, H, O = dims
    rng = np.random.default_rng(1234)
    x_np = rng.standard_normal((B, T, I)).astype(np.float32)
    y_np = (0.1 * rng.standard_normal((B, O))).astype(np.float32)

    torch.manual_seed(0)
    model = LSTM(input_size=I, hidden_size=H, output_size=O)
    x = torch.from_numpy(x_np)
    y = torch.from_numpy(y_np)

    record = {'x': x_np, 'y': y_np}
    record.update({f'w0_{k}': v for k, v in _model_weights(model).items()})

    opt = admm_mod.ADMMBasedOptimizer(model, (x, y), params, verbose=False)
    record.update({f's0_{k}': v for k, v in _optimizer_state(opt).items()})

    for step in range(1, steps + 1):
        opt.step()
        record.update({f'w{step}_{k}': v for k, v in _model_weights(model).items()})
        record.update({f's{step}_{k}': v
                       for k, v in _optimizer_state(opt).items()})

    out = os.path.join(GOLDEN_DIR, f'small_{variant}{tag}_{steps}steps.npz')
    np.savez_compressed(out, **record)
    print(f'wrote {out}')


def make_dataset_golden(dataset: str, epochs: int, hidden: int = 10) -> None:
    """Fast-variant loss-trajectory golden on a real dataset via the
    reference optimizer (data through our verified loaders)."""
    import torch
    from torch import nn
    import admm as admm_mod
    admm_mod.with_dual_y = False
    from blocks.lstm import LSTM
    from admm_lstm_tpu.params import example_parameter_dictionary
    from admm_lstm_tpu.data import load_dataset

    (tx, ty, vx, vy), _, _ = load_dataset(dataset)
    train_x, train_y, test_x, test_y = map(torch.from_numpy,
                                           (tx, ty, vx, vy))
    torch.manual_seed(0)
    model = LSTM(input_size=tx.shape[2], hidden_size=hidden,
                 output_size=ty.shape[1])
    weights0 = _model_weights(model)
    params = example_parameter_dictionary[dataset]
    opt = admm_mod.ADMMBasedOptimizer(model, (train_x, train_y), params,
                                      verbose=False)
    loss_fn = nn.MSELoss()

    train_losses, val_losses = [], []

    def record():
        with torch.no_grad():
            train_losses.append(float(loss_fn(model(train_x), train_y)))
            val_losses.append(float(loss_fn(model(test_x), test_y)))

    record()
    for epoch in range(epochs):
        opt.step()
        record()
        print(f'{dataset} epoch {epoch + 1}: train {train_losses[-1]:.8f} '
              f'val {val_losses[-1]:.8f}')

    out = os.path.join(GOLDEN_DIR, f'{dataset.lower()}_fast.npz')
    np.savez_compressed(
        out, train_loss=np.asarray(train_losses),
        val_loss=np.asarray(val_losses), hidden=hidden,
        **{f'w0_{k}': v for k, v in weights0.items()})
    print(f'wrote {out}')


def make_googlestock_golden(epochs: int) -> None:
    import torch
    from torch import nn
    import admm as admm_mod
    admm_mod.with_dual_y = False
    from blocks.lstm import LSTM
    from admm_lstm_tpu.params import example_parameter_dictionary
    # Data via our loader (byte-identical windowing semantics to
    # dataset.py:386-443; the reference's dataset.py cannot import here as it
    # pulls optional deps (av/cv2) for dead code paths).
    from admm_lstm_tpu.data.google_stock import load as load_gs

    train_x, train_y, test_x, test_y = map(torch.from_numpy, load_gs())
    torch.manual_seed(0)
    model = LSTM(input_size=1, hidden_size=10, output_size=1)
    weights0 = _model_weights(model)

    params = example_parameter_dictionary['GoogleStock']
    opt = admm_mod.ADMMBasedOptimizer(model, (train_x, train_y), params,
                                      verbose=False)
    loss_fn = nn.MSELoss()

    def losses():
        with torch.no_grad():
            return (float(loss_fn(model(train_x), train_y)),
                    float(loss_fn(model(test_x), test_y)))

    train_losses, val_losses, epoch_ms = [], [], []
    tl, vl = losses()
    train_losses.append(tl)
    val_losses.append(vl)
    print(f'epoch 0: train {tl:.8f} val {vl:.8f}')
    for epoch in range(1, epochs + 1):
        t0 = time.perf_counter()
        opt.step()
        ms = (time.perf_counter() - t0) * 1e3
        epoch_ms.append(ms)
        tl, vl = losses()
        train_losses.append(tl)
        val_losses.append(vl)
        print(f'epoch {epoch}: train {tl:.8f} val {vl:.8f} ({ms:.0f} ms)')

    out = os.path.join(GOLDEN_DIR, 'googlestock_fast.npz')
    np.savez_compressed(
        out,
        train_loss=np.asarray(train_losses),
        val_loss=np.asarray(val_losses),
        epoch_ms=np.asarray(epoch_ms),
        train_x=train_x.cpu().numpy(), train_y=train_y.cpu().numpy(),
        test_x=test_x.cpu().numpy(), test_y=test_y.cpu().numpy(),
        **{f'w0_{k}': v for k, v in weights0.items()})
    print(f'wrote {out}')

    baseline = {
        'machine': 'container CPU (torch eager, reference implementation)',
        'dataset': 'GoogleStock', 'hidden': 10, 'epochs': epochs,
        'mean_epoch_ms': float(np.mean(epoch_ms)),
        'median_epoch_ms': float(np.median(epoch_ms)),
        'iters_per_s': 1000.0 / float(np.mean(epoch_ms)),
        'final_train_loss': train_losses[-1],
        'final_val_loss': val_losses[-1],
    }
    with open(os.path.join(REPO, 'BASELINE_MEASURED.json'), 'w') as f:
        json.dump(baseline, f, indent=2)
    print(json.dumps(baseline, indent=2))


def _stub_optional_modules() -> None:
    """Stub heavy optional deps (av/cv2) that the reference's dataset.py
    imports at module scope for dead code paths."""
    class _AnyAttr(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith('__'):
                raise AttributeError(name)
            sub = _AnyAttr(f'{self.__name__}.{name}')
            setattr(self, name, sub)
            return sub

    for name in ('av', 'cv2', 'torchvision'):
        sys.modules.setdefault(name, _AnyAttr(name))
    import matplotlib
    matplotlib.use('Agg')
    matplotlib.use = lambda *a, **k: None  # reference forces TkAgg at import


def make_admm_l_golden(epochs: int = 5) -> None:
    """Loss-trajectory golden for ADMM-LSTM-L on small synthetic data.

    Drives the reference admm_l_demo (comparison_experiment/admm_l/main.py)
    end to end; our implementation replicates its torch.randn*0.1 seed-0
    weight draws, so trajectories are directly comparable."""
    import torch
    _stub_optional_modules()
    sys.path.insert(0, os.path.join(REFERENCE, 'comparison_experiment'))
    import matplotlib
    matplotlib.use('Agg')
    matplotlib.use = lambda *a, **k: None  # their module forces TkAgg
    from comparison_experiment.admm_l.main import admm_l_demo

    B, T, I, H, O = 24, 6, 2, 4, 1
    rng = np.random.default_rng(99)
    train_x = torch.from_numpy(rng.standard_normal((B, T, I)).astype(np.float32))
    train_y = torch.from_numpy((0.1 * rng.standard_normal((B, O))).astype(np.float32))
    test_x = torch.from_numpy(rng.standard_normal((8, T, I)).astype(np.float32))
    test_y = torch.from_numpy((0.1 * rng.standard_normal((8, O))).astype(np.float32))

    torch.manual_seed(0)
    result = admm_l_demo(epochs, H, train_x, train_y, test_x, test_y)

    out = os.path.join(GOLDEN_DIR, 'admm_l_small.npz')
    np.savez_compressed(
        out,
        x=train_x.numpy(), y=train_y.numpy(),
        test_x=test_x.numpy(), test_y=test_y.numpy(),
        train_loss=np.asarray(result['train_loss']),
        val_loss=np.asarray(result['val_loss']))
    print(f'wrote {out}')


def make_admm_s_golden(epochs: int = 5) -> None:
    """Loss-trajectory golden for ADMM-LSTM-S on GoogleStock.

    Runs the reference script (ADMMLSTMS/main.py) in place via runpy with
    controlled argv; its printed per-iteration losses are the fixture."""
    import io
    import runpy
    from contextlib import redirect_stdout

    _stub_optional_modules()
    os.makedirs('comparison_experiment/admm_s', exist_ok=True)
    old_argv = sys.argv
    sys.argv = ['main.py', '-y', '-e', str(epochs), '-d', 'GoogleStock']
    buf = io.StringIO()
    try:
        with redirect_stdout(buf):
            runpy.run_path(os.path.join(REFERENCE, 'ADMMLSTMS', 'main.py'),
                           run_name='__main__')
    finally:
        sys.argv = old_argv
    out_text = buf.getvalue()
    train, test = [], []
    for line in out_text.splitlines():
        if line.startswith('iter ') and 'loss_train' in line:
            parts = line.replace(':', '').replace(',', '').split()
            train.append(float(parts[3]))
            test.append(float(parts[5]))
    out = os.path.join(GOLDEN_DIR, 'admm_s_googlestock.npz')
    np.savez_compressed(out, train_loss=np.asarray(train),
                        val_loss=np.asarray(test), epochs=epochs)
    print(f'wrote {out}: train={train}')


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--epochs', type=int, default=30)
    parser.add_argument('--steps', type=int, default=3)
    parser.add_argument('--skip-googlestock', action='store_true')
    parser.add_argument('--skip-small', action='store_true')
    parser.add_argument('--admm-l', action='store_true')
    parser.add_argument('--admm-s', action='store_true')
    parser.add_argument('--wide', action='store_true')
    parser.add_argument('--datasets', default='',
                        help='comma-separated extra fast-variant goldens '
                             '(e.g. YahooFinance,DNA1)')
    parser.add_argument('--workdir', default='/tmp/refrun')
    args = parser.parse_args()

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    _setup_reference_import(args.workdir)

    if not args.skip_small:
        for variant in ('fast', 'fast_dual_y', 'no_dual_y'):
            make_small_golden(variant, args.steps)
    if args.wide:
        # Wider instance (H=64, I=9): exercises multi-iteration weight
        # line searches and MXU-sized blocks.
        make_small_golden('fast', args.steps, dims=(64, 12, 9, 64, 3),
                          tag='_wide')
    if args.admm_l:
        make_admm_l_golden()
    if args.admm_s:
        make_admm_s_golden()
    for ds in (args.datasets or '').split(','):
        if ds:
            make_dataset_golden(ds, args.epochs)
    if not args.skip_googlestock:
        make_googlestock_golden(args.epochs)


if __name__ == '__main__':
    main()
