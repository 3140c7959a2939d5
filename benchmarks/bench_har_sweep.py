"""HAR-shaped exact-solve sweep: H in {64, 128, 256} at D = 561 features.

The BASELINE config 4 ("HAR hidden=64-256 sweep stressing the batched
Cholesky/normal-equation solves") has no runnable real-data counterpart in
this container (the UCI HAR raw files are absent — data/har.py docstring),
so this benchmark runs the exact PERFORMANCE half on HAR-shaped synthetic
data: B x T x I = 2048 x 10 x 561, O = 6 one-hot outputs, full-batch ADMM
with the exact normal-equation weight solve on BOTH stages
(exact_solve_max_dim = 1024 > 561) — the configuration that OOM'd in
round 3 and is now streamed via the chunked wide-contraction Gram
(solvers/normal_eq._gram_bvec).

Reports per H: epoch time, Gram+Cholesky MXU FLOP count, achieved TFLOP/s
and % of the bf16 MXU peak (197 TFLOP/s on v5e), plus a 30-epoch finite /
decreasing loss sanity gate.

FLOP accounting is ALGORITHMIC (useful-work) FLOPs: the Gram is counted
at its full K*D^2*N cost even though the default block-triangular
strategy (normal_eq._gram_blocktri, round 5) only executes ~61% of those
MACs in hardware by mirroring symmetric blocks — the same convention as
counting an FFT conv at direct-conv FLOPs.  "% of peak" is therefore an
effective number; the physical MXU utilization is ~0.61x of it on the
blocktri stages.

Usage: python benchmarks/bench_har_sweep.py [--epochs 50] [--hs 64,128,256]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np

PEAK_MXU_TFLOPS = 197.0  # bf16, TPU v5e


def flop_count(hidden: int, d_in: int, steps: int, batch: int) -> int:
    """MXU FLOPs of one exact-solve epoch's weight phase (both stages).

    Per stage of design width D: Gram 2*4H*D^2*N (N = T*B rows), the
    lhs @ w rhs-assembly einsum 2*4H*D^2, Cholesky factor ~D^3/3 and two
    triangular solves ~2*D^2 per (gate, column) system (4H of them).
    The sweep's recurrent matmuls add 2*T*B*4H*H (counted too).
    """
    n = steps * batch
    total = 0
    for d in (d_in, hidden):
        gram = 2 * 4 * hidden * d * d * n
        chol = 4 * hidden * (d ** 3 // 3 + 2 * d * d)
        total += gram + chol
    total += 2 * steps * batch * 4 * hidden * hidden   # sweep recurrence
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=50)
    ap.add_argument('--batch', type=int, default=2048)
    ap.add_argument('--hs', default='64,128,256')
    ap.add_argument('--reps', type=int, default=3)
    args = ap.parse_args()

    from admm_lstm_tpu import ADMMConfig
    from admm_lstm_tpu.core.init import init_admm_state
    from admm_lstm_tpu.core.step import make_multi_epoch_fn
    from admm_lstm_tpu.data.synthetic import load as synth_load
    from admm_lstm_tpu.models.lstm import init_lstm_params
    from admm_lstm_tpu.params import parameter_set

    B, T, I, O = args.batch, 10, 561, 6
    x, y, vx, vy = synth_load(batch=B, seq_len=T, input_size=I,
                              output_size=O, val_batch=128)
    x, y, vx, vy = map(jnp.asarray, (x, y, vx, vy))
    ps = parameter_set('HAR')

    out = {}
    for hidden in [int(h) for h in args.hs.split(',')]:
        cfg = ADMMConfig.turbo(hidden_size=hidden, exact_solve_max_dim=1024)
        params = init_lstm_params(jax.random.PRNGKey(0), I, hidden, O)
        run = make_multi_epoch_fn(cfg, args.epochs, donate=True)
        state = init_admm_state(params, x, ps, cfg)
        t_c0 = time.perf_counter()
        _, m = run(state, x, y, vx, vy)
        losses = np.asarray(m['val_loss'])
        compile_s = time.perf_counter() - t_c0
        rates = []
        for rep in range(args.reps):
            state = init_admm_state(
                params._replace(wy=params.wy * (1 + (rep + 1) * 1e-7)),
                x, ps, cfg)
            t0 = time.perf_counter()
            _, m = run(state, x, y, vx, vy)
            final = float(np.asarray(m['val_loss'])[-1])   # real sync
            rates.append(args.epochs / (time.perf_counter() - t0))
            assert np.isfinite(final), f'diverged at H={hidden}'
        rate = sorted(rates)[len(rates) // 2]
        epoch_us = 1e6 / rate
        flops = flop_count(hidden, I, T, B)
        tflops = flops * rate / 1e12
        out[f'H{hidden}'] = {
            'epoch_us': round(epoch_us, 1),
            'iters_per_s': round(rate, 2),
            'mxu_flops_per_epoch': flops,
            'achieved_tflops': round(tflops, 2),
            'pct_of_peak_mxu': round(100 * tflops / PEAK_MXU_TFLOPS, 1),
            'val_first': round(float(losses[0]), 5),
            'val_last': round(float(losses[-1]), 5),
            'compile_s': round(compile_s, 1),
        }
        print(f'H={hidden}: {json.dumps(out[f"H{hidden}"])}', flush=True)

    print(json.dumps({'metric': 'har_shaped_exact_sweep',
                      'batch': B, 'seq_len': T, 'input': I, 'output': O,
                      'sweep': out}))


if __name__ == '__main__':
    main()
