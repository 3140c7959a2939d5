"""Panel-width A/B for the blocked batched Cholesky at HAR scale.

Self-chained (the only reliable measurement on this relay): N_CHAIN
solves of K=4H SPD systems at D=561 per program, inputs tied to the
carry, fetch-synced.  Compares block widths; the product default lives
in solvers/blocked_chol.blocked_spd_solve(block=...).

Usage: python benchmarks/bench_chol_block.py [--hidden 64] [--blocks 64,128,192,256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N_CHAIN = 50


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--hidden', type=int, default=64)
    ap.add_argument('--dim', type=int, default=561)
    ap.add_argument('--blocks', default='64,128,192,256')
    args = ap.parse_args()

    from admm_lstm_tpu.solvers.blocked_chol import blocked_spd_solve

    K, D = 4 * args.hidden, args.dim
    rng = np.random.RandomState(0)
    m = rng.randn(K, D, D).astype(np.float32)
    a0 = jnp.asarray(m @ m.transpose(0, 2, 1)
                     + D * np.eye(D, dtype=np.float32))
    b0 = jnp.asarray(rng.randn(K, D).astype(np.float32))

    for block in [int(v) for v in args.blocks.split(',')]:
        def chain(a, b):
            def body(carry, _):
                aa, bb = carry
                x = blocked_spd_solve(aa, bb, block=block)
                # Tie the next iteration's inputs to the result.
                eps = x[0, 0] * 1e-30
                return (aa + eps, bb + eps), x[0, 0]

            (_, _), xs = lax.scan(body, (a, b), None, length=N_CHAIN)
            return xs

        fn = jax.jit(chain)
        out = fn(a0, b0)
        float(np.asarray(out[-1]))
        times = []
        for rep in range(3):
            a = a0 * (1 + (rep + 1) * 1e-7)
            t0 = time.perf_counter()
            out = fn(a, b0)
            float(np.asarray(out[-1]))
            times.append((time.perf_counter() - t0) / N_CHAIN * 1e3)
        print(f'block={block:4d}: {min(times):7.2f} ms/solve '
              f'(chains {[round(t, 2) for t in times]})', flush=True)


if __name__ == '__main__':
    main()
