"""Two-point scaling check: separate fixed chain overhead from true
per-iteration cost for elementwise slab passes in both layouts.

For each shape, times self-chained scans at N1 and N2 and reports the
marginal per-iteration cost (t2 - t1) / (N2 - N1) — immune to any fixed
dispatch/fetch/relay overhead that a single-N measurement folds in.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import admm_lstm_tpu  # noqa: F401  (persistent compilation cache)
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N1 = int(os.environ.get('LAYOUT_N1', '200'))
N2 = int(os.environ.get('LAYOUT_N2', '2000'))


def chain(fn, x, n):
    def run(x):
        def body(x, _):
            return fn(x), None
        out, _ = lax.scan(body, x, None, length=n)
        return out

    jfn = jax.jit(run)
    out = jfn(x)
    float(np.asarray(out).ravel()[0])
    times = []
    for rep in range(3):
        xr = x * (1.0 + (rep + 1) * 1e-7)
        t0 = time.perf_counter()
        out = jfn(xr)
        float(np.asarray(out).ravel()[0])
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    key = jax.random.PRNGKey(0)
    T, B, H = 11, 4224, 10
    shapes = {
        'H-minor (T,B,H)': (T, B, H),
        'B-minor (T,H,B)': (T, H, B),
        'wide H-minor (T,B,4H)': (T, B, 4 * H),
        'wide B-minor (T,4H,B)': (T, 4 * H, B),
    }
    only = os.environ.get('LAYOUT_ONLY')
    items = ([list(shapes.items())[int(only)]] if only is not None
             else list(shapes.items()))
    print(f'device: {jax.devices()[0]}  N1={N1} N2={N2}', flush=True)
    for name, shp in items:
        x = jax.random.normal(key, shp, jnp.float32)
        f = lambda a: a * 1.0000001 + 0.0000001
        t1 = chain(f, x, N1)
        t2 = chain(f, x, N2)
        marg = (t2 - t1) / (N2 - N1) * 1e6
        fixed = t1 - N1 * (t2 - t1) / (N2 - N1)
        nbytes = np.prod(shp) * 4
        gbps = 2 * nbytes / (marg * 1e-6) / 1e9
        print(f'{name:24s} marginal {marg:7.2f} us/pass '
              f'({gbps:7.1f} GB/s logical r+w)  fixed {fixed * 1e3:7.1f} ms',
              flush=True)


if __name__ == '__main__':
    main()
