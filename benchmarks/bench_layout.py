"""Measure HBM slab-traffic cost of lane layouts for the ADMM state.

Hypothesis (round 3): the state slabs are (T+1, B, H) with H minor; at the
reference's hidden sizes (H=10) XLA pads the minor axis to the 128-wide
vector lanes, inflating every slab's HBM footprint ~12.8x.  Storing the
slabs batch-minor -- (T+1, H, B) with B = 4224 = 33*128 -- removes the
padding entirely (sublane pad 10->16 is only 1.6x and only on one axis).

Timing recipe per docs/ROADMAP.md environment caveats: self-chained
`lax.scan` device programs, synced by fetching a real scalar; inputs
varied between reps.

Usage: python benchmarks/bench_layout.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import admm_lstm_tpu  # noqa: F401  (enables the persistent compilation cache)
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N = int(os.environ.get('LAYOUT_N', '2000'))


def chain_time(fn, x):
    """Per-iteration us of a self-chained N-iteration elementwise pass."""
    def run(x):
        def body(x, _):
            return fn(x), None
        out, _ = lax.scan(body, x, None, length=N)
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
        times.append((time.perf_counter() - t0) / N * 1e6)
    return min(times)


def main():
    key = jax.random.PRNGKey(0)
    T, B, H = 11, 4224, 10

    shapes = {
        '(T,B,H)  H-minor (current state layout)': (T, B, H),
        '(T,H,B)  B-minor (candidate layout)': (T, H, B),
        '(T,B,4H) 4H-minor (weight-phase wide)': (T, B, 4 * H),
        '(T,4H,B) B-minor (weight-phase compact)': (T, 4 * H, B),
        '(T*B*H,) flat control': (T * B * H,),
    }
    only = os.environ.get('LAYOUT_ONLY')
    if only is not None:
        items = [list(shapes.items())[int(only)]]
    else:
        items = list(shapes.items())

    print(f'device: {jax.devices()[0]};  logical bytes/slab: '
          f'{T * B * H * 4 / 1e6:.2f} MB (x4 for the 4H shapes)', flush=True)
    for name, shp in items:
        x = jax.random.normal(key, shp, jnp.float32)
        # One read + one write of the slab per iteration, trivial VPU work.
        t = chain_time(lambda a: a * 1.0000001 + 0.0000001, x)
        nbytes = np.prod(shp) * 4
        gbps = 2 * nbytes / (t * 1e-6) / 1e9
        print(f'{name:45s} {t:8.2f} us/pass   effective {gbps:7.1f} GB/s '
              f'(read+write, unpadded bytes)', flush=True)


if __name__ == '__main__':
    main()
