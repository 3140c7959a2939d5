"""Honest per-phase attribution at headline scale.

Each phase is timed as a SELF-CHAINED `lax.scan` (the phase's outputs feed
the next iteration through the state carry), executed as one device
program and synced by fetching a real scalar — the only trustworthy
timing recipe on this relayed TPU (see docs/ROADMAP.md environment
caveats).  Per-phase time = (chain(phase on) - chain(phase identity)) is
not measurable directly, so we report the self-chained per-iteration cost
of each phase alone plus the full epoch; the gap between sum-of-phases
and the full epoch is fusion overlap.

Usage: python benchmarks/bench_attrib.py [dataset] [hidden]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from admm_lstm_tpu import ADMMConfig
from admm_lstm_tpu.core.init import init_admm_state
from admm_lstm_tpu.core.step import (_sweep, _weight_phase, _wy_update,
                                     admm_step, rules_for)
from admm_lstm_tpu.models.lstm import init_lstm_params, params_from_dict
from admm_lstm_tpu.params import parameter_set

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get('ATTRIB_N', '1000'))


def chain_time(make_body, state, *args):
    """Per-iteration ms of a self-chained N-iteration device program."""
    def run(state):
        def body(st, _):
            return make_body(st), None
        st, _ = lax.scan(body, state, None, length=N)
        return st

    fn = jax.jit(run)
    out = fn(state)
    # real sync: fetch one scalar
    float(np.asarray(out.params.wy)[0, 0])
    times = []
    for rep in range(3):
        st = state._replace(params=state.params._replace(
            wy=state.params.wy * (1.0 + (rep + 1) * 1e-7)))
        t0 = time.perf_counter()
        out = fn(st)
        float(np.asarray(out.params.wy)[0, 0])
        times.append((time.perf_counter() - t0) / N * 1e3)
    return min(times)


def main():
    dataset = sys.argv[1] if len(sys.argv) > 1 else 'GoogleStock'
    hidden = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    golden_path = os.path.join(REPO, 'tests', 'golden', 'googlestock_fast.npz')
    if dataset == 'GoogleStock' and hidden == 10 and os.path.isfile(golden_path):
        g = np.load(golden_path)
        x, y = jnp.asarray(g['train_x']), jnp.asarray(g['train_y'])
        params = params_from_dict({k[3:]: g[k] for k in g.files
                                   if k.startswith('w0_')})
    else:
        from admm_lstm_tpu.data import load_dataset
        (tx, ty, _, _), _, _ = load_dataset(dataset)
        x, y = jnp.asarray(tx), jnp.asarray(ty)
        params = init_lstm_params(jax.random.PRNGKey(0), x.shape[-1], hidden,
                                  y.shape[-1])

    ps = parameter_set(dataset)
    for label, cfg in (
            ('gauss_seidel', ADMMConfig()),
            ('turbo', ADMMConfig(sweep_mode='jacobi', exact_weight_solve=True,
                                 matmul_precision='default')),
    ):
        rules = rules_for(cfg)
        state = init_admm_state(params, x, ps, cfg)
        x_im = jnp.transpose(x, (1, 2, 0)).astype(jnp.float32)  # (T, I, B) batch-minor

        def full(st):
            return admm_step(st, x, y, rules)

        def weights_only(st):
            wx, wh = _weight_phase(st, x_im, rules)
            return st._replace(params=st.params._replace(wx=wx, wh=wh))

        y_im = jnp.transpose(y).astype(jnp.float32)  # (O, B) out-minor

        def sweep_only(st):
            gates, duals = _sweep(st, x_im, st.params, y_im, rules)
            return st._replace(gates=gates, duals=duals)

        def wy_only(st):
            return st._replace(params=st.params._replace(
                wy=_wy_update(st, rules)))

        t_full = chain_time(full, state)
        t_w = chain_time(weights_only, state)
        t_s = chain_time(sweep_only, state)
        t_wy = chain_time(wy_only, state)
        print(f'{dataset} H={hidden} B={x.shape[0]} T={x.shape[1]} '
              f'[{label}]: full {t_full * 1e3:7.1f} us | '
              f'weights {t_w * 1e3:7.1f} | sweep {t_s * 1e3:7.1f} | '
              f'wy {t_wy * 1e3:6.1f} | sum/full '
              f'{(t_w + t_s + t_wy) / t_full:4.2f}')


if __name__ == '__main__':
    print('device:', jax.devices()[0])
    main()
