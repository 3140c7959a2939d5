"""A/B the Gram strategies (einsum / wide / pair) inside the turbo
weight phase at the GoogleStock headline shape, self-chained.

The pair operand at this shape (D=10: 55 pairs x 42k rows ~ 9 MB) fits
VMEM, unlike the einsum's (k,d,t,b)-shaped 67 MB intermediate — if the
weight phase's 55 us is intermediate-traffic-bound, pair should show it.

Usage: ADMM_GRAM_STRATEGY={einsum|wide|pair|blocktri} python benchmarks/bench_gram_ab.py
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = 2000


def main() -> None:
    from admm_lstm_tpu import ADMMConfig
    from admm_lstm_tpu.core.init import init_admm_state
    from admm_lstm_tpu.core.step import _weight_phase, rules_for
    from admm_lstm_tpu.models.lstm import params_from_dict
    from admm_lstm_tpu.params import parameter_set

    g = np.load(os.path.join(REPO, 'tests', 'golden',
                             'googlestock_fast.npz'))
    x = jnp.asarray(g['train_x'])
    params = params_from_dict({k[3:]: g[k] for k in g.files
                               if k.startswith('w0_')})
    ps = parameter_set('GoogleStock')
    rules = rules_for(ADMMConfig.turbo())
    state0 = init_admm_state(params, x, ps, ADMMConfig.turbo())
    x_im = jnp.transpose(x, (1, 2, 0)).astype(jnp.float32)

    def body(st, _):
        eps = st.params.wy[0, 0] * 1e-30
        gates = st.gates._replace(i=st.gates.i + eps, h=st.gates.h + eps)
        st = st._replace(gates=gates)
        wx, wh = _weight_phase(st, x_im, rules)
        fold = (jnp.sum(wx) + jnp.sum(wh)) * 1e-30
        return st._replace(params=st.params._replace(
            wy=st.params.wy + fold)), None

    fn = jax.jit(lambda st: lax.scan(body, st, None, length=N)[0])
    out = fn(state0)
    float(np.asarray(out.params.wy)[0, 0])
    times = []
    for rep in range(3):
        st = state0._replace(params=state0.params._replace(
            wy=state0.params.wy * (1.0 + (rep + 1) * 1e-7)))
        t0 = time.perf_counter()
        out = fn(st)
        float(np.asarray(out.params.wy)[0, 0])
        times.append((time.perf_counter() - t0) / N * 1e6)
    strat = os.environ.get('ADMM_GRAM_STRATEGY', 'einsum(default)')
    print(f'strategy={strat}: weight phase {min(times):.1f} us/iter '
          f'(3 chains: {[round(t, 1) for t in times]})')


if __name__ == '__main__':
    main()
