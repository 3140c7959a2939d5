"""Sub-phase attribution of the prox-linear weight phase (gauss_seidel).

Times self-chained prefixes of `core.step._weight_phase`'s pipeline at
the GoogleStock headline shape, so the gap to the HBM floor can be
assigned to target formation / projections / gradient / line search /
stage H rather than guessed.  Fetch-synchronized chains (see
benchmarks/_sync.py caveats).

Usage: python benchmarks/bench_weight_detail.py
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
from admm_lstm_tpu.core.step import _IS_TANH, rules_for
from admm_lstm_tpu.models.lstm import params_from_dict
from admm_lstm_tpu.params import parameter_set
from admm_lstm_tpu.solvers.prox_linear import weight_stage_update_wide

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get('DETAIL_N', '1000'))


def chain_time(make_body, state):
    def run(state):
        def body(st, _):
            return make_body(st), None
        st, _ = lax.scan(body, state, None, length=N)
        return st

    fn = jax.jit(run)
    out = fn(state)
    float(np.asarray(out.params.wy)[0, 0])
    times = []
    for rep in range(3):
        st = state._replace(params=state.params._replace(
            wy=state.params.wy * (1.0 + (rep + 1) * 1e-7)))
        t0 = time.perf_counter()
        out = fn(st)
        float(np.asarray(out.params.wy)[0, 0])
        times.append((time.perf_counter() - t0) / N * 1e6)
    return min(times)


def main():
    g = np.load(os.path.join(REPO, 'tests', 'golden', 'googlestock_fast.npz'))
    x = jnp.asarray(g['train_x'])
    params = params_from_dict({k[3:]: g[k] for k in g.files
                               if k.startswith('w0_')})
    ps = parameter_set('GoogleStock')
    cfg = ADMMConfig()
    rules = rules_for(cfg)
    precision = rules.precision
    state0 = init_admm_state(params, x, ps, cfg)
    x_im = jnp.transpose(x, (1, 2, 0)).astype(jnp.float32)
    seq_len = state0.seq_len
    hidden = state0.hidden_size

    def fold(st, v):
        """Fold any tensor into the carried state so the chain is honest."""
        return st._replace(params=st.params._replace(
            wy=st.params.wy + jnp.sum(v) * 1e-30))

    def to_wide(w):
        return jnp.transpose(w, (1, 0, 2)).reshape(w.shape[1], 4 * hidden)

    def pieces(st, upto):
        gates, duals, rho = st.gates, st.duals, st.rho
        # XLA hoists loop-invariant code out of while bodies; only wy
        # varies through the chain, so tie the big inputs to it (two
        # extra slab passes, identical across pieces).
        eps = st.params.wy[0, 0] * 1e-30
        gates = gates._replace(i=gates.i + eps, h=gates.h + eps)
        st = st._replace(params=st.params._replace(wx=st.params.wx + eps,
                                                   wh=st.params.wh + eps))
        h_hist = gates.h[:-1]
        rho_g = rho.stacked_ifgo()
        target_w = jnp.concatenate(
            [d[1:] / r + gg[1:] for gg, d, r in
             ((gates.i, duals.i, rho.i), (gates.f, duals.f, rho.f),
              (gates.g, duals.g, rho.g), (gates.o, duals.o, rho.o))], axis=1)
        if upto == 'target':
            return fold(st, target_w)
        tanh_cols = jnp.repeat(jnp.asarray(_IS_TANH), hidden)
        wx_w, wh_w = to_wide(st.params.wx), to_wide(st.params.wh)
        xproj = jnp.einsum('tdb,dk->tkb', x_im, wx_w, precision=precision)
        hproj = jnp.einsum('tdb,dk->tkb', h_hist, wh_w, precision=precision)
        if upto == 'proj':
            return fold(fold(st, xproj), hproj)
        if upto == 'gradx':
            pre = xproj + hproj
            sig = jax.nn.sigmoid(pre)
            act = jnp.where(tanh_cols[:, None], jnp.tanh(pre), sig)
            d_act = jnp.where(tanh_cols[:, None], 1.0 - jnp.tanh(pre) ** 2,
                              sig * (1.0 - sig))
            resid = act - target_w
            grad = jnp.einsum('tdb,tkb->dk', x_im, resid * d_act,
                              precision=precision)
            gp = jnp.einsum('tdb,dk->tkb', x_im, grad, precision=precision)
            return fold(fold(st, grad), gp)
        res_x = weight_stage_update_wide(
            x_im, xproj, hproj, wx_w, target_w, rho_g, st.beta.x,
            tanh_cols, seq_len, rules.max_backtrack, precision)
        if upto == 'stagex':
            return fold(fold(st, res_x.weights), res_x.proj_new)
        res_h = weight_stage_update_wide(
            h_hist, hproj, res_x.proj_new, wh_w, target_w, rho_g, st.beta.h,
            tanh_cols, seq_len, rules.max_backtrack, precision)
        return fold(fold(st, res_x.weights), res_h.weights)

    print(f'device: {jax.devices()[0]}  (GoogleStock h=10, us/iter)')
    prev = 0.0
    for name in ('target', 'proj', 'gradx', 'stagex', 'full'):
        t = chain_time(functools.partial(pieces, upto=name), state0)
        print(f'{name:8s} cumulative {t:7.1f} us  (delta {t - prev:+7.1f})',
              flush=True)
        prev = t


if __name__ == '__main__':
    main()
