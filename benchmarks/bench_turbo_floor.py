"""Structural-floor decomposition of the TURBO epoch (GoogleStock h=10).

Round-3 left the turbo epoch at ~29% of the naive bandwidth
speed-of-light (44.9 MB state-once model -> 54.8 us) with no floor
argument.  This probe closes that the same way the round-3 weight-stage
case was closed: measure self-chained CUMULATIVE PREFIXES of the real
turbo epoch body and SKELETONS of each phase (the irreducible
read-everything / write-everything passes with all solver math removed),
so the gap decomposes into (a) bytes the ALGORITHM must move beyond the
state-once model and (b) genuine inefficiency.

All chains fold their outputs into the carried state (XLA hoists
loop-invariant code out of scan bodies) and end with a real host fetch
(docs/ROADMAP.md measurement rules).

Usage: python benchmarks/bench_turbo_floor.py [--n 2000]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PEAK_GBPS = 819.0


def chain_time(make_body, state, n, extra_args=()):
    def run(state):
        def body(st, _):
            return make_body(st, *extra_args), None
        st, _ = lax.scan(body, state, None, length=n)
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
        times.append((time.perf_counter() - t0) / n * 1e6)
    return min(times)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=2000)
    args = ap.parse_args()

    from admm_lstm_tpu import ADMMConfig
    from admm_lstm_tpu.core.init import init_admm_state
    from admm_lstm_tpu.core.step import (_sweep, _weight_phase, _wy_update,
                                         admm_step_im, rules_for)
    from admm_lstm_tpu.models.lstm import (params_from_dict,
                                           train_val_mse_im)
    from admm_lstm_tpu.params import parameter_set

    g = np.load(os.path.join(REPO, 'tests', 'golden',
                             'googlestock_fast.npz'))
    x = jnp.asarray(g['train_x'])
    y = jnp.asarray(g['train_y'])
    vx, vy = jnp.asarray(g['test_x']), jnp.asarray(g['test_y'])
    params = params_from_dict({k[3:]: g[k] for k in g.files
                               if k.startswith('w0_')})
    ps = parameter_set('GoogleStock')
    cfg = ADMMConfig.turbo()
    rules = rules_for(cfg)
    state0 = init_admm_state(params, x, ps, cfg)

    x_im = jnp.transpose(x, (1, 2, 0)).astype(jnp.float32)
    vx_im = jnp.transpose(vx, (1, 2, 0)).astype(jnp.float32)
    y_im = jnp.transpose(y).astype(jnp.float32)
    vy_im = jnp.transpose(vy).astype(jnp.float32)
    xall_im = jnp.concatenate([x_im, vx_im], axis=-1)

    def fold(st, *vals):
        eps = sum(jnp.sum(v) for v in vals) * 1e-30
        return st._replace(params=st.params._replace(wy=st.params.wy + eps))

    def tie(st):
        """Tie the slabs to the carry so nothing hoists."""
        eps = st.params.wy[0, 0] * 1e-30
        gates = st.gates._replace(i=st.gates.i + eps, h=st.gates.h + eps)
        return st._replace(gates=gates)

    # --- cumulative prefixes of the turbo epoch ---------------------
    def p_carry(st):
        return fold(st, st.gates.i[0, 0, 0])

    def p_wy(st):
        st = tie(st)
        return fold(st, _wy_update(st, rules))

    def p_weights(st):
        st = tie(st)
        wy = _wy_update(st, rules)
        st = st._replace(params=st.params._replace(wy=wy))
        wx, wh = _weight_phase(st, x_im, rules)
        return fold(st, wx, wh)

    def p_full(st):
        return admm_step_im(tie(st), x_im, y_im, rules)

    def p_metrics(st):
        st = admm_step_im(tie(st), x_im, y_im, rules)
        tl, vl = train_val_mse_im(st.params, xall_im, y_im, vy_im,
                                  rules.precision)
        return fold(st, tl + vl)

    results = {}
    prev = 0.0
    for name, body in (('carry', p_carry), ('wy', p_wy),
                       ('weights', p_weights), ('full', p_full),
                       ('metrics', p_metrics)):
        t = chain_time(body, state0, args.n)
        results[name] = {'cum_us': round(t, 1),
                         'delta_us': round(t - prev, 1)}
        print(f'{name:8s} cumulative {t:7.1f} us (delta {t - prev:+6.1f})',
              flush=True)
        prev = t

    # --- skeletons: the irreducible in/out passes -------------------
    # Sweep skeleton: read the 12 interior slabs + the (4H) hoisted
    # pre-activation once, write 11 slabs — all solver math replaced by
    # a single add.  Measures what a PERFECTLY fused jacobi sweep would
    # cost on this machine (per-op overhead of ~1 op per output).
    T1 = state0.seq_len - 1
    H = state0.hidden_size
    B = state0.batch_size

    def p_sweep_skeleton(st):
        st = tie(st)
        gates, duals = st.gates, st.duals
        interior = slice(1, state0.seq_len)
        wh_flat = jnp.transpose(st.params.wh, (1, 0, 2)).reshape(H, 4 * H)
        rec = jnp.einsum('thb,hk->tkb', gates.h[0:T1], wh_flat,
                         precision=rules.precision)
        rec = rec.reshape(T1, 4, H, B)
        slabs = [s[interior] for s in
                 (gates.i, gates.f, gates.g, gates.o, gates.c, gates.h,
                  duals.i, duals.f, duals.g, duals.o, duals.c, duals.h)]
        outs = [s + rec[:, i % 4] for i, s in enumerate(slabs[:11])]
        gates = gates._replace(
            i=gates.i.at[interior].set(outs[0]),
            c=gates.c.at[interior].set(outs[4]),
            h=gates.h.at[interior].set(outs[5]))
        return fold(st._replace(gates=gates), *outs[6:])

    t_skel = chain_time(p_sweep_skeleton, state0, args.n)
    results['sweep_skeleton'] = {'us': round(t_skel, 1)}
    print(f'sweep skeleton (12 reads + rec matmul + 11 writes): '
          f'{t_skel:.1f} us', flush=True)

    # Weight-phase skeleton: read the 8 target slabs + h history + x,
    # produce the two projections and one activation pass, write one
    # (T, 4H, B) slab — the "touch every operand once" floor of the
    # exact stage with the Gram/solve math removed.
    def p_weight_skeleton(st):
        st = tie(st)
        gates, duals, rho = st.gates, st.duals, st.rho
        h_hist = gates.h[:-1]
        target = jnp.concatenate(
            [d[1:] / r + gg[1:] for gg, d, r in
             ((gates.i, duals.i, rho.i), (gates.f, duals.f, rho.f),
              (gates.g, duals.g, rho.g), (gates.o, duals.o, rho.o))],
            axis=1)
        wx_w = jnp.transpose(st.params.wx, (1, 0, 2)).reshape(-1, 4 * H)
        wh_w = jnp.transpose(st.params.wh, (1, 0, 2)).reshape(H, 4 * H)
        pre = (jnp.einsum('tdb,dk->tkb', x_im, wx_w,
                          precision=rules.precision)
               + jnp.einsum('tdb,dk->tkb', h_hist, wh_w,
                            precision=rules.precision))
        u = jnp.tanh(pre)
        resid = u - target
        return fold(st, jnp.sum(resid * resid, axis=(0, 2)),
                    jnp.sum(resid, axis=(0, 2)))

    t_wskel = chain_time(p_weight_skeleton, state0, args.n)
    results['weight_skeleton'] = {'us': round(t_wskel, 1)}
    print(f'weight skeleton (targets + projections + act pass): '
          f'{t_wskel:.1f} us', flush=True)

    # Byte accounting for context.
    slab = (state0.seq_len - 1) * H * B * 4
    sweep_bytes = (12 + 11) * slab + 4 * slab * 2   # slabs + pre in/out
    results['model'] = {
        'sweep_skeleton_bytes_mb': round(sweep_bytes / 1e6, 1),
        'sweep_skeleton_floor_us': round(sweep_bytes / PEAK_GBPS / 1e3, 1),
    }
    print(json.dumps(results))


if __name__ == '__main__':
    main()
