"""Phase attribution + structural floor of the STACKED 2-layer epoch.

Round-4 VERDICT #1: the stacked GoogleStock (8, 8) config recorded
1.25 it/s in the driver artifact — slower than the CPU reference — with
no attribution.  The bench_turbo_floor methodology applied here:

  1. chain        — the real per-epoch program exactly as
                    make_stacked_multi_epoch_fn runs it (step + train/val
                    loss + in-scan best-iterate carry), timed as one
                    pre-compiled epoch-chunked scan.  This is the number
                    the bench artifact should report; the round-4 1.25
                    came from timing train_stacked() end-to-end, whose
                    init/fresh-jit/host-sync overhead (and, driver-side,
                    a cold compile) landed inside the timed region.
  2. step         — stacked_admm_step alone (no loss evals/tracking).
  3. weights      — cumulative prefix: wy + layer-0 exact weight solve +
                    upper-layer ridge solve + the per-epoch M^-1.
  4. carry        — scan/carry skeleton (fold one scalar; measures the
                    chain's irreducible per-iteration cost).
  5. skeleton     — read-and-rewrite every state slab with the solver
                    math removed (the epoch's data-movement floor).
  6. losses       — step + the two stacked_mse_loss forwards + the
                    tree-where best tracking (the full chain body); the
                    delta vs `step` prices the metric/tracking overhead.

All chains fold outputs into the carried state (XLA hoists
loop-invariant code out of scan bodies) and end with a real host fetch
(docs/ROADMAP.md measurement rules).

Usage: python benchmarks/bench_stacked_floor.py [--n 300]
"""

import argparse
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


def chain_time(body_fn, carry0, n, sync_leaf):
    """min over 3 reps of per-iteration us for `body_fn` self-chained."""

    def run(carry):
        return lax.scan(lambda c, _: (body_fn(c), None), carry, None,
                        length=n)[0]

    fn = jax.jit(run)
    out = fn(carry0)
    float(np.asarray(sync_leaf(out)).ravel()[0])
    times = []
    for rep in range(3):
        c = jax.tree.map(
            lambda a: a * (1.0 + (rep + 1) * 1e-7)
            if hasattr(a, 'dtype') and a.dtype == jnp.float32 else a,
            carry0)
        t0 = time.perf_counter()
        out = fn(c)
        v = float(np.asarray(sync_leaf(out)).ravel()[0])
        times.append((time.perf_counter() - t0) / n * 1e6)
        assert np.isfinite(v)
    return min(times)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=300)
    ap.add_argument('--hiddens', type=int, nargs='+', default=[8, 8])
    args = ap.parse_args()

    from admm_lstm_tpu import ADMMConfig
    from admm_lstm_tpu.core.step import rules_for
    from admm_lstm_tpu.params import parameter_set
    from admm_lstm_tpu.variants.stacked import (
        StackedParams, _layer0_weight_phase, _upper_weight_solve,
        init_stacked, init_stacked_state, stacked_admm_step_im,
        stacked_mse_loss)
    from admm_lstm_tpu.solvers import closed_form as cf

    g = np.load(os.path.join(REPO, 'tests', 'golden',
                             'googlestock_fast.npz'))
    x = jnp.asarray(g['train_x'])
    y = jnp.asarray(g['train_y'])
    vx, vy = jnp.asarray(g['test_x']), jnp.asarray(g['test_y'])
    hiddens = tuple(args.hiddens)
    cfg = ADMMConfig(hidden_size=hiddens[0], seed=0)
    ps = parameter_set('Stacked')
    rules = rules_for(cfg)
    precision = rules.precision

    params = init_stacked(jax.random.PRNGKey(0), x.shape[2], hiddens,
                          y.shape[1])
    state0 = init_stacked_state(params, x, ps, cfg)
    x_im = jnp.transpose(x, (1, 2, 0)).astype(jnp.float32)
    y_im = jnp.transpose(y).astype(jnp.float32)
    n = args.n

    state_bytes = sum(a.size * a.dtype.itemsize
                      for a in jax.tree.leaves(state0))

    def tie(st):
        eps = st.params.wy[0, 0] * 1e-30
        gates = tuple(gk._replace(i=gk.i + eps, h=gk.h + eps)
                      for gk in st.gates)
        return st._replace(gates=gates)

    def fold(st, *vals):
        eps = sum(jnp.sum(v) * 1e-30 for v in vals)
        return st._replace(params=st.params._replace(wy=st.params.wy + eps))

    # --- carry skeleton ------------------------------------------------
    def p_carry(st):
        return fold(st, st.gates[0].i[0, 0, 0])

    # --- slab skeleton: touch every gate/dual/z slab once -------------
    def p_skeleton(st):
        eps = st.params.wy[0, 0] * 1e-30
        bump = lambda a: a + eps
        return st._replace(
            gates=tuple(jax.tree.map(bump, gk) for gk in st.gates),
            duals=tuple(jax.tree.map(bump, dk) for dk in st.duals),
            zs=tuple(bump(z) for z in st.zs),
            zduals=tuple(bump(z) for z in st.zduals))

    # --- weight-phase prefix (mirrors stacked_admm_step steps 1-2) ----
    def p_weights(st):
        st = tie(st)
        rho = st.rho
        top = len(st.params.layers) - 1
        g_top, d_top = st.gates[top], st.duals[top]
        wy_new = cf.wy_update(st.params.wy, g_top.h[-1], g_top.a, rho.y,
                              st.beta.wy, d_top.y, rules.with_dual_y,
                              rules.precision, batch_minor=True)
        layers_new = [_layer0_weight_phase(x_im, st.gates[0], st.duals[0],
                                           st.params.layers[0], rho,
                                           st.beta, rules)]
        for k in range(1, len(st.params.layers)):
            layers_new.append(_upper_weight_solve(
                st.gates[k - 1].h[1:], st.gates[k].h[:-1],
                st.zs[k - 1], st.zduals[k - 1], st.params.layers[k],
                st.rho_z, st.beta, precision))
        minv_folds = []
        for k in range(top):
            wx_up = layers_new[k + 1].wx
            m = rho.h * jnp.eye(wx_up.shape[1], dtype=x_im.dtype)
            m = m + st.rho_z * jnp.einsum('gdh,geh->de', wx_up, wx_up,
                                          precision=precision)
            minv_folds.append(jnp.linalg.inv(m)[0, 0])
        # Fold (don't commit) the outputs: iterating the weight phase
        # alone against never-refreshed sweep targets diverges, so the
        # chain must recompute the same solves each iteration.
        return fold(st, wy_new,
                    *(l.wx for l in layers_new), *minv_folds)

    # --- the real step / chain body ------------------------------------
    def p_step(st):
        return stacked_admm_step_im(tie(st), x_im, y_im, rules)

    vx_im = jnp.transpose(vx, (1, 2, 0)).astype(jnp.float32)
    vy_im = jnp.transpose(vy).astype(jnp.float32)
    xall_im = jnp.concatenate([x_im, vx_im], axis=-1)
    n_train = x.shape[0]

    def p_losses(st):
        # EXACTLY the make_stacked_multi_epoch_fn chain body: step + one
        # concatenated train/val forward + best-iterate tree-where.
        from admm_lstm_tpu.variants.stacked import stacked_forward_im
        st = stacked_admm_step_im(tie(st), x_im, y_im, rules)
        pred = stacked_forward_im(st.params, xall_im, precision)
        tr = jnp.mean((pred[:, :n_train] - y_im) ** 2)
        vl = jnp.mean((pred[:, n_train:] - vy_im) ** 2)
        better = vl < tr
        params = jax.tree.map(lambda a: jnp.where(better, a, a * 1.0),
                              st.params)
        return fold(st._replace(params=params), tr, vl)

    sync = lambda st: st.params.wy[0, 0]
    res = {
        'shape': {'batch': int(x.shape[0]), 'seq_len': int(x.shape[1]),
                  'hiddens': list(hiddens)},
        'state_mb': round(state_bytes / 1e6, 1),
        'hbm_floor_us': round(2 * state_bytes / (PEAK_GBPS * 1e9) * 1e6, 1),
        'carry_us': round(chain_time(p_carry, state0, n, sync), 1),
        'skeleton_us': round(chain_time(p_skeleton, state0, n, sync), 1),
        'weights_us': round(chain_time(p_weights, state0, n, sync), 1),
        'step_us': round(chain_time(p_step, state0, n, sync), 1),
        'chain_us': round(chain_time(p_losses, state0, n, sync), 1),
    }
    res['sweep_plus_assemble_us'] = round(res['step_us']
                                          - res['weights_us'], 1)
    res['metrics_us'] = round(res['chain_us'] - res['step_us'], 1)
    res['iters_per_s_chain'] = round(1e6 / res['chain_us'], 1)
    print(json.dumps(res, indent=1))


if __name__ == '__main__':
    main()
