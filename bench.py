"""Headline benchmark: ADMM iterations/s on GoogleStock (hidden=10, full batch).

Prints ONE JSON line:
  {"metric": "admm_iters_per_s_googlestock_h10", "value": N, "unit": "iters/s",
   "vs_baseline": N, ...}

vs_baseline is measured against the reference implementation's CPU rate
recorded in BASELINE_MEASURED.json (tools/make_golden.py; torch eager,
this container).  The run also validates quality: the 30-epoch validation
loss must match the reference trajectory's endpoint within 5%.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from admm_lstm_tpu import ADMMConfig
    from admm_lstm_tpu.core.init import init_admm_state
    from admm_lstm_tpu.core.step import make_admm_step
    from admm_lstm_tpu.models.lstm import (init_lstm_params, mse_loss,
                                           params_from_dict)
    from admm_lstm_tpu.params import parameter_set

    # --- data + seed-0 initial weights (exact reference parity if golden
    # fixtures exist, fresh xavier otherwise) ---
    golden_path = os.path.join(REPO, 'tests', 'golden', 'googlestock_fast.npz')
    golden = np.load(golden_path) if os.path.isfile(golden_path) else None
    if golden is not None:
        x = jnp.asarray(golden['train_x'])
        y = jnp.asarray(golden['train_y'])
        vx, vy = jnp.asarray(golden['test_x']), jnp.asarray(golden['test_y'])
        params = params_from_dict({k[3:]: golden[k] for k in golden.files
                                   if k.startswith('w0_')})
    else:
        from admm_lstm_tpu.data import load_dataset
        (tx, ty, tvx, tvy), _, _ = load_dataset('GoogleStock')
        x, y, vx, vy = map(jnp.asarray, (tx, ty, tvx, tvy))
        params = init_lstm_params(jax.random.PRNGKey(0), 1, 10, 1)

    from admm_lstm_tpu.core.step import make_multi_epoch_fn

    ps = parameter_set('GoogleStock')
    ref_final = float(golden['val_loss'][30]) if golden is not None else None

    # The production loop shape: N epochs inside ONE device program
    # (`lax.scan` over epochs, each iteration the full ADMM step + both
    # losses).  The host dispatches once per chunk, so the relay latency
    # that dominated the round-1 per-epoch loop (one dispatch per 0.11 ms
    # epoch) is amortized 1000x.  Same loop api.train uses (log_every=0).
    #
    # TIMING HONESTY: on this relayed TPU, jax.block_until_ready returns
    # before execution finishes (measured: a 1000-epoch program "completes"
    # in the same 0.7 ms as a 100-epoch one, while a real value fetch
    # scales 9x).  The only trustworthy sync is fetching a result scalar
    # to host, so each timed chain ends with np.asarray of the final
    # metric.  The ~35 ms dispatch+fetch relay overhead is amortized over
    # a 1000-epoch single-program chain (<5% of wall time) and INCLUDED
    # in the reported rate.
    # ADMM_BENCH_SMOKE=1 shrinks everything for a fast CI/CPU smoke run
    # (tests/test_bench_smoke.py); timings are then meaningless but every
    # code path executes.
    smoke = bool(os.environ.get('ADMM_BENCH_SMOKE'))
    chain_len = 20 if smoke else 1000

    def measure_mode(cfg):
        """(iters/s best, median, 30-epoch val, quality_ok) for one mode."""
        run30 = make_multi_epoch_fn(cfg, 30, donate=True)
        run_chain = make_multi_epoch_fn(cfg, chain_len, donate=True)
        state = init_admm_state(params, x, ps, cfg)
        _, m30 = run30(state, x, y, vx, vy)
        val = float(np.asarray(m30['val_loss'])[-1])
        ok = ref_final is None or val <= ref_final * 1.05

        def timed_chain(rep: int) -> float:
            state = init_admm_state(params, x, ps, cfg)
            state = state._replace(params=state.params._replace(
                wy=state.params.wy * (1.0 + (rep + 1) * 1e-7)))
            t0 = time.perf_counter()
            _, m = run_chain(state, x, y, vx, vy)
            final = float(np.asarray(m['val_loss'])[-1])  # real sync
            dt = time.perf_counter() - t0
            assert np.isfinite(final)
            return chain_len / dt

        timed_chain(99)  # warm / compile
        rates = [timed_chain(rep) for rep in range(1 if smoke else 3)]
        return max(rates), sorted(rates)[len(rates) // 2], val, ok

    # Two modes, each with its own 30-epoch quality gate against the
    # reference endpoint: the reference-exact Gauss-Seidel sweep, and the
    # Jacobi (time-parallel) sweep — a documented sweep-order relaxation
    # of the same algorithm family (the reference itself sweeps in either
    # direction: ADMMLSTMS/main.py:251 goes backward).  The headline is
    # the fastest mode whose gate passes.
    # 'turbo' adds the LM-anchored exact weight solve (replacing the
    # line-searched prox step with an exact solve of the damped
    # subproblem) and default matmul precision — measured BETTER 30-epoch
    # val than the reference (0.3404 vs 0.3469) at ~2.5x the parity rate.
    cfg = ADMMConfig()
    modes = {
        'gauss_seidel': measure_mode(cfg),
        'jacobi': measure_mode(cfg.replace(sweep_mode='jacobi')),
        'turbo': measure_mode(cfg.replace(sweep_mode='jacobi',
                                          exact_weight_solve=True,
                                          matmul_precision='default')),
    }
    passing = {k: v for k, v in modes.items() if v[3]} or modes
    mode = max(passing, key=lambda k: passing[k][0])
    iters_per_s, median_rate, val_loss, quality_ok = modes[mode]

    # Quality DOMINANCE metric: vmapped successive-halving rho search
    # (tune.refine_rho — a capability the reference lacks; it hand-edits
    # rho in source, README.md:79-83) then report the tuned 30-epoch val
    # loss from the same seed-0 initial weights.
    from admm_lstm_tpu.tune import refine_rho
    tuned = refine_rho(x, y, vx, vy, ps, config=cfg, epochs=30,
                       rounds=1 if smoke else 3, params=params,
                       keys=('c', 'y') if smoke else ('c', 'h', 'y'),
                       span=5.0 if smoke else 10.0)
    tuned_val_loss = float(tuned['best_val_loss'])

    baseline_path = os.path.join(REPO, 'BASELINE_MEASURED.json')
    baseline_rate = None
    if os.path.isfile(baseline_path):
        with open(baseline_path) as f:
            baseline_rate = json.load(f).get('iters_per_s')

    result = {
        'metric': 'admm_iters_per_s_googlestock_h10',
        'value': round(iters_per_s, 2),
        'unit': 'iters/s',
        'vs_baseline': (round(iters_per_s / baseline_rate, 1)
                        if baseline_rate else None),
        'epoch_ms': round(1000.0 / iters_per_s, 3),
        'median_iters_per_s': round(median_rate, 2),
        'mode': mode,
        'gs_iters_per_s': round(modes['gauss_seidel'][0], 2),
        'jacobi_iters_per_s': round(modes['jacobi'][0], 2),
        'turbo_iters_per_s': round(modes['turbo'][0], 2),
        'turbo_val_loss_30ep': round(modes['turbo'][2], 6),
        'final_val_loss_30ep': round(val_loss, 6),
        'gs_val_loss_30ep': round(modes['gauss_seidel'][2], 6),
        'ref_val_loss_30ep': (round(ref_final, 6) if ref_final else None),
        'tuned_val_loss_30ep': round(tuned_val_loss, 6),
        'tuned_rho': {k: float(f'{v:.3g}')
                      for k, v in tuned['best_rho'].items()},
        'quality_ok': quality_ok,
        'device': str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
