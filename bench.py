"""Headline benchmark + per-config artifact (BASELINE.json configs).

Prints ONE COMPACT JSON line (< 2000 chars — the driver keeps only the
last 2000 chars of output, so the whole line must fit or the headline is
lost, which is exactly what happened to BENCH_r04.json) and writes the
full multi-config artifact to bench_detail.json next to this script.
Headline (metric/value/vs_baseline) is unchanged from rounds 1-3: ADMM
iterations/s on GoogleStock (hidden=10, full batch), measured as the
median of fetch-synced epoch-chunked chains, with a 30-epoch
validation-loss gate against the recorded reference trajectory.
vs_baseline is against the reference implementation's CPU rate recorded
in BASELINE_MEASURED.json (torch eager, this container).

Round 4 adds a `configs` section so every runnable BASELINE.json config
ships in the driver-captured artifact instead of ROADMAP prose:
  * yahoofinance / dna1 — the default (auto Pallas gate-sweep kernel)
    vs kernel-off rates + quality gates vs the recorded reference
    endpoints, plus the turbo mode.
  * har_synthetic — the H in {64,128,256} x D=561 exact-solve sweep
    (BASELINE config 4's performance half; raw HAR data is absent from
    this container) with achieved TFLOP/s and % of bf16 MXU peak.
  * yahoo_scenarios_loose — BASELINE config 3: a scenario batch of
    sequence sets vmapped on one chip, loose (no_dual_y) variant.
GEFCOM2012 (config 2) stays data-blocked; multi-host (config 5) stays
environment-blocked (see tests/test_multihost.py for the mechanism).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))

PEAK_GBPS = 819.0        # TPU v5e HBM
PEAK_MXU_TFLOPS = 197.0  # TPU v5e bf16 MXU


def _load_golden(name):
    import numpy as np
    path = os.path.join(REPO, 'tests', 'golden', f'{name}.npz')
    return np.load(path) if os.path.isfile(path) else None


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    # Console INFO lines share stdout with the compact artifact line and
    # eat into the driver's 2000-char tail capture — silence them.
    import logging as _logging
    _logging.disable(_logging.CRITICAL)
    from admm_lstm_tpu.utils import logging as _alog
    _alog.set_console_enabled(False)

    from admm_lstm_tpu import ADMMConfig
    from admm_lstm_tpu.core.init import init_admm_state
    from admm_lstm_tpu.core.step import make_multi_epoch_fn
    from admm_lstm_tpu.models.lstm import init_lstm_params, params_from_dict
    from admm_lstm_tpu.params import parameter_set

    smoke = bool(os.environ.get('ADMM_BENCH_SMOKE'))

    # ------------------------------------------------------------------
    # Shared measurement core.  TIMING HONESTY (docs/ROADMAP.md): on this
    # relayed TPU, jax.block_until_ready returns before execution
    # finishes; the only trustworthy sync is fetching a result scalar to
    # host, so each timed chain ends with np.asarray of the final metric.
    # Inputs vary between reps (result cache); the ~35 ms dispatch+fetch
    # relay overhead is amortized over the epoch-chunked chain and
    # INCLUDED in the reported rate.
    # ------------------------------------------------------------------
    def measure_mode(cfg, params, ps, x, y, vx, vy, ref_final,
                     chain_len, n_reps, gate_epochs=30):
        """Stats dict: median/min/max iters/s over fetch-synced chains
        and the `gate_epochs` val-loss gate vs ref_final."""
        run30 = make_multi_epoch_fn(cfg, gate_epochs, donate=True)
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
        rates = sorted(timed_chain(rep) for rep in range(n_reps))
        return {'median': rates[len(rates) // 2], 'min': rates[0],
                'max': rates[-1], 'val': val, 'ok': ok}

    def mode_stats(v):
        return {'median': round(v['median'], 2), 'min': round(v['min'], 2),
                'max': round(v['max'], 2), 'val_loss_30ep': round(v['val'], 6)}

    # ------------------------------------------------------------------
    # Headline: GoogleStock hidden=10 (BASELINE config 1), 3 modes.
    # ------------------------------------------------------------------
    golden = _load_golden('googlestock_fast')
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

    ps = parameter_set('GoogleStock')
    ref_final = float(golden['val_loss'][30]) if golden is not None else None
    chain_len = 20 if smoke else 1000
    n_reps = 1 if smoke else 5

    cfg = ADMMConfig()
    hl = lambda c: measure_mode(c, params, ps, x, y, vx, vy, ref_final,
                                chain_len, n_reps)
    modes = {
        'gauss_seidel': hl(cfg),
        'jacobi': hl(cfg.replace(sweep_mode='jacobi')),
        'turbo': hl(ADMMConfig.turbo()),
    }
    passing = {k: v for k, v in modes.items() if v['ok']} or modes
    mode = max(passing, key=lambda k: passing[k]['median'])
    m = modes[mode]
    iters_per_s, val_loss, quality_ok = m['median'], m['val'], m['ok']

    # Roofline accounting (modeled HBM floor: every state byte read and
    # written once per epoch + one read of the inputs; see round-3 notes
    # — XLA cost_analysis is not usable as a traffic model here).
    state0 = init_admm_state(params, x, ps, cfg)
    state_bytes = sum(a.size * a.dtype.itemsize
                      for a in jax.tree.leaves(state0))
    floor_bytes = 2 * state_bytes + (x.size + y.size + vx.size) * 4
    sol_epoch_us = floor_bytes / (PEAK_GBPS * 1e9) * 1e6
    roofline = {
        'hbm_bytes_floor_per_epoch': int(floor_bytes),
        'achieved_gbps_at_floor': round(floor_bytes * iters_per_s / 1e9, 1),
        'pct_of_peak_bw': round(100.0 * floor_bytes * iters_per_s
                                / (PEAK_GBPS * 1e9), 1),
        'sol_epoch_us': round(sol_epoch_us, 1),
        'pct_of_sol': round(100.0 * sol_epoch_us * iters_per_s / 1e6, 1),
        # Round-4 floor decomposition (benchmarks/bench_turbo_floor.py):
        # at this scale the ~50 MB working set is VMEM-resident across
        # the epoch scan (the sweep skeleton moves 47 MB in 28.4 us,
        # above HBM peak), so the naive HBM state-once model above is a
        # REFERENCE lower bound, not the achievable floor; the measured
        # skeleton floor (all passes, solver math removed) is ~86 us,
        # and the turbo epoch runs ~1.75x that — the gap is the
        # solver's real VPU/MXU math.
        'sol_model': 'naive-hbm-state-once (see ROADMAP: VMEM-resident)',
        'skeleton_floor_us_measured': 86.0,
        # Round-5 floor correction (docs/ROADMAP.md, kernels/__init__.py
        # fused-epoch retirement): the 86 us all-passes skeleton ignores
        # the structural serial components — the weight phase's two-pass
        # requirement (~47 us), the final step's bounded search, the
        # metric forward's serial T-recurrence, the epoch carry — which
        # sum to a structure-respecting floor of ~112-125 us.
        'structure_floor_us': 118.0,
        'pct_of_structure_floor': round(100.0 * 118.0 * iters_per_s / 1e6,
                                        1),
    }

    configs = {}

    # ------------------------------------------------------------------
    # YahooFinance + DNA1 (BASELINE configs 3's dataset / the bundled
    # classification set): default (auto gate-sweep kernel) vs kernel-off
    # vs turbo, each vs the recorded reference endpoint.
    # ------------------------------------------------------------------
    sec_chain = 10 if smoke else 500
    sec_reps = 1 if smoke else 3
    for ds_name, key in (('YahooFinance', 'yahoofinance'),
                         ('DNA1', 'dna1')):
        g = _load_golden(f'{key}_fast')
        from admm_lstm_tpu.data import load_dataset
        (tx, ty, tvx, tvy), _, _ = load_dataset(ds_name)
        dx, dy = jnp.asarray(tx), jnp.asarray(ty)
        dvx, dvy = jnp.asarray(tvx), jnp.asarray(tvy)
        if g is not None:
            dparams = params_from_dict({k[3:]: g[k] for k in g.files
                                        if k.startswith('w0_')})
            dref = float(g['val_loss'][30])
            dh = int(g['hidden'])
        else:
            dh = 10
            dparams = init_lstm_params(jax.random.PRNGKey(0), dx.shape[2],
                                       dh, dy.shape[1])
            dref = None
        dps = parameter_set(ds_name)
        dcfg = ADMMConfig(hidden_size=dh)
        dm = lambda c: measure_mode(c, dparams, dps, dx, dy, dvx, dvy,
                                    dref, sec_chain, sec_reps)
        dmodes = {
            'default': dm(dcfg),                       # auto kernel
            'nokernel': dm(dcfg.replace(use_pallas_sweep=False)),
            'turbo': dm(ADMMConfig.turbo(hidden_size=dh)),
        }
        configs[key] = {
            'batch': int(dx.shape[0]), 'seq_len': int(dx.shape[1]),
            'hidden': dh,
            'ref_val_loss_30ep': (round(dref, 6) if dref is not None
                                  else None),
            'kernel_speedup': round(dmodes['default']['median']
                                    / dmodes['nokernel']['median'], 2),
            'modes': {k: mode_stats(v) for k, v in dmodes.items()},
            'quality_ok': dmodes['default']['ok'],
        }
        if key == 'yahoofinance':
            yahoo_default_rate = dmodes['default']['median']

    # The shard_map composition of the gate-sweep kernel, measured
    # through the SHARDED epoch program (1-device mesh on this single
    # chip — the layout/collective structure is the multi-device one;
    # 8-virtual-device bit-parity lives in tests/test_sharding.py).
    # Rate should track the unsharded default: the kernel survives the
    # mesh instead of resolving to the scan (pre-round-4 behavior).
    from admm_lstm_tpu.parallel import make_mesh, shard_batch, shard_state
    from admm_lstm_tpu.parallel.sharding import make_sharded_multi_epoch_fn
    (tx, ty, tvx, tvy), _, _ = load_dataset('YahooFinance')
    yx, yy = jnp.asarray(tx), jnp.asarray(ty)
    yvx, yvy = jnp.asarray(tvx), jnp.asarray(tvy)
    g = _load_golden('yahoofinance_fast')
    yparams = (params_from_dict({k[3:]: g[k] for k in g.files
                                 if k.startswith('w0_')})
               if g is not None else
               init_lstm_params(jax.random.PRNGKey(0), yx.shape[2], 10,
                                yy.shape[1]))
    yh = int(g['hidden']) if g is not None else 10
    yps = parameter_set('YahooFinance')
    ycfg = ADMMConfig(hidden_size=yh)
    mesh1 = make_mesh((1,), ('data',))
    dp_chain = 10 if smoke else 500
    dp_run = make_sharded_multi_epoch_fn(ycfg, mesh1, dp_chain,
                                         donate=True)
    from admm_lstm_tpu.core.init import init_admm_state as _ias
    dp_rates = []
    for rep in range(1 + (1 if smoke else 3)):
        st = shard_state(_ias(yparams._replace(
            wy=yparams.wy * (1 + (rep + 1) * 1e-7)), yx, yps, ycfg), mesh1)
        sx_, sy_ = shard_batch(yx, yy, mesh1)
        t0 = time.perf_counter()
        _, dpm = dp_run(st, sx_, sy_, yvx, yvy)
        final = float(np.asarray(dpm['val_loss'])[-1])
        if rep:
            dp_rates.append(dp_chain / (time.perf_counter() - t0))
        assert np.isfinite(final)
    configs['yahoofinance']['dp_mesh1_kernel'] = {
        'median': round(sorted(dp_rates)[len(dp_rates) // 2], 2),
        'vs_default': round(sorted(dp_rates)[len(dp_rates) // 2]
                            / yahoo_default_rate, 2),
    }

    # ------------------------------------------------------------------
    # HAR-shaped exact-solve sweep (BASELINE config 4's performance
    # half; raw HAR files absent — data/har.py docstring).  D=561
    # features, H sweep, exact normal-equation solve on BOTH stages via
    # the chunked wide-contraction Gram (no OOM at any H).
    # ------------------------------------------------------------------
    from benchmarks.bench_har_sweep import flop_count
    from admm_lstm_tpu.data.synthetic import load as synth_load
    if smoke:
        hB, hT, hI, hO, h_list, h_epochs, h_reps = 64, 4, 24, 3, (8,), 3, 1
    else:
        hB, hT, hI, hO = 2048, 10, 561, 6
        h_list, h_epochs, h_reps = (64, 128, 256), 30, 3
    hx, hy, hvx, hvy = synth_load(batch=hB, seq_len=hT, input_size=hI,
                                  output_size=hO, val_batch=128)
    hx, hy = jnp.asarray(hx), jnp.asarray(hy)
    hvx, hvy = jnp.asarray(hvx), jnp.asarray(hvy)
    hps = parameter_set('HAR')
    har = {}
    for hidden in h_list:
        hcfg = ADMMConfig.turbo(hidden_size=hidden, exact_solve_max_dim=1024)
        hparams = init_lstm_params(jax.random.PRNGKey(0), hI, hidden, hO)
        run = make_multi_epoch_fn(hcfg, h_epochs, donate=True)
        rates, val_last = [], None
        for rep in range(h_reps + 1):          # rep 0 = warm/compile
            st = init_admm_state(
                hparams._replace(wy=hparams.wy * (1 + (rep + 1) * 1e-7)),
                hx, hps, hcfg)
            t0 = time.perf_counter()
            _, hm = run(st, hx, hy, hvx, hvy)
            val_last = float(np.asarray(hm['val_loss'])[-1])
            if rep:
                rates.append(h_epochs / (time.perf_counter() - t0))
            assert np.isfinite(val_last)
        rate = sorted(rates)[len(rates) // 2]
        flops = flop_count(hidden, hI, hT, hB)
        har[f'H{hidden}'] = {
            'epoch_us': round(1e6 / rate, 1),
            'mxu_flops_per_epoch': flops,
            'achieved_tflops': round(flops * rate / 1e12, 2),
            'pct_of_peak_mxu': round(100 * flops * rate / 1e12
                                     / PEAK_MXU_TFLOPS, 1),
            'val_last': round(val_last, 5),
        }
    configs['har_synthetic'] = {
        'batch': hB, 'seq_len': hT, 'input': hI, 'output': hO,
        'exact_weight_solve': True, 'sweep': har,
    }

    # ------------------------------------------------------------------
    # Scenario batch, loose variant (BASELINE config 3): S independent
    # Yahoo-scale training instances vmapped into ONE program on one
    # chip (multi-ticker shape; only the AAPL cache is bundled, so the
    # scenario axis slices the cached set into disjoint folds).
    # ------------------------------------------------------------------
    from admm_lstm_tpu.core.step import admm_step, rules_for
    from admm_lstm_tpu.models.lstm import mse_loss
    S = 2 if smoke else 4
    sc_epochs = 5 if smoke else 200
    from admm_lstm_tpu.data import load_dataset
    (tx, ty, tvx, tvy), _, _ = load_dataset('YahooFinance')
    tx, ty = jnp.asarray(tx), jnp.asarray(ty)
    fold = tx.shape[0] // S
    sxs = jnp.stack([tx[i * fold:(i + 1) * fold] for i in range(S)])
    sys_ = jnp.stack([ty[i * fold:(i + 1) * fold] for i in range(S)])
    # wy_lipschitz: the loose variant's fixed tiny theta diverges on
    # YahooFinance with the shipped tuning (the reference's wy search is
    # a tautological no-op — StepRules.wy_lipschitz docstring); the
    # Lipschitz-safeguarded step is the shipped fix.
    scfg = ADMMConfig(variant='no_dual_y', hidden_size=10, epochs=sc_epochs,
                      wy_lipschitz=True)
    srules = rules_for(scfg)
    sps = parameter_set('YahooFinance')
    skeys = jax.random.split(jax.random.PRNGKey(0), S)
    sparams = jax.vmap(lambda k: init_lstm_params(
        k, tx.shape[2], 10, ty.shape[1]))(skeys)
    sstates = jax.vmap(lambda p, xx: init_admm_state(
        p, xx, sps, scfg))(sparams, sxs)

    def run_one(state, xx, yy):
        def body(s, _):
            s = admm_step(s, xx, yy, srules)
            return s, mse_loss(s.params, xx, yy, srules.precision)
        return jax.lax.scan(body, state, None, length=sc_epochs)

    srun = jax.jit(jax.vmap(run_one))
    _, straj = srun(sstates, sxs, sys_)
    float(np.asarray(straj)[0, -1])     # warm + sync
    s_rates, sfinal = [], None
    for rep in range(1 if smoke else 3):   # median like every config
        sstates2 = jax.vmap(lambda p, xx: init_admm_state(
            p._replace(wy=p.wy * (1 + (rep + 1) * 1e-7)), xx, sps,
            scfg))(sparams, sxs)
        t0 = time.perf_counter()
        _, straj = srun(sstates2, sxs, sys_)
        sfinal = np.asarray(straj)[:, -1]
        s_rates.append(S * sc_epochs / (time.perf_counter() - t0))
        assert np.all(np.isfinite(sfinal))
    s_med = sorted(s_rates)[len(s_rates) // 2]
    configs['yahoo_scenarios_loose'] = {
        'scenarios': S, 'fold_batch': int(fold), 'epochs': sc_epochs,
        'variant': 'no_dual_y',
        'scenario_epochs_per_s': round(s_med, 2),
        'epochs_per_s': round(s_med / S, 2),
        'final_train_loss': [round(float(v), 6) for v in sfinal],
    }

    # ------------------------------------------------------------------
    # GEFCOM2012 WIND track (energy forecasting, T=24): real bundled
    # data the reference ships but never trains (its GEFCOM class reads
    # only the Load track, whose raw file is absent — BASELINE config 2
    # stays data-blocked; this is the runnable energy config).  No
    # reference endpoint exists, so the gate is a real val-loss
    # decrease over the 30-epoch program.
    # ------------------------------------------------------------------
    from admm_lstm_tpu.data.gefcom_wind import load as wind_load
    wtx, wty, wvx, wvy = wind_load()
    if smoke:
        wtx, wty = wtx[:256], wty[:256]
        wvx, wvy = wvx[:64], wvy[:64]
    wx_, wy_ = jnp.asarray(wtx), jnp.asarray(wty)
    wvx_, wvy_ = jnp.asarray(wvx), jnp.asarray(wvy)
    wps = parameter_set('GEFCOM2012Wind')
    wparams = init_lstm_params(jax.random.PRNGKey(0), 1, 10, 1)
    wmodes = {}
    for wname, wcfg in (('default', ADMMConfig()),
                        ('turbo', ADMMConfig.turbo())):
        run30 = make_multi_epoch_fn(wcfg, 30, donate=True)
        st = init_admm_state(wparams, wx_, wps, wcfg)
        _, wm = run30(st, wx_, wy_, wvx_, wvy_)
        wtraj = np.asarray(wm['val_loss'])
        run_c = make_multi_epoch_fn(wcfg, sec_chain, donate=True)
        rates = []
        for rep in range(1 + sec_reps):
            st = init_admm_state(wparams._replace(
                wy=wparams.wy * (1 + (rep + 1) * 1e-7)), wx_, wps, wcfg)
            t0 = time.perf_counter()
            _, wm = run_c(st, wx_, wy_, wvx_, wvy_)
            final = float(np.asarray(wm['val_loss'])[-1])
            if rep:
                rates.append(sec_chain / (time.perf_counter() - t0))
            assert np.isfinite(final)
        wmodes[wname] = {
            'median': round(sorted(rates)[len(rates) // 2], 2),
            'val_loss_30ep': round(float(wtraj[-1]), 6),
            'val_decreased': bool(wtraj[-1] < wtraj[0]),
        }
    # Quality gate (round-4 VERDICT #5: 'val_decreased' was the weakest
    # gate in the artifact while the shipped Wind tuning was provably far
    # off — default 0.092 vs turbo 0.0099 val30): route the config
    # through train(preset='best') and gate QUANTITATIVELY — the
    # committed run's best val must be at-or-below its own probe winner
    # (the preset dominance property, tests/test_preset.py).
    from admm_lstm_tpu.api import train
    wbest = train(wx_, wy_, wvx_, wvy_, wps,
                  config=ADMMConfig(epochs=10 if smoke else 30),
                  log_every=0, preset='best')
    wbest_val = float(min(wbest['val_loss']))
    configs['gefcom_wind'] = {
        'batch': int(wx_.shape[0]), 'seq_len': int(wx_.shape[1]),
        'hidden': 10, 'modes': wmodes,
        'preset_choice': wbest['preset_choice'],
        'preset_best_val_30ep': round(wbest_val, 6),
        'quality_ok': bool(
            wbest_val <= min(wbest['probe_val'].values()) * 1.001
            and all(v['val_decreased'] for v in wmodes.values())),
    }

    # ------------------------------------------------------------------
    # Tensor parallelism at the scale it exists for (H=128 + exact
    # solve), run through the 2-D (data, model) sharded program on a
    # (1, 1) mesh — the only honest on-device TP measurement a single
    # chip allows: it validates the sharded lowering's layout/collective
    # structure and its overhead vs the unsharded program (multi-device
    # numerics are covered by tests/test_sharding.py::
    # test_tensor_parallel_exact_solve_h128 on 8 virtual devices).
    # ------------------------------------------------------------------
    import functools as _ft
    from admm_lstm_tpu.core.step import admm_step_im, rules_for as _rf
    from admm_lstm_tpu.parallel import make_mesh as _mm
    from admm_lstm_tpu.parallel.sharding import state_shardings
    from jax.sharding import NamedSharding, PartitionSpec as _P
    tpB, tpT, tpI, tpH = (64, 4, 8, 16) if smoke else (1024, 10, 8, 128)
    tpx_bm, tpy_bm, _, _ = synth_load(batch=tpB, seq_len=tpT,
                                      input_size=tpI, output_size=1,
                                      val_batch=8)
    tpx_bm = jnp.asarray(tpx_bm)                    # batch-major, for init
    tpx = jnp.transpose(tpx_bm, (1, 2, 0)).astype(jnp.float32)
    tpy = jnp.transpose(jnp.asarray(tpy_bm)).astype(jnp.float32)
    tp_cfg = ADMMConfig.turbo(hidden_size=tpH)
    tp_rules = _rf(tp_cfg)
    tp_params = init_lstm_params(jax.random.PRNGKey(0), tpI, tpH, 1)
    tp_mesh = _mm((1, 1), ('data', 'model'))
    tp_sh = state_shardings(tp_mesh, model_axis='model')
    tp_chain = 5 if smoke else 200

    def tp_run(state):
        return jax.lax.scan(
            lambda st, _: (admm_step_im(st, tpx, tpy, tp_rules), None),
            state, None, length=tp_chain)[0]

    tp_fns = {
        'tp_mesh': jax.jit(tp_run, in_shardings=(tp_sh,),
                           out_shardings=tp_sh),
        'unsharded': jax.jit(tp_run),
    }
    from admm_lstm_tpu.core.init import init_admm_state as _ias2
    tp_out = {}
    for name, fn in tp_fns.items():
        rates = []
        for rep in range(1 + (1 if smoke else 3)):
            st = _ias2(tp_params._replace(
                wy=tp_params.wy * (1 + (rep + 1) * 1e-7)),
                tpx_bm, ps, tp_cfg)
            if name == 'tp_mesh':
                st = jax.tree.map(jax.device_put, st, tp_sh)
            t0 = time.perf_counter()
            st = fn(st)
            final = float(np.asarray(st.params.wy[0, 0]))
            if rep:
                rates.append(tp_chain / (time.perf_counter() - t0))
            assert np.isfinite(final)
        tp_out[name] = round(sorted(rates)[len(rates) // 2], 2)
    configs['tp_h128_exact'] = {
        'hidden': tpH, 'mesh': [1, 1], 'axes': ['data', 'model'],
        'iters_per_s': tp_out['tp_mesh'],
        'vs_unsharded': round(tp_out['tp_mesh'] / tp_out['unsharded'], 2),
    }

    # ------------------------------------------------------------------
    # Stacked 2-layer (the single-chip half of BASELINE config 5; the
    # multi-host half remains environment-blocked — see
    # tests/test_multihost.py for the proven mechanism).  GoogleStock
    # (8, 8) with the in-scan best-iterate carry; quality gate = the
    # stack must beat the single-layer shipped-tuning endpoint.
    #
    # TIMED LIKE EVERY OTHER CONFIG (round-4 fix): one pre-compiled
    # epoch-chunked chain, init outside the timed region, median of
    # fetch-synced reps.  Round 4 timed train_stacked() end-to-end,
    # which put state init, fresh jit wrappers and (driver-side) a cold
    # compile inside the region — 1.25 it/s for a 660 us epoch program
    # (benchmarks/bench_stacked_floor.py has the phase attribution).
    # ------------------------------------------------------------------
    from admm_lstm_tpu.variants.stacked import (
        init_stacked, init_stacked_state, make_stacked_multi_epoch_fn)
    from admm_lstm_tpu.api import train_best_stacked
    st_epochs = 5 if smoke else 120
    st_chain = 10 if smoke else 500
    st_cfg = ADMMConfig(epochs=st_epochs, hidden_size=8, seed=0)
    st_ps = parameter_set('Stacked')
    # Rate FIRST (pre-compiled chain over the epoch program), quality
    # after: the preset's vmapped searches churn HBM and measurably
    # destabilize a chain timed right behind them (959 vs 1,505 it/s
    # across round-5 captures).
    st_run = make_stacked_multi_epoch_fn(st_cfg, st_chain, donate=True)
    st_params0 = init_stacked(jax.random.PRNGKey(0), x.shape[2], (8, 8),
                              y.shape[1])
    st_rates = []
    for rep in range(1 + (1 if smoke else 3)):     # rep 0 = warm/compile
        p = st_params0._replace(wy=st_params0.wy * (1 + (rep + 1) * 1e-7))
        sst = init_stacked_state(p, x, st_ps, st_cfg)
        sbp = jax.tree.map(lambda a: jnp.array(a, copy=True), sst.params)
        sbv = jnp.asarray(1e9, jnp.float32)
        t0 = time.perf_counter()
        _, _, _, _, _, svl = st_run(sst, sbv, sbp, x, y, vx, vy)
        final = float(np.asarray(svl)[-1])         # real sync
        if rep:
            st_rates.append(st_chain / (time.perf_counter() - t0))
        assert np.isfinite(final)
    # Quality: through the stacked preset (probe shipped vs searched
    # tuning, commit the winner with the best-iterate carry) — round-5
    # measurement: tuned ends 0.040 vs the shipped tuning's 0.055 at
    # the 120-epoch budget.
    st_res = train_best_stacked(
        x, y, vx, vy, st_ps, st_cfg, hiddens=(8, 8),
        probe_epochs=2 if smoke else 30,
        search_rounds=1 if smoke else 2, log_every=0)
    st_best = float(min(st_res['val_loss']))
    configs['googlestock_stacked_2layer'] = {
        'hiddens': [8, 8], 'epochs': st_epochs,
        'iters_per_s': round(sorted(st_rates)[len(st_rates) // 2], 2),
        'chain_len': st_chain,
        'best_val_loss': round(st_best, 6),
        'best_epoch': int(st_res['best_epoch']),
        'quality_ok': bool(ref_final is None or st_best <= ref_final),
    }

    # ------------------------------------------------------------------
    # Quality dominance: vmapped successive-halving rho search (tune.
    # refine_rho — a capability the reference lacks) from the same
    # seed-0 initial weights.
    # ------------------------------------------------------------------
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
        'value': round(iters_per_s, 2),          # MEDIAN of n_reps chains
        'unit': 'iters/s',
        'vs_baseline': (round(iters_per_s / baseline_rate, 1)
                        if baseline_rate else None),
        'epoch_ms': round(1000.0 / iters_per_s, 3),
        'reps': n_reps,
        'spread_min': round(m['min'], 2),
        'spread_max': round(m['max'], 2),
        'mode': mode,
        'modes': {k: mode_stats(v) for k, v in modes.items()},
        'final_val_loss_30ep': round(val_loss, 6),
        'ref_val_loss_30ep': (round(ref_final, 6) if ref_final else None),
        'tuned_val_loss_30ep': round(tuned_val_loss, 6),
        'tuned_rho': {k: float(f'{v:.3g}')
                      for k, v in tuned['best_rho'].items()},
        'quality_ok': quality_ok,
        'layout': 'batch-minor',
        'device': str(jax.devices()[0]),
        **roofline,
        'configs': configs,
    }

    # Full artifact -> file; stdout gets ONE COMPACT line that always
    # survives a 2000-char tail capture (see module docstring).
    detail_path = os.path.join(REPO, 'bench_detail.json')
    with open(detail_path, 'w') as f:
        json.dump(result, f, indent=1)

    def _cfg_brief(key):
        c = configs[key]
        if 'modes' in c:
            brief = {m: c['modes'][m]['median'] for m in c['modes']
                     if 'median' in c['modes'][m]}
            if 'quality_ok' in c:
                brief['ok'] = c['quality_ok']
            return brief
        return c

    compact = {
        'metric': result['metric'],
        'value': result['value'],
        'unit': result['unit'],
        'vs_baseline': result['vs_baseline'],
        'epoch_ms': result['epoch_ms'],
        'mode': mode,
        'modes': {k: round(v['median'], 1) for k, v in modes.items()},
        'val_30ep': result['final_val_loss_30ep'],
        'ref_30ep': result['ref_val_loss_30ep'],
        'tuned_30ep': result['tuned_val_loss_30ep'],
        'quality_ok': quality_ok,
        'pct_of_structure_floor': roofline['pct_of_structure_floor'],
        'cfg': {
            'yahoo': _cfg_brief('yahoofinance'),
            'dna1': _cfg_brief('dna1'),
            'har_pct_mxu': {k: v['pct_of_peak_mxu']
                            for k, v in configs['har_synthetic']
                            ['sweep'].items()},
            'scen_eps': configs['yahoo_scenarios_loose']
                               ['scenario_epochs_per_s'],
            'wind': _cfg_brief('gefcom_wind'),
            'tp_h128': configs['tp_h128_exact']['iters_per_s'],
            'stacked': {
                'ips': configs['googlestock_stacked_2layer']
                              ['iters_per_s'],
                'val': configs['googlestock_stacked_2layer']
                              ['best_val_loss'],
                'ok': configs['googlestock_stacked_2layer']
                             ['quality_ok']},
        },
        'detail': 'bench_detail.json',
    }
    line = json.dumps(compact)
    if len(line) >= 1900:   # unconditional (assert would strip under -O)
        raise RuntimeError(f'compact bench line too long: {len(line)} '
                           f'chars — would overflow the driver tail capture')
    print(line)


if __name__ == '__main__':
    main()
