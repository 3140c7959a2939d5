"""Smoke test of the headline benchmark artifact.

The driver runs `python bench.py` on real TPU hardware every round; a
syntax error or API drift there silently costs the round's headline.
ADMM_BENCH_SMOKE=1 shrinks the chains/tuning so the full script executes
in seconds on CPU, and the emitted JSON line is schema-checked here.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_smoke():
    env = dict(os.environ, ADMM_BENCH_SMOKE='1', JAX_PLATFORMS='cpu',
               JAX_PLATFORM_NAME='cpu')
    proc = subprocess.run([sys.executable, os.path.join(REPO, 'bench.py')],
                          capture_output=True, text=True, timeout=900,
                          env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    # ARTIFACT-SURVIVAL GATE (round-4 defect): the driver records only
    # the LAST 2000 CHARS of stdout and parses the final line.  The
    # whole compact headline line must therefore live inside that tail.
    tail = proc.stdout[-2000:]
    line = tail.strip().splitlines()[-1]
    compact = json.loads(line)
    assert compact['metric'] == 'admm_iters_per_s_googlestock_h10'
    assert compact['unit'] == 'iters/s'
    assert compact['value'] > 0
    for key in ('mode', 'modes', 'vs_baseline', 'epoch_ms', 'val_30ep',
                'quality_ok', 'cfg'):
        assert key in compact, key
    for key in ('yahoo', 'dna1', 'har_pct_mxu', 'scen_eps', 'wind',
                'tp_h128', 'stacked'):
        assert key in compact['cfg'], key
    assert compact['cfg']['stacked']['ips'] > 0

    # Full artifact lands in bench_detail.json.
    with open(os.path.join(REPO, 'bench_detail.json')) as f:
        result = json.load(f)
    assert result['metric'] == 'admm_iters_per_s_googlestock_h10'
    assert result['value'] == compact['value']
    for key in ('mode', 'modes', 'reps', 'spread_min', 'spread_max',
                'final_val_loss_30ep', 'tuned_val_loss_30ep', 'quality_ok'):
        assert key in result, key
    for mode in ('gauss_seidel', 'jacobi', 'turbo'):
        stats = result['modes'][mode]
        assert stats['median'] > 0
        assert stats['min'] <= stats['median'] <= stats['max']
    # The headline is the MEDIAN (not max) of the repetitions.
    assert result['spread_min'] <= result['value'] <= result['spread_max']
    # The quality gates run even in smoke mode: the 30-epoch programs are
    # full-size, so the parity check is real.
    assert (result['modes']['gauss_seidel']['val_loss_30ep']
            <= result['ref_val_loss_30ep'] * 1.05)
    # Round 4: one artifact entry per runnable BASELINE config.
    cfgs = result['configs']
    for key in ('yahoofinance', 'dna1'):
        assert cfgs[key]['kernel_speedup'] > 0
        for mode in ('default', 'nokernel', 'turbo'):
            assert cfgs[key]['modes'][mode]['median'] > 0
        # Real quality gates vs the recorded reference endpoints.
        assert cfgs[key]['modes']['default']['val_loss_30ep'] <= \
            cfgs[key]['ref_val_loss_30ep'] * 1.05
    assert all(v['epoch_us'] > 0
               for v in cfgs['har_synthetic']['sweep'].values())
    assert cfgs['yahoo_scenarios_loose']['scenario_epochs_per_s'] > 0
    assert cfgs['yahoofinance']['dp_mesh1_kernel']['median'] > 0
    assert cfgs['googlestock_stacked_2layer']['iters_per_s'] > 0
    assert cfgs['tp_h128_exact']['iters_per_s'] > 0
    assert cfgs['gefcom_wind']['modes']['default']['median'] > 0
