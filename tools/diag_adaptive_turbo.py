"""Diagnose the adaptive_rho x turbo non-composition (round-2 verdict #5).

Runs GoogleStock (golden seed-0 weights) 30 epochs under every
combination of {sweep_mode, exact_weight_solve, matmul_precision} with
adaptive_rho on, to isolate WHICH turbo ingredient breaks the residual
balancing.  CPU-friendly (minutes).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from admm_lstm_tpu import ADMMConfig
from admm_lstm_tpu.core.init import init_admm_state
from admm_lstm_tpu.core.step import make_multi_epoch_fn
from admm_lstm_tpu.models.lstm import params_from_dict
from admm_lstm_tpu.params import parameter_set

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
g = np.load(os.path.join(REPO, 'tests', 'golden', 'googlestock_fast.npz'))
x, y = jnp.asarray(g['train_x']), jnp.asarray(g['train_y'])
vx, vy = jnp.asarray(g['test_x']), jnp.asarray(g['test_y'])
params = params_from_dict({k[3:]: g[k] for k in g.files
                           if k.startswith('w0_')})
ps = parameter_set('GoogleStock')

EPOCHS = int(os.environ.get('DIAG_EPOCHS', '30'))

print(f'{"sweep":12s} {"exact":5s} {"prec":8s} {"adapt":5s} -> val@{EPOCHS}')
for sweep in ('gauss_seidel', 'jacobi'):
    for exact in (False, True):
        for prec in ('highest', 'default'):
            for adapt in (True,):
                cfg = ADMMConfig(sweep_mode=sweep, exact_weight_solve=exact,
                                 matmul_precision=prec, adaptive_rho=adapt)
                run = make_multi_epoch_fn(cfg, EPOCHS, donate=True)
                state = init_admm_state(params, x, ps, cfg)
                _, m = run(state, x, y, vx, vy)
                val = float(np.asarray(m['val_loss'])[-1])
                print(f'{sweep:12s} {str(exact):5s} {prec:8s} {str(adapt):5s}'
                      f' -> {val:.6f}', flush=True)
