"""Sweep the residual-balancing knobs (adapt_mu, adapt_tau) and horizon
for adaptive_rho on GoogleStock (round-2 verdict #5 follow-up)."""

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


def run(cfg, epochs):
    fn = make_multi_epoch_fn(cfg, epochs, donate=True)
    state = init_admm_state(params, x, ps, cfg)
    _, m = fn(state, x, y, vx, vy)
    v = np.asarray(m['val_loss'])
    return float(v[29]) if epochs >= 30 else float(v[-1]), float(v[-1])


for exact in (False, True):
    for mu in (2.0, 5.0, 10.0):
        for tau in (1.3, 2.0):
            cfg = ADMMConfig(adaptive_rho=True, exact_weight_solve=exact,
                             adapt_mu=mu, adapt_tau=tau)
            v30, v100 = run(cfg, 100)
            print(f'exact={exact!s:5s} mu={mu:4.1f} tau={tau:3.1f} '
                  f'-> val@30 {v30:.6f}  val@100 {v100:.6f}', flush=True)
