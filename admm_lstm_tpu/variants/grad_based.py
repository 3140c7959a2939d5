"""Gradient-based full-batch baselines: SGD / Adam / Adagrad via optax.

Capability parity with the reference comparison baselines
(comparison_experiment/grad_based/grad_based.py): same model, full-batch
MSE training, same default learning rates (demo.py:58-63: sgd 1.5,
adam 0.2, adagrad 1.0), optional per-parameter gradient-norm recording
(grad_based.py:13,34-37) used to demonstrate gradient explosion.  The
whole epoch (grad + update) is one jitted function here.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import optax

from admm_lstm_tpu.models.lstm import LSTMParams, init_lstm_params, mse_loss
from admm_lstm_tpu.utils.logging import info

DEFAULT_LRS = {'sgd': 1.5, 'adam': 0.2, 'adagrad': 1.0}
EXPLOSION_DEMO_LR = 7.4  # grad_based.py:75-76


def _make_optimizer(method: str, lr: float) -> optax.GradientTransformation:
    if method == 'sgd':
        return optax.sgd(lr)
    if method == 'adam':
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if method == 'adagrad':
        return optax.adagrad(lr)
    raise ValueError(f'unknown method {method!r}; use sgd/adam/adagrad')


def train_grad_based(method: str, train_x, train_y, val_x, val_y,
                     epochs: int, params: Optional[LSTMParams] = None,
                     hidden_size: int = 10, lr: Optional[float] = None,
                     seed: int = 0, record_gradients: bool = False,
                     log_every: int = 0) -> Dict[str, object]:
    """Full-batch gradient training; returns the comparison-harness dict
    shape {'name', 'train_loss', 'val_loss', 'gradients', 'params'}."""
    train_x, train_y = jnp.asarray(train_x), jnp.asarray(train_y)
    val_x, val_y = jnp.asarray(val_x), jnp.asarray(val_y)
    if params is None:
        params = init_lstm_params(jax.random.PRNGKey(seed), train_x.shape[2],
                                  hidden_size, train_y.shape[1])
    lr = DEFAULT_LRS[method] if lr is None else lr
    opt = _make_optimizer(method, lr)
    opt_state = opt.init(params)

    val_fn = jax.jit(mse_loss)
    train_loss: List[float] = [float(val_fn(params, train_x, train_y))]
    val_loss: List[float] = [float(val_fn(params, val_x, val_y))]
    gradients: Dict[str, List[float]] = {'wx': [], 'wh': [], 'wy': []}

    # Whole run as ONE device program (lax.scan over epochs; the loss and
    # gradient-norm trajectories come back as stacked scan outputs) — the
    # same loop shape as api.train; log points bound the chunks.
    import functools

    @functools.partial(jax.jit, static_argnames='n')
    def run_chunk(params, opt_state, n):
        def body(carry, _):
            params, opt_state = carry
            grads = jax.grad(mse_loss)(params, train_x, train_y)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            gns = jnp.stack([jnp.sqrt(jnp.sum(g * g))
                             for g in (grads.wx, grads.wh, grads.wy)])
            metrics = (mse_loss(params, train_x, train_y),
                       mse_loss(params, val_x, val_y), gns)
            return (params, opt_state), metrics

        return jax.lax.scan(body, (params, opt_state), None, length=n)

    import numpy as np
    epoch = 0
    while epoch < epochs:
        chunk = epochs - epoch
        if log_every:
            chunk = min(chunk, log_every - epoch % log_every)
        (params, opt_state), (tls, vls, gns) = run_chunk(
            params, opt_state, n=chunk)
        train_loss += list(map(float, np.asarray(tls)))
        val_loss += list(map(float, np.asarray(vls)))
        if record_gradients:
            gns = np.asarray(gns)
            for j, k in enumerate(('wx', 'wh', 'wy')):
                gradients[k] += list(map(float, gns[:, j]))
        epoch += chunk
        if log_every and epoch % log_every == 0:
            info(f'{method.upper()}: Epoch {epoch}/{epochs}, '
                 f'Loss: {train_loss[-1]:.8f}, Val: {val_loss[-1]:.8f}')

    return {
        'name': {'sgd': 'SGD', 'adam': 'Adam', 'adagrad': 'Adagrad'}[method],
        'train_loss': train_loss,
        'val_loss': val_loss,
        'gradients': gradients if record_gradients else {},
        'params': params,
    }


def sgd_demo(num_epochs, train_x, train_y, test_x, test_y, lr=None, **kw):
    return train_grad_based('sgd', train_x, train_y, test_x, test_y,
                            num_epochs, lr=lr, **kw)


def adam_demo(num_epochs, train_x, train_y, test_x, test_y, lr=None, **kw):
    return train_grad_based('adam', train_x, train_y, test_x, test_y,
                            num_epochs, lr=lr, **kw)


def adagrad_demo(num_epochs, train_x, train_y, test_x, test_y, lr=None, **kw):
    return train_grad_based('adagrad', train_x, train_y, test_x, test_y,
                            num_epochs, lr=lr, **kw)
