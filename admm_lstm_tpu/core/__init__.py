from admm_lstm_tpu.core.state import ADMMState, GateSlabs, DualSlabs, Penalties, Ridges
from admm_lstm_tpu.core.init import init_admm_state
from admm_lstm_tpu.core.step import admm_step, make_admm_step
from admm_lstm_tpu.core.residuals import admm_residuals

__all__ = ['ADMMState', 'GateSlabs', 'DualSlabs', 'Penalties', 'Ridges',
           'init_admm_state', 'admm_step', 'make_admm_step', 'admm_residuals']
