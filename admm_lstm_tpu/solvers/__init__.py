from admm_lstm_tpu.solvers import closed_form, prox_linear, normal_eq

__all__ = ['closed_form', 'prox_linear', 'normal_eq']
