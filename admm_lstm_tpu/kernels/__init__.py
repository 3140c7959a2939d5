from admm_lstm_tpu.kernels.gate_sweep import pallas_interior_sweep

__all__ = ['pallas_interior_sweep']
