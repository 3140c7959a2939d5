from admm_lstm_tpu.kernels.gate_sweep import (pallas_interior_sweep,
                                              pallas_jacobi_sweep)
from admm_lstm_tpu.kernels.weight_stage import pallas_weight_stage

__all__ = ['pallas_interior_sweep', 'pallas_jacobi_sweep',
           'pallas_weight_stage']
