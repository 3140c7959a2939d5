from admm_lstm_tpu.utils.logging import info, warning, error, log_assert, global_dict
from admm_lstm_tpu.utils.timer import Timer

__all__ = ['info', 'warning', 'error', 'log_assert', 'global_dict', 'Timer']
