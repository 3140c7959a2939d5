from admm_lstm_tpu.models.lstm import (
    LSTMParams, init_lstm_params, lstm_forward, lstm_forward_with_history, mse_loss,
)

__all__ = ['LSTMParams', 'init_lstm_params', 'lstm_forward',
           'lstm_forward_with_history', 'mse_loss']
