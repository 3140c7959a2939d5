from admm_lstm_tpu.ckpt.checkpoint import CheckpointManager, save_model, load_model

__all__ = ['CheckpointManager', 'save_model', 'load_model']
