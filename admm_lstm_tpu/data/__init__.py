from admm_lstm_tpu.data.registry import supported_datasets, load_dataset

__all__ = ['supported_datasets', 'load_dataset']
