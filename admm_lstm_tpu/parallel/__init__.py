from admm_lstm_tpu.parallel.mesh import make_mesh, initialize_multihost
from admm_lstm_tpu.parallel.sharding import (batch_sharding, state_shardings,
                                             make_sharded_epoch_fn,
                                             make_sharded_multi_epoch_fn,
                                             make_sharded_step, shard_batch,
                                             shard_state)

__all__ = ['make_mesh', 'initialize_multihost', 'batch_sharding',
           'state_shardings', 'make_sharded_epoch_fn',
           'make_sharded_multi_epoch_fn', 'make_sharded_step', 'shard_batch',
           'shard_state']
