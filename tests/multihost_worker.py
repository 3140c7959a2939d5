"""Worker process for the 2-process `jax.distributed` bring-up test.

Run as:  python multihost_worker.py <process_id> <num_processes> <port> <out.npz>

Each process owns 2 virtual CPU devices; together they form a 4-way 'data'
mesh spanning a real process boundary, so the weight-consensus psums of the
sharded ADMM step travel through gloo cross-process collectives — the same
code path `initialize_multihost` drives on a multi-host TPU pod (where the
collectives ride ICI/DCN instead).  The reference has no distribution at
all (SURVEY §2.2); this exercises the net-new axis end to end.

Process 0 writes the post-step replicated weights and train loss to
`out.npz`; the parent test compares them against a single-process run.
"""

import os
import sys

proc_id, nprocs, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                   sys.argv[3], sys.argv[4])
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['JAX_PLATFORM_NAME'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
os.environ['ADMM_TPU_NO_FILELOG'] = '1'
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

from admm_lstm_tpu.parallel.mesh import initialize_multihost  # noqa: E402

initialize_multihost(coordinator_address=f'localhost:{port}',
                     num_processes=nprocs, process_id=proc_id)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from admm_lstm_tpu import ADMMConfig  # noqa: E402
from admm_lstm_tpu.core.init import init_admm_state  # noqa: E402
from admm_lstm_tpu.models.lstm import init_lstm_params, mse_loss  # noqa: E402
from admm_lstm_tpu.parallel import (make_mesh, make_sharded_step,  # noqa: E402
                                    shard_batch, shard_state)
from admm_lstm_tpu.data.synthetic import load as synth  # noqa: E402
from admm_lstm_tpu.params import parameter_set  # noqa: E402

assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == 2 * nprocs  # global view of every device

# Identical global problem on every process (same seeds).
tx, ty, _, _ = synth(batch=16, seq_len=5, input_size=2, output_size=1)
tx, ty = jnp.asarray(tx), jnp.asarray(ty)
params = init_lstm_params(jax.random.PRNGKey(0), 2, 4, 1)
cfg = ADMMConfig()

mesh = make_mesh()  # all 4 devices, both processes, on the 'data' axis
state = shard_state(init_admm_state(params, tx, parameter_set('Synthetic'),
                                    cfg), mesh)
sx, sy = shard_batch(tx, ty, mesh)
step = make_sharded_step(cfg, mesh, donate=False)
for _ in range(3):
    state = step(state, sx, sy)

loss = jax.jit(mse_loss, out_shardings=jax.NamedSharding(
    mesh, jax.sharding.PartitionSpec()))(state.params, sx, sy)

# Chunk-dispatch overhead: one 20-epoch chunked program (the production
# loop shape), timed end-to-end including the cross-process collectives.
import time  # noqa: E402

from admm_lstm_tpu.parallel import make_sharded_multi_epoch_fn  # noqa: E402

chunk = make_sharded_multi_epoch_fn(cfg, mesh, 20, donate=False)
st2, m = chunk(state, sx, sy, tx, ty)
float(np.asarray(m['val_loss'])[-1])          # warm + sync
t0 = time.perf_counter()
st2, m = chunk(state, sx, sy, tx, ty)
chunk_final = float(np.asarray(m['val_loss'])[-1])
chunk_secs = time.perf_counter() - t0

# Round-4: the shard_map'd Pallas gate-sweep kernel ACROSS the process
# boundary — each process runs the (interpret-mode, on CPU) kernel on
# its local batch shards; the surrounding consensus psums still ride
# gloo.  2 steps from the same initial state, compared against a
# single-process kernel-forced oracle by the parent.
cfg_k = ADMMConfig(use_pallas_sweep=True)
state_k = shard_state(init_admm_state(params, tx,
                                      parameter_set('Synthetic'), cfg_k),
                      mesh)
step_k = make_sharded_step(cfg_k, mesh, donate=False)
for _ in range(2):
    state_k = step_k(state_k, sx, sy)

# Weights are replicated, hence addressable from every process.
wy = np.asarray(state.params.wy)
wx = np.asarray(state.params.wx)
wh = np.asarray(state.params.wh)
if proc_id == 0:
    np.savez(out_path, wy=wy, wx=wx, wh=wh, loss=np.asarray(loss),
             chunk_secs=chunk_secs, chunk_final=chunk_final,
             wy_kernel=np.asarray(state_k.params.wy),
             wh_kernel=np.asarray(state_k.params.wh))
print(f'proc {proc_id}: ok loss={float(loss):.8f} '
      f'chunk20={chunk_secs * 1e3:.1f}ms', flush=True)
