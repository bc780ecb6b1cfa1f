"""Child process for the multi-host smoke test (tests/test_parallel.py).

Each process owns 2 virtual CPU devices; two processes rendezvous through
``jax.distributed.initialize`` (the capability the reference claims via
torch.distributed env:// init, /root/reference/train.py:368-380), then:

- assert global device/process visibility,
- print this host's BatchIterator sample indexes (parent checks shard
  disjointness — the DistributedSampler replacement),
- run ONE data-parallel train step on a tiny algebraic model over the
  global mesh and print the loss (parent checks both hosts agree).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

process_id = int(sys.argv[1])
num_processes = int(sys.argv[2])
port = sys.argv[3]

jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=num_processes,
                           process_id=process_id)

from lt_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()  # multi-process CPU compiles are minutes cold

import numpy as np  # noqa: E402

from lt_tpu.parallel import mesh as mesh_lib  # noqa: E402

# Establish the Gloo communicator clique FIRST, while the processes are
# still in lockstep: the first collective pays a 30 s context-init
# deadline, and the minutes-long jit compiles below can skew the two
# processes far past it (observed: one process hits the compilation cache,
# the other misses).
mesh = mesh_lib.make_mesh()
replicated = mesh_lib.replicated_sharding(mesh)
warm = jax.make_array_from_process_local_data(
    mesh_lib.batch_sharding(mesh),
    np.full((2, 1), 1.0 + process_id, np.float32), (4, 1))
total = jax.jit(lambda x: x.sum(), out_shardings=replicated)(warm)
assert float(total) == 2 * (1.0 + 0.0) + 2 * (1.0 + 1.0), float(total)
print(f"[{process_id}] gloo warmup OK", flush=True)

import jax.numpy as jnp  # noqa: E402

from lt_tpu.data.batch import BatchIterator  # noqa: E402
from lt_tpu.data.synthetic import SyntheticMultiViewDataset  # noqa: E402
from lt_tpu.engine import factory  # noqa: E402
from lt_tpu.engine.steps import TrainState, make_train_step  # noqa: E402
from lt_tpu.models.triangulation import AlgebraicTriangulationNet  # noqa: E402
from lt_tpu.utils.cfg import AttrDict  # noqa: E402

assert jax.process_index() == process_id
assert jax.process_count() == num_processes
assert jax.local_device_count() == 2
assert jax.device_count() == 2 * num_processes
assert mesh_lib.is_master() == (process_id == 0)
print(f"[{process_id}] devices global={jax.device_count()} "
      f"local={jax.local_device_count()}", flush=True)

# --- per-host data sharding disjointness (DistributedSampler parity) ---
ds = SyntheticMultiViewDataset(n_samples=16, n_views=2, num_joints=4,
                               image_size=32, seed=0)
it = BatchIterator(ds, batch_size=4, shuffle=True, seed=7,
                   shard_id=jax.process_index(),
                   num_shards=jax.process_count(), prefetch=0)
indexes = []
for batch in it.epoch(0):
    indexes.extend(int(i) for i in batch["indexes"])
print(f"[{process_id}] INDEXES {sorted(indexes)}", flush=True)

# --- one sharded train step over the global mesh ---
config = AttrDict({
    "kind": "human36m",
    "opt": {"criterion": "MSESmooth", "lr": 1e-3,
            "scale_keypoints_3d": 0.1},
    "model": {"name": "alg",
              "backbone": {"num_joints": 4, "num_layers": 18}},
})
model = AlgebraicTriangulationNet(num_joints=4, num_layers=18,
                                  use_confidences=True)
global_batch = 8
n_views, image = 4, 32  # 2 opposite views make the DLT degenerate (NaN)
# Real look-at cameras (random projection matrices make the DLT SVD
# degenerate -> NaN loss); identical on both hosts by construction.
from __graft_entry__ import _example_batch  # noqa: E402

images, proj, keypoints = _example_batch(global_batch, n_views, image, 4)
batch_np = {
    "images": images,
    "proj_matrices": proj,
    "keypoints_3d": np.concatenate(
        [keypoints, np.ones((global_batch, 4, 1), np.float32)],
        -1).astype(np.float32),
    "keypoints_validity": np.ones((global_batch, 4, 1), np.float32),
    "view_mask": np.ones((global_batch, n_views), np.float32),
}

variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                jnp.asarray(batch_np["images"][:1]),
                                jnp.asarray(batch_np["proj_matrices"][:1]))
variables = dict(variables)
criterion = factory.make_criterion(config)
optimizer = factory.make_optimizer(config, variables["params"], "alg")
state = TrainState(variables["params"], variables["batch_stats"],
                   optimizer.init(variables["params"]),
                   jnp.zeros((), jnp.int32))

state = jax.device_put(state, replicated)

# Each host feeds its half of the global batch (multi-host shard_batch:
# local data -> globally sharded array).
sharding = mesh_lib.batch_sharding(mesh)
lo = process_id * (global_batch // num_processes)
hi = lo + global_batch // num_processes
batch = {k: jax.make_array_from_process_local_data(
    sharding, np.ascontiguousarray(v[lo:hi]), v.shape)
    for k, v in batch_np.items()}

train_step = make_train_step(model, "alg", criterion, optimizer, config)
new_state, metrics = train_step(state, batch, jax.random.PRNGKey(2))
jax.block_until_ready(new_state.params)
loss = float(metrics["total_loss"])
assert np.isfinite(loss)
print(f"[{process_id}] LOSS {loss:.6f}", flush=True)
print(f"[{process_id}] MULTIHOST_OK", flush=True)
