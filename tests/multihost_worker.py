"""Worker for the 2-process jax.distributed CPU test (test_multihost.py).

Run as: python multihost_worker.py <process_id> <num_processes> <port>

Exercises the REAL multi-process branches of parallel/multihost.py —
`union_vocab` (process_allgather vocab union) and `make_global_arrays`
(host-local shards -> global jax.Array) — plus a cross-process psum'd
cofactor aggregation, validated against the full-data sigma computed
locally (the data is deterministic so every process knows the whole
table)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from duckdb_imputation_tpu.parallel import multihost  # noqa: E402

multihost.initialize(f"127.0.0.1:{port}", nproc, proc_id)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, jax.devices()

import functools  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import shard_map  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from duckdb_imputation_tpu import FeatureSchema  # noqa: E402
from duckdb_imputation_tpu.ring.sum import masked_sigma  # noqa: E402

# --- union_vocab: per-process vocabularies differ and have different sizes
local_keys = (((1, 2, 3), (10,)) if proc_id == 0
              else ((2, 3, 9), (10, 20, 30)))
merged = multihost.union_vocab(local_keys)
assert merged == ((1, 2, 3, 9), (10, 20, 30)), merged

# --- make_global_arrays + cross-process psum'd aggregation
schema = FeatureSchema(num_cols=2, cat_keys=((0, 1, 2),))
n_global = 64
rng = np.random.default_rng(0)  # same seed everywhere: all processes know
x_all = rng.normal(size=(2, n_global)).astype(np.float32)  # the full table
c_all = rng.integers(0, 3, size=(1, n_global)).astype(np.int32)
w_all = (rng.random(n_global) > 0.3).astype(np.float32)

lo = proc_id * (n_global // nproc)
hi = lo + n_global // nproc
mesh = multihost.global_mesh()
xg, cg, wg = multihost.make_global_arrays(
    mesh, x_all[:, lo:hi], c_all[:, lo:hi], w_all[lo:hi])
assert xg.shape == (2, n_global), xg.shape


@jax.jit
@functools.partial(shard_map, mesh=mesh,
                   in_specs=(P(None, "data"), P(None, "data"), P("data")),
                   out_specs=P())
def agg(x, c, w):
    return jax.lax.psum(masked_sigma(x, c, w, schema=schema), "data")


sigma = np.asarray(jax.block_until_ready(agg(xg, cg, wg)))
ref = np.asarray(masked_sigma(jnp.asarray(x_all), jnp.asarray(c_all),
                              jnp.asarray(w_all), schema=schema))
np.testing.assert_allclose(sigma, ref, rtol=1e-5, atol=1e-4)

print(f"MULTIHOST_OK {proc_id}", flush=True)
