"""2D-sharded cofactor aggregation: rows over 'data', sigma columns over
'model'.

For very wide one-hot expansions (large total vocab V), the P×P sigma
itself becomes big (P = 1+d+V; V=64k ⇒ 16GB f32). SURVEY.md §2 item 2: shard
the Gram output over a model axis. Each model shard owns a contiguous slice
of the vocab (and therefore of sigma's columns):

    S[:, cols_m] = Zᵀ · diag(w) · Z[:, cols_m]

Every (data, model) device builds the full-height Zᵀ for its row shard (the
one-hot build is compute, not memory — it never materializes beyond a VMEM
tile) but only the `cols_m` slice of the right operand; the psum over 'data'
yields sigma column-sharded over 'model'. Communication: one psum of
P × (P/M) per shard — a reduce-scatter of the full sigma in effect, riding
ICI.

The column slicing runs per-chunk inside the same streaming scan as the
1D path, so the overlap requirement (exchange of partial triples overlapped
with next-chunk compute, SURVEY §2 item 5) is handled by XLA's scheduler:
the per-chunk partial sums are independent of the collective until the final
psum, which overlaps with the epilogue of the scan automatically; for the
tiny 1D sigma the collective is 64KB and latency-hidden entirely.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..schema import FeatureSchema
from ..ring.sum import DEFAULT_ROW_CHUNK, _pad_cols, _zt_block
from ..ring.triple import Triple, triple_from_sigma


def make_mesh_2d(n_data: int, n_model: int,
                 axes=("data", "model")) -> Mesh:
    devs = np.asarray(jax.devices()[:n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(devs, axes)


@functools.partial(jax.jit, static_argnames=("schema", "mesh", "row_chunk"))
def _sigma_2d(x_num, codes, weights, *, schema: FeatureSchema, mesh,
              row_chunk: int):
    p = schema.sigma_size
    n_model = mesh.shape["model"]
    cols_per = -(-p // n_model)        # ceil; last shard zero-padded

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, "data"), P(None, "data"), P("data")),
        out_specs=P(None, "model"),
    )
    def local(xn, cd, w):
        m = jax.lax.axis_index("model")
        lo = m * cols_per
        zt = _zt_block(xn, cd, schema)                    # [P, n_local]
        zt_pad = jnp.pad(zt, ((0, cols_per * n_model - p), (0, 0)))
        cols = jax.lax.dynamic_slice_in_dim(zt_pad, lo, cols_per, axis=0)
        block = jax.lax.dot_general(
            zt * w[None, :], cols, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)            # [P, cols_per]
        return jax.lax.psum(block, "data")

    return local(x_num, codes, weights)


def sum_to_triple_sharded2d(x_num=None, codes=None, weights=None, *,
                            schema: FeatureSchema, mesh: Mesh,
                            row_chunk: int = DEFAULT_ROW_CHUNK) -> Triple:
    """Aggregate with rows sharded over 'data' and sigma columns over
    'model'. Returns a fully-gathered Triple (tests / small V); production
    wide-V flows keep the column-sharded sigma on-device and feed the
    sharded solver directly."""
    n = x_num.shape[-1] if x_num is not None else codes.shape[-1]
    if x_num is None:
        x_num = np.zeros((0, n), np.float32)
    if codes is None:
        codes = np.zeros((0, n), np.int32)
    if weights is None:
        weights = np.ones((n,), np.float32)
    nd = mesh.shape["data"]
    def pad(a):
        a = np.asarray(a)
        padn = (-a.shape[-1]) % nd
        if padn == 0:
            return jnp.asarray(a)
        widths = [(0, 0)] * (a.ndim - 1) + [(0, padn)]
        return jnp.asarray(np.pad(a, widths))
    sigma_cols = _sigma_2d(pad(np.asarray(x_num, np.float32)),
                           pad(np.asarray(codes, np.int32)),
                           pad(np.asarray(weights, np.float32)),
                           schema=schema, mesh=mesh, row_chunk=row_chunk)
    p = schema.sigma_size
    sigma = np.asarray(sigma_cols)[:, :p]
    return triple_from_sigma(jnp.asarray(sigma), schema.num_cols)
