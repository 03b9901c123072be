"""Grouped (GROUP BY) Pallas cofactor kernel — sorted-segment hash
aggregation in ONE kernel launch.

The reference's GROUP BY runs DuckDB's hash aggregate over per-thread
SumStates. Here: rows are counting-sorted by group id on the host (indices
only), each group's range is padded to a block multiple with zero-weight
rows, and a single Pallas kernel streams the blocks; a scalar-prefetched
block→group map routes every block's Gram contribution into its group's
output slab (the output BlockSpec index_map reads the prefetched map, so
revisits stay resident in VMEM while a group's blocks stream by — groups
are contiguous after the sort). Skew costs nothing: a hot key is just a
longer run of blocks into the same slab.

Total work is one pass over the data regardless of the number of groups —
unlike the masked-vmap fallback (G passes) — with no per-group-size
recompiles (unlike the sliced host loop)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...schema import FeatureSchema
from ..triple import Triple, triple_from_sigma
from .sigma_pallas import _seg_size, _sizing


def _grouped_kernel(gmap_ref, first_ref, x_ref, codes_ref, w_ref, out_ref,
                    *, schema: FeatureSchema, pack: int, chunk: int,
                    width: int):
    step = pl.program_id(0)

    @pl.when(first_ref[step] == 1)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    p_pad = _seg_size(schema, pack, width)
    d = schema.num_cols
    offs = schema.offsets
    q = jax.lax.broadcasted_iota(jnp.int32, (p_pad, 1), 0)

    zts, zws = [], []
    for k in range(pack):
        sl = pl.ds(k * chunk, chunk)
        zt = jnp.broadcast_to((q == 0).astype(jnp.float32), (p_pad, chunk))
        for j in range(d):
            zt = zt + (q == 1 + j).astype(jnp.float32) * x_ref[j, sl][None, :]
        for j, size in enumerate(schema.cat_sizes):
            start = 1 + d + offs[j]
            inseg = jnp.logical_and(q >= start, q < start + size)
            hit = jnp.logical_and(
                inseg, codes_ref[j, sl][None, :] == (q - start))
            zt = zt + hit.astype(jnp.float32)
        zts.append(zt)
        zws.append(zt * w_ref[:, sl])
    if pack * p_pad < width:
        zpad = jnp.zeros((width - pack * p_pad, chunk), jnp.float32)
        zts.append(zpad)
        zws.append(zpad)
    zt_packed = jnp.concatenate(zts, axis=0) if len(zts) > 1 else zts[0]
    zw_packed = jnp.concatenate(zws, axis=0) if len(zws) > 1 else zws[0]
    out_ref[0] += jax.lax.dot_general(
        zt_packed, zw_packed, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit,
                   static_argnames=("schema", "num_groups", "chunk_cols"))
def _sigma_pallas_grouped_padded(x_num, codes, weights, gmap, first, *,
                                 schema: FeatureSchema, num_groups: int,
                                 chunk_cols: int):
    """Inputs already group-sorted and block-padded; gmap/first are the
    per-block group ids / first-block flags (i32[n_blocks])."""
    d, c = schema.num_cols, schema.cat_cols
    n = x_num.shape[-1]
    p = schema.sigma_size
    pack, width = _sizing(schema)
    block = pack * chunk_cols
    n_blocks = n // block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((max(d, 1), block), lambda i, g, f: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(c, 1), block), lambda i, g, f: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i, g, f: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, width, width),
                               lambda i, g, f: (g[i], 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_grouped_kernel, schema=schema, pack=pack,
                          chunk=chunk_cols, width=width),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_groups, width, width),
                                       jnp.float32),
    )(gmap, first,
      x_num if d else jnp.zeros((1, n), jnp.float32),
      codes if c else jnp.zeros((1, n), jnp.int32),
      weights.reshape(1, n))

    seg = _seg_size(schema, pack, width)
    sigma = out[:, :p, :p]
    for k in range(1, pack):
        sigma = sigma + out[:, k * seg:k * seg + p, k * seg:k * seg + p]
    return sigma


def sum_to_triple_grouped_pallas(x_num, codes, group_ids, *,
                                 schema: FeatureSchema, num_groups: int,
                                 weights=None,
                                 chunk_cols: int = 2048) -> Triple:
    """GROUP BY aggregation through the single-launch grouped kernel.
    x_num f32[d, n], codes i32[c, n], group_ids i32[n] (out-of-range rows
    are dropped)."""
    g = np.asarray(jax.device_get(jnp.asarray(group_ids)))
    n = len(g)
    d, c = schema.num_cols, schema.cat_cols
    if x_num is None:
        x_num = np.zeros((0, n), np.float32)
    if codes is None:
        codes = np.zeros((0, n), np.int32)
    if weights is None:
        weights = np.ones((n,), np.float32)
    x_num = np.asarray(x_num, np.float32)
    codes = np.asarray(codes, np.int32)
    weights = np.asarray(weights, np.float32)

    pack, width = _sizing(schema)
    block = pack * chunk_cols

    order = np.argsort(g, kind="stable")
    gs = g[order]
    valid = (gs >= 0) & (gs < num_groups)
    order = order[valid]
    gs = gs[valid]
    counts = np.bincount(gs, minlength=num_groups)
    padded = np.maximum(-(-counts // block) * block, block)

    total = int(padded.sum())
    xg = np.zeros((max(d, 1), total), np.float32)
    cg = np.zeros((max(c, 1), total), np.int32)
    wg = np.zeros((total,), np.float32)
    gmap = np.zeros((total // block,), np.int32)
    first = np.zeros((total // block,), np.int32)

    pos = 0
    bpos = 0
    start = 0
    for gid in range(num_groups):
        cnt = int(counts[gid])
        idx = order[start:start + cnt]
        start += cnt
        if d:
            xg[:, pos:pos + cnt] = x_num[:, idx]
        if c:
            cg[:, pos:pos + cnt] = codes[:, idx]
        wg[pos:pos + cnt] = weights[idx]
        nb = int(padded[gid]) // block
        gmap[bpos:bpos + nb] = gid
        first[bpos] = 1
        pos += int(padded[gid])
        bpos += nb

    sigma = _sigma_pallas_grouped_padded(
        jnp.asarray(xg), jnp.asarray(cg), jnp.asarray(wg),
        jnp.asarray(gmap), jnp.asarray(first), schema=schema,
        num_groups=num_groups, chunk_cols=chunk_cols)
    return triple_from_sigma(sigma, schema.num_cols)
