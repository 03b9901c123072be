"""Grouped (GROUP BY) Pallas cofactor kernel — sorted-segment hash
aggregation in ONE kernel launch.

The reference's GROUP BY runs DuckDB's hash aggregate over per-thread
SumStates. Here: rows are counting-sorted by group id, each group's range
is padded to a block multiple with zero-weight rows, and a single Pallas
kernel streams the blocks; a scalar-prefetched block→group map routes every
block's Gram contribution into its group's output slab (the output
BlockSpec index_map reads the prefetched map, so revisits stay resident in
VMEM while a group's blocks stream by — groups are contiguous after the
sort). Skew costs nothing: a hot key is just a longer run of blocks into
the same slab.

Total work is one pass over the data regardless of the number of groups —
unlike the masked-vmap fallback (G passes) — with no per-group-size
recompiles (unlike the sliced host loop).

GROUPING PREP IS DEVICE-NATIVE: the pad-then-payload-sort trick keeps the
whole call one XLA program with zero host data traffic. Block-aligning
dummy rows (weight 0) are appended BEFORE the sort with group ids computed
from the per-group pad deficits, so ONE `jax.lax.sort` over (group_ids ‖
payload columns) lands every group on a block boundary — no post-sort
gather/scatter (XLA TPU gathers measured 40-100× slower than the sort
itself at 10M rows). The sort is the dominant prep cost (~25 ms keys-only,
~70-90 ms with payloads, @10M rows on v5e); for repeated aggregations over
the SAME grouping (per-class QDA/NB inside MICE — the reference's own
pattern, qda.cpp GROUP BY label) use `sort_by_group` once and
`sum_to_triple_grouped_presorted` per call, which is kernel-only."""
from __future__ import annotations

import functools
from typing import NamedTuple

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


class GroupLayout(NamedTuple):
    """Sorted-segment layout: block → output-slab routing for group-sorted,
    block-aligned data. Slab num_groups is the overflow slab that absorbs
    out-of-range rows and alignment dummies; callers drop it."""
    gmap: jax.Array    # i32[n_blocks] block -> slab in [0, num_groups]
    first: jax.Array   # i32[n_blocks] 1 on each slab's first block
    block: int         # rows per block (pack * chunk_cols), static
    num_groups: int    # real groups (static); slabs = num_groups + 1


@functools.partial(jax.jit,
                   static_argnames=("num_groups", "block", "n_total", "d",
                                    "c"))
def _device_group_sort(x_num, codes, weights, group_ids, *, num_groups: int,
                       block: int, n_total: int, d: int, c: int):
    """Pad-then-payload-sort, fully on device.

    Appends n_total - n dummy rows whose group ids equal each group's pad
    deficit (so after ONE stable-free sort every group's segment length is
    an exact block multiple) with the remainder in overflow group
    `num_groups`; sorts (group_ids ‖ weights ‖ x rows ‖ code rows) in one
    jax.lax.sort; derives the block→slab map from the padded counts.
    Out-of-range group ids are clamped into the overflow slab (dropped)."""
    n = weights.shape[-1]
    g = jnp.asarray(group_ids, jnp.int32)
    g = jnp.where((g >= 0) & (g < num_groups), g, num_groups)

    gi = jax.lax.broadcasted_iota(jnp.int32, (num_groups, 1), 0)
    counts = jnp.sum((g[None, :] == gi), axis=1)            # [G]
    padded = jnp.maximum((counts + block - 1) // block, 1) * block
    pad_needed = padded - counts                             # [G], each < 2*block

    n_extra = n_total - n
    cum_pad = jnp.cumsum(pad_needed)
    extra_iota = jnp.arange(n_extra, dtype=jnp.int32)
    # dummy row i gets the group whose pad range it falls into; the rest
    # (beyond sum(pad_needed)) go to the overflow slab
    dummy_g = jnp.sum(extra_iota[None, :] >= cum_pad[:, None],
                      axis=0).astype(jnp.int32)

    g_ext = jnp.concatenate([g, dummy_g])
    w_ext = jnp.concatenate([weights, jnp.zeros(n_extra, jnp.float32)])
    ops = [g_ext, w_ext]
    for j in range(d):
        ops.append(jnp.concatenate([x_num[j], jnp.zeros(n_extra,
                                                        jnp.float32)]))
    for j in range(c):
        ops.append(jnp.concatenate([codes[j], jnp.zeros(n_extra,
                                                        jnp.int32)]))
    out = jax.lax.sort(tuple(ops), num_keys=1)
    w_s = out[1]
    x_s = (jnp.stack(out[2:2 + d], 0) if d
           else jnp.zeros((1, n_total), jnp.float32))
    c_s = (jnp.stack(out[2 + d:2 + d + c], 0) if c
           else jnp.zeros((1, n_total), jnp.int32))

    blocks_per = padded // block                              # [G]
    cum_blocks = jnp.cumsum(blocks_per)
    b_iota = jnp.arange(n_total // block, dtype=jnp.int32)
    gmap = jnp.sum(b_iota[None, :] >= cum_blocks[:, None],
                   axis=0).astype(jnp.int32)                  # [nb] in [0, G]
    first = jnp.concatenate([jnp.ones(1, jnp.int32),
                             (gmap[1:] != gmap[:-1]).astype(jnp.int32)])
    return x_s, c_s, w_s, gmap, first


def sort_by_group(x_num, codes, group_ids, *, schema: FeatureSchema,
                  num_groups: int, weights=None, chunk_cols: int = 2048):
    """One-time grouping prep for repeated grouped aggregation (the
    per-class QDA/NB-inside-MICE pattern): returns (x_sorted, codes_sorted,
    weights_sorted, GroupLayout). Each subsequent
    `sum_to_triple_grouped_presorted` call is then kernel-only — the
    database analogue of clustering the table by the GROUP BY key once."""
    d, c = schema.num_cols, schema.cat_cols
    n = len(group_ids)
    if x_num is None:
        x_num = jnp.zeros((0, n), jnp.float32)
    if codes is None:
        codes = jnp.zeros((0, n), jnp.int32)
    if weights is None:
        weights = jnp.ones((n,), jnp.float32)
    pack, _ = _sizing(schema)
    block = pack * chunk_cols
    n_total = (-(-n // block)) * block + (num_groups + 1) * block
    x_s, c_s, w_s, gmap, first = _device_group_sort(
        jnp.asarray(x_num, jnp.float32), jnp.asarray(codes, jnp.int32),
        jnp.asarray(weights, jnp.float32), group_ids,
        num_groups=num_groups, block=block, n_total=n_total, d=d, c=c)
    return x_s, c_s, w_s, GroupLayout(gmap, first, block, num_groups)


def sum_to_triple_grouped_presorted(x_sorted, codes_sorted, w_sorted,
                                    layout: GroupLayout, *,
                                    schema: FeatureSchema,
                                    chunk_cols: int = 2048) -> Triple:
    """Grouped aggregation over data already laid out by `sort_by_group`:
    one kernel launch, no prep. Weights may differ from the layout-time
    weights (e.g. a per-round observed-mask in sorted row order)."""
    sigma = _sigma_pallas_grouped_padded(
        x_sorted, codes_sorted, w_sorted, layout.gmap, layout.first,
        schema=schema, num_groups=layout.num_groups + 1,
        chunk_cols=chunk_cols)
    return triple_from_sigma(sigma[:layout.num_groups], schema.num_cols)


def sum_to_triple_grouped_pallas(x_num, codes, group_ids, *,
                                 schema: FeatureSchema, num_groups: int,
                                 weights=None,
                                 chunk_cols: int = 2048) -> Triple:
    """GROUP BY aggregation through the single-launch grouped kernel, with
    DEVICE-NATIVE grouping prep (pad-then-payload-sort; no host data
    traffic). x_num f32[d, n], codes i32[c, n], group_ids i32[n]
    (out-of-range rows are dropped)."""
    x_s, c_s, w_s, layout = sort_by_group(
        x_num, codes, group_ids, schema=schema, num_groups=num_groups,
        weights=weights, chunk_cols=chunk_cols)
    return sum_to_triple_grouped_presorted(
        x_s, c_s, w_s, layout, schema=schema, chunk_cols=chunk_cols)
