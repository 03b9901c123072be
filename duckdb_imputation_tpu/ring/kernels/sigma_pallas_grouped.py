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
from .sigma_pallas import (
    _fast2_epilogue,
    _fast3_epilogue,
    _fast3_segment,
    _seg_size,
    _sizing,
    _sizing_fast2,
    _sizing_fast3,
)


def _grouped_unsorted_kernel(x_ref, codes_ref, w_ref, g_ref, out_ref, *,
                             schema: FeatureSchema, pack: int, chunk: int,
                             width: int, num_groups: int):
    """Single-pass UNSORTED grouped Gram: all `num_groups` output slabs stay
    resident in VMEM; each block builds the packed Z once (the expensive
    part — VPU one-hot construction) and then runs one masked weight-fold +
    one MXU pass per group. No grouping prep of any kind — the direct
    analogue of DuckDB's hash aggregate (one pass, group routing inline),
    and skew-immune by construction (a hot group is just a denser mask)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    p_pad = _seg_size(schema, pack, width)
    d = schema.num_cols
    offs = schema.offsets
    q = jax.lax.broadcasted_iota(jnp.int32, (p_pad, 1), 0)

    zts, wrows, grows = [], [], []
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
        wrows.append(w_ref[:, sl])
        grows.append(g_ref[:, sl])
    zpad = (jnp.zeros((width - pack * p_pad, chunk), jnp.float32)
            if pack * p_pad < width else None)
    zt_packed = jnp.concatenate(zts + ([zpad] if zpad is not None else []),
                                axis=0) if pack > 1 or zpad is not None \
        else zts[0]

    for gid in range(num_groups):
        zws = [zts[k] * (wrows[k] * (grows[k] == gid).astype(jnp.float32))
               for k in range(pack)]
        if zpad is not None:
            zws.append(zpad)
        zw_packed = jnp.concatenate(zws, axis=0) if len(zws) > 1 else zws[0]
        out_ref[gid] += jax.lax.dot_general(
            zt_packed, zw_packed, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("schema", "num_groups",
                                             "chunk_cols"))
def _sigma_pallas_grouped_unsorted(x_num, codes, weights, group_ids, *,
                                   schema: FeatureSchema, num_groups: int,
                                   chunk_cols: int):
    """Unsorted grouped sigma, one kernel launch, zero prep. Inputs must be
    block-aligned (pad with weight 0); out-of-range group ids are dropped
    (no mask matches). Returns f32[num_groups, P, P]."""
    d, c = schema.num_cols, schema.cat_cols
    n = weights.shape[-1]
    p = schema.sigma_size
    pack, width = _sizing(schema)
    block = pack * chunk_cols
    n_blocks = n // block

    out = pl.pallas_call(
        functools.partial(_grouped_unsorted_kernel, schema=schema, pack=pack,
                          chunk=chunk_cols, width=width,
                          num_groups=num_groups),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((max(d, 1), block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(c, 1), block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_groups, width, width),
                               lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_groups, width, width),
                                       jnp.float32),
    )(x_num if d else jnp.zeros((1, n), jnp.float32),
      codes if c else jnp.zeros((1, n), jnp.int32),
      weights.reshape(1, n),
      jnp.asarray(group_ids, jnp.int32).reshape(1, n))

    seg = _seg_size(schema, pack, width)
    sigma = out[:, :p, :p]
    for k in range(1, pack):
        sigma = sigma + out[:, k * seg:k * seg + p, k * seg:k * seg + p]
    return sigma


def _grouped_unsorted_fast_kernel(x_ref, codes_ref, w_ref, g_ref, s0_ref,
                                  cor_ref, ee_ref, *,
                                  schema: FeatureSchema, pack: int,
                                  chunk: int, width: int, eseg: int,
                                  num_groups: int):
    """Split-precision unsorted grouped Gram (BINARY weights): the bf16
    base-plus-correction decomposition of sigma_pallas_fast applied per
    group slab. Group routing masks w·[g==gid] are binary, so the bf16
    weight fold stays exact and every per-group matmul is single-pass bf16
    (~6× the f32-HIGHEST MXU rate) — this is what makes dense inline group
    routing affordable: the ×G MXU cost runs at full bf16 throughput while
    the expensive VPU Z build still happens once."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        s0_ref[:] = jnp.zeros_like(s0_ref)
        cor_ref[:] = jnp.zeros_like(cor_ref)
        ee_ref[:] = jnp.zeros_like(ee_ref)

    p_pad = _seg_size(schema, pack, width)
    d = schema.num_cols
    offs = schema.offsets
    q = jax.lax.broadcasted_iota(jnp.int32, (p_pad, 1), 0)
    qe = jax.lax.broadcasted_iota(jnp.int32, (eseg, 1), 0)

    zbs, es, wrows, grows = [], [], [], []
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
        zbs.append(zt.astype(jnp.bfloat16))
        e = jnp.zeros((eseg, chunk), jnp.float32)
        for j in range(d):
            xj = x_ref[j, sl][None, :]
            e = e + (qe == j).astype(jnp.float32) * (
                xj - xj.astype(jnp.bfloat16).astype(jnp.float32))
        es.append(e.astype(jnp.bfloat16))
        wrows.append(w_ref[:, sl])
        grows.append(g_ref[:, sl])
    zpad = (jnp.zeros((width - pack * p_pad, chunk), jnp.bfloat16)
            if pack * p_pad < width else None)
    zb_p = jnp.concatenate(zbs + ([zpad] if zpad is not None else []),
                           axis=0) if pack > 1 or zpad is not None \
        else zbs[0]

    def bdot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    for gid in range(num_groups):
        wgs = [(wrows[k] * (grows[k] == gid).astype(jnp.float32))
               .astype(jnp.bfloat16) for k in range(pack)]
        zbws = [zbs[k] * wgs[k] for k in range(pack)]
        ews = [es[k] * wgs[k] for k in range(pack)]
        if zpad is not None:
            zbws.append(zpad)
        zbw_p = (jnp.concatenate(zbws, axis=0) if len(zbws) > 1
                 else zbws[0])
        ew_p = jnp.concatenate(ews, axis=0) if pack > 1 else ews[0]
        s0_ref[gid] += bdot(zb_p, zbw_p)
        cor_ref[gid] += bdot(ew_p, zb_p)
        ee_ref[gid] += bdot(ew_p, ew_p)


@functools.partial(jax.jit, static_argnames=("schema", "num_groups",
                                             "chunk_cols"))
def _sigma_pallas_grouped_unsorted_fast(x_num, codes, weights, group_ids, *,
                                        schema: FeatureSchema,
                                        num_groups: int, chunk_cols: int):
    from .sigma_pallas import _round_up
    d, c = schema.num_cols, schema.cat_cols
    n = weights.shape[-1]
    p = schema.sigma_size
    pack, width = _sizing(schema)
    seg = _seg_size(schema, pack, width)
    eseg = _round_up(max(d, 1), 8)
    block = pack * chunk_cols
    n_blocks = n // block

    s0, cor, ee = pl.pallas_call(
        functools.partial(_grouped_unsorted_fast_kernel, schema=schema,
                          pack=pack, chunk=chunk_cols, width=width,
                          eseg=eseg, num_groups=num_groups),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((max(d, 1), block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(c, 1), block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((num_groups, width, width), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_groups, pack * eseg, width),
                         lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_groups, pack * eseg, pack * eseg),
                         lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_groups, width, width), jnp.float32),
            jax.ShapeDtypeStruct((num_groups, pack * eseg, width),
                                 jnp.float32),
            jax.ShapeDtypeStruct((num_groups, pack * eseg, pack * eseg),
                                 jnp.float32),
        ),
    )(x_num if d else jnp.zeros((1, n), jnp.float32),
      codes if c else jnp.zeros((1, n), jnp.int32),
      weights.reshape(1, n),
      jnp.asarray(group_ids, jnp.int32).reshape(1, n))

    sigma = jnp.zeros((num_groups, p, p), jnp.float32)
    for k in range(pack):
        sigma = sigma + s0[:, k * seg:k * seg + p, k * seg:k * seg + p]
    corr = jnp.zeros((num_groups, p, p), jnp.float32)
    for k in range(pack):
        corr = corr.at[:, 1:1 + d, :].add(
            cor[:, k * eseg:k * eseg + d, k * seg:k * seg + p])
    sigma = sigma + corr + jnp.swapaxes(corr, -1, -2)
    eecorr = jnp.zeros((num_groups, d, d), jnp.float32)
    for k in range(pack):
        eecorr = eecorr + ee[:, k * eseg:k * eseg + d,
                             k * eseg:k * eseg + d]
    return sigma.at[:, 1:1 + d, 1:1 + d].add(eecorr)


def _grouped_unsorted_fast2_kernel(x_ref, codes_ref, w_ref, g_ref, out_ref,
                                   *, schema: FeatureSchema, t_pad: int,
                                   vpads: tuple[int, ...], seg_e: int,
                                   p_seg: int, pack: int, chunk: int,
                                   width: int, num_groups: int):
    """Unsorted grouped Gram in the v2 packed layout (BINARY weights):
    the [zw ‖ residual] packed array is built ONCE per block in f32 and
    cast to bf16 unweighted (LHS); each group then pays one f32
    mask-fold + bf16 cast + ONE MXU pass — out[g] += LHSᵀ·(W_g·LHS),
    symmetric because W_g is diagonal, so the v2 epilogue applies
    unchanged. Replaces the v1 three-dots-per-group form: ~2× less MXU
    work per group (one [width,width] pass instead of s0+cor+ee) at
    pack=4 vs 5."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    d = schema.num_cols
    sizes = schema.cat_sizes
    qt = jax.lax.broadcasted_iota(jnp.int32, (t_pad, 1), 0)

    segs, wsegs = [], []
    for k in range(pack):
        sl = pl.ds(k * chunk, chunk)
        top = jnp.broadcast_to((qt == 0).astype(jnp.float32),
                               (t_pad, chunk))
        for j in range(d):
            top = top + (qt == 1 + j).astype(jnp.float32) \
                * x_ref[j, sl][None, :]
        segs.append(top)
        for j, size in enumerate(sizes):
            cj = codes_ref[j, sl][None, :]
            cadj = jnp.where(cj < size, cj, -1)           # oov -> no hit
            qj = jax.lax.broadcasted_iota(jnp.int32, (vpads[j], 1), 0)
            segs.append((qj == cadj).astype(jnp.float32))
        if seg_e:
            segs.append(top - top.astype(jnp.bfloat16).astype(jnp.float32))
        wsegs.append(w_ref[:, sl])
    if pack * p_seg < width:
        segs.append(jnp.zeros((width - pack * p_seg, chunk), jnp.float32))
    arr = jnp.concatenate(segs, axis=0) if len(segs) > 1 else segs[0]
    lhs = arr.astype(jnp.bfloat16)

    for gid in range(num_groups):
        # per-pack-segment group mask folded in f32 (binary, so products
        # stay exact through the bf16 cast); broadcast to that segment's
        # p_seg sublane rows via a full-width row built from the pack masks
        wrow = jnp.concatenate(
            [jnp.broadcast_to(
                wsegs[k] * (g_ref[:, pl.ds(k * chunk, chunk)] == gid
                            ).astype(jnp.float32),
                (p_seg, chunk)) for k in range(pack)]
            + ([jnp.zeros((width - pack * p_seg, chunk), jnp.float32)]
               if pack * p_seg < width else []),
            axis=0) if pack > 1 or pack * p_seg < width else \
            jnp.broadcast_to(
                wsegs[0] * (g_ref[:, pl.ds(0, chunk)] == gid
                            ).astype(jnp.float32), (p_seg, chunk))
        rhs = (arr * wrow).astype(jnp.bfloat16)
        out_ref[gid] += jax.lax.dot_general(
            lhs, rhs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("schema", "num_groups",
                                             "chunk_cols"))
def _sigma_pallas_grouped_unsorted_fast2(x_num, codes, weights, group_ids, *,
                                         schema: FeatureSchema,
                                         num_groups: int, chunk_cols: int):
    """Zero-prep unsorted grouped sigma at the v2 rate. Inputs must be
    block-aligned (pad with weight 0); out-of-range group ids are dropped.
    Returns f32[num_groups, P, P]."""
    d, c = schema.num_cols, schema.cat_cols
    n = weights.shape[-1]
    t_pad, vpads, seg_e, p_seg, pack, width = _sizing_fast2(schema)
    block = pack * chunk_cols
    n_blocks = n // block

    out = pl.pallas_call(
        functools.partial(_grouped_unsorted_fast2_kernel, schema=schema,
                          t_pad=t_pad, vpads=vpads, seg_e=seg_e,
                          p_seg=p_seg, pack=pack, chunk=chunk_cols,
                          width=width, num_groups=num_groups),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((max(d, 1), block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(c, 1), block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_groups, width, width),
                               lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_groups, width, width),
                                       jnp.float32),
    )(x_num if d else jnp.zeros((1, n), jnp.float32),
      codes if c else jnp.zeros((1, n), jnp.int32),
      weights.reshape(1, n),
      jnp.asarray(group_ids, jnp.int32).reshape(1, n))

    return jax.vmap(lambda o: _fast2_epilogue(
        o, schema, t_pad, vpads, seg_e, p_seg, pack))(out)


def _grouped_unsorted_fast3_kernel(x_ref, codes_ref, w_ref, g_ref, out_ref,
                                   *, schema: FeatureSchema, nseg: int,
                                   bins, core: int, pack: int, chunk: int,
                                   width: int, tail_base: int,
                                   tail_rows: int, num_groups: int):
    """Unsorted grouped Gram in the v3 compact layout (BINARY weights):
    the packed array is built ONCE per block UNWEIGHTED (lhs, bf16); each
    group folds w·[g==gid] into the rhs and pays ONE MXU pass — same
    one-sided-masking algebra as the v2 unsorted kernel, at v3's smaller
    per-row MXU cost (pack 5 vs 4 on the headline schema). The ones-tail
    is the all-ones rows on the lhs and the reshaped (w·mask) block rows
    on the rhs, so N_g / lin_g / lin_cat_g come out of the same pass."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    d, c = schema.num_cols, schema.cat_cols
    segs = []
    for k in range(pack):
        sl = pl.ds(k * chunk, chunk)
        segs.extend(_fast3_segment(
            [x_ref[j, sl][None, :] for j in range(d)],
            [codes_ref[j, sl][None, :] for j in range(c)],
            None, schema=schema, nseg=nseg, bins=bins, chunk=chunk))
    qt = jax.lax.broadcasted_iota(jnp.int32, (tail_rows, 1), 0)
    segs.append(jnp.broadcast_to((qt < pack).astype(jnp.float32),
                                 (tail_rows, chunk)))
    if tail_base + tail_rows < width:
        segs.append(jnp.zeros((width - tail_base - tail_rows, chunk),
                              jnp.float32))
    arr = jnp.concatenate(segs, axis=0)
    lhs = arr.astype(jnp.bfloat16)

    block = pack * chunk
    for gid in range(num_groups):
        wm = (w_ref[0, :block]
              * (g_ref[0, :block] == gid).astype(jnp.float32))
        tailw = wm.reshape(pack, chunk)
        mult = jnp.concatenate(
            [jnp.broadcast_to(tailw[k:k + 1, :], (core, chunk))
             for k in range(pack)]
            + [tailw if tail_rows == pack else jnp.concatenate(
                [tailw, jnp.zeros((tail_rows - pack, chunk), jnp.float32)],
                axis=0)]
            + ([jnp.zeros((width - tail_base - tail_rows, chunk),
                          jnp.float32)]
               if tail_base + tail_rows < width else []),
            axis=0)
        rhs = (arr * mult).astype(jnp.bfloat16)
        out_ref[gid] += jax.lax.dot_general(
            lhs, rhs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("schema", "num_groups",
                                             "chunk_cols"))
def _sigma_pallas_grouped_unsorted_fast3(x_num, codes, weights, group_ids, *,
                                         schema: FeatureSchema,
                                         num_groups: int, chunk_cols: int):
    """Zero-prep unsorted grouped sigma at the v3 rate. Inputs must be
    block-aligned (pad with weight 0); out-of-range group ids are dropped.
    Returns f32[num_groups, P, P]."""
    d, c = schema.num_cols, schema.cat_cols
    n = weights.shape[-1]
    nseg, bins, core, pack, width, tail_base, tail_rows = \
        _sizing_fast3(schema)
    block = pack * chunk_cols
    n_blocks = n // block

    out = pl.pallas_call(
        functools.partial(_grouped_unsorted_fast3_kernel, schema=schema,
                          nseg=nseg, bins=bins, core=core, pack=pack,
                          chunk=chunk_cols, width=width,
                          tail_base=tail_base, tail_rows=tail_rows,
                          num_groups=num_groups),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((max(d, 1), block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(c, 1), block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_groups, width, width),
                               lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_groups, width, width),
                                       jnp.float32),
    )(x_num if d else jnp.zeros((1, n), jnp.float32),
      codes if c else jnp.zeros((1, n), jnp.int32),
      weights.reshape(1, n),
      jnp.asarray(group_ids, jnp.int32).reshape(1, n))

    return jax.vmap(lambda o: _fast3_epilogue(o, schema))(out)


def _grouped_fast3_kernel(gmap_ref, first_ref, x_ref, codes_ref, w_ref,
                          out_ref, *, schema: FeatureSchema, nseg: int,
                          bins, core: int, pack: int, chunk: int,
                          width: int, tail_base: int, tail_rows: int):
    """Sorted-slab grouped kernel at the v3 compact rate (BINARY weights):
    the _sigma_fast3_kernel build with the scalar-prefetched block→slab
    routing. Data must be group-sorted and block-padded (sort_by_group),
    so grouping adds ZERO kernel cost over the ungrouped v3 kernel."""
    step = pl.program_id(0)

    @pl.when(first_ref[step] == 1)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    d, c = schema.num_cols, schema.cat_cols
    segs = []
    for k in range(pack):
        sl = pl.ds(k * chunk, chunk)
        segs.extend(_fast3_segment(
            [x_ref[j, sl][None, :] for j in range(d)],
            [codes_ref[j, sl][None, :] for j in range(c)],
            w_ref[:, sl], schema=schema, nseg=nseg, bins=bins, chunk=chunk))
    tail = w_ref[0, :pack * chunk].reshape(pack, chunk)
    if tail_rows > pack:
        tail = jnp.concatenate(
            [tail, jnp.zeros((tail_rows - pack, chunk), jnp.float32)],
            axis=0)
    segs.append(tail)
    if tail_base + tail_rows < width:
        segs.append(jnp.zeros((width - tail_base - tail_rows, chunk),
                              jnp.float32))
    arr = jnp.concatenate(segs, axis=0).astype(jnp.bfloat16)
    out_ref[0] += jax.lax.dot_general(
        arr, arr, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("schema", "num_groups", "chunk_cols"))
def _sigma_pallas_grouped_fast3_padded(x_num, codes, weights, gmap, first, *,
                                       schema: FeatureSchema,
                                       num_groups: int, chunk_cols: int):
    """Inputs already group-sorted and padded to v3 block multiples
    (sort_by_group(..., fast=True)); weights must be binary. Returns
    f32[num_groups, P, P]."""
    d, c = schema.num_cols, schema.cat_cols
    n = x_num.shape[-1]
    nseg, bins, core, pack, width, tail_base, tail_rows = \
        _sizing_fast3(schema)
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
        functools.partial(_grouped_fast3_kernel, schema=schema, nseg=nseg,
                          bins=bins, core=core, pack=pack, chunk=chunk_cols,
                          width=width, tail_base=tail_base,
                          tail_rows=tail_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_groups, width, width),
                                       jnp.float32),
    )(gmap, first,
      x_num if d else jnp.zeros((1, n), jnp.float32),
      codes if c else jnp.zeros((1, n), jnp.int32),
      weights.reshape(1, n))

    return jax.vmap(lambda o: _fast3_epilogue(o, schema))(out)


# Cap on resident output-slab VMEM for the unsorted kernel (f32 bytes);
# beyond this the sort+slab path wins despite its prep cost.
_UNSORTED_VMEM_BUDGET = 6 << 20


def unsorted_group_limit(schema: FeatureSchema) -> int:
    _, width = _sizing(schema)
    return max(_UNSORTED_VMEM_BUDGET // (width * width * 4), 1)


def sum_to_triple_grouped_unsorted(x_num, codes, group_ids, *,
                                   schema: FeatureSchema, num_groups: int,
                                   weights=None, fast: bool | None = None,
                                   chunk_cols: int | None = None) -> Triple:
    """GROUP BY aggregation with NO grouping prep: single pass, group
    routing by inline masks inside the kernel. Preferred for small-to-medium
    group counts (per-class LDA/QDA/NB — the reference's GROUP BY label,
    qda.cpp); for num_groups > unsorted_group_limit(schema) use the
    sorted-slab path.

    fast: split-precision bf16 base + exact-rank-d correction — valid for
    BINARY weights (masks / GROUP BY with no weight column). Defaults to
    True when weights is None (all-ones), False otherwise."""
    d, c = schema.num_cols, schema.cat_cols
    n = len(group_ids)
    if fast is None:
        fast = weights is None
    if x_num is None:
        x_num = jnp.zeros((0, n), jnp.float32)
    if codes is None:
        codes = jnp.zeros((0, n), jnp.int32)
    if weights is None:
        weights = jnp.ones((n,), jnp.float32)
    sz3 = _sizing_fast3(schema)
    use_v3 = fast and sz3[4] <= 128   # compact layout fits one MXU tile
    use_v2 = fast and not use_v3 and _sizing_fast2(schema)[3] <= 128
    pack = (sz3[3] if use_v3
            else _sizing_fast2(schema)[4] if use_v2 else _sizing(schema)[0])
    if chunk_cols is None:
        chunk_cols = 8192 if use_v3 else 2048  # v3's measured-fastest
    block = pack * chunk_cols
    pad = (-n) % block
    x_in = jnp.asarray(x_num, jnp.float32)
    c_in = jnp.asarray(codes, jnp.int32)
    w_in = jnp.asarray(weights, jnp.float32)
    g_in = jnp.asarray(group_ids, jnp.int32)
    if pad:
        if d:
            x_in = jnp.pad(x_in, ((0, 0), (0, pad)))
        if c:
            c_in = jnp.pad(c_in, ((0, 0), (0, pad)))
        w_in = jnp.pad(w_in, (0, pad))
        g_in = jnp.pad(g_in, (0, pad), constant_values=-1)
    kern = (_sigma_pallas_grouped_unsorted_fast3 if use_v3
            else _sigma_pallas_grouped_unsorted_fast2 if use_v2
            else _sigma_pallas_grouped_unsorted_fast if fast
            else _sigma_pallas_grouped_unsorted)
    sigma = kern(x_in, c_in, w_in, g_in, schema=schema,
                 num_groups=num_groups, chunk_cols=chunk_cols)
    return triple_from_sigma(sigma, schema.num_cols)


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


def _grouped_fast2_kernel(gmap_ref, first_ref, x_ref, codes_ref, w_ref,
                          out_ref, *, schema: FeatureSchema, t_pad: int,
                          vpads: tuple[int, ...], seg_e: int, p_seg: int,
                          pack: int, chunk: int, width: int):
    """Sorted-slab grouped kernel at the v2 split-precision rate (BINARY
    weights): the single-fused-MXU-pass packed build of _sigma_fast2_kernel
    (sigma_pallas.py) with the scalar-prefetched block→slab routing of
    _grouped_kernel. Data must be group-sorted and block-padded (every
    block belongs to exactly one slab — sort_by_group guarantees it), so
    grouping adds ZERO kernel cost over the ungrouped v2 kernel: one
    bf16 self-Gram per block, accumulated into the block's group slab."""
    step = pl.program_id(0)

    @pl.when(first_ref[step] == 1)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    d = schema.num_cols
    sizes = schema.cat_sizes
    qt = jax.lax.broadcasted_iota(jnp.int32, (t_pad, 1), 0)

    segs = []
    for k in range(pack):
        sl = pl.ds(k * chunk, chunk)
        wrow = w_ref[:, sl]
        top = jnp.broadcast_to((qt == 0).astype(jnp.float32),
                               (t_pad, chunk))
        for j in range(d):
            top = top + (qt == 1 + j).astype(jnp.float32) \
                * x_ref[j, sl][None, :]
        topw = top * wrow
        segs.append(topw)
        for j, size in enumerate(sizes):
            cj = codes_ref[j, sl][None, :]
            cadj = jnp.where(cj < size, cj, -1)           # oov -> no hit
            qj = jax.lax.broadcasted_iota(jnp.int32, (vpads[j], 1), 0)
            segs.append((qj == cadj).astype(jnp.float32) * wrow)
        if seg_e:
            segs.append(topw - topw.astype(jnp.bfloat16).astype(jnp.float32))
    if pack * p_seg < width:
        segs.append(jnp.zeros((width - pack * p_seg, chunk), jnp.float32))
    arr = jnp.concatenate(segs, axis=0).astype(jnp.bfloat16) \
        if len(segs) > 1 else segs[0].astype(jnp.bfloat16)
    out_ref[0] += jax.lax.dot_general(
        arr, arr, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("schema", "num_groups", "chunk_cols"))
def _sigma_pallas_grouped_fast2_padded(x_num, codes, weights, gmap, first, *,
                                       schema: FeatureSchema,
                                       num_groups: int, chunk_cols: int):
    """Inputs already group-sorted and padded to v2 block multiples
    (sort_by_group(..., fast=True)); weights must be binary. Returns
    f32[num_groups, P, P]."""
    d, c = schema.num_cols, schema.cat_cols
    n = x_num.shape[-1]
    t_pad, vpads, seg_e, p_seg, pack, width = _sizing_fast2(schema)
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
        functools.partial(_grouped_fast2_kernel, schema=schema, t_pad=t_pad,
                          vpads=vpads, seg_e=seg_e, p_seg=p_seg, pack=pack,
                          chunk=chunk_cols, width=width),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_groups, width, width),
                                       jnp.float32),
    )(gmap, first,
      x_num if d else jnp.zeros((1, n), jnp.float32),
      codes if c else jnp.zeros((1, n), jnp.int32),
      weights.reshape(1, n))

    return jax.vmap(lambda o: _fast2_epilogue(
        o, schema, t_pad, vpads, seg_e, p_seg, pack))(out)


class GroupLayout(NamedTuple):
    """Sorted-segment layout: block → output-slab routing for group-sorted,
    block-aligned data. Slab num_groups is the overflow slab that absorbs
    out-of-range rows and alignment dummies; callers drop it. `fast` marks
    a layout built for the v2 split-precision kernel's block geometry
    (binary weights only)."""
    gmap: jax.Array    # i32[n_blocks] block -> slab in [0, num_groups]
    first: jax.Array   # i32[n_blocks] 1 on each slab's first block
    block: int         # rows per block (pack * chunk_cols), static
    num_groups: int    # real groups (static); slabs = num_groups + 1
    fast: bool = False
    chunk_cols: int = 2048


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


def _fast_layout_v3(schema: FeatureSchema) -> bool:
    """True when fast sorted layouts/kernels use the v3 compact packing
    (fits one 128-sublane MXU tile). Shared by sort_by_group and
    sum_to_triple_grouped_presorted so layout geometry and kernel always
    agree."""
    return _sizing_fast3(schema)[4] <= 128


def sort_by_group(x_num, codes, group_ids, *, schema: FeatureSchema,
                  num_groups: int, weights=None,
                  chunk_cols: int | None = None, fast: bool = False):
    """One-time grouping prep for repeated grouped aggregation (the
    per-class QDA/NB-inside-MICE pattern): returns (x_sorted, codes_sorted,
    weights_sorted, GroupLayout). Each subsequent
    `sum_to_triple_grouped_presorted` call is then kernel-only — the
    database analogue of clustering the table by the GROUP BY key once.

    fast=True lays blocks out for the split-precision kernels (single
    bf16 MXU pass — the ungrouped headline rate; weights at aggregation
    time must be BINARY): the v3 compact layout where it fits one MXU
    tile, else v2. The choice is a pure function of the schema, so the
    presorted consumer recomputes it consistently."""
    d, c = schema.num_cols, schema.cat_cols
    n = len(group_ids)
    if x_num is None:
        x_num = jnp.zeros((0, n), jnp.float32)
    if codes is None:
        codes = jnp.zeros((0, n), jnp.int32)
    if weights is None:
        weights = jnp.ones((n,), jnp.float32)
    use_v3 = fast and _fast_layout_v3(schema)
    if chunk_cols is None:
        chunk_cols = 16384 if use_v3 else 8192 if fast else 2048
    pack = (_sizing_fast3(schema)[3] if use_v3
            else _sizing_fast2(schema)[4] if fast else _sizing(schema)[0])
    block = pack * chunk_cols
    n_total = (-(-n // block)) * block + (num_groups + 1) * block
    x_s, c_s, w_s, gmap, first = _device_group_sort(
        jnp.asarray(x_num, jnp.float32), jnp.asarray(codes, jnp.int32),
        jnp.asarray(weights, jnp.float32), group_ids,
        num_groups=num_groups, block=block, n_total=n_total, d=d, c=c)
    return x_s, c_s, w_s, GroupLayout(gmap, first, block, num_groups,
                                      fast, chunk_cols)


def sum_to_triple_grouped_presorted(x_sorted, codes_sorted, w_sorted,
                                    layout: GroupLayout, *,
                                    schema: FeatureSchema,
                                    chunk_cols: int | None = None) -> Triple:
    """Grouped aggregation over data already laid out by `sort_by_group`:
    one kernel launch, no prep. Weights may differ from the layout-time
    weights (e.g. a per-round observed-mask in sorted row order; must stay
    BINARY for a fast layout)."""
    kern = ((_sigma_pallas_grouped_fast3_padded if _fast_layout_v3(schema)
             else _sigma_pallas_grouped_fast2_padded) if layout.fast
            else _sigma_pallas_grouped_padded)
    sigma = kern(
        x_sorted, codes_sorted, w_sorted, layout.gmap, layout.first,
        schema=schema, num_groups=layout.num_groups + 1,
        chunk_cols=chunk_cols or layout.chunk_cols)
    return triple_from_sigma(sigma[:layout.num_groups], schema.num_cols)


def sum_to_triple_grouped_pallas(x_num, codes, group_ids, *,
                                 schema: FeatureSchema, num_groups: int,
                                 weights=None, fast: bool | None = None,
                                 chunk_cols: int | None = None) -> Triple:
    """GROUP BY aggregation through the single-launch grouped kernel, with
    DEVICE-NATIVE grouping prep (pad-then-payload-sort; no host data
    traffic). x_num f32[d, n], codes i32[c, n], group_ids i32[n]
    (out-of-range rows are dropped). fast (split-precision bf16, valid for
    BINARY weights) defaults to True when weights is None — the sort's
    zero-weight dummy rows keep the weight vector binary."""
    if fast is None:
        fast = weights is None
    x_s, c_s, w_s, layout = sort_by_group(
        x_num, codes, group_ids, schema=schema, num_groups=num_groups,
        weights=weights, chunk_cols=chunk_cols, fast=fast)
    return sum_to_triple_grouped_presorted(
        x_s, c_s, w_s, layout, schema=schema)
