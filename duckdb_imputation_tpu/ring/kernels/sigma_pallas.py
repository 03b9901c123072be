"""Pallas TPU kernel for the fused masked cofactor aggregation.

This is the native-kernel replacement for the reference's hot loop
(Triple::SumNoLift, sum_no_lift.cpp:53-216 — scalar FMA quad loop + hash-map
upserts per row). Contract identical to ring.sum.masked_sigma: inputs are
features-first (x f32[d, n], codes i32[c, n], w f32[n]), output the P×P
sigma with P = 1 + d + V.

Kernel design:
  * COLUMN-MAJOR streaming: the row axis rides the 128-lane dimension, so
    narrow column data is dense in HBM and VMEM (row-major [n, d] would be
    tile-padded 128/d×);
  * Z built IN VMEM (ones row ‖ x ‖ one-hot via iota compare) — the one-hot
    expansion never touches HBM;
  * LANE-PACKING for small P: each block is split into `pack = ⌊128/P⌋`
    contiguous chunks stacked along sublanes, so one MXU pass computes
    `pack` independent P×P Gram blocks — recovering the utilization naive
    padding throws away. Cross-chunk blocks land in discarded off-diagonal
    positions;
  * f32 accumulation into the output block across grid steps (HIGHEST
    precision — no bf16 demotion of the inputs).

The epilogue (sum of `pack` diagonal P×P blocks) is tiny XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...schema import FeatureSchema

LANES = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def _sizing(schema: FeatureSchema):
    """(pack, width): how many P-segments ride the 128 sublanes, and the
    padded matmul width."""
    p_pad = _round_up(schema.sigma_size, 8)
    if p_pad <= LANES:
        pack = LANES // p_pad
        width = LANES
    else:
        pack = 1
        width = _round_up(p_pad, LANES)
    return pack, width


def _seg_size(schema: FeatureSchema, pack: int, width: int) -> int:
    return _round_up(schema.sigma_size, 8) if pack > 1 else width


def _sigma_kernel(x_ref, codes_ref, w_ref, out_ref, *, schema: FeatureSchema,
                  pack: int, chunk: int, width: int):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    p_pad = _seg_size(schema, pack, width)
    d = schema.num_cols
    offs = schema.offsets
    # per-sublane dispatch from iota + static offsets — the Z block becomes
    # d+c broadcast multiply-adds on the VPU instead of dozens of
    # sublane-misaligned concats (no captured constants: Pallas requires
    # everything derived from iota / refs)
    q = jax.lax.broadcasted_iota(jnp.int32, (p_pad, 1), 0)

    zts, zws = [], []
    for k in range(pack):
        sl = pl.ds(k * chunk, chunk)
        zt = (q == 0).astype(jnp.float32)         # broadcasts to [p_pad, chunk]
        zt = jnp.broadcast_to(zt, (p_pad, chunk))
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
    # f32 HIGHEST: the MXU runs this as multi-pass bf16; a manual bf16x3
    # split was measured 5x SLOWER here (bf16 (16,128) tiling forces
    # relayouts for the lanes-contracted operands) and less accurate.
    out_ref[:] += jax.lax.dot_general(
        zt_packed, zw_packed, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("schema", "chunk_cols"))
def sigma_pallas(x_num, codes, weights, *, schema: FeatureSchema,
                 chunk_cols: int = 2048) -> jax.Array:
    """Masked sigma S = Zᵀ diag(w) Z via the packed Pallas kernel.

    x_num f32[d, n], codes i32[c, n], weights f32[n]; n must be a multiple
    of pack*chunk_cols (use sigma_pallas_padded otherwise)."""
    d, c = schema.num_cols, schema.cat_cols
    n = x_num.shape[-1] if d else codes.shape[-1]
    p = schema.sigma_size
    pack, width = _sizing(schema)
    block = pack * chunk_cols
    assert n % block == 0, (n, block)
    grid = (n // block,)

    x_in = (jnp.asarray(x_num, jnp.float32) if d
            else jnp.zeros((1, n), jnp.float32))
    c_in = (jnp.asarray(codes, jnp.int32) if c
            else jnp.zeros((1, n), jnp.int32))
    w_in = jnp.asarray(weights, jnp.float32).reshape(1, n)

    out = pl.pallas_call(
        functools.partial(_sigma_kernel, schema=schema, pack=pack,
                          chunk=chunk_cols, width=width),
        grid=grid,
        in_specs=[
            pl.BlockSpec((max(d, 1), block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(c, 1), block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((width, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((width, width), jnp.float32),
        # NOTE: no cost_estimate — declaring the (padded) FLOP count makes
        # the Mosaic scheduler serialize the pipeline, costing ~600x.
    )(x_in, c_in, w_in)
    seg = _seg_size(schema, pack, width)
    sigma = out[:p, :p]
    for k in range(1, pack):
        sigma = sigma + out[k * seg:k * seg + p, k * seg:k * seg + p]
    return sigma


# ---------------------------------------------------------------------------
# Fast split-precision variant (binary weights)
# ---------------------------------------------------------------------------

def _sigma_fast_kernel(x_ref, codes_ref, w_ref, s0_ref, cor_ref, ee_ref, *,
                       schema: FeatureSchema, pack: int, chunk: int,
                       width: int, eseg: int):
    """bf16 base pass + exact low-rank correction.

    Write Z = Zb + E with Zb = bf16(Z): the ones/one-hot rows are
    bf16-EXACT, so E is nonzero only on the d numeric rows and
        S = ZbᵀWZb + (EᵀWZb + transpose) + EᵀWE.
    For BINARY weights w∈{0,1} every product here is exact in bf16
    (0/1·bf16 and bf16·bf16 → f32 accumulate), so the only inexactness is
    the f32 accumulation itself — like the reference's own f32 sums — while
    the big [width,width] pass runs single-pass bf16 (~6× the f32-HIGHEST
    MXU rate). Outputs: s0 [width,width], cor = EᵀW·Zb [pack·eseg, width],
    ee = EᵀW·E [pack·eseg, pack·eseg]."""
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

    zbs, zbws, es = [], [], []
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
        zb = zt.astype(jnp.bfloat16)
        e = jnp.zeros((eseg, chunk), jnp.float32)
        for j in range(d):
            xj = x_ref[j, sl][None, :]
            e = e + (qe == j).astype(jnp.float32) * (
                xj - xj.astype(jnp.bfloat16).astype(jnp.float32))
        wrow = w_ref[:, sl]
        zbs.append(zb)
        zbws.append((zb.astype(jnp.float32) * wrow).astype(jnp.bfloat16))
        es.append((e * wrow).astype(jnp.bfloat16))
    if pack * p_pad < width:
        zpad = jnp.zeros((width - pack * p_pad, chunk), jnp.bfloat16)
        zbs.append(zpad)
        zbws.append(zpad)
    zb_p = jnp.concatenate(zbs, 0) if len(zbs) > 1 else zbs[0]
    zbw_p = jnp.concatenate(zbws, 0) if len(zbws) > 1 else zbws[0]
    e_p = jnp.concatenate(es, 0) if len(es) > 1 else es[0]

    def bdot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    s0_ref[:] += bdot(zb_p, zbw_p)
    cor_ref[:] += bdot(e_p, zb_p)
    ee_ref[:] += bdot(e_p, e_p)


@functools.partial(jax.jit, static_argnames=("schema", "chunk_cols"))
def sigma_pallas_fast(x_num, codes, weights, *, schema: FeatureSchema,
                      chunk_cols: int = 2048) -> jax.Array:
    """Split-precision masked sigma for BINARY weights (masks). Semantics
    identical to sigma_pallas up to f32 accumulation order; ~1.7× faster
    (measured 1.24 ms vs 2.0 ms on 8.4M rows, P=21). With non-binary
    weights the w-fold rounds to bf16 — use sigma_pallas then."""
    d, c = schema.num_cols, schema.cat_cols
    n = x_num.shape[-1] if d else codes.shape[-1]
    p = schema.sigma_size
    pack, width = _sizing(schema)
    seg = _seg_size(schema, pack, width)
    eseg = _round_up(max(d, 1), 8)
    block = pack * chunk_cols
    assert n % block == 0, (n, block)

    x_in = (jnp.asarray(x_num, jnp.float32) if d
            else jnp.zeros((1, n), jnp.float32))
    c_in = (jnp.asarray(codes, jnp.int32) if c
            else jnp.zeros((1, n), jnp.int32))
    w_in = jnp.asarray(weights, jnp.float32).reshape(1, n)

    s0, cor, ee = pl.pallas_call(
        functools.partial(_sigma_fast_kernel, schema=schema, pack=pack,
                          chunk=chunk_cols, width=width, eseg=eseg),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((max(d, 1), block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(c, 1), block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((width, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pack * eseg, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pack * eseg, pack * eseg), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((width, width), jnp.float32),
            jax.ShapeDtypeStruct((pack * eseg, width), jnp.float32),
            jax.ShapeDtypeStruct((pack * eseg, pack * eseg), jnp.float32),
        ),
    )(x_in, c_in, w_in)

    sigma = jnp.zeros((p, p), jnp.float32)
    for k in range(pack):
        sigma = sigma + s0[k * seg:k * seg + p, k * seg:k * seg + p]
    corr = jnp.zeros((p, p), jnp.float32)
    for k in range(pack):
        corr = corr.at[1:1 + d, :].add(
            cor[k * eseg:k * eseg + d, k * seg:k * seg + p])
    sigma = sigma + corr + corr.T
    eecorr = jnp.zeros((d, d), jnp.float32)
    for k in range(pack):
        eecorr = eecorr + ee[k * eseg:k * eseg + d,
                             k * eseg:k * eseg + d]
    return sigma.at[1:1 + d, 1:1 + d].add(eecorr)


# ---------------------------------------------------------------------------
# Fast split-precision variant v2: segmented build + single fused MXU pass
# ---------------------------------------------------------------------------

def _sizing_fast2(schema: FeatureSchema):
    """(t_pad, vpads, seg_e, p_seg, pack, width) for the v2 layout.

    Per pack segment the packed array holds [zw (t_pad + Σ vpads rows) ‖ ew
    (t_pad rows, only when there are numeric cols)]: the weighted bf16 Z
    block followed by its bf16 residual rows, so ONE [width,width] dot
    yields base Gram + cross correction + residual Gram as sub-blocks of
    each diagonal segment. EVERY section — the ones+num rows and each cat
    column's one-hot rows — is its own 8-aligned sublane block, so each
    build compare touches only its own round_up(size, 8) rows (never the
    whole vocab block) and needs no cross-column accumulate."""
    d = schema.num_cols
    t_pad = _round_up(1 + d, 8)
    vpads = tuple(_round_up(s, 8) for s in schema.cat_sizes)
    seg_e = t_pad if d else 0
    p_seg = t_pad + sum(vpads) + seg_e
    if p_seg <= LANES:
        pack = LANES // p_seg
        width = LANES
    else:
        pack = 1
        width = _round_up(p_seg, LANES)
    return t_pad, vpads, seg_e, p_seg, pack, width


def _sigma_fast2_kernel(x_ref, codes_ref, w_ref, out_ref, *,
                        schema: FeatureSchema, t_pad: int,
                        vpads: tuple[int, ...], seg_e: int, p_seg: int,
                        pack: int, chunk: int, width: int):
    """v2 split-precision kernel body (binary weights).

    For w∈{0,1}, w² = w, so the weight folds symmetrically into ONE packed
    array: zw = w·bf16(Z) and ew = bf16(w·Z − f32(bf16(w·Z))) = w·bf16(E).
    G = arrᵀarr then contains, inside each diagonal p_seg×p_seg block:
        [ ZbᵀWZb   ZbᵀWE ]
        [ EᵀWZb    EᵀWE  ]
    which the epilogue sums into S = ZᵀWZ (same math as sigma_pallas_fast,
    one MXU pass instead of three, ~2× less VPU build work).

    One-hot build: each cat column is its own 8-aligned block; one compare
    of the block iota against the column's code row, masked by w.
    Out-of-vocab codes (encode() maps misses to size_j) are remapped to -1
    on the [1, chunk] row vector so they contribute 0 (the old kernel's
    in-segment guard).

    All segments are built in f32 (native (8,128) tiling, so the 8-row
    pieces concat without relayout) and the full [width, chunk] array is
    cast to bf16 ONCE — casting 8-row pieces individually forces Mosaic to
    repack them into (16,128) bf16 tiles, measured ~25% slower."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    d = schema.num_cols
    sizes = schema.cat_sizes
    qt = jax.lax.broadcasted_iota(jnp.int32, (t_pad, 1), 0)

    segs = []
    for k in range(pack):
        sl = pl.ds(k * chunk, chunk)
        wrow = w_ref[:, sl]                               # [1, chunk]
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
    out_ref[:] += jax.lax.dot_general(
        arr, arr, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("schema", "chunk_cols"))
def sigma_pallas_fast2(x_num, codes, weights, *, schema: FeatureSchema,
                       chunk_cols: int = 8192) -> jax.Array:
    """v2 split-precision masked sigma for BINARY weights. Same semantics
    as sigma_pallas_fast (identical split-precision math, f32 accumulation
    order differs); single fused MXU pass. n must be a multiple of
    pack*chunk_cols (pack from _sizing_fast2)."""
    d, c = schema.num_cols, schema.cat_cols
    n = x_num.shape[-1] if d else codes.shape[-1]
    p = schema.sigma_size
    t_pad, vpads, seg_e, p_seg, pack, width = _sizing_fast2(schema)
    block = pack * chunk_cols
    assert n % block == 0, (n, block)

    x_in = (jnp.asarray(x_num, jnp.float32) if d
            else jnp.zeros((1, n), jnp.float32))
    c_in = (jnp.asarray(codes, jnp.int32) if c
            else jnp.zeros((1, n), jnp.int32))
    w_in = jnp.asarray(weights, jnp.float32).reshape(1, n)

    out = pl.pallas_call(
        functools.partial(_sigma_fast2_kernel, schema=schema, t_pad=t_pad,
                          vpads=vpads, seg_e=seg_e, p_seg=p_seg, pack=pack,
                          chunk=chunk_cols, width=width),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((max(d, 1), block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(c, 1), block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((width, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((width, width), jnp.float32),
    )(x_in, c_in, w_in)

    return _fast2_epilogue(out, schema, t_pad, vpads, seg_e, p_seg, pack)


def _sigma_fast2_cols_kernel(*refs, schema: FeatureSchema, t_pad: int,
                             vpads: tuple[int, ...], seg_e: int, p_seg: int,
                             pack: int, chunk: int, width: int):
    """Per-column-ref variant of _sigma_fast2_kernel: refs =
    (x_0 .. x_{d-1}, code_0 .. code_{c-1}, w, out), each input [1, block].
    Identical math; exists so the columnar table layout (tuple of
    per-column arrays — see ring.sum.linear_predict for why) feeds the
    kernel without ever re-stacking a [d, n] block."""
    d, c = schema.num_cols, schema.cat_cols
    x_refs = refs[:d]
    c_refs = refs[d:d + c]
    w_ref = refs[d + c]
    out_ref = refs[d + c + 1]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

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
                * x_refs[j][0, sl][None, :]
        topw = top * wrow
        segs.append(topw)
        for j, size in enumerate(sizes):
            cj = c_refs[j][0, sl][None, :]
            cadj = jnp.where(cj < size, cj, -1)
            qj = jax.lax.broadcasted_iota(jnp.int32, (vpads[j], 1), 0)
            segs.append((qj == cadj).astype(jnp.float32) * wrow)
        if seg_e:
            segs.append(topw - topw.astype(jnp.bfloat16).astype(jnp.float32))
    if pack * p_seg < width:
        segs.append(jnp.zeros((width - pack * p_seg, chunk), jnp.float32))
    arr = jnp.concatenate(segs, axis=0).astype(jnp.bfloat16) \
        if len(segs) > 1 else segs[0].astype(jnp.bfloat16)
    out_ref[:] += jax.lax.dot_general(
        arr, arr, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _fast2_epilogue(out, schema: FeatureSchema, t_pad, vpads, seg_e, p_seg,
                    pack):
    """Sum the packed diagonal blocks of the kernel output into the P×P
    sigma (shared by the stacked and per-column entry points)."""
    d = schema.num_cols
    p = schema.sigma_size
    parts = [np.arange(1 + d)]
    row = t_pad
    for j, size in enumerate(schema.cat_sizes):
        parts.append(row + np.arange(size))
        row += vpads[j]
    idx = jnp.asarray(np.concatenate(parts).astype(np.int32))
    sigma = jnp.zeros((p, p), jnp.float32)
    corr = jnp.zeros((p, p), jnp.float32)
    ee = jnp.zeros((1 + d, 1 + d), jnp.float32)
    zoff = t_pad + sum(vpads)
    for k in range(pack):
        base = k * p_seg
        sigma = sigma + out[jnp.ix_(base + idx, base + idx)]
        if seg_e:
            corr = corr.at[:1 + d, :].add(
                out[base + zoff:base + zoff + 1 + d][:, base + idx])
            ee = ee + out[base + zoff:base + zoff + 1 + d,
                          base + zoff:base + zoff + 1 + d]
    if seg_e:
        sigma = sigma + corr + corr.T
        sigma = sigma.at[:1 + d, :1 + d].add(ee)
    return sigma


@functools.partial(jax.jit,
                   static_argnames=("schema", "chunk_cols", "interpret"))
def sigma_pallas_fast2_cols(x_cols, code_cols, weights, *,
                            schema: FeatureSchema,
                            chunk_cols: int = 8192,
                            interpret: bool = False) -> jax.Array:
    """sigma_pallas_fast2 fed by TUPLES of per-column [n] arrays (the
    columnar pytree layout) — each column is its own kernel ref, so the
    [d, n] stack is never materialized. n must be a block multiple."""
    d, c = schema.num_cols, schema.cat_cols
    assert len(x_cols) == d and len(code_cols) == c
    n = x_cols[0].shape[-1] if d else code_cols[0].shape[-1]
    t_pad, vpads, seg_e, p_seg, pack, width = _sizing_fast2(schema)
    block = pack * chunk_cols
    assert n % block == 0, (n, block)

    row_spec = pl.BlockSpec((1, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    ins = ([jnp.asarray(xc, jnp.float32).reshape(1, n) for xc in x_cols]
           + [jnp.asarray(cc, jnp.int32).reshape(1, n) for cc in code_cols]
           + [jnp.asarray(weights, jnp.float32).reshape(1, n)])
    out = pl.pallas_call(
        functools.partial(_sigma_fast2_cols_kernel, schema=schema,
                          t_pad=t_pad, vpads=vpads, seg_e=seg_e,
                          p_seg=p_seg, pack=pack, chunk=chunk_cols,
                          width=width),
        grid=(n // block,),
        in_specs=[row_spec] * len(ins),
        out_specs=pl.BlockSpec((width, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((width, width), jnp.float32),
        interpret=interpret,
    )(*ins)
    return _fast2_epilogue(out, schema, t_pad, vpads, seg_e, p_seg, pack)


def _fast_cols_use_v3(schema: FeatureSchema) -> bool:
    """Cost-based v3-vs-v2 choice for the per-column-ref kernels (same
    rule as sigma_pallas_fast_padded)."""
    sz3 = _sizing_fast3(schema)
    sz2 = _sizing_fast2(schema)
    cost3 = _mxu_cost_per_row(sz3[4], sz3[3])
    cost2 = (_mxu_cost_per_row(LANES, sz2[4]) if sz2[3] <= LANES
             else float("inf"))
    return cost3 <= cost2 and sz3[4] <= 2 * LANES


def fast_cols_block(schema: FeatureSchema) -> int:
    """Row granule of the dispatched per-column fast kernel."""
    if _fast_cols_use_v3(schema):
        return _sizing_fast3(schema)[3] * _fast3_chunk(schema)
    return _sizing_fast2(schema)[4] * 8192


def sigma_pallas_fast_cols_padded(x_cols, code_cols, weights, *,
                                  schema: FeatureSchema,
                                  chunk_cols: int | None = None,
                                  interpret: bool = False
                                  ) -> jax.Array:
    """Dispatched split-precision masked sigma over per-column tuples
    (BINARY weights): v3 compact kernel where it wins, else v2. The MICE
    device loops' aggregation entry point."""
    if _fast_cols_use_v3(schema):
        return sigma_pallas_fast3_cols_padded(x_cols, code_cols, weights,
                                              schema=schema,
                                              chunk_cols=chunk_cols,
                                              interpret=interpret)
    return sigma_pallas_fast2_cols_padded(x_cols, code_cols, weights,
                                          schema=schema,
                                          chunk_cols=chunk_cols or 8192,
                                          interpret=interpret)


def sigma_pallas_fast2_cols_padded(x_cols, code_cols, weights, *,
                                   schema: FeatureSchema,
                                   chunk_cols: int = 8192,
                                   interpret: bool = False) -> jax.Array:
    """Zero-weight pad n up to a v2 block multiple (per-column inputs)."""
    d = schema.num_cols
    n = x_cols[0].shape[-1] if d else code_cols[0].shape[-1]
    pack = _sizing_fast2(schema)[4]
    block = pack * chunk_cols
    pad = (-n) % block
    if pad:
        x_cols = tuple(jnp.pad(jnp.asarray(xc, jnp.float32), (0, pad))
                       for xc in x_cols)
        code_cols = tuple(jnp.pad(jnp.asarray(cc, jnp.int32), (0, pad))
                          for cc in code_cols)
        w = (jnp.ones((n,), jnp.float32) if weights is None
             else jnp.asarray(weights, jnp.float32))
        weights = jnp.pad(w, (0, pad))
    elif weights is None:
        weights = jnp.ones((n,), jnp.float32)
    return sigma_pallas_fast2_cols(x_cols, code_cols, weights,
                                   schema=schema, chunk_cols=chunk_cols,
                                   interpret=interpret)


def sigma_pallas_fast2_padded(x_num, codes, weights, *,
                              schema: FeatureSchema,
                              chunk_cols: int = 8192) -> jax.Array:
    """Zero-weight pad n up to a v2 block multiple."""
    d, c = schema.num_cols, schema.cat_cols
    n = x_num.shape[-1] if d else codes.shape[-1]
    pack = _sizing_fast2(schema)[4]
    block = pack * chunk_cols
    pad = (-n) % block
    if pad:
        if d:
            x_num = jnp.pad(jnp.asarray(x_num, jnp.float32),
                            ((0, 0), (0, pad)))
        if c:
            codes = jnp.pad(jnp.asarray(codes, jnp.int32), ((0, 0), (0, pad)))
        w = (jnp.ones((n,), jnp.float32) if weights is None
             else jnp.asarray(weights, jnp.float32))
        weights = jnp.pad(w, (0, pad))
    elif weights is None:
        weights = jnp.ones((n,), jnp.float32)
    return sigma_pallas_fast2(x_num, codes, weights, schema=schema,
                              chunk_cols=chunk_cols)


# ---------------------------------------------------------------------------
# Fast split-precision variant v3: compact 8-aligned packing, shared ones-tail
# ---------------------------------------------------------------------------

def _sizing_fast3(schema: FeatureSchema):
    """(nseg, bins, core, pack, width, tail_base, tail_rows) for the v3
    compact layout.

    v2 spends 3 of its 32 headline-segment rows on the literal ones row
    (padded into an 8-row block with the d numeric rows) plus 4 more on
    residual-section padding. v3 removes both overheads while keeping every
    concat boundary 8-aligned (misaligned f32 concats force Mosaic sublane
    relayouts):

      * the hi/lo numeric rows share ONE section: [x·w (d rows) ‖
        residual (d rows)] padded to round_up(2d, 8) — the self-Gram's
        (hi+lo)×(hi+lo) sub-blocks sum to the exact f32 products, same
        split-precision algebra as v2;
      * cat columns are FIRST-FIT BIN-PACKED into shared 8·k-row sections
        (two vocab-3 columns share one 8-row bin instead of two);
      * the ones row moves OUT of the per-segment layout into a shared
        8·⌈pack/8⌉-row TAIL: tail row k holds segment k's weight row, so
        out[tail_k, seg_k·rows] delivers N / lin / lin_cat for segment k
        while tail×tail cross terms land in discarded off-diagonal slots.

    Headline config (d=4, two vocab-8 cats): core = 8+8+8 = 24, pack = 5
    (5·24+8 = 128) vs v2's pack 4 — 25% less MXU work per row. Pure-numeric
    d=4: core = 8, pack = 14 (14·8+16 = 128) vs v2's 8 — 1.75×.

    bins: tuple of (bin_rows, ((cat_col_index, offset_in_bin), ...)).
    """
    d = schema.num_cols
    nseg = _round_up(2 * d, 8) if d else 0
    bins: list[list] = []   # [rows, used, [(j, off)]]
    for j, s in enumerate(schema.cat_sizes):
        for b in bins:
            if b[0] - b[1] >= s:
                b[2].append((j, b[1]))
                b[1] += s
                break
        else:
            bins.append([_round_up(s, 8), s, [(j, 0)]])
    core = nseg + sum(b[0] for b in bins)
    pack = 1
    for k in range(max(LANES // max(core, 1), 1), 0, -1):
        if k * core + 8 * ((k + 7) // 8) <= LANES:
            pack = k
            break
    tail_rows = 8 * ((pack + 7) // 8)
    width = (LANES if pack * core + tail_rows <= LANES
             else _round_up(core + tail_rows, LANES))
    tail_base = pack * core
    bins_t = tuple((b[0], tuple(b[2])) for b in bins)
    return nseg, bins_t, core, pack, width, tail_base, tail_rows


def _fast3_segment(x_rows, code_rows, wrow, *, schema: FeatureSchema,
                   nseg: int, bins, chunk: int):
    """Build one segment's [core, chunk] f32 pieces (weighted, hi‖lo split).
    x_rows/code_rows: per-column [1, chunk] slices; wrow [1, chunk].

    Every operation here runs at full sublane height — [1, chunk]
    intermediates are poison (Mosaic pads them to 8 sublanes, so a
    per-column scalar-row op costs a full 8-row op; a first draft built
    hi/lo per column that way and measured 1.5-2× SLOWER overall despite
    the MXU saving):
      * the numeric hi rows are iota-masked madds straight off the refs;
      * the lo rows are ONE cast-roundtrip subtract on the whole section
        (zero on the zero rows) rolled down d sublanes — cat rows never
        need residuals (one-hots are bf16-exact);
      * solo-bin one-hot compares need NO out-of-vocab guard at all:
        code==size hits the bin's pad row (unmapped in the collapse
        matrix) or no row, negative codes hit nothing. Shared bins guard
        with [1, chunk] compares only (unavoidable, rare)."""
    d = schema.num_cols
    sizes = schema.cat_sizes
    pieces = []
    if nseg:
        qn = jax.lax.broadcasted_iota(jnp.int32, (nseg, 1), 0)
        hi = (qn == 0).astype(jnp.float32) * x_rows[0]
        for j in range(1, d):
            hi = hi + (qn == j).astype(jnp.float32) * x_rows[j]
        if wrow is not None:
            hi = hi * wrow
        lo = hi - hi.astype(jnp.bfloat16).astype(jnp.float32)
        pieces.append(hi + pltpu.roll(lo, shift=d, axis=0))
    for rows, cols in bins:
        qb = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        acc = None
        for j, off in cols:
            cj = code_rows[j]
            if len(cols) == 1:
                hit = (qb == cj).astype(jnp.float32)
            else:
                cadj = jnp.where((cj >= 0) & (cj < sizes[j]), cj + off, -1)
                hit = (qb == cadj).astype(jnp.float32)
            acc = hit if acc is None else acc + hit
        pieces.append(acc if wrow is None else acc * wrow)
    return pieces


def _sigma_fast3_kernel(x_ref, codes_ref, w_ref, out_ref, *,
                        schema: FeatureSchema, nseg: int, bins, core: int,
                        pack: int, chunk: int, width: int, tail_base: int,
                        tail_rows: int):
    """v3 kernel body: compact packed build, one bf16 self-Gram per block.
    Split-precision algebra identical to _sigma_fast2_kernel (binary w)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    d, c = schema.num_cols, schema.cat_cols
    segs = []
    for k in range(pack):
        sl = pl.ds(k * chunk, chunk)
        wrow = w_ref[:, sl]
        segs.extend(_fast3_segment(
            [x_ref[j, sl][None, :] for j in range(d)],
            [codes_ref[j, sl][None, :] for j in range(c)],
            wrow, schema=schema, nseg=nseg, bins=bins, chunk=chunk))
    # tail: row k = segment k's weight row — ONE sublane-split reshape of
    # the weight block instead of `pack` iota madds
    tail = w_ref[0, :pack * chunk].reshape(pack, chunk)
    if tail_rows > pack:
        tail = jnp.concatenate(
            [tail, jnp.zeros((tail_rows - pack, chunk), jnp.float32)], axis=0)
    segs.append(tail)
    if tail_base + tail_rows < width:
        segs.append(jnp.zeros((width - tail_base - tail_rows, chunk),
                              jnp.float32))
    arr = jnp.concatenate(segs, axis=0).astype(jnp.bfloat16) \
        if len(segs) > 1 else segs[0].astype(jnp.bfloat16)
    out_ref[:] += jax.lax.dot_general(
        arr, arr, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=None)
def _fast3_collapse(schema: FeatureSchema) -> np.ndarray:
    """0/1 collapse matrix C[pack, width, P]: packed row → sigma row, per
    segment. σ = Σ_k C_kᵀ·out·C_k — hi and lo rows both map to their
    numeric sigma row (summing the four hi/lo cross products into the exact
    f32 value), bin rows map through the bin layout, tail row k maps to
    sigma row 0 for segment k only (cross-segment tail/tail products are
    never touched)."""
    nseg, bins, core, pack, width, tail_base, _ = _sizing_fast3(schema)
    d = schema.num_cols
    offs = schema.offsets
    p = schema.sigma_size
    C = np.zeros((pack, width, p), np.float32)
    for k in range(pack):
        base = k * core
        for j in range(d):
            C[k, base + j, 1 + j] = 1.0
            C[k, base + d + j, 1 + j] = 1.0
        row = base + nseg
        for rows, cols in bins:
            for j, off in cols:
                size = len(schema.cat_keys[j])
                for v in range(size):
                    C[k, row + off + v, 1 + d + offs[j] + v] = 1.0
            row += rows
        C[k, tail_base + k, 0] = 1.0
    return C


def _fast3_epilogue(out, schema: FeatureSchema):
    C = jnp.asarray(_fast3_collapse(schema))
    return jnp.einsum("krp,rs,ksq->pq", C, out, C,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("schema", "chunk_cols"))
def sigma_pallas_fast3(x_num, codes, weights, *, schema: FeatureSchema,
                       chunk_cols: int | None = None) -> jax.Array:
    """v3 compact-packed split-precision masked sigma for BINARY weights.
    Same split-precision semantics as sigma_pallas_fast2 (f32 accumulation
    order differs); less padded MXU work per row (see _sizing_fast3).
    n must be a multiple of pack*chunk_cols."""
    d, c = schema.num_cols, schema.cat_cols
    n = x_num.shape[-1] if d else codes.shape[-1]
    if chunk_cols is None:
        chunk_cols = _fast3_chunk(schema)
    nseg, bins, core, pack, width, tail_base, tail_rows = \
        _sizing_fast3(schema)
    block = pack * chunk_cols
    assert n % block == 0, (n, block)

    x_in = (jnp.asarray(x_num, jnp.float32) if d
            else jnp.zeros((1, n), jnp.float32))
    c_in = (jnp.asarray(codes, jnp.int32) if c
            else jnp.zeros((1, n), jnp.int32))
    w_in = jnp.asarray(weights, jnp.float32).reshape(1, n)

    out = pl.pallas_call(
        functools.partial(_sigma_fast3_kernel, schema=schema, nseg=nseg,
                          bins=bins, core=core, pack=pack, chunk=chunk_cols,
                          width=width, tail_base=tail_base,
                          tail_rows=tail_rows),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((max(d, 1), block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(c, 1), block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((width, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((width, width), jnp.float32),
    )(x_in, c_in, w_in)
    return _fast3_epilogue(out, schema)


def _fast3_chunk(schema: FeatureSchema) -> int:
    """Default chunk: 16384 keeps the [width, chunk] f32 build ≤ 8 MB of
    VMEM at width 128 (measured ~6% faster than 8192); wide single-pack
    schemas drop to 4096."""
    return 16384 if _sizing_fast3(schema)[4] <= LANES else 4096


def _sigma_fast3_cols_kernel(*refs, schema: FeatureSchema, nseg: int,
                             bins, core: int, pack: int, chunk: int,
                             width: int, tail_base: int, tail_rows: int):
    """Per-column-ref variant of _sigma_fast3_kernel: refs =
    (x_0 .. x_{d-1}, code_0 .. code_{c-1}, w, out), each input [1, block].
    Identical math; feeds the columnar table layout without re-stacking."""
    d, c = schema.num_cols, schema.cat_cols
    x_refs = refs[:d]
    c_refs = refs[d:d + c]
    w_ref = refs[d + c]
    out_ref = refs[d + c + 1]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    segs = []
    for k in range(pack):
        sl = pl.ds(k * chunk, chunk)
        segs.extend(_fast3_segment(
            [x_refs[j][:, sl] for j in range(d)],
            [c_refs[j][:, sl] for j in range(c)],
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
    arr = jnp.concatenate(segs, axis=0).astype(jnp.bfloat16) \
        if len(segs) > 1 else segs[0].astype(jnp.bfloat16)
    out_ref[:] += jax.lax.dot_general(
        arr, arr, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("schema", "chunk_cols", "interpret"))
def sigma_pallas_fast3_cols(x_cols, code_cols, weights, *,
                            schema: FeatureSchema,
                            chunk_cols: int | None = None,
                            interpret: bool = False) -> jax.Array:
    """sigma_pallas_fast3 fed by TUPLES of per-column [n] arrays (the
    columnar pytree layout). n must be a v3 block multiple. interpret=True
    runs the GENERIC pallas interpreter (works inside multi-process
    shard_map programs, where force_tpu_interpret_mode deadlocks)."""
    d, c = schema.num_cols, schema.cat_cols
    assert len(x_cols) == d and len(code_cols) == c
    n = x_cols[0].shape[-1] if d else code_cols[0].shape[-1]
    if chunk_cols is None:
        chunk_cols = _fast3_chunk(schema)
    nseg, bins, core, pack, width, tail_base, tail_rows = \
        _sizing_fast3(schema)
    block = pack * chunk_cols
    assert n % block == 0, (n, block)

    row_spec = pl.BlockSpec((1, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    ins = ([jnp.asarray(xc, jnp.float32).reshape(1, n) for xc in x_cols]
           + [jnp.asarray(cc, jnp.int32).reshape(1, n) for cc in code_cols]
           + [jnp.asarray(weights, jnp.float32).reshape(1, n)])
    out = pl.pallas_call(
        functools.partial(_sigma_fast3_cols_kernel, schema=schema,
                          nseg=nseg, bins=bins, core=core, pack=pack,
                          chunk=chunk_cols, width=width,
                          tail_base=tail_base, tail_rows=tail_rows),
        grid=(n // block,),
        in_specs=[row_spec] * len(ins),
        out_specs=pl.BlockSpec((width, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((width, width), jnp.float32),
        interpret=interpret,
    )(*ins)
    return _fast3_epilogue(out, schema)


def sigma_pallas_fast3_cols_padded(x_cols, code_cols, weights, *,
                                   schema: FeatureSchema,
                                   chunk_cols: int | None = None,
                                   interpret: bool = False
                                   ) -> jax.Array:
    """Zero-weight pad n up to a v3 block multiple (per-column inputs)."""
    d = schema.num_cols
    n = x_cols[0].shape[-1] if d else code_cols[0].shape[-1]
    if chunk_cols is None:
        chunk_cols = _fast3_chunk(schema)
    pack = _sizing_fast3(schema)[3]
    block = pack * chunk_cols
    pad = (-n) % block
    if pad:
        x_cols = tuple(jnp.pad(jnp.asarray(xc, jnp.float32), (0, pad))
                       for xc in x_cols)
        code_cols = tuple(jnp.pad(jnp.asarray(cc, jnp.int32), (0, pad))
                          for cc in code_cols)
        w = (jnp.ones((n,), jnp.float32) if weights is None
             else jnp.asarray(weights, jnp.float32))
        weights = jnp.pad(w, (0, pad))
    elif weights is None:
        weights = jnp.ones((n,), jnp.float32)
    return sigma_pallas_fast3_cols(x_cols, code_cols, weights,
                                   schema=schema, chunk_cols=chunk_cols,
                                   interpret=interpret)


def sigma_pallas_fast3_padded(x_num, codes, weights, *,
                              schema: FeatureSchema,
                              chunk_cols: int | None = None) -> jax.Array:
    """Zero-weight pad n up to a v3 block multiple."""
    d, c = schema.num_cols, schema.cat_cols
    n = x_num.shape[-1] if d else codes.shape[-1]
    if chunk_cols is None:
        chunk_cols = _fast3_chunk(schema)
    pack = _sizing_fast3(schema)[3]
    block = pack * chunk_cols
    pad = (-n) % block
    if pad:
        if d:
            x_num = jnp.pad(jnp.asarray(x_num, jnp.float32),
                            ((0, 0), (0, pad)))
        if c:
            codes = jnp.pad(jnp.asarray(codes, jnp.int32), ((0, 0), (0, pad)))
        w = (jnp.ones((n,), jnp.float32) if weights is None
             else jnp.asarray(weights, jnp.float32))
        weights = jnp.pad(w, (0, pad))
    elif weights is None:
        weights = jnp.ones((n,), jnp.float32)
    return sigma_pallas_fast3(x_num, codes, weights, schema=schema,
                              chunk_cols=chunk_cols)


def _mxu_cost_per_row(width: int, pack: int) -> float:
    """Padded self-Gram MXU work per table row: 2·width²/pack FLOP."""
    return 2.0 * width * width / pack


def sigma_pallas_fast_padded(x_num, codes, weights, *,
                             schema: FeatureSchema,
                             chunk_cols: int | None = None) -> jax.Array:
    """Split-precision masked sigma for BINARY weights, any n. Dispatches
    by padded MXU cost per row: the v3 compact-packed kernel wins wherever
    its tail+bin layout packs more segments (20.7 vs 17.3 G rows/s on the
    headline config, same chip minute); v2 covers the rare schemas where
    v3's ones-tail costs a pack slot; schemas too wide for a 128-sublane
    segment fall back to the v1 three-output kernel."""
    sz3 = _sizing_fast3(schema)
    sz2 = _sizing_fast2(schema)
    cost3 = _mxu_cost_per_row(sz3[4], sz3[3])
    cost2 = (_mxu_cost_per_row(LANES, sz2[4]) if sz2[3] <= LANES
             else float("inf"))
    if cost3 <= cost2 and sz3[4] <= 2 * LANES:
        return sigma_pallas_fast3_padded(x_num, codes, weights,
                                         schema=schema,
                                         chunk_cols=chunk_cols)
    if sz2[3] <= LANES:
        return sigma_pallas_fast2_padded(x_num, codes, weights,
                                         schema=schema,
                                         chunk_cols=chunk_cols or 8192)
    chunk_cols = chunk_cols or 2048
    d, c = schema.num_cols, schema.cat_cols
    n = x_num.shape[-1] if d else codes.shape[-1]
    pack, _ = _sizing(schema)
    block = pack * chunk_cols
    pad = (-n) % block
    if pad:
        if d:
            x_num = jnp.pad(jnp.asarray(x_num, jnp.float32), ((0, 0), (0, pad)))
        if c:
            codes = jnp.pad(jnp.asarray(codes, jnp.int32), ((0, 0), (0, pad)))
        w = (jnp.ones((n,), jnp.float32) if weights is None
             else jnp.asarray(weights, jnp.float32))
        weights = jnp.pad(w, (0, pad))
    elif weights is None:
        weights = jnp.ones((n,), jnp.float32)
    return sigma_pallas_fast(x_num, codes, weights, schema=schema,
                             chunk_cols=chunk_cols)


def sigma_pallas_padded(x_num, codes, weights, *, schema: FeatureSchema,
                        chunk_cols: int = 2048) -> jax.Array:
    """Wrapper: zero-weight pad n up to a block multiple (padding rows carry
    weight 0, so they contribute nothing)."""
    d, c = schema.num_cols, schema.cat_cols
    n = x_num.shape[-1] if d else codes.shape[-1]
    pack, _ = _sizing(schema)
    block = pack * chunk_cols
    pad = (-n) % block
    if pad:
        if d:
            x_num = jnp.pad(jnp.asarray(x_num, jnp.float32), ((0, 0), (0, pad)))
        if c:
            codes = jnp.pad(jnp.asarray(codes, jnp.int32), ((0, 0), (0, pad)))
        w = (jnp.ones((n,), jnp.float32) if weights is None
             else jnp.asarray(weights, jnp.float32))
        weights = jnp.pad(w, (0, pad))
    elif weights is None:
        weights = jnp.ones((n,), jnp.float32)
    return sigma_pallas(x_num, codes, weights, schema=schema,
                        chunk_cols=chunk_cols)
