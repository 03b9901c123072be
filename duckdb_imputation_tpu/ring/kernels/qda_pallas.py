"""Batched QDA prediction as ONE Pallas pass — all classes per tile.

The XLA batched predict (models.device.qda_predict_device) streams the
[m, n] feature block once PER CLASS (C reads of ~840 MB at 10M rows even
in its Cholesky-factored form — 27.6 ms measured). This kernel reads the
table ONCE: per chunk it builds the same lane-packed split-precision Z
block as the v3 sigma kernel, scores every class's factored form with one
skinny MXU dot, and reduces to the argmax in-register:

    quad_c = −L_c·L_cᵀ  (Cholesky of the PSD −quad_c), so
    s_c(z) = −‖L_cᵀz‖² + lin_c·z + b_c

The scoring operand packs, per class, 1 LINEAR scorer row (lin_c, with
b_c riding the ones-tail slot) and m QUADRATIC scorer rows (the columns
of L_c) — `sigma_fused.pack_lhs` builds it unchanged (hi/lo bf16 split,
collapse-matrix layout, ~1e-7 relative scores). Per segment the kernel
dots its [2·R_pad, width] slice against the packed block, squares the
quadratic rows, and contracts with a constant ±selection matrix:

    scores = M_sel @ s − M_sum @ (s∘s)        [C, chunk]

then takes the first-max class index (LDA tie convention).

Cost per table row: ~2·(2·C·(1+m))·128/pack MXU FLOP (the 128-lane
packing price; ~90k at the 4+2 headline schema) + one table read — ~5 ms
@10M rows vs the XLA form's 27.6. Reference being batched:
qda.cpp:444-481 (3 dgemv PER ROW·CLASS; the author's own "batched
rewrite" note at qda.cpp:407).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...schema import FeatureSchema
from .sigma_pallas import (
    _fast3_segment,
    _fast_cols_use_v3,
    _round_up,
    _sizing_fast3,
)


def qda_pack_scorers(quad, lin, intercept, *, schema: FeatureSchema):
    """(quad [C, m, m] neg. def., lin [C, m], intercept [C]) → the
    [2·l_pad, width] bf16 hi/lo scoring operand + (n_scorers, C).
    Scorer order per class: [linear, quad_0 .. quad_{m-1}]."""
    from .sigma_fused import pack_lhs

    c_cls, m = quad.shape[0], quad.shape[-1]
    p = schema.sigma_size
    assert m == p - 1, (m, p)
    eye = jnp.eye(m, dtype=quad.dtype)
    chol = jnp.linalg.cholesky(-quad + 1e-12 * eye)        # [C, m, m]
    r_pc = 1 + m
    w_full = jnp.zeros((p, c_cls * r_pc), jnp.float32)
    icpt = jnp.zeros((c_cls * r_pc,), jnp.float32)
    for cc in range(c_cls):
        base = cc * r_pc
        w_full = w_full.at[1:, base].set(lin[cc])
        icpt = icpt.at[base].set(intercept[cc])
        # quad scorers: y_i = (L_cᵀ z)_i ⇒ scorer i = L_c[:, i]
        w_full = w_full.at[1:, base + 1:base + r_pc].set(chol[cc])
    lhs = pack_lhs(w_full, icpt, schema=schema, n_rows=c_cls * r_pc)
    return lhs, c_cls * r_pc


def _score_mats(c_cls: int, r_pc: int, r_pad: int):
    """Constant [C, r_pad] selectors: M_sel picks each class's linear
    scorer row, M_sum sums its quadratic scorer rows (to be subtracted
    as squares)."""
    sel = np.zeros((c_cls, r_pad), np.float32)
    ssum = np.zeros((c_cls, r_pad), np.float32)
    for cc in range(c_cls):
        sel[cc, cc * r_pc] = 1.0
        ssum[cc, cc * r_pc + 1:cc * r_pc + r_pc] = 1.0
    return sel, ssum


def _qda_kernel(*refs, schema: FeatureSchema, n_scorers: int, c_cls: int,
                nseg: int, bins, pack: int, chunk: int,
                width: int, tail_base: int, tail_rows: int):
    """refs = (x_0.., code_0.., lhs, sel, ssum, out_pred)."""
    d, c = schema.num_cols, schema.cat_cols
    x_refs = refs[:d]
    c_refs = refs[d:d + c]
    lhs_ref = refs[d + c]
    sel_ref = refs[d + c + 1]
    sum_ref = refs[d + c + 2]
    pred_ref = refs[d + c + 3]
    l_pad = lhs_ref.shape[0] // 2
    r_pc = n_scorers // c_cls

    # one packed split-precision Z block for all segments (UNWEIGHTED)
    segs = []
    for k in range(pack):
        sl = pl.ds(k * chunk, chunk)
        segs.extend(_fast3_segment(
            [x_refs[j][0, sl][None, :] for j in range(d)],
            [c_refs[j][0, sl][None, :] for j in range(c)],
            None, schema=schema, nseg=nseg, bins=bins, chunk=chunk))
    qt = jax.lax.broadcasted_iota(jnp.int32, (tail_rows, 1), 0)
    segs.append(jnp.broadcast_to((qt < pack).astype(jnp.float32),
                                 (tail_rows, chunk)))
    if tail_base + tail_rows < width:
        segs.append(jnp.zeros((width - tail_base - tail_rows, chunk),
                              jnp.float32))
    zb = jnp.concatenate(segs, axis=0).astype(jnp.bfloat16)

    # score per SEGMENT (the all-segments [2·l_pad, chunk] product would
    # hold ~60 MB of VMEM at chunk 8192; per-segment slices keep the live
    # intermediate at [R, chunk]): hi and lo scorer slices dotted
    # separately against the shared packed block, then summed
    qi = jax.lax.broadcasted_iota(jnp.int32, (c_cls, 1), 0)
    for k in range(pack):
        sl = pl.ds(k * chunk, chunk)
        hi_k = lhs_ref[pl.ds(k * n_scorers, n_scorers), :]
        lo_k = lhs_ref[pl.ds(l_pad + k * n_scorers, n_scorers), :]
        sk = (jax.lax.dot_general(
                  hi_k, zb, (((1,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(
                  lo_k, zb, (((1,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32))   # [R, chunk]
        if sel_ref.shape[1] > n_scorers:
            sk = jnp.concatenate(
                [sk, jnp.zeros((sel_ref.shape[1] - n_scorers, chunk),
                               jnp.float32)], axis=0)
        scores = jax.lax.dot_general(
            sel_ref[:, :], sk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) \
            - jax.lax.dot_general(
                sum_ref[:, :], sk * sk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [C, chunk]
        mx = jnp.max(scores, axis=0, keepdims=True)
        idx = jnp.min(jnp.where(scores >= mx, qi, c_cls), axis=0,
                      keepdims=True)                     # first max (ties)
        pred_ref[0, sl] = idx[0]


@functools.partial(jax.jit, static_argnames=("schema", "n_scorers",
                                             "c_cls", "chunk_cols"))
def _qda_predict_pallas(x_cols, code_cols, lhs, *, schema: FeatureSchema,
                        n_scorers: int, c_cls: int,
                        chunk_cols: int = 8192):
    d, c = schema.num_cols, schema.cat_cols
    n = x_cols[0].shape[-1] if d else code_cols[0].shape[-1]
    nseg, bins, core, pack, width, tail_base, tail_rows = \
        _sizing_fast3(schema)
    block = pack * chunk_cols
    assert n % block == 0, (n, block)
    r_pad = _round_up(n_scorers, 8)
    sel, ssum = _score_mats(c_cls, n_scorers // c_cls, r_pad)

    row_spec = pl.BlockSpec((1, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    ins = ([jnp.asarray(xc, jnp.float32).reshape(1, n) for xc in x_cols]
           + [jnp.asarray(cc, jnp.int32).reshape(1, n) for cc in code_cols]
           + [jnp.asarray(lhs, jnp.bfloat16), jnp.asarray(sel),
              jnp.asarray(ssum)])
    specs = ([row_spec] * (d + c)
             + [pl.BlockSpec((lhs.shape[0], width), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c_cls, r_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c_cls, r_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)])
    pred = pl.pallas_call(
        functools.partial(_qda_kernel, schema=schema, n_scorers=n_scorers,
                          c_cls=c_cls, nseg=nseg, bins=bins,
                          pack=pack, chunk=chunk_cols, width=width,
                          tail_base=tail_base, tail_rows=tail_rows),
        grid=(n // block,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
    )(*ins)
    return pred[0]


def qda_predict_pallas(quad, lin, intercept, x_num, codes, *,
                       schema: FeatureSchema,
                       chunk_cols: int = 8192) -> jax.Array:
    """One-table-pass batched QDA prediction (see module docstring).
    Inputs match models.device.qda_predict_device; v3-layout schemas only
    (callers dispatch — see qda_predict_device's method parameter).
    Returns the argmax class index i32[n]; rows beyond a block multiple
    are zero-padded and sliced off."""
    assert _fast_cols_use_v3(schema), "v3 packed layout required"
    d, c = schema.num_cols, schema.cat_cols
    n = x_num.shape[-1] if d else codes.shape[-1]
    pack = _sizing_fast3(schema)[3]
    block = pack * chunk_cols
    pad = (-n) % block
    x_cols = tuple(jnp.pad(jnp.asarray(x_num[j], jnp.float32), (0, pad))
                   for j in range(d))
    code_cols = tuple(jnp.pad(jnp.asarray(codes[j], jnp.int32), (0, pad))
                      for j in range(c))
    lhs, n_scorers = qda_pack_scorers(quad, lin, intercept, schema=schema)
    pred = _qda_predict_pallas(x_cols, code_cols, lhs, schema=schema,
                               n_scorers=n_scorers, c_cls=quad.shape[0],
                               chunk_cols=chunk_cols)
    return pred[:n] if pad else pred
