"""Fused impute+aggregate Pallas kernel — one pass per MICE column step.

The fused MICE round (mice/device_round.py) spends its time in full-table
passes: per column, one aggregation pass (the v2 split-precision Gram,
sigma_pallas.py) plus one predict/write-back pass (class_argmax /
linear_predict) — 4 passes per round at 2 null columns. But the predict
pass reads exactly the columns the NEXT column's aggregation re-reads, and
the aggregation kernel already builds the full packed Z block in VMEM. So
this kernel does both at once, per chunk:

  1. build the packed split-precision Z block (unweighted; for binary
     weights the v2 algebra is unchanged: w·bf16(Z) = bf16(w·Z) and the
     residual rows satisfy w·E = wZ − w·bf16(Z), so weighting the
     bf16-cast block by w afterwards reproduces sigma_pallas_fast2's Gram
     EXACTLY — same f32-accumulation-error class);
  2. score the PREVIOUS column's model against Z via one skinny MXU dot —
     the coefficient matrix rides in as a [2L, width] operand split
     hi/lo in bf16 (lo = W − bf16(W)), and the numeric coefficients are
     duplicated onto the residual rows, so scores ≈ f32 W·Z to ~1e-7
     relative (split × split) instead of bf16's ~4e-3;
  3. impute: argmax over class rows (categorical, LDA index convention,
     lda.cpp:575) or the direct prediction row (numeric), select under the
     column's null mask, write the new column chunk out;
  4. substitute the imputed section of Z (the one-hot rows of a cat column
     / the numeric + residual rows of a num column), weight by the NEXT
     column's observed mask, and accumulate the Gram.

Steady-state cost per round: 2 fused passes instead of 4, and the scoring
dot adds only 64·L MACs/row to the Gram's 128²/pack — measured ~1.7× on
the 100M-row MICE round (BENCH.md).

Reference flow being fused: the per-column aggregate→train→predict→
write-back cycle of run_MICE_baseline (imputation_base.cpp:21-142).
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
    LANES,
    _fast2_epilogue,
    _fast3_collapse,
    _fast3_epilogue,
    _fast_cols_use_v3,
    _round_up,
    _sizing_fast2,
    _sizing_fast3,
)


def _phys_map(schema: FeatureSchema):
    """Static sigma-index → segment-local physical row map T f32[P, p_seg]
    (the lhs scatter matrix): T[i, phys(i)] = 1, plus the numeric rows
    (and the ones row, whose residual is identically 0) duplicated onto
    the residual section so coefficients also multiply the E rows."""
    t_pad, vpads, seg_e, p_seg, pack, width = _sizing_fast2(schema)
    d = schema.num_cols
    p = schema.sigma_size
    t = np.zeros((p, p_seg), np.float32)
    for i in range(1 + d):
        t[i, i] = 1.0
    row = t_pad
    off = 1 + d
    for j, size in enumerate(schema.cat_sizes):
        for k in range(size):
            t[off + k, row + k] = 1.0
        off += size
        row += vpads[j]
    if seg_e:
        zoff = t_pad + sum(vpads)
        for i in range(1 + d):
            t[i, zoff + i] += 1.0
    return t


def pack_lhs(w_full, intercept, *, schema: FeatureSchema,
             n_rows: int) -> jax.Array:
    """Build the [2·L_pad, width] bf16 hi/lo-split scoring operand.

    w_full: f32[P, R] coefficients in sigma-index space (R = n_classes for
    LDA, 1 for linreg; w_full[0] may carry the intercept's ones-row slot);
    intercept: f32[R] added on the ones row (z's ones row is 1 for every
    column, including pad columns). n_rows = R. Laid out for whichever
    packed layout (v3 compact / v2) the fused kernel dispatches for this
    schema."""
    if _fast_cols_use_v3(schema):
        return _pack_lhs_v3(w_full, intercept, schema=schema, n_rows=n_rows)
    t_pad, vpads, seg_e, p_seg, pack, width = _sizing_fast2(schema)
    tmat = jnp.asarray(_phys_map(schema))
    # clamp -inf intercepts (empty LDA classes) to a dominating finite
    # value: inf in the bf16 MXU operand risks 0·inf NaNs on pad rows
    icpt = jnp.maximum(jnp.asarray(intercept, jnp.float32), -1e30)
    seg = jnp.asarray(w_full, jnp.float32).T @ tmat        # [R, p_seg]
    seg = seg.at[:, 0].add(icpt)
    l_pad = _round_up(pack * n_rows, 8)
    lhs = jnp.zeros((l_pad, width), jnp.float32)
    for k in range(pack):
        lhs = jax.lax.dynamic_update_slice(
            lhs, seg, (k * n_rows, k * p_seg))
    hi = lhs.astype(jnp.bfloat16)
    lo = (lhs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=0)               # [2·l_pad, width]


def _fused_kernel(*refs, schema: FeatureSchema, kind: str, imp_col: int,
                  n_rows: int, t_pad: int, vpads: tuple[int, ...],
                  seg_e: int, p_seg: int, pack: int, chunk: int,
                  width: int):
    """refs = (x_0..x_{d-1}, code_0..code_{c-1}, null_imp, w_agg, lhs,
    out_col, out_gram). kind: 'cat' | 'num'."""
    d, c = schema.num_cols, schema.cat_cols
    x_refs = refs[:d]
    c_refs = refs[d:d + c]
    null_ref = refs[d + c]
    w_ref = refs[d + c + 1]
    lhs_ref = refs[d + c + 2]
    col_ref = refs[d + c + 3]
    gram_ref = refs[d + c + 4]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        gram_ref[:] = jnp.zeros_like(gram_ref)

    sizes = schema.cat_sizes
    qt = jax.lax.broadcasted_iota(jnp.int32, (t_pad, 1), 0)
    l_pad = lhs_ref.shape[0] // 2

    # ---- build UNWEIGHTED packed Z (f32 pieces per segment) ----
    pieces = []          # per segment: [top, onehot_0.., (resid)]
    for k in range(pack):
        sl = pl.ds(k * chunk, chunk)
        top = jnp.broadcast_to((qt == 0).astype(jnp.float32),
                               (t_pad, chunk))
        for j in range(d):
            top = top + (qt == 1 + j).astype(jnp.float32) \
                * x_refs[j][0, sl][None, :]
        seg = [top]
        for j, size in enumerate(sizes):
            cj = c_refs[j][0, sl][None, :]
            cadj = jnp.where(cj < size, cj, -1)
            qj = jax.lax.broadcasted_iota(jnp.int32, (vpads[j], 1), 0)
            seg.append((qj == cadj).astype(jnp.float32))
        if seg_e:
            seg.append(top - top.astype(jnp.bfloat16).astype(jnp.float32))
        pieces.append(seg)
    flat = [p for seg in pieces for p in seg]
    if pack * p_seg < width:
        flat.append(jnp.zeros((width - pack * p_seg, chunk), jnp.float32))
    zb = jnp.concatenate(flat, axis=0).astype(jnp.bfloat16)

    # ---- score the previous column's model: one skinny dot ----
    raw = jax.lax.dot_general(
        lhs_ref[:, :], zb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [2·l_pad, chunk]
    s = raw[:l_pad] + raw[l_pad:]

    # ---- impute + substitute the imputed section ----
    n_cat_sections = len(sizes)
    for k in range(pack):
        sl = pl.ds(k * chunk, chunk)
        nullm = null_ref[0, sl][None, :] > 0.0
        if kind == "cat":
            base = k * n_rows
            best = s[base][None, :]
            idx = jnp.zeros((1, chunk), jnp.int32)
            for cc in range(1, n_rows):
                row = s[base + cc][None, :]
                m = row > best
                idx = jnp.where(m, cc, idx)
                best = jnp.where(m, row, best)
            old = c_refs[imp_col][0, sl][None, :]
            new = jnp.where(nullm, idx, old)
            col_ref[0, sl] = new[0]
            size = sizes[imp_col]
            cadj = jnp.where(new < size, new, -1)
            qj = jax.lax.broadcasted_iota(jnp.int32,
                                          (vpads[imp_col], 1), 0)
            pieces[k][1 + imp_col] = (qj == cadj).astype(jnp.float32)
        else:
            pred = s[k * n_rows][None, :]
            old = x_refs[imp_col][0, sl][None, :]
            new = jnp.where(nullm, pred, old)
            col_ref[0, sl] = new[0]
            top = pieces[k][0] + (qt == 1 + imp_col).astype(jnp.float32) \
                * (new - old)
            pieces[k][0] = top
            if seg_e:
                pieces[k][1 + n_cat_sections] = \
                    top - top.astype(jnp.bfloat16).astype(jnp.float32)

    # ---- weighted Gram for the NEXT column's sigma ----
    segs = []
    for k in range(pack):
        sl = pl.ds(k * chunk, chunk)
        wrow = w_ref[0, sl][None, :]
        segs.extend(p * wrow for p in pieces[k])
    if pack * p_seg < width:
        segs.append(jnp.zeros((width - pack * p_seg, chunk), jnp.float32))
    arr = jnp.concatenate(segs, axis=0).astype(jnp.bfloat16)
    gram_ref[:] += jax.lax.dot_general(
        arr, arr, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _pack_lhs_v3(w_full, intercept, *, schema: FeatureSchema,
                 n_rows: int) -> jax.Array:
    """v3-layout scoring operand: per segment k the coefficient rows are
    w_fullᵀ·C_kᵀ (the collapse matrix already duplicates each numeric
    sigma row onto its hi AND lo physical rows and maps the ones row to
    tail slot k), with the intercept added on the tail column."""
    nseg, bins, core, pack, width, tail_base, tail_rows = \
        _sizing_fast3(schema)
    C = jnp.asarray(_fast3_collapse(schema))           # [pack, width, P]
    icpt = jnp.maximum(jnp.asarray(intercept, jnp.float32), -1e30)
    w = jnp.asarray(w_full, jnp.float32)               # [P, R]
    l_pad = _round_up(pack * n_rows, 8)
    lhs = jnp.zeros((l_pad, width), jnp.float32)
    for k in range(pack):
        seg = (C[k] @ w).T                             # [R, width]
        seg = seg.at[:, tail_base + k].add(icpt)
        lhs = jax.lax.dynamic_update_slice(lhs, seg, (k * n_rows, 0))
    hi = lhs.astype(jnp.bfloat16)
    lo = (lhs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=0)           # [2·l_pad, width]


def _fused3_kernel(*refs, schema: FeatureSchema, kind: str, imp_col: int,
                   n_rows: int, nseg: int, bins, core: int, pack: int,
                   chunk: int, width: int, tail_base: int, tail_rows: int,
                   noise: bool = False):
    """v3-layout fused impute+aggregate body. Same 4 phases as
    _fused_kernel, at the compact packing's MXU cost; the class argmax
    runs as full-height sublane reductions (max + first-match index)
    instead of a per-class [1, chunk] row loop.

    noise=True (numeric columns): stochastic-regression imputation — the
    prediction gains std·z with z ~ N(0,1) drawn IN-KERNEL from the
    per-core PRNG via Box-Muller (the reference's regression.cpp:493-504
    noise, its /dev/urandom seed replaced by a per-(round, column) seed,
    so a run is reproducible given its seed). The per-block stream is
    seeded `seed ^ ((block_off + step) · 0x9E3779B9)` — the step enters
    MULTIPLICATIVELY (odd full-period constant), so two (round, column)
    seeds that differ by less than the grid's block count can never alias
    a neighbouring block's stream, and `block_off` (this shard's global
    block offset, 0 single-device) keys the stream by GLOBAL block index:
    for a fixed padded row count and chunking the draws are identical on
    any mesh shape. Stream note: these draws are keyed by (seed, global
    block, lane), not by global row index like the unfused loop's
    counter-based _row_noise — the two paths' noise STREAMS differ while
    both match the reference's distribution."""
    d, c = schema.num_cols, schema.cat_cols
    x_refs = refs[:d]
    c_refs = refs[d:d + c]
    null_ref = refs[d + c]
    w_ref = refs[d + c + 1]
    lhs_ref = refs[d + c + 2]
    extra = refs[d + c + 3:d + c + 5] if noise else ()
    col_ref = refs[d + c + 3 + len(extra)]
    gram_ref = refs[d + c + 4 + len(extra)]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        gram_ref[:] = jnp.zeros_like(gram_ref)

    sizes = schema.cat_sizes
    qn = (jax.lax.broadcasted_iota(jnp.int32, (nseg, 1), 0) if nseg
          else None)
    l_pad = lhs_ref.shape[0] // 2

    def roll_resid(hi):
        lo = hi - hi.astype(jnp.bfloat16).astype(jnp.float32)
        return hi + pltpu.roll(lo, shift=d, axis=0)

    def build_bin(cols, code_of, sl):
        rows = cols[0]
        col_list = cols[1]
        qb = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        acc = None
        for j, off in col_list:
            cj = code_of(j, sl)
            if len(col_list) == 1:
                hit = (qb == cj).astype(jnp.float32)
            else:
                cadj = jnp.where((cj >= 0) & (cj < sizes[j]), cj + off, -1)
                hit = (qb == cadj).astype(jnp.float32)
            acc = hit if acc is None else acc + hit
        return acc

    def code_raw(j, sl):
        return c_refs[j][0, sl][None, :]

    # ---- build UNWEIGHTED pieces: per segment [hi?, bin_0, bin_1, ...]
    pieces = []
    for k in range(pack):
        sl = pl.ds(k * chunk, chunk)
        seg = []
        if nseg:
            hi = (qn == 0).astype(jnp.float32) * x_refs[0][0, sl][None, :]
            for j in range(1, d):
                hi = hi + (qn == j).astype(jnp.float32) \
                    * x_refs[j][0, sl][None, :]
            seg.append(hi)
        for b in bins:
            seg.append(build_bin(b, code_raw, sl))
        pieces.append(seg)

    qt = jax.lax.broadcasted_iota(jnp.int32, (tail_rows, 1), 0)
    ones_tail = jnp.broadcast_to((qt < pack).astype(jnp.float32),
                                 (tail_rows, chunk))

    def packed(segs_per_k, tail):
        flat = []
        for seg in segs_per_k:
            if nseg:
                flat.append(roll_resid(seg[0]))
                flat.extend(seg[1:])
            else:
                flat.extend(seg)
        flat.append(tail)
        if tail_base + tail_rows < width:
            flat.append(jnp.zeros((width - tail_base - tail_rows, chunk),
                                  jnp.float32))
        return jnp.concatenate(flat, axis=0).astype(jnp.bfloat16)

    zb = packed(pieces, ones_tail)

    # ---- score the previous column's model: one skinny dot ----
    raw = jax.lax.dot_general(
        lhs_ref[:, :], zb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [2·l_pad, chunk]
    s = raw[:l_pad] + raw[l_pad:]

    # ---- impute + substitute the imputed section ----
    znoise = None
    if noise and kind == "num":
        seed_ref, std_ref = extra
        # seed_ref = [per-(round, column) seed, global block offset];
        # multiplicative step mixing — see the docstring's stream contract
        pltpu.prng_seed(seed_ref[0]
                        ^ ((seed_ref[1] + step)
                           * jnp.int32(-1640531527)))   # 0x9E3779B9

        def unit(bits):
            # random bits → (0, 1]: 24 low bits as a positive int32
            # (Mosaic has no uint32→f32 cast), never exactly 0
            i = pltpu.bitcast(bits, jnp.int32)
            return (((i >> 8) & 0xFFFFFF).astype(jnp.float32) + 1.0) \
                * (2.0 ** -24)
        u1 = unit(pltpu.prng_random_bits((pack, chunk)))
        u2 = unit(pltpu.prng_random_bits((pack, chunk)))
        znoise = jnp.sqrt(-2.0 * jnp.log(u1)) \
            * jnp.cos((2.0 * np.pi) * u2) * std_ref[0]
    bin_of = None
    if kind == "cat":
        bin_of = next(i for i, b in enumerate(bins)
                      if any(j == imp_col for j, _ in b[1]))
    for k in range(pack):
        sl = pl.ds(k * chunk, chunk)
        nullm = null_ref[0, sl][None, :] > 0.0
        if kind == "cat":
            sb = s[k * n_rows:(k + 1) * n_rows]          # [n_rows, chunk]
            qi = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
            mx = jnp.max(sb, axis=0, keepdims=True)
            idx = jnp.min(jnp.where(sb >= mx, qi, n_rows), axis=0,
                          keepdims=True)                 # first max (ties)
            old = c_refs[imp_col][0, sl][None, :]
            new = jnp.where(nullm, idx, old)
            col_ref[0, sl] = new[0]

            def code_new(j, sl=sl, new=new):
                return new if j == imp_col else code_raw(j, sl)
            sec = (1 if nseg else 0) + bin_of
            pieces[k][sec] = build_bin(bins[bin_of], code_new, sl)
        else:
            pred = s[k * n_rows][None, :]
            if znoise is not None:
                pred = pred + znoise[k:k + 1]
            old = x_refs[imp_col][0, sl][None, :]
            new = jnp.where(nullm, pred, old)
            col_ref[0, sl] = new[0]
            pieces[k][0] = pieces[k][0] \
                + (qn == imp_col).astype(jnp.float32) * (new - old)

    # ---- weighted Gram for the NEXT column's sigma ----
    wsegs = []
    for k in range(pack):
        sl = pl.ds(k * chunk, chunk)
        wrow = w_ref[0, sl][None, :]
        wsegs.append([p * wrow for p in pieces[k]])
    wtail = w_ref[0, :pack * chunk].reshape(pack, chunk)
    if tail_rows > pack:
        wtail = jnp.concatenate(
            [wtail, jnp.zeros((tail_rows - pack, chunk), jnp.float32)],
            axis=0)
    arr = packed(wsegs, wtail)
    gram_ref[:] += jax.lax.dot_general(
        arr, arr, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("schema", "kind", "imp_col",
                                             "n_rows", "chunk_cols",
                                             "interpret"))
def _fused_impute_aggregate_v3(x_cols, code_cols, null_imp, w_agg, lhs, *,
                               schema: FeatureSchema, kind: str,
                               imp_col: int, n_rows: int,
                               chunk_cols: int = 8192,
                               noise_seed=None, noise_std=None,
                               noise_block_off=None,
                               interpret: bool = False):
    d, c = schema.num_cols, schema.cat_cols
    assert len(x_cols) == d and len(code_cols) == c
    n = x_cols[0].shape[-1] if d else code_cols[0].shape[-1]
    nseg, bins, core, pack, width, tail_base, tail_rows = \
        _sizing_fast3(schema)
    block = pack * chunk_cols
    assert n % block == 0, (n, block)
    noise = noise_seed is not None and kind == "num"

    row_spec = pl.BlockSpec((1, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    ins = ([jnp.asarray(xc, jnp.float32).reshape(1, n) for xc in x_cols]
           + [jnp.asarray(cc, jnp.int32).reshape(1, n) for cc in code_cols]
           + [jnp.asarray(null_imp, jnp.float32).reshape(1, n),
              jnp.asarray(w_agg, jnp.float32).reshape(1, n),
              jnp.asarray(lhs, jnp.bfloat16)])
    specs = [row_spec] * (d + c + 2) \
        + [pl.BlockSpec((lhs.shape[0], width), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)]
    if noise:
        boff = (jnp.zeros((), jnp.int32) if noise_block_off is None
                else jnp.asarray(noise_block_off, jnp.int32).reshape(()))
        ins += [jnp.stack([jnp.asarray(noise_seed, jnp.int32)
                           .reshape(()), boff]),
                jnp.asarray(noise_std, jnp.float32).reshape(1)]
        specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
    col_dtype = jnp.int32 if kind == "cat" else jnp.float32
    new_col, gram = pl.pallas_call(
        functools.partial(_fused3_kernel, schema=schema, kind=kind,
                          imp_col=imp_col, n_rows=n_rows, nseg=nseg,
                          bins=bins, core=core, pack=pack, chunk=chunk_cols,
                          width=width, tail_base=tail_base,
                          tail_rows=tail_rows, noise=noise),
        grid=(n // block,),
        in_specs=specs,
        out_specs=(
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((width, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), col_dtype),
            jax.ShapeDtypeStruct((width, width), jnp.float32),
        ),
        interpret=interpret,
    )(*ins)
    return new_col[0], _fast3_epilogue(gram, schema)


def fused_block(schema: FeatureSchema, chunk_cols: int = 8192) -> int:
    """Row granule of the dispatched fused kernel."""
    pack = (_sizing_fast3(schema)[3] if _fast_cols_use_v3(schema)
            else _sizing_fast2(schema)[4])
    return pack * chunk_cols


def fused_impute_aggregate(x_cols, code_cols, null_imp, w_agg, lhs, *,
                           schema: FeatureSchema, kind: str, imp_col: int,
                           n_rows: int, chunk_cols: int = 8192,
                           noise_seed=None, noise_std=None,
                           noise_block_off=None, interpret: bool = False):
    """One fused pass: impute column `imp_col` of `kind` from the scoring
    operand `lhs` (pack_lhs), then aggregate the masked sigma with weights
    `w_agg` over the UPDATED table. Returns (new_column [n], sigma [P, P]).
    Dispatches the v3 compact layout where it wins (pack_lhs made the
    matching choice). noise_seed/noise_std (numeric columns): stochastic-
    regression noise drawn in-kernel (v3 only); noise_block_off keys the
    stream by global block index under sharding (see _fused3_kernel)."""
    if _fast_cols_use_v3(schema):
        return _fused_impute_aggregate_v3(
            x_cols, code_cols, null_imp, w_agg, lhs, schema=schema,
            kind=kind, imp_col=imp_col, n_rows=n_rows,
            chunk_cols=chunk_cols, noise_seed=noise_seed,
            noise_std=noise_std, noise_block_off=noise_block_off,
            interpret=interpret)
    if noise_seed is not None:
        raise ValueError("in-kernel stochastic noise requires the v3 "
                         "fused layout; use the unfused loop for this "
                         "schema")
    return _fused_impute_aggregate_v2(
        x_cols, code_cols, null_imp, w_agg, lhs, schema=schema, kind=kind,
        imp_col=imp_col, n_rows=n_rows, chunk_cols=chunk_cols,
        interpret=interpret)


@functools.partial(jax.jit, static_argnames=("schema", "kind", "imp_col",
                                             "n_rows", "chunk_cols",
                                             "interpret"))
def _fused_impute_aggregate_v2(x_cols, code_cols, null_imp, w_agg, lhs, *,
                               schema: FeatureSchema, kind: str,
                               imp_col: int, n_rows: int,
                               chunk_cols: int = 8192,
                               interpret: bool = False):
    """One fused pass: impute column `imp_col` of `kind` from the scoring
    operand `lhs` (pack_lhs), then aggregate the masked sigma with weights
    `w_agg` over the UPDATED table. Returns (new_column [n], sigma [P, P]).

    x_cols/code_cols: tuples of per-column [n] arrays (columnar carry);
    null_imp f32[n] (1 = originally null, to impute); w_agg f32[n] binary.
    n must be a multiple of pack·chunk_cols."""
    d, c = schema.num_cols, schema.cat_cols
    assert len(x_cols) == d and len(code_cols) == c
    n = x_cols[0].shape[-1] if d else code_cols[0].shape[-1]
    t_pad, vpads, seg_e, p_seg, pack, width = _sizing_fast2(schema)
    block = pack * chunk_cols
    assert n % block == 0, (n, block)
    assert p_seg * pack <= LANES or pack == 1

    row_spec = pl.BlockSpec((1, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    ins = ([jnp.asarray(xc, jnp.float32).reshape(1, n) for xc in x_cols]
           + [jnp.asarray(cc, jnp.int32).reshape(1, n) for cc in code_cols]
           + [jnp.asarray(null_imp, jnp.float32).reshape(1, n),
              jnp.asarray(w_agg, jnp.float32).reshape(1, n),
              jnp.asarray(lhs, jnp.bfloat16)])
    col_dtype = jnp.int32 if kind == "cat" else jnp.float32
    new_col, gram = pl.pallas_call(
        functools.partial(_fused_kernel, schema=schema, kind=kind,
                          imp_col=imp_col, n_rows=n_rows, t_pad=t_pad,
                          vpads=vpads, seg_e=seg_e, p_seg=p_seg, pack=pack,
                          chunk=chunk_cols, width=width),
        grid=(n // block,),
        in_specs=[row_spec] * (d + c + 2)
        + [pl.BlockSpec((lhs.shape[0], width), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((width, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), col_dtype),
            jax.ShapeDtypeStruct((width, width), jnp.float32),
        ),
        interpret=interpret,
    )(*ins)
    sigma = _fast2_epilogue(gram, schema, t_pad, vpads, seg_e, p_seg, pack)
    return new_col[0], sigma
