"""Grouped NB-aggregate Pallas kernel — bandwidth-bound segment sums.

The NB aggregate (Triple::sum_to_nb_agg, sum/sum_to_nb_agg.cpp:39-146;
grouped = GROUP BY label) needs per-group sums of F = [1 ‖ x ‖ x² ‖
onehot(codes)] — a [G, F] result from an [F, n] × [n, G] contraction. XLA
lowers that to a matmul with an (≤56, ≤G) output tile: ~3% MXU utilization,
10× slower than the memory floor. This kernel instead streams column
chunks HBM→VMEM, builds F and the group-mask W = (g == iota_G)·w on-chip
(the one-hot and x² never touch HBM), and accumulates W·Fᵀ per chunk: the
pass is bound by reading the raw columns once — the hash-aggregation of
the reference collapsed to one streaming fused multiply.

Group ids ride along as data (no sorting, no scalar prefetch): a skewed
label distribution changes nothing (each row contributes one multiply to
its group's row of W regardless of skew).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...schema import FeatureSchema
from ..triple import NBAgg


def _round_up(x, m):
    return -(-x // m) * m


def _nb_kernel(x_ref, c_ref, w_ref, g_ref, out_ref, *,
               schema: FeatureSchema, chunk: int, f_pad: int, g_pad: int):
    """General-weights variant: f32 feature block, HIGHEST-precision dot."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    d = schema.num_cols
    f = 1 + 2 * d + schema.vocab_size
    rows = [jnp.ones((1, chunk), jnp.float32)]
    if d:
        x = x_ref[:, :]
        rows.append(x)
        rows.append(x * x)
    for j, size in enumerate(schema.cat_sizes):
        it = jax.lax.broadcasted_iota(jnp.int32, (size, 1), 0)
        rows.append((c_ref[j, :][None, :] == it).astype(jnp.float32))
    if f_pad > f:
        rows.append(jnp.zeros((f_pad - f, chunk), jnp.float32))
    feats = jnp.concatenate(rows, axis=0)

    qg = jax.lax.broadcasted_iota(jnp.int32, (g_pad, 1), 0)
    wmat = (g_ref[0, :][None, :] == qg).astype(jnp.float32) * w_ref[0, :]

    out_ref[:] += jax.lax.dot_general(
        wmat, feats, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _bf16_split3_f32(x):
    """Same 3-way split, but the parts stay f32 (bf16-representable values)
    so the whole feature block is built in f32 — (8, 128)-tile sublane
    alignment — and cast to bf16 ONCE. Piecewise bf16 segments with odd row
    counts force (16, 128) repacks at every concat boundary (measured 2×
    slower end-to-end)."""
    b1 = x.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = x - b1
    b2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
    b3 = r1 - b2
    return b1, b2, b3


def _nb_kernel_fast(x_ref, c_ref, w_ref, g_ref, out_ref, *,
                    schema: FeatureSchema, chunk: int, f: int, g_pad: int):
    """Binary-weights variant: ONE single-pass bf16 dot.

    The group mask rows are {0,1} (exact in bf16) and the binary feature
    rows (ones, one-hot) are exact in bf16, so their products are exact.
    Numeric rows (x, x²) are split 3-way bf16 (exact f32 reconstruction),
    all splits ride in the same widened rhs, ordered for f32 sublane
    alignment (one-hot first, the lone ones-row last):
        [onehot ‖ x:b1 ‖ x:b2 ‖ x:b3 ‖ x²:b1 ‖ x²:b2 ‖ x²:b3 ‖ 1 ‖ 0-pad]
    and the host adds the three split columns back together. The block is
    built entirely in f32 and cast to bf16 once (see _bf16_split3_f32).
    Result: exact f32-accumulated sums at single-bf16-pass MXU cost,
    leaving the pass bandwidth-bound (measured 729 GB/s of the ~752 GB/s
    pure-read rate at the 8num+4cat config)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    d = schema.num_cols
    rows = []
    for j, size in enumerate(schema.cat_sizes):
        it = jax.lax.broadcasted_iota(jnp.int32, (size, 1), 0)
        rows.append((c_ref[j, :][None, :] == it).astype(jnp.float32))
    if d:
        x = x_ref[:, :]                               # [d, chunk] f32
        rows.extend(_bf16_split3_f32(x))
        rows.extend(_bf16_split3_f32(x * x))
    f_wide = out_ref.shape[1]
    used = schema.vocab_size + 6 * d
    ri = jax.lax.broadcasted_iota(jnp.int32, (f_wide - used, chunk), 0)
    rows.append((ri == 0).astype(jnp.float32))        # ones row + 0-pad
    feats = jnp.concatenate(rows, axis=0).astype(jnp.bfloat16)

    qg = jax.lax.broadcasted_iota(jnp.int32, (g_pad, 1), 0)
    wmat = ((g_ref[0, :][None, :] == qg).astype(jnp.float32)
            * w_ref[0, :]).astype(jnp.bfloat16)

    out_ref[:] += jax.lax.dot_general(
        wmat, feats, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("schema", "num_groups",
                                             "chunk_cols", "fast"))
def _nb_grouped_pallas(x_num, codes, weights, group_ids, *,
                       schema: FeatureSchema, num_groups: int,
                       chunk_cols: int, fast: bool):
    d, c = schema.num_cols, schema.cat_cols
    v = schema.vocab_size
    n = weights.shape[-1]
    f = 1 + 2 * d + v
    f_wide = _round_up(v + 6 * d + 1, 8) if fast else _round_up(f, 8)
    g_pad = _round_up(max(num_groups, 8), 8)

    if fast:
        kern = functools.partial(_nb_kernel_fast, schema=schema,
                                 chunk=chunk_cols, f=f, g_pad=g_pad)
    else:
        kern = functools.partial(_nb_kernel, schema=schema,
                                 chunk=chunk_cols, f_pad=f_wide,
                                 g_pad=g_pad)
    out = pl.pallas_call(
        kern,
        grid=(n // chunk_cols,),
        in_specs=[
            pl.BlockSpec((max(d, 1), chunk_cols), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(c, 1), chunk_cols), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk_cols), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk_cols), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g_pad, f_wide), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g_pad, f_wide), jnp.float32),
    )(x_num if d else jnp.zeros((1, n), jnp.float32),
      codes if c else jnp.zeros((1, n), jnp.int32),
      weights.reshape(1, n),
      group_ids.reshape(1, n))
    out = out[:num_groups]
    if not fast:
        return out[:, :f]
    # fast layout: [onehot V ‖ x×3 splits ‖ x²×3 splits ‖ 1 ‖ pad] →
    # standard [1 ‖ x ‖ x² ‖ onehot], the three splits summed back together
    x_sum = out[:, v:v + d] + out[:, v + d:v + 2 * d] \
        + out[:, v + 2 * d:v + 3 * d]
    q_sum = out[:, v + 3 * d:v + 4 * d] + out[:, v + 4 * d:v + 5 * d] \
        + out[:, v + 5 * d:v + 6 * d]
    ones_col = out[:, v + 6 * d:v + 6 * d + 1]
    return jnp.concatenate([ones_col, x_sum, q_sum, out[:, :v]], axis=1)


def sum_to_nb_agg_grouped_pallas(x_num, codes, group_ids, *,
                                 schema: FeatureSchema, num_groups: int,
                                 weights=None, chunk_cols: int = 32768,
                                 fast: bool | None = None) -> NBAgg:
    """Grouped NB aggregate via the streaming Pallas kernel. Rows are
    zero-weight padded to a chunk multiple (padded rows carry group id
    `num_groups`, matching no output row). `fast=True` (default when
    weights are absent, i.e. binary group masks only) takes the
    single-bf16-pass split-precision path — EXACT f32 sums; pass
    fast=False for arbitrary non-binary weights."""
    n = len(group_ids) if group_ids is not None else weights.shape[-1]
    d = schema.num_cols
    if fast is None:
        fast = weights is None
    if x_num is None:
        x_num = jnp.zeros((0, n), jnp.float32)
    if codes is None:
        codes = jnp.zeros((0, n), jnp.int32)
    x_num = jnp.asarray(x_num, jnp.float32)
    codes = jnp.asarray(codes, jnp.int32)
    weights = (jnp.ones((n,), jnp.float32) if weights is None
               else jnp.asarray(weights, jnp.float32))
    gids = jnp.asarray(group_ids, jnp.int32)

    pad = (-n) % chunk_cols
    if pad:
        x_num = jnp.pad(x_num, ((0, 0), (0, pad)))
        codes = jnp.pad(codes, ((0, 0), (0, pad)))
        weights = jnp.pad(weights, (0, pad))
        gids = jnp.pad(gids, (0, pad), constant_values=num_groups)

    sums = _nb_grouped_pallas(x_num, codes, weights, gids, schema=schema,
                              num_groups=num_groups, chunk_cols=chunk_cols,
                              fast=fast)
    return NBAgg(n=sums[:, 0], lin=sums[:, 1:1 + d],
                 quad_diag=sums[:, 1 + d:1 + 2 * d],
                 lin_cat=sums[:, 1 + 2 * d:])
