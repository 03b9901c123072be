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


def _bf16_split3(x):
    """x (f32) = b1 + b2 + b3 with each bᵢ bf16: 3×8 mantissa bits cover
    f32's 24 — the sum reconstructs x exactly."""
    b1 = x.astype(jnp.bfloat16)
    r1 = x - b1.astype(jnp.float32)
    b2 = r1.astype(jnp.bfloat16)
    b3 = (r1 - b2.astype(jnp.float32)).astype(jnp.bfloat16)
    return b1, b2, b3


def _nb_kernel_fast(x_ref, c_ref, w_ref, g_ref, out_ref, *,
                    schema: FeatureSchema, chunk: int, f: int, g_pad: int):
    """Binary-weights variant: ONE single-pass bf16 dot.

    The group mask rows are {0,1} (exact in bf16) and the binary feature
    rows (ones, one-hot) are exact in bf16, so their products are exact.
    Numeric rows (x, x²) are split 3-way bf16 (exact f32 reconstruction),
    all splits ride in the same widened rhs:
        [1 ‖ onehot ‖ x:b1 ‖ x:b2 ‖ x:b3 ‖ x²:b1 ‖ x²:b2 ‖ x²:b3]
    and the host adds the three split columns back together. Result: exact
    f32-accumulated sums at single-bf16-pass MXU cost (~6× the HIGHEST
    rate), leaving the pass bandwidth-bound."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    d = schema.num_cols
    rows = [jnp.ones((1, chunk), jnp.bfloat16)]
    for j, size in enumerate(schema.cat_sizes):
        it = jax.lax.broadcasted_iota(jnp.int32, (size, 1), 0)
        rows.append((c_ref[j, :][None, :] == it).astype(jnp.bfloat16))
    if d:
        x = x_ref[:, :]                               # [d, chunk] f32
        xsplit = _bf16_split3(x)
        qsplit = _bf16_split3(x * x)
        for k in range(3):
            rows.append(xsplit[k])
            rows.append(qsplit[k])
    f_wide = out_ref.shape[1]
    used = 1 + schema.vocab_size + 6 * d
    if f_wide > used:
        rows.append(jnp.zeros((f_wide - used, chunk), jnp.bfloat16))
    feats = jnp.concatenate(rows, axis=0)

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
    f_wide = _round_up(1 + v + 6 * d, 8) if fast else _round_up(f, 8)
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
    # fast layout: [1 ‖ onehot V ‖ (x, x²)×split k=0..2] → standard
    # [1 ‖ x ‖ x² ‖ onehot] with the three splits summed back together
    base = 1 + v
    numeric = (out[:, base:base + 2 * d]
               + out[:, base + 2 * d:base + 4 * d]
               + out[:, base + 4 * d:base + 6 * d])
    return jnp.concatenate([out[:, :1], numeric, out[:, 1:base]], axis=1)


def sum_to_nb_agg_grouped_pallas(x_num, codes, group_ids, *,
                                 schema: FeatureSchema, num_groups: int,
                                 weights=None, chunk_cols: int = 16384,
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
