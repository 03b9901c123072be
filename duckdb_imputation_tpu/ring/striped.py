"""Large-vocabulary aggregation: sigma computed in column stripes.

SURVEY.md §7 hard part 3: the dense quad_cat section is V×V — for large
total vocab V the full sigma no longer fits (V=64k ⇒ 16GB f32). Two escape
hatches exist in this framework:

  1. shard sigma columns over a 'model' mesh axis
     (parallel/sharded2d.py) — the multi-chip answer;
  2. THIS module — single-device striped evaluation: S[:, stripe] is a
     rectangular Gram Zᵀ·diag(w)·Z[:, stripe]; memory is bounded by
     P × stripe_width, and stripes stream through the same masked scan as
     the full kernel. Consumers that only need parts of sigma (e.g. a
     per-label-column MICE round needs the label rows + the dense numeric
     block) fetch just those stripes.

For V² so large that even stripes are wasteful (hyper-sparse co-occurrence),
the right structure is sorted-COO + segment_sum over pair keys
(code_i * V_j + code_j); that variant matters only past ~10^5 categories
per column and is out of scope for the dense engine — the stripes keep the
all-reduce story intact (each stripe psums independently, overlapping the
next stripe's compute).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..schema import FeatureSchema
from .sum import DEFAULT_ROW_CHUNK, _normalize_inputs, _pad_cols, _zt_block


@functools.partial(jax.jit,
                   static_argnames=("schema", "lo", "width", "row_chunk"))
def sigma_stripe(x_num, codes, weights, *, schema: FeatureSchema, lo: int,
                 width: int, row_chunk: int = DEFAULT_ROW_CHUNK) -> jax.Array:
    """S[:, lo:lo+width] = Zᵀ diag(w) Z[:, lo:lo+width], streamed over row
    chunks. f32[P, width]."""
    x_num, codes, weights, n = _normalize_inputs(x_num, codes, weights)
    p = schema.sigma_size

    def gram(xn, cd, w):
        zt = _zt_block(xn, cd, schema)
        cols = jax.lax.slice_in_dim(zt, lo, lo + width, axis=0)
        return jax.lax.dot_general(
            zt * w[None, :], cols, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    if n <= row_chunk:
        return gram(x_num, codes, weights)

    x_num = _pad_cols(x_num, row_chunk)
    codes = _pad_cols(codes, row_chunk)
    weights = _pad_cols(weights, row_chunk)
    nc = x_num.shape[-1] // row_chunk
    xs = (x_num.reshape(x_num.shape[0], nc, row_chunk).swapaxes(0, 1),
          codes.reshape(codes.shape[0], nc, row_chunk).swapaxes(0, 1),
          weights.reshape(nc, row_chunk))

    def body(acc, chunk):
        xn, cd, w = chunk
        return acc + gram(xn, cd, w), None

    acc0 = jnp.zeros((p, width), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, xs)
    return out


def sigma_striped(x_num, codes, weights, *, schema: FeatureSchema,
                  stripe: int = 1024,
                  row_chunk: int = DEFAULT_ROW_CHUNK):
    """Yield (lo, S[:, lo:lo+w]) stripes covering the full sigma. Peak
    device memory: P × stripe f32 (plus the input scan chunk)."""
    p = schema.sigma_size
    lo = 0
    while lo < p:
        w = min(stripe, p - lo)
        yield lo, sigma_stripe(x_num, codes, weights, schema=schema, lo=lo,
                               width=w, row_chunk=row_chunk)
        lo += w
