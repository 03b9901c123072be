"""Headline benchmark: cofactor aggregation rows/s/chip (BASELINE.json
config `sum_to_triple_4_2` — 4 numeric + 2 categorical columns, WHERE-masked)
on the real chip via the lane-packed Pallas kernel, steady state.

Methodology notes (this environment):
  * jit compiles go through a remote-compile tunnel (~0.1-1s each) and every
    DISPATCH pays ~1s of RPC latency, so single-call wall timing is useless;
  * device time is measured by the SLOPE method: one jitted lax.fori_loop
    runs K dependent kernel iterations in a single dispatch (inputs varied
    on-device so nothing can be cached), timed at two K values; the slope
    is pure device time per iteration. The result is fetched to host to
    force completion.

Baseline (`vs_baseline`): the reference publishes no numbers and cannot be
built here (DuckDB 0.9.2 must be cloned from the network; this box has zero
egress — BASELINE.md). Stand-in: the same masked Gram computation as CPU
BLAS sgemm via numpy, normalized per core — a GENEROUS upper bound on the
reference's per-core scalar FMA + hash-map loop (sum_no_lift.cpp:128-214);
DuckDB-per-core is strictly slower than sgemm-per-core on this kernel.

Prints exactly ONE JSON line on stdout; detail goes to stderr.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N_ROWS = 8_386_560  # 819 blocks of 5*2048 (pack=5 for P=21)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_tpu(schema):
    import functools

    import jax
    import jax.numpy as jnp

    from duckdb_imputation_tpu.ring.kernels.sigma_pallas import (
        sigma_pallas,
        sigma_pallas_fast,
    )

    @jax.jit
    def gen(key):
        kx, kc, kw = jax.random.split(key, 3)
        x = jax.random.normal(kx, (4, N_ROWS), jnp.float32)
        c = jax.random.randint(kc, (2, N_ROWS), 0, 8, jnp.int32)
        w = (jax.random.uniform(kw, (N_ROWS,)) > 0.2).astype(jnp.float32)
        return x, c, w

    key = jax.random.PRNGKey(0)
    x, c, w = gen(key)
    jax.block_until_ready((x, c, w))
    s = sigma_pallas(x, c, w, schema=schema)
    log(f"warmup sigma N={float(np.asarray(s)[0, 0]):.0f}")

    p = schema.sigma_size

    @functools.partial(jax.jit, static_argnames=("iters", "fast"))
    def loop(x, c, w, iters: int, fast: bool = True):
        # masks are binary -> the split-precision fast kernel applies
        kern = sigma_pallas_fast if fast else sigma_pallas
        def body(i, acc):
            # vary the input per iteration so XLA cannot hoist/CSE the
            # kernel out of the loop (would fake the slope measurement)
            s = kern(x, c, w + 1e-9 * i.astype(jnp.float32), schema=schema)
            return acc + s
        return jax.lax.fori_loop(0, iters, body,
                                 jnp.zeros((p, p), jnp.float32))

    k_lo, k_hi = 8, 128
    np.asarray(loop(x, c, w, iters=k_lo))   # warm both compiles
    np.asarray(loop(x, c, w, iters=k_hi))
    t0 = time.perf_counter()
    np.asarray(loop(x, c, w, iters=k_hi))
    d_hi = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(loop(x, c, w, iters=k_lo))
    d_lo = time.perf_counter() - t0
    per = (d_hi - d_lo) / (k_hi - k_lo)
    log(f"tpu pallas slope: {per * 1e3:.3f} ms/iter "
        f"-> {N_ROWS / per / 1e9:.2f}G rows/s, "
        f"{N_ROWS * 28 / per / 1e9:.0f} GB/s effective")
    return N_ROWS / per


def bench_cpu_baseline(schema, n=1_000_000, iters=3):
    """Single-core-normalized numpy sgemm of the same computation."""
    rng = np.random.default_rng(0)
    num = rng.normal(size=(n, 4)).astype(np.float32)
    codes = rng.integers(0, 8, size=(n, 2)).astype(np.int32)
    weights = (rng.random(n) > 0.2).astype(np.float32)
    v = schema.vocab_size
    offs = schema.offsets
    t0 = time.perf_counter()
    for _ in range(iters):
        b = np.zeros((n, v), np.float32)
        for j in range(schema.cat_cols):
            b[np.arange(n), codes[:, j] + offs[j]] = 1.0
        z = np.concatenate([np.ones((n, 1), np.float32), num, b], axis=1)
        zw = z * weights[:, None]
        sigma = z.T @ zw
    dt = (time.perf_counter() - t0) / iters
    ncores = os.cpu_count() or 1
    per_core = n / (dt * ncores)
    log(f"cpu sgemm stand-in: {dt * 1e3:.1f} ms on {ncores} cores "
        f"-> {per_core / 1e6:.2f}M rows/s/core")
    return per_core


def bench_mice_round(schema, n=10_000_000):
    """Full MICE round (BASELINE config 5, single chip): masked aggregate +
    train + predict + write-back for 1 continuous and 1 categorical null
    column over n rows, via the fused single-dispatch loop."""
    import jax
    import jax.numpy as jnp

    from duckdb_imputation_tpu.mice.device_round import mice_loop_device

    key = jax.random.PRNGKey(0)

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 5)
        z0 = jax.random.normal(ks[0], (n,))
        z1 = jax.random.normal(ks[1], (n,))
        x = jnp.stack([z0, 2 * z0 + z1, z1 - z0,
                       jax.random.normal(ks[2], (n,))])
        c = jax.random.randint(ks[3], (2, n), 0, 8, jnp.int32)
        nn = jnp.zeros((4, n), bool).at[1].set(
            jax.random.uniform(ks[4], (n,)) < 0.2)
        cn = jnp.zeros((2, n), bool).at[0].set(
            jax.random.uniform(ks[0], (n,)) < 0.2)
        return x, c, nn, cn

    x, c, nn, cn = gen(key)
    jax.block_until_ready((x, c, nn, cn))

    def run(iters, xx):
        # x/codes are DONATED by the loop — hand over fresh buffers per call
        xo, co, _ = mice_loop_device(
            xx + 0.0, c + 0, nn, cn, key, schema=schema,
            num_cols_to_impute=(1,), cat_cols_to_impute=(0,),
            iters=jnp.int32(iters), gd_iters=200)
        return float(np.asarray(xo[1, :4]).sum())

    run(1, x)                                   # compile
    t0 = time.perf_counter(); run(10, x * 1.000001)
    d1 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(210, x * 1.000002)
    d2 = time.perf_counter() - t0
    per_round = (d2 - d1) / 200
    log(f"MICE round @{n} rows (1 num + 1 cat null col): "
        f"{per_round * 1e3:.1f} ms/round")
    return per_round


def main():
    from duckdb_imputation_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from duckdb_imputation_tpu import FeatureSchema
    schema = FeatureSchema(
        num_cols=4, cat_keys=(tuple(range(8)), tuple(range(8))))
    rows_per_s = bench_tpu(schema)
    base = bench_cpu_baseline(schema)
    mice_round_s = bench_mice_round(schema)
    print(json.dumps({
        "metric": "cofactor_agg_rows_per_s_per_chip (sum_to_triple_4_2 masked)",
        "value": round(rows_per_s),
        "unit": "rows/s",
        "vs_baseline": round(rows_per_s / base, 1),
        "mice_round_ms_10M_rows": round(mice_round_s * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
