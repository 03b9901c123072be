"""Command-line interface: CSV in → imputed CSV out, plus the benchmark
configs (the driver role of the reference's main.cpp / examples).

    python -m duckdb_imputation_tpu.cli impute data.csv --out imputed.csv \
        --mode low --iters 5
    python -m duckdb_imputation_tpu.cli bench --config sum_to_triple_4_0
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def cmd_impute(args):
    from .table.native import read_csv
    from .mice import run_mice_baseline, run_mice_high, run_mice_low
    from .utils.profiling import PhaseTimer

    if args.mode == "stream":
        from .mice.streaming import impute_csv_stream
        timer = PhaseTimer(verbose=args.verbose)
        res = impute_csv_stream(
            args.csv, args.out, iters=args.iters, noise=not args.no_noise,
            linreg_iters=args.linreg_iters, timer=timer,
            block_bytes=args.block_mb << 20)
        print(timer.report(), file=sys.stderr)
        print(f"wrote {args.out} ({res.ss.n_rows} rows, "
              f"{len(res.idx)} dirty)", file=sys.stderr)
        return

    t = read_csv(args.csv)
    timer = PhaseTimer(verbose=args.verbose)
    runner = {"baseline": run_mice_baseline, "low": run_mice_low,
              "high": run_mice_high}[args.mode]
    out = runner(t, iters=args.iters, noise=not args.no_noise, timer=timer,
                 linreg_iters=args.linreg_iters)
    print(timer.report(), file=sys.stderr)

    num = np.asarray(out.num_data)
    cat = out.cat_values()
    names = list(out.num_names) + list(out.cat_names)
    with open(args.out, "w") as f:
        f.write(",".join(names) + "\n")
        for i in range(out.n_rows):
            row = [f"{num[j, i]:.7g}" for j in range(num.shape[0])]
            row += [str(int(cat[j, i])) for j in range(cat.shape[0])]
            f.write(",".join(row) + "\n")
    print(f"wrote {args.out} ({out.n_rows} rows)", file=sys.stderr)


def cmd_bench(args):
    """The BASELINE.json configs (BASELINE.md)."""
    import time

    import jax
    import jax.numpy as jnp

    from . import FeatureSchema
    from .ring.kernels.sigma_pallas import sigma_pallas
    from .ring.sum import masked_sigma, sum_to_nb_agg_grouped

    rng = np.random.default_rng(0)
    results = {}

    def slope_time(loop_fn, lo=8, hi=64):
        np.asarray(loop_fn(lo))
        np.asarray(loop_fn(hi))
        t0 = time.perf_counter(); np.asarray(loop_fn(hi)); d2 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(loop_fn(lo)); d1 = time.perf_counter() - t0
        return (d2 - d1) / (hi - lo)

    if args.config in ("sum_to_triple_4_0", "all"):
        n = 1_048_576 * 4
        schema = FeatureSchema(num_cols=4)
        x = jax.device_put(rng.normal(size=(4, n)).astype(np.float32))
        import functools

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(iters: int):
            def body(i, acc):
                s = masked_sigma(x * (1 + 1e-9 * i), None, None,
                                 schema=schema)
                return acc + s
            return jax.lax.fori_loop(0, iters, body,
                                     jnp.zeros((5, 5), jnp.float32))
        per = slope_time(loop)
        results["sum_to_triple_4_0@4M"] = {"ms": per * 1e3,
                                           "rows_per_s": n / per}

    if args.config in ("nb_grouped", "all"):
        n = 1_048_576 * 8
        schema = FeatureSchema(
            num_cols=8, cat_keys=tuple(tuple(range(16)) for _ in range(4)))
        x = jax.device_put(rng.normal(size=(8, n)).astype(np.float32))
        c = jax.device_put(rng.integers(0, 16, size=(4, n)).astype(np.int32))
        g = jax.device_put(rng.integers(0, 8, size=(n,)).astype(np.int32))
        import functools

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(iters: int):
            def body(i, acc):
                agg = sum_to_nb_agg_grouped(
                    x * (1 + 1e-9 * i), c, g, schema=schema, num_groups=8)
                return acc + agg.n.sum()
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        per = slope_time(loop, 4, 16)
        results["sum_to_nb_agg_8_4_grouped@8M"] = {
            "ms": per * 1e3, "rows_per_s": n / per}

    if args.config in ("sum_to_triple_4_2", "all"):
        n = 5 * 2048 * 819
        schema = FeatureSchema(
            num_cols=4, cat_keys=(tuple(range(8)), tuple(range(8))))
        x = jax.device_put(rng.normal(size=(4, n)).astype(np.float32))
        c = jax.device_put(rng.integers(0, 8, size=(2, n)).astype(np.int32))
        w = jax.device_put((rng.random(n) > 0.2).astype(np.float32))
        import functools

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(iters: int):
            def body(i, acc):
                s = sigma_pallas(x, c, w + 1e-9 * i, schema=schema)
                return acc + s
            return jax.lax.fori_loop(0, iters, body,
                                     jnp.zeros((21, 21), jnp.float32))
        per = slope_time(loop)
        results["sum_to_triple_4_2_masked@8.4M"] = {
            "ms": per * 1e3, "rows_per_s": n / per}

    print(json.dumps(results, indent=2))


def main(argv=None):
    from .config import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser(prog="duckdb_imputation_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("impute", help="MICE-impute a CSV")
    p.add_argument("csv")
    p.add_argument("--out", default="imputed.csv")
    p.add_argument("--mode", choices=["baseline", "low", "high", "stream"],
                   default="low",
                   help="stream = out-of-core: chunked two-pass streaming "
                        "aggregation + delta rounds over the dirty cache; "
                        "the file is never resident")
    p.add_argument("--block-mb", type=int, default=64,
                   help="streamed block size (stream mode)")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--linreg-iters", type=int, default=10000)
    p.add_argument("--no-noise", action="store_true",
                   help="deterministic regression imputation")
    p.add_argument("--verbose", action="store_true")
    p.set_defaults(fn=cmd_impute)

    p = sub.add_parser("bench", help="run benchmark configs")
    p.add_argument("--config", default="all",
                   choices=["all", "sum_to_triple_4_0", "sum_to_triple_4_2",
                            "nb_grouped"])
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
