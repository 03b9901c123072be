"""Iris MICE demo — the analogue of the reference driver
(/root/reference/main.cpp:14-81): inject 20% MCAR nulls into two continuous
columns and the categorical target, run MICE, report imputation quality.

    python examples/iris_demo.py [--mode low|baseline|high] [--iters 5]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from sklearn.datasets import load_iris

from duckdb_imputation_tpu.table import from_numpy
from duckdb_imputation_tpu.mice import (run_mice_baseline, run_mice_high,
                                        run_mice_low)
from duckdb_imputation_tpu.utils import PhaseTimer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="baseline",
                    choices=["baseline", "low", "high"])
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    x, y = load_iris(return_X_y=True)
    rng = np.random.default_rng(42)
    n = len(x)
    num = x.astype(np.float32)
    cat = y[:, None].astype(np.int64)
    num_null = np.zeros_like(num, bool)
    cat_null = np.zeros_like(cat, bool)
    # MCAR nulls, Fisher–Yates-style sampling (main.cpp:14-38)
    for j in (0, 3):
        num_null[rng.choice(n, n // 5, replace=False), j] = True
    cat_null[rng.choice(n, n // 5, replace=False), 0] = True

    t = from_numpy(num, cat, num_null, cat_null)
    timer = PhaseTimer()
    runner = {"baseline": run_mice_baseline, "low": run_mice_low,
              "high": run_mice_high}[args.mode]
    out = runner(t, iters=args.iters, timer=timer)

    print(timer.report())
    for j in (0, 3):
        m = num_null[:, j]
        rmse = float(np.sqrt(np.mean(
            (np.asarray(out.num_data)[j, m] - num[m, j]) ** 2)))
        print(f"num col {j}: imputed RMSE {rmse:.3f} "
              f"(column std {num[:, j].std():.3f})")
    m = cat_null[:, 0]
    acc = float((out.cat_values()[0, m] == cat[m, 0]).mean())
    print(f"target: imputation accuracy {acc:.3f}")


if __name__ == "__main__":
    main()
