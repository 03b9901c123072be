"""CLI smoke: CSV in -> imputed CSV out (the reference main.cpp role)."""
import subprocess
import sys


def test_cli_impute_roundtrip(tmp_path):
    import numpy as np
    rng = np.random.default_rng(0)
    n = 400
    z = rng.normal(size=n)
    a = z.astype(np.float32)
    b = (2 * z + 0.01 * rng.normal(size=n)).astype(np.float32)
    c = (z > 0).astype(int)
    null = np.zeros(n, bool)
    null[rng.choice(n, n // 5, replace=False)] = True
    src = tmp_path / "in.csv"
    with open(src, "w") as f:
        f.write("a,b,c\n")
        for i in range(n):
            bv = "" if null[i] else f"{b[i]:.6g}"
            f.write(f"{a[i]:.6g},{bv},{c[i]}\n")
    out = tmp_path / "out.csv"
    # subprocess so the CLI's own platform/jit setup is exercised; force
    # CPU via conftest-equivalent env (axon pin ignores env, but the CLI
    # must work under whatever backend is present — keep rows small)
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; from duckdb_imputation_tpu.cli import main;"
         f"sys.argv=['cli','impute',{str(src)!r},'--out',{str(out)!r},"
         "'--mode','baseline','--iters','2','--no-noise'];main()"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = open(out).read().strip().splitlines()
    assert lines[0].split(",")[:2] == ["a", "b"]
    assert len(lines) == n + 1
    got_b = np.asarray([float(l.split(",")[1]) for l in lines[1:]])
    rmse = float(np.sqrt(np.mean((got_b[null] - b[null]) ** 2)))
    assert rmse < 0.2, rmse
