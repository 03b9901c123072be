"""On-hardware validation suite — run on a real TPU chip.

The pytest suite (tests/) pins JAX to a virtual 8-device CPU mesh so it can
exercise sharding without hardware, and runs Pallas kernels in interpret
mode. This script is the complement: it drives the COMPILED Mosaic kernels
on the real chip and cross-checks them against the XLA reference path and
each other. Run: `python tpu_checks.py` (~2-4 min incl. remote compiles).

Checks:
  1. v3 / v2 / f32-HIGHEST kernel parity vs masked_sigma across schemas
     (incl. out-of-vocab codes, shared bins, cat-only, numeric-only);
     counts must be EXACT, x-sums within split-precision tolerance.
  2. grouped kernels (unsorted v3, presorted v3 via the public dispatch)
     vs the masked per-group path on 90%-skewed labels.
  3. fused impute+aggregate MICE loop vs the unfused loop on
     signal-bearing data: imputed codes identical, numerics ~1e-4.
  4. the fused kernel through the SHARDED loop (1-device mesh):
     bit-identical to the single-device fused loop, deterministic and
     stochastic (global-block-keyed noise stream).
  5. end-to-end rmse smoke (the /verify recipe).

Prints one JSON line: {"ok": true, "checks": N} or raises.
"""
from __future__ import annotations

import json
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def check_kernel_parity():
    import jax.numpy as jnp

    from duckdb_imputation_tpu import FeatureSchema
    from duckdb_imputation_tpu.ring.kernels.sigma_pallas import (
        _sizing_fast3,
        sigma_pallas_fast2_padded,
        sigma_pallas_fast3_padded,
        sigma_pallas_fast_padded,
        sigma_pallas_padded,
    )
    from duckdb_imputation_tpu.ring.sum import masked_sigma

    rng = np.random.default_rng(5)
    configs = [
        ("headline", 4, (8, 8)),
        ("numeric", 4, ()),
        ("catonly", 0, (8, 8)),
        ("shared-bins", 1, (3, 3, 4)),
        ("mixed", 2, (5, 12)),
    ]
    n = 50_000
    count = 0
    for name, d, vocabs in configs:
        schema = FeatureSchema(
            num_cols=d,
            cat_keys=tuple(tuple(range(v)) for v in vocabs))
        num = rng.normal(size=(d, n)).astype(np.float32)
        codes = (np.stack([rng.integers(0, v, size=n) for v in vocabs])
                 .astype(np.int32) if vocabs
                 else np.zeros((0, n), np.int32))
        if vocabs:
            codes[0, :500] = vocabs[0]     # encode() miss convention
            codes[-1, 500:900] = -1
        w = (rng.random(n) > 0.3).astype(np.float32)
        ref = np.asarray(masked_sigma(num, codes, w, schema=schema))
        kernels = {"v3": sigma_pallas_fast3_padded,
                   "dispatch": sigma_pallas_fast_padded,
                   "f32": sigma_pallas_padded}
        if d:  # v2 requires at least the ones row section; always fine
            kernels["v2"] = sigma_pallas_fast2_padded
        for kname, fn in kernels.items():
            got = np.asarray(fn(jnp.asarray(num), jnp.asarray(codes),
                                jnp.asarray(w), schema=schema))
            assert got[0, 0] == ref[0, 0], (name, kname)
            np.testing.assert_array_equal(got[0, 1 + d:], ref[0, 1 + d:],
                                          err_msg=f"{name}/{kname}")
            np.testing.assert_allclose(got, ref, rtol=2e-4, atol=0.5,
                                       err_msg=f"{name}/{kname}")
            count += 1
        log(f"kernel parity {name}: OK "
            f"(v3 pack={_sizing_fast3(schema)[3]})")
    return count


def check_grouped():
    import jax
    import jax.numpy as jnp

    from duckdb_imputation_tpu import FeatureSchema
    from duckdb_imputation_tpu.ring.kernels.sigma_pallas_grouped import (
        sort_by_group,
        sum_to_triple_grouped_presorted,
        sum_to_triple_grouped_unsorted,
    )
    from duckdb_imputation_tpu.ring.sum import sum_to_triple_grouped

    schema = FeatureSchema(num_cols=4,
                           cat_keys=(tuple(range(8)), tuple(range(8))))
    groups = 8
    n = 200_000
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (4, n), jnp.float32)
    c = jax.random.randint(ks[1], (2, n), 0, 8, jnp.int32)
    hot = jax.random.uniform(ks[2], (n,)) < 0.9
    g = jnp.where(hot, 0,
                  jax.random.randint(ks[3], (n,), 1, groups)).astype(
                      jnp.int32)
    ref = sum_to_triple_grouped(x, c, g, schema=schema, num_groups=groups,
                                method="masked")
    uns = sum_to_triple_grouped_unsorted(x, c, g, schema=schema,
                                         num_groups=groups, fast=True)
    x_s, c_s, w_s, layout = sort_by_group(x, c, g, schema=schema,
                                          num_groups=groups, fast=True)
    pre = sum_to_triple_grouped_presorted(x_s, c_s, w_s, layout,
                                          schema=schema)
    count = 0
    for tag, got in (("unsorted-v3", uns), ("presorted-v3", pre)):
        np.testing.assert_array_equal(np.asarray(ref.n), np.asarray(got.n))
        np.testing.assert_array_equal(np.asarray(ref.lin_cat),
                                      np.asarray(got.lin_cat))
        np.testing.assert_array_equal(np.asarray(ref.cat_cat),
                                      np.asarray(got.cat_cat))
        np.testing.assert_allclose(np.asarray(ref.quad),
                                   np.asarray(got.quad),
                                   rtol=2e-4, atol=0.5)
        log(f"grouped {tag}: OK")
        count += 1
    return count


def check_fused_mice():
    import jax
    import jax.numpy as jnp

    from duckdb_imputation_tpu import FeatureSchema
    from duckdb_imputation_tpu.mice.device_round import (
        mice_loop_device,
        mice_loop_device_fused,
    )

    schema = FeatureSchema(num_cols=4,
                           cat_keys=(tuple(range(8)), tuple(range(8))))
    n = 200_000
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    z0 = jax.random.normal(ks[0], (n,))
    z1 = jax.random.normal(ks[1], (n,))
    x = jnp.stack([z0, 2 * z0 + z1, z1 - z0,
                   jax.random.normal(ks[2], (n,))])
    # cat col 0 depends on z0 (predictable — argmax not a coin flip)
    c0 = jnp.clip(z0 + 4.0, 0, 7).astype(jnp.int32)
    c = jnp.stack([c0,
                   jax.random.randint(ks[3], (n,), 0, 8)]).astype(jnp.int32)
    nn = jnp.zeros((4, n), bool).at[1].set(
        jax.random.uniform(ks[4], (n,)) < 0.2)
    cn = jnp.zeros((2, n), bool).at[0].set(
        jax.random.uniform(ks[0], (n,)) < 0.2)
    kw = dict(schema=schema, num_cols_to_impute=(1,),
              cat_cols_to_impute=(0,), iters=jnp.int32(3))
    xu, cu, _ = mice_loop_device(x + 0.0, c + 0, nn, cn, key,
                                 kernel="pallas_fast", **kw)
    xf, cf = mice_loop_device_fused(x + 0.0, c + 0, nn, cn, **kw)
    m = np.asarray(cn[0])
    agree = float((np.asarray(cf)[0][m] == np.asarray(cu)[0][m]).mean())
    xdiff = float(np.abs(np.asarray(xf)[1] - np.asarray(xu)[1]).max())
    assert agree > 0.999, agree
    assert xdiff < 1e-2, xdiff
    log(f"fused vs unfused MICE: OK (code agreement {agree:.4f}, "
        f"x maxdiff {xdiff:.2e})")
    return 1


def check_fused_noise():
    """Stochastic-regression noise drawn in-kernel (Box-Muller from the
    Pallas PRNG): N(0, std) moments, per-seed determinism, seed
    sensitivity. Interpret mode cannot test this (its prng_random_bits is
    constant), so it lives here."""
    import jax
    import jax.numpy as jnp

    from duckdb_imputation_tpu import FeatureSchema
    from duckdb_imputation_tpu.mice.device_round import \
        mice_loop_device_fused

    schema = FeatureSchema(num_cols=4,
                           cat_keys=(tuple(range(8)), tuple(range(8))))
    n = 200_000
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    z0 = jax.random.normal(ks[0], (n,))
    eps = jax.random.normal(ks[5], (n,))
    x = jnp.stack([z0, 2 * z0 + 0.5 * eps,
                   jax.random.normal(ks[1], (n,)),
                   jax.random.normal(ks[2], (n,))])
    c0 = jnp.clip(z0 + 4.0, 0, 7).astype(jnp.int32)
    c = jnp.stack([c0, jax.random.randint(ks[3], (n,), 0, 8)]).astype(
        jnp.int32)
    nn = jnp.zeros((4, n), bool).at[1].set(
        jax.random.uniform(ks[4], (n,)) < 0.2)
    cn = jnp.zeros((2, n), bool).at[0].set(
        jax.random.uniform(ks[0], (n,)) < 0.2)
    kw = dict(schema=schema, num_cols_to_impute=(1,),
              cat_cols_to_impute=(0,), iters=jnp.int32(2))
    xn, _ = mice_loop_device_fused(x + 0.0, c + 0, nn, cn, **kw)
    xa, _ = mice_loop_device_fused(x + 0.0, c + 0, nn, cn, key,
                                   noise=True, **kw)
    xb, _ = mice_loop_device_fused(x + 0.0, c + 0, nn, cn, key,
                                   noise=True, **kw)
    xc, _ = mice_loop_device_fused(x + 0.0, c + 0, nn, cn,
                                   jax.random.PRNGKey(7), noise=True, **kw)
    xn, xa, xb, xc = map(np.asarray, (xn, xa, xb, xc))
    m = np.asarray(nn[1])
    assert np.array_equal(xa, xb), "same-seed determinism broken"
    assert not np.array_equal(xa[1][m], xc[1][m]), "seed has no effect"
    d = xa[1][m] - xn[1][m]            # pure noise draws, same solve path
    z = d / max(d.std(), 1e-9)
    # residual std of the x1 model is ~0.5 (x1 = 2 x0 + 0.5 eps)
    assert 0.4 < d.std() < 0.6, d.std()
    assert abs(d.mean()) < 0.01, d.mean()
    assert abs(float((z ** 3).mean())) < 0.1
    assert abs(float((z ** 4).mean()) - 3.0) < 0.2
    log(f"fused in-kernel noise: OK (std {d.std():.3f}, "
        f"skew {float((z ** 3).mean()):.3f}, "
        f"kurt {float((z ** 4).mean()):.3f})")
    return 1


def check_e2e_rmse():
    from duckdb_imputation_tpu.mice import run_mice_baseline
    from duckdb_imputation_tpu.table import from_numpy

    rng = np.random.default_rng(0)
    n = 50_000
    z = rng.normal(size=(n, 2))
    num = np.stack([z[:, 0], 2 * z[:, 0] + z[:, 1], z[:, 1] - z[:, 0],
                    rng.normal(size=n)], 1).astype(np.float32)
    cat = ((z[:, 0] > 0).astype(int) * 3 + 4)[:, None]
    nn = np.zeros_like(num, bool)
    cn = np.zeros_like(cat, bool)
    nn[rng.choice(n, n // 5, False), 1] = True
    cn[rng.choice(n, n // 5, False), 0] = True
    t = from_numpy(num, cat, nn, cn)
    out = run_mice_baseline(t, iters=2, linreg_iters=500, noise=False)
    rmse = float(np.sqrt(np.mean(
        (np.asarray(out.num_data)[1, nn[:, 1]] - num[nn[:, 1], 1]) ** 2)))
    assert rmse < 0.05, rmse
    log(f"e2e MICE rmse: OK ({rmse:.2e})")
    return 1


def check_sharded_fused():
    """The fused production kernel through the SHARDED loop on hardware
    (1-device mesh — multi-chip isn't available here; the 8-shard case is
    covered by the interpret-mode pytest + the 2-process worker): must be
    BIT-identical to the single-device fused loop, deterministic AND
    stochastic — the global-block-keyed noise stream makes the two paths
    byte-equal at equal padded row counts."""
    import jax
    from jax.sharding import Mesh

    from duckdb_imputation_tpu.mice.device_round import run_mice_device
    from duckdb_imputation_tpu.mice.sharded_round import run_mice_sharded
    from duckdb_imputation_tpu.table import from_numpy

    rng = np.random.default_rng(11)
    n = 300_000
    z = rng.normal(size=(n, 2))
    num = np.stack([z[:, 0], 2 * z[:, 0] + z[:, 1], z[:, 1] - z[:, 0],
                    rng.normal(size=n)], 1).astype(np.float32)
    cat = ((z[:, 0] > 0).astype(int) * 3 + 4)[:, None]
    nn = np.zeros_like(num, bool)
    cn = np.zeros_like(cat, bool)
    nn[rng.choice(n, n // 5, False), 1] = True
    cn[rng.choice(n, n // 5, False), 0] = True
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))

    for noise in (False, True):
        out_s = run_mice_sharded(from_numpy(num, cat, nn, cn), iters=2,
                                 mesh=mesh, kernel="pallas_fused",
                                 noise=noise, seed=5)
        out_d = run_mice_device(from_numpy(num, cat, nn, cn), iters=2,
                                kernel="pallas_fused", noise=noise, seed=5)
        np.testing.assert_array_equal(np.asarray(out_s.num_data),
                                      np.asarray(out_d.num_data))
        np.testing.assert_array_equal(np.asarray(out_s.cat_codes),
                                      np.asarray(out_d.cat_codes))
        rmse = float(np.sqrt(np.mean(
            (np.asarray(out_s.num_data)[1, nn[:, 1]]
             - num[nn[:, 1], 1]) ** 2)))
        assert rmse < (0.2 if noise else 0.05), (noise, rmse)
        log(f"sharded fused (noise={noise}): bit-identical to the "
            f"single-device fused loop, rmse {rmse:.2e}")
    return 2


def main():
    from duckdb_imputation_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    import jax
    assert jax.default_backend() not in ("cpu",), (
        "tpu_checks.py validates compiled Mosaic kernels — run it on the "
        "TPU (the pytest suite covers the CPU/interpret side)")
    checks = 0
    checks += check_kernel_parity()
    checks += check_grouped()
    checks += check_fused_mice()
    checks += check_fused_noise()
    checks += check_sharded_fused()
    checks += check_e2e_rmse()
    print(json.dumps({"ok": True, "checks": checks}))


if __name__ == "__main__":
    main()
