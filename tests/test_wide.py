"""Wide-V sharded solve: sigma stays column-sharded through CG.

SURVEY.md §7 hard part 3 / VERDICT #6: at V≈4k on the 8-device mesh the
P×P sigma is built column-sharded (per-device block P×(P/M)) and the MICE
column step trains through the distributed-matvec CG without ever
materializing sigma on one device."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from duckdb_imputation_tpu import FeatureSchema
from duckdb_imputation_tpu.parallel.sharded2d import make_mesh_2d
from duckdb_imputation_tpu.parallel.wide import (
    cg_solve_wide,
    linreg_train_wide,
    mice_column_step_wide,
    predict_wide,
    sigma_wide,
)


def _wide_data(n=4096, vocab=2048, seed=0):
    rng = np.random.default_rng(seed)
    num = rng.normal(size=(2, n)).astype(np.float32)
    num[1] = 0.5 * num[0] + 0.1 * rng.normal(size=n).astype(np.float32)
    codes = rng.integers(0, vocab, size=(2, n)).astype(np.int32)
    w = (rng.random(n) > 0.25).astype(np.float32)
    schema = FeatureSchema(num_cols=2,
                           cat_keys=(tuple(range(vocab)),
                                     tuple(range(vocab))))
    return num, codes, w, schema


@pytest.fixture(scope="module")
def mesh2d():
    return make_mesh_2d(2, 4)


def test_sigma_wide_stays_sharded(mesh2d):
    """The production aggregate keeps sigma column-sharded over 'model':
    per-device block is P × (P_pad/M) — never the full matrix — and the
    gathered value equals the single-device masked sigma."""
    from duckdb_imputation_tpu.ring.sum import masked_sigma

    num, codes, w, schema = _wide_data(n=2048, vocab=512)
    p = schema.sigma_size
    sig = sigma_wide(num, codes, w, schema=schema, mesh=mesh2d)
    spec = sig.sharding.spec
    assert tuple(spec) == (None, "model"), spec
    shard_shapes = {s.data.shape for s in sig.addressable_shards}
    assert shard_shapes == {(p, sig.shape[1] // 4)}, shard_shapes

    ref = np.asarray(masked_sigma(num, codes, w, schema=schema))
    np.testing.assert_allclose(np.asarray(sig)[:, :p], ref,
                               rtol=1e-5, atol=1e-3)


def test_cg_matches_dense_solve(mesh2d):
    """Sharded CG == dense ridge solve of the same normal equations
    (λ > 0 pins the one-hot collinearity null space)."""
    num, codes, w, schema = _wide_data(n=4096, vocab=256)
    p = schema.sigma_size
    label = 1 + 1  # numeric col 1 in sigma index space
    ridge = 1e-2

    sig_cols = sigma_wide(num, codes, w, schema=schema, mesh=mesh2d)
    coeff = np.asarray(cg_solve_wide(sig_cols, mesh=mesh2d, label=label,
                                     p=p, ridge=ridge, iters=2000,
                                     tol=1e-9))
    assert coeff[label] == -1.0

    sigma = np.asarray(sig_cols)[:, :p].astype(np.float64)
    keep = [i for i in range(p) if i != label]
    nrows = max(sigma[0, 0], 1.0)
    a = sigma[np.ix_(keep, keep)] / nrows
    dd = np.ones(p - 1)
    dd[0] = 0.0
    a = a + ridge * np.diag(dd)
    b = sigma[keep, label] / nrows
    ref = np.linalg.solve(a, b)
    np.testing.assert_allclose(coeff[keep], ref, rtol=2e-3, atol=2e-3)


def test_wide_mice_column_step(mesh2d):
    """End-to-end wide-V MICE column step at V=4096 (P=4099): sharded
    aggregate + CG train + row-sharded predict + write-back. The imputation
    must reconstruct the linear relation x1 ≈ 0.5·x0 on the masked rows."""
    n, vocab = 8192, 2048
    num, codes, _, schema = _wide_data(n=n, vocab=vocab, seed=3)
    rng = np.random.default_rng(7)
    null = rng.random(n) < 0.2
    x = jnp.asarray(num)
    # corrupt the null entries so the step must actually impute
    x = x.at[1].set(jnp.where(jnp.asarray(null), 99.0, x[1]))

    out = mice_column_step_wide(x, jnp.asarray(codes), jnp.asarray(null),
                                schema=schema, mesh=mesh2d, label=1,
                                ridge=1e-4, iters=3000, tol=1e-10)
    got = np.asarray(out[1])[null]
    want = 0.5 * num[0][null]
    # x1 = 0.5 x0 + 0.1 ε with 4096 one-hot nuisance features: the fit
    # recovers the signal well within the noise scale
    assert np.sqrt(np.mean((got - want) ** 2)) < 0.25
    # observed rows untouched
    np.testing.assert_array_equal(np.asarray(out[1])[~null], num[1][~null])


def test_predict_wide_matches_host(mesh2d):
    """Row-sharded prediction == dense θᵀZ on the host."""
    from duckdb_imputation_tpu.ring.sum import _zt_block

    num, codes, _, schema = _wide_data(n=1000, vocab=128, seed=5)
    p = schema.sigma_size
    rng = np.random.default_rng(11)
    coeff = rng.normal(size=p).astype(np.float32)
    coeff[2] = -1.0
    got = np.asarray(predict_wide(jnp.asarray(num), jnp.asarray(codes),
                                  jnp.asarray(coeff), schema=schema,
                                  mesh=mesh2d, label=1))
    zt = np.asarray(_zt_block(jnp.asarray(num), jnp.asarray(codes), schema))
    theta = coeff.copy()
    theta[2] = 0.0
    np.testing.assert_allclose(got, theta @ zt, rtol=1e-4, atol=1e-4)
