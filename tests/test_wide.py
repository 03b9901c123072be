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


def test_lda_wide_matches_dense(mesh2d):
    """Sharded-operator LDA == the dense trainer (models.lda_train →
    LDAParams) at narrow V: same pooled covariance, shrinkage, class sums
    and intercepts, solved by CG on the distributed matvec instead of a
    materialized m×m lstsq."""
    from duckdb_imputation_tpu.models.lda import LDAParams, lda_train
    from duckdb_imputation_tpu.parallel.wide import lda_solve_wide
    from duckdb_imputation_tpu.ring.sum import sum_to_triple

    rng = np.random.default_rng(21)
    n = 4096
    cls = rng.integers(0, 3, size=n)
    num = np.stack([cls - 1.0 + 0.4 * rng.normal(size=n),
                    rng.normal(size=n)]).astype(np.float32)
    codes = np.stack([cls,
                      rng.integers(0, 13, size=n)]).astype(np.int32)
    w = (rng.random(n) > 0.25).astype(np.float32)
    schema = FeatureSchema(num_cols=2,
                           cat_keys=(tuple(range(3)), tuple(range(13))))
    label, shrink = 0, 1e-3
    p, d = schema.sigma_size, schema.num_cols

    triple = sum_to_triple(num, codes, w, schema=schema)
    params = LDAParams.decode(
        np.asarray(lda_train(triple, schema, label=label,
                             shrinkage=shrink)),
        num_cols=d, normalize=False)

    sig_cols = sigma_wide(num, codes, w, schema=schema, mesh=mesh2d)
    wv, icpt = lda_solve_wide(sig_cols, mesh=mesh2d, schema=schema,
                              label=label, shrinkage=shrink, iters=3000,
                              tol=1e-10)
    wv, icpt = np.asarray(wv), np.asarray(icpt)

    offs = schema.offsets
    lab_lo = 1 + d + offs[label]
    active = [i for i in range(1, p)
              if not (lab_lo <= i < lab_lo + 3)]
    # dense coef rows are [num cols..., kept vocab slots...] — exactly the
    # ascending active sigma indices
    np.testing.assert_allclose(wv[active], params.coef, rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(icpt, params.intercept, rtol=2e-3,
                               atol=2e-3)
    # label-block and intercept rows never contribute
    assert np.all(wv[0] == 0) and np.all(wv[lab_lo:lab_lo + 3] == 0)


def test_run_mice_wide_matches_dense(mesh2d):
    """Mixed-table wide-V MICE == a dense twin of the identical schedule
    (mean/mode init, LDA cat step via models.lda, ridge num step via a
    dense solve) at narrow V: codes equal, numerics close."""
    from duckdb_imputation_tpu.models.lda import lda_train, lda_predict
    from duckdb_imputation_tpu.parallel.wide import run_mice_wide
    from duckdb_imputation_tpu.ring.sum import (_zt_block, masked_sigma,
                                                sum_to_triple)

    rng = np.random.default_rng(33)
    n = 4096
    cls = rng.integers(0, 3, size=n)
    z = rng.normal(size=n)
    num = np.stack([cls - 1.0 + 0.3 * z,
                    0.7 * (cls - 1.0) + 0.2 * rng.normal(size=n)]
                   ).astype(np.float32)
    codes = np.stack([cls, rng.integers(0, 11, size=n)]).astype(np.int32)
    schema = FeatureSchema(num_cols=2,
                           cat_keys=(tuple(range(3)), tuple(range(11))))
    num_null = np.zeros((2, n), bool)
    cat_null = np.zeros((2, n), bool)
    num_null[1, rng.random(n) < 0.2] = True
    cat_null[0, rng.random(n) < 0.2] = True
    ridge, shrink, iters = 1e-3, 1e-3, 2

    xw, cw = run_mice_wide(num, codes, num_null, cat_null, schema=schema,
                           mesh=mesh2d, iters=iters, ridge=ridge,
                           shrinkage=shrink, cg_iters=4000, tol=1e-11)
    xw, cw = np.asarray(xw), np.asarray(cw)

    # ---- dense twin of the same schedule ----
    x = num.copy()
    c = codes.copy()
    obs = ~num_null[1]
    x[1] = np.where(num_null[1], x[1][obs].mean(), x[1])
    hist = np.bincount(c[0][~cat_null[0]], minlength=3)
    c[0] = np.where(cat_null[0], np.argmax(hist), c[0])
    p = schema.sigma_size
    for _ in range(iters):
        w = (~cat_null[0]).astype(np.float32)
        triple = sum_to_triple(x, c, w, schema=schema)
        params = lda_train(triple, schema, label=0, shrinkage=shrink)
        idx = np.asarray(lda_predict(np.asarray(params), x, c[1:2]))
        c[0] = np.where(cat_null[0], idx, c[0])

        w = (~num_null[1]).astype(np.float32)
        sigma = np.asarray(masked_sigma(x, c, w, schema=schema), np.float64)
        lab = 1 + 1
        keep = [i for i in range(p) if i != lab]
        nr = max(sigma[0, 0], 1.0)
        dd = np.ones(p - 1)
        dd[0] = 0.0
        a = sigma[np.ix_(keep, keep)] / nr + ridge * np.diag(dd)
        b = sigma[keep, lab] / nr
        th = np.linalg.solve(a, b)
        coeff = np.zeros(p, np.float32)
        coeff[keep] = th
        zt = np.asarray(_zt_block(jnp.asarray(x), jnp.asarray(c), schema))
        preds = coeff @ zt
        x[1] = np.where(num_null[1], preds, x[1])

    np.testing.assert_array_equal(cw, c)
    np.testing.assert_allclose(xw, x, rtol=5e-3, atol=5e-3)


def test_wide_mice_cat_step_4k(mesh2d):
    """Categorical wide-V step at P=4099 (label C=3 + a 4093-wide nuisance
    vocab): sharded LDA recovers the class of the masked rows from the
    numeric signal; sigma never materializes beyond P×(P_pad/M) per
    device."""
    from duckdb_imputation_tpu.parallel.wide import mice_cat_step_wide

    rng = np.random.default_rng(17)
    n, vbig = 2048, 4093
    cls = rng.integers(0, 3, size=n)
    num = np.stack([cls * 2.0 + 0.3 * rng.normal(size=n),
                    rng.normal(size=n)]).astype(np.float32)
    codes = np.stack([cls, rng.integers(0, vbig, size=n)]).astype(np.int32)
    schema = FeatureSchema(num_cols=2,
                           cat_keys=(tuple(range(3)), tuple(range(vbig))))
    null = rng.random(n) < 0.2
    corrupted = codes.copy()
    corrupted[0] = np.where(null, (cls + 1) % 3, cls)   # wrong where null

    out = mice_cat_step_wide(jnp.asarray(num), jnp.asarray(corrupted),
                             jnp.asarray(null), schema=schema, mesh=mesh2d,
                             label=0, shrinkage=1e-3, iters=800, tol=1e-8)
    got = np.asarray(out[0])
    assert (got[null] == cls[null]).mean() > 0.95
    np.testing.assert_array_equal(got[~null], cls[~null])


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


def test_sigma_wide_16k_per_device_memory(mesh2d):
    """V = 16,384 (P = 16,387 — the dense sigma alone is 1.07 GB f32):
    the wide aggregate must hold only P × (P_pad/M) per device, OBSERVED
    from the actual shard buffers (round-4 verdict ask #5 — the memory
    claim was previously asserted by construction, never measured). The
    dense-sigma bound being escaped is ML/utils.cpp:176-310's single
    malloc'd matrix."""
    n = 512
    vocab = 8192                      # 2 cat cols -> V = 16,384
    rng = np.random.default_rng(2)
    num = rng.normal(size=(2, n)).astype(np.float32)
    codes = rng.integers(0, vocab, size=(2, n)).astype(np.int32)
    w = np.ones(n, np.float32)
    schema = FeatureSchema(num_cols=2,
                           cat_keys=(tuple(range(vocab)),
                                     tuple(range(vocab))))
    p = schema.sigma_size
    assert p > 16_000
    sig = sigma_wide(num, codes, w, schema=schema, mesh=mesh2d)
    m = mesh2d.shape["model"]
    per_dev_cols = sig.shape[1] // m
    full_bytes = p * p * 4
    for s in sig.addressable_shards:
        assert s.data.shape == (p, per_dev_cols)
        assert s.data.nbytes * m < full_bytes * 1.01 + 4 * p * m
        assert s.data.nbytes <= full_bytes // m + 4 * p * per_dev_cols
    # correctness spots: N on the ones diagonal; every one-hot col sums
    # to its count row
    sig_np = np.asarray(sig)[:, :p]
    assert sig_np[0, 0] == n
    np.testing.assert_allclose(sig_np[1 + 2:, 0].sum(), 2 * n, rtol=1e-6)


def test_striped_single_device_16k():
    """The single-device stripe path at V = 16,384: S[:, stripe] blocks
    agree with the wide sharded aggregate, memory bounded by P × width
    (ring/striped.py — escape hatch 2)."""
    from duckdb_imputation_tpu.ring.striped import sigma_stripe

    n = 512
    vocab = 8192
    rng = np.random.default_rng(3)
    num = rng.normal(size=(2, n)).astype(np.float32)
    codes = rng.integers(0, vocab, size=(2, n)).astype(np.int32)
    w = np.ones(n, np.float32)
    schema = FeatureSchema(num_cols=2,
                           cat_keys=(tuple(range(vocab)),
                                     tuple(range(vocab))))
    p = schema.sigma_size
    width = 256
    s0 = np.asarray(sigma_stripe(num, codes, w, schema=schema, lo=0,
                                 width=width, row_chunk=256))
    assert s0.shape == (p, width)
    assert s0[0, 0] == n
    # the numeric block of the stripe matches the dense masked sigma
    from duckdb_imputation_tpu.ring.sum import masked_sigma
    small = FeatureSchema(num_cols=2)
    ref = np.asarray(masked_sigma(num, None, w, schema=small))
    np.testing.assert_allclose(s0[:3, :3], ref, rtol=1e-5, atol=1e-3)
