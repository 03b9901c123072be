"""Pallas kernel semantics tests (interpret mode on the CPU mesh)."""
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from duckdb_imputation_tpu import FeatureSchema
from duckdb_imputation_tpu.ring.sum import masked_sigma


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    n = 5 * 2048 * 2
    num = rng.normal(size=(4, n)).astype(np.float32)
    codes = rng.integers(0, 8, size=(2, n)).astype(np.int32)
    w = (rng.random(n) > 0.3).astype(np.float32)
    schema = FeatureSchema(num_cols=4,
                           cat_keys=(tuple(range(8)), tuple(range(8))))
    return num, codes, w, schema


def test_sigma_pallas_interpret(data):
    from duckdb_imputation_tpu.ring.kernels.sigma_pallas import (
        sigma_pallas_padded,
    )
    num, codes, w, schema = data
    ref = np.asarray(masked_sigma(num, codes, w, schema=schema))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sigma_pallas_padded(num, codes, w, schema=schema))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-2)
    assert got[0, 0] == w.sum()


def test_sigma_pallas_fast_interpret(data):
    """Split-precision kernel: binary-mask semantics equal to the f32 path
    within f32-accumulation tolerance."""
    from duckdb_imputation_tpu.ring.kernels.sigma_pallas import (
        sigma_pallas_fast_padded,
    )
    num, codes, w, schema = data
    ref = np.asarray(masked_sigma(num, codes, w, schema=schema))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sigma_pallas_fast_padded(num, codes, w,
                                                  schema=schema))
    # counts exact
    assert got[0, 0] == ref[0, 0]
    np.testing.assert_array_equal(got[0, 5:], ref[0, 5:])  # lin_cat counts
    # x-involving sums within split tolerance
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=0.3)


def test_sigma_pallas_fast_odd_sizes():
    """Non-multiple row count + 1 numeric + 3 cat columns (different pack)."""
    from duckdb_imputation_tpu.ring.kernels.sigma_pallas import (
        sigma_pallas_fast_padded,
    )
    rng = np.random.default_rng(6)
    n = 12_345
    num = rng.normal(size=(1, n)).astype(np.float32)
    codes = rng.integers(0, 3, size=(3, n)).astype(np.int32)
    w = (rng.random(n) > 0.5).astype(np.float32)
    schema = FeatureSchema(num_cols=1, cat_keys=((0, 1, 2),) * 3)
    ref = np.asarray(masked_sigma(num, codes, w, schema=schema))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sigma_pallas_fast_padded(num, codes, w,
                                                  schema=schema))
    assert got[0, 0] == ref[0, 0]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=0.3)


def test_sigma_pallas_fast2_oov_codes(data):
    """v2 kernel: out-of-vocab codes (encode() maps misses to size_j) and
    negative codes contribute nothing — they must not alias the next
    column's first category (the v2 build compares offs+code directly)."""
    from duckdb_imputation_tpu.ring.kernels.sigma_pallas import (
        sigma_pallas_fast2_padded,
    )
    num, codes, w, schema = data
    codes = codes.copy()
    codes[0, :500] = 8    # = size_0: encode() miss convention
    codes[1, 500:900] = -1
    ref = np.asarray(masked_sigma(num, codes, w, schema=schema))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sigma_pallas_fast2_padded(num, codes, w,
                                                   schema=schema,
                                                   chunk_cols=2048))
    assert got[0, 0] == ref[0, 0]
    np.testing.assert_array_equal(got[0, 5:], ref[0, 5:])
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=0.3)


def test_sigma_pallas_fast3_interpret(data):
    """v3 compact-packed kernel (shared ones-tail, hi‖lo merged section):
    counts exact, x-sums within split-precision tolerance; OOV and
    negative codes contribute nothing."""
    from duckdb_imputation_tpu.ring.kernels.sigma_pallas import (
        _sizing_fast3,
        sigma_pallas_fast3_padded,
    )
    num, codes, w, schema = data
    assert _sizing_fast3(schema)[3] == 5    # pack 5 vs v2's 4
    codes = codes.copy()
    codes[0, :500] = 8    # = size_0: encode() miss convention
    codes[1, 500:900] = -1
    n = 6000
    num, codes, w = num[:, :n], codes[:, :n], w[:n]
    ref = np.asarray(masked_sigma(num, codes, w, schema=schema))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sigma_pallas_fast3_padded(num, codes, w,
                                                   schema=schema,
                                                   chunk_cols=512))
    assert got[0, 0] == ref[0, 0]
    np.testing.assert_array_equal(got[0, 5:], ref[0, 5:])   # lin_cat counts
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=0.3)


def test_sigma_pallas_fast3_shared_bins():
    """v3 bin packing: two vocab-3 columns share one 8-row bin (guarded
    compares), a vocab-4 column gets its own; OOV codes must not alias a
    bin-mate's categories."""
    from duckdb_imputation_tpu.ring.kernels.sigma_pallas import (
        _sizing_fast3,
        sigma_pallas_fast3_padded,
    )
    rng = np.random.default_rng(7)
    n = 5000
    schema = FeatureSchema(num_cols=1, cat_keys=((0, 1, 2), (0, 1, 2),
                                                 (0, 1, 2, 3)))
    nseg, bins = _sizing_fast3(schema)[:2]
    assert bins[0][1] == ((0, 0), (1, 3)) and bins[1][1] == ((2, 0),)
    num = rng.normal(size=(1, n)).astype(np.float32)
    codes = np.stack([rng.integers(0, 3, n), rng.integers(0, 3, n),
                      rng.integers(0, 4, n)]).astype(np.int32)
    codes[0, :300] = 3     # OOV in a shared bin: must NOT hit col 1's rows
    codes[1, 300:600] = -1
    w = (rng.random(n) > 0.4).astype(np.float32)
    ref = np.asarray(masked_sigma(num, codes, w, schema=schema))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sigma_pallas_fast3_padded(num, codes, w,
                                                   schema=schema,
                                                   chunk_cols=512))
    assert got[0, 0] == ref[0, 0]
    np.testing.assert_array_equal(got[0, 2:], ref[0, 2:])
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=0.3)


def test_sigma_pallas_fast3_cols(data):
    """Per-column-ref v3 variant (the MICE loops' aggregation entry point)
    matches the stacked kernel bit-for-bit."""
    from duckdb_imputation_tpu.ring.kernels.sigma_pallas import (
        sigma_pallas_fast3_cols_padded,
        sigma_pallas_fast3_padded,
    )
    num, codes, w, schema = data
    n = 4000
    num, codes, w = num[:, :n], codes[:, :n], w[:n]
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(sigma_pallas_fast3_padded(num, codes, w,
                                                 schema=schema,
                                                 chunk_cols=512))
        b = np.asarray(sigma_pallas_fast3_cols_padded(
            tuple(num), tuple(codes), w, schema=schema, chunk_cols=512))
    np.testing.assert_array_equal(a, b)


def test_fused_noise_draws():
    """In-kernel stochastic-regression noise (v3 fused kernel): draws land
    ONLY on null cells and scale with std. Interpret-mode's PRNG returns
    constant bits (all draws equal), so seed-sensitivity and the N(0, std)
    distribution are asserted on real hardware by tpu_checks.py
    (check_fused_noise); here we pin the masking/plumbing."""
    import jax.numpy as jnp
    from duckdb_imputation_tpu.ring.kernels.sigma_fused import (
        fused_impute_aggregate, pack_lhs)

    rng = np.random.default_rng(31)
    schema = FeatureSchema(num_cols=2, cat_keys=((0, 1, 2),))
    from duckdb_imputation_tpu.ring.kernels.sigma_pallas import \
        _sizing_fast3
    pack = _sizing_fast3(schema)[3]
    chunk = 512
    n = pack * chunk
    x_cols = tuple(jnp.asarray(rng.normal(size=n), jnp.float32)
                   for _ in range(2))
    code_cols = (jnp.asarray(rng.integers(0, 3, n), jnp.int32),)
    null_imp = jnp.asarray(rng.random(n) < 0.2, jnp.float32)
    w = jnp.ones((n,), jnp.float32)
    theta = jnp.zeros((schema.sigma_size,), jnp.float32).at[0].set(0.25)
    lhs = pack_lhs(theta[:, None], jnp.zeros((1,)), schema=schema, n_rows=1)

    def run(seed, std):
        with pltpu.force_tpu_interpret_mode():
            new, _ = fused_impute_aggregate(
                x_cols, code_cols, null_imp, w, lhs, schema=schema,
                kind="num", imp_col=1, n_rows=1, chunk_cols=chunk,
                noise_seed=jnp.int32(seed), noise_std=jnp.float32(std))
        return np.asarray(new)

    base = run(123, 0.0)       # zero std == deterministic prediction
    a = run(123, 2.0)
    b = run(123, 2.0)
    m = np.asarray(null_imp) > 0
    # observed cells untouched by noise; draws deterministic per seed
    np.testing.assert_array_equal(a[~m], np.asarray(x_cols[1])[~m])
    np.testing.assert_array_equal(base[~m], np.asarray(x_cols[1])[~m])
    np.testing.assert_array_equal(a, b)
    # every null cell moved by std * z (interpret z is a nonzero constant)
    assert (np.abs(a[m] - base[m]) > 0).all()


def test_fast3_sizing_and_collapse_invariants():
    """Pure-layout property fuzz over random schemas: the v3 sizing always
    produces an 8-aligned, in-bounds packing, and the collapse matrix maps
    exactly {tail → ones row, hi+lo → numeric rows, bin rows → cat slots}
    within each segment."""
    import itertools
    import random
    from duckdb_imputation_tpu.ring.kernels.sigma_pallas import (
        _fast3_collapse,
        _sizing_fast3,
    )
    rnd = random.Random(11)
    schemas = [FeatureSchema(num_cols=d, cat_keys=tuple(
        tuple(range(rnd.randint(2, 12))) for _ in range(c)))
        for d, c in itertools.product((0, 1, 4, 7, 9), (0, 1, 3, 5))
        if d or c]
    for schema in schemas:
        nseg, bins, core, pack, width, tail_base, tail_rows = \
            _sizing_fast3(schema)
        d = schema.num_cols
        assert core % 8 == 0 and pack >= 1 and tail_rows >= pack
        assert tail_base == pack * core
        assert tail_base + tail_rows <= width and width % 128 == 0
        # each cat col placed exactly once, offsets disjoint within bins
        placed = [j for _, cols in bins for j, _ in cols]
        assert sorted(placed) == list(range(schema.cat_cols))
        for rows, cols in bins:
            spans = sorted((off, off + len(schema.cat_keys[j]))
                           for j, off in cols)
            assert spans[-1][1] <= rows
            assert all(a[1] <= b[0] for a, b in zip(spans, spans[1:]))
        C = _fast3_collapse(schema)
        assert C.shape == (pack, width, schema.sigma_size)
        for k in range(pack):
            colsum = C[k].sum(axis=0)
            assert colsum[0] == 1.0                      # ones ← tail only
            assert (colsum[1:1 + d] == 2.0).all()        # hi + lo
            assert (colsum[1 + d:] == 1.0).all()         # one hot row each
            rows_used = np.nonzero(C[k].any(axis=1))[0]
            seg = set(range(k * core, (k + 1) * core)) | {tail_base + k}
            assert set(rows_used.tolist()) <= seg


def test_sigma_pallas_fast_padded_wide_schema_fallback():
    """A schema whose v2 segment exceeds the 128 sublanes must fall back to
    the v1 kernel through the public padded wrapper, with equal semantics."""
    from duckdb_imputation_tpu.ring.kernels.sigma_pallas import (
        _sizing_fast2,
        sigma_pallas_fast_padded,
    )
    rng = np.random.default_rng(8)
    n = 3000
    schema = FeatureSchema(num_cols=4, cat_keys=(tuple(range(120)),))
    assert _sizing_fast2(schema)[3] > 128  # v2 segment does not fit
    num = rng.normal(size=(4, n)).astype(np.float32)
    codes = rng.integers(0, 120, size=(1, n)).astype(np.int32)
    w = (rng.random(n) > 0.4).astype(np.float32)
    ref = np.asarray(masked_sigma(num, codes, w, schema=schema))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sigma_pallas_fast_padded(num, codes, w,
                                                  schema=schema))
    assert got[0, 0] == ref[0, 0]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=0.3)


def test_nb_pallas_grouped_interpret(data):
    """Streaming NB grouped kernel (both precision variants) matches the
    XLA segment-sum path; counts exact."""
    from duckdb_imputation_tpu.ring.kernels.nb_pallas import (
        sum_to_nb_agg_grouped_pallas,
    )
    from duckdb_imputation_tpu.ring.sum import _sum_to_nb_agg_grouped_xla

    num, codes, w, schema = data
    rng = np.random.default_rng(6)
    g = rng.integers(0, 5, size=num.shape[-1]).astype(np.int32)
    ref = _sum_to_nb_agg_grouped_xla(num, codes, g, schema=schema,
                                     num_groups=5)
    with pltpu.force_tpu_interpret_mode():
        for fast in (False, True):
            got = sum_to_nb_agg_grouped_pallas(
                num, codes, g, schema=schema, num_groups=5, fast=fast)
            np.testing.assert_array_equal(np.asarray(got.n),
                                          np.asarray(ref.n))
            np.testing.assert_array_equal(np.asarray(got.lin_cat),
                                          np.asarray(ref.lin_cat))
            np.testing.assert_allclose(np.asarray(got.lin),
                                       np.asarray(ref.lin),
                                       rtol=1e-6, atol=1e-3)
            np.testing.assert_allclose(np.asarray(got.quad_diag),
                                       np.asarray(ref.quad_diag),
                                       rtol=1e-6, atol=5e-2)


def test_nb_pallas_grouped_ragged_rows(data):
    """Non-chunk-multiple row counts: zero-weight padding, padded rows hit
    no group."""
    from duckdb_imputation_tpu.ring.kernels.nb_pallas import (
        sum_to_nb_agg_grouped_pallas,
    )
    from duckdb_imputation_tpu.ring.sum import _sum_to_nb_agg_grouped_xla

    num, codes, w, schema = data
    k = 5000  # not a multiple of anything relevant
    num, codes, w = num[:, :k], codes[:, :k], w[:k]
    rng = np.random.default_rng(7)
    g = rng.integers(0, 3, size=k).astype(np.int32)
    ref = _sum_to_nb_agg_grouped_xla(num, codes, g, schema=schema,
                                     num_groups=3, weights=w)
    with pltpu.force_tpu_interpret_mode():
        got = sum_to_nb_agg_grouped_pallas(
            num, codes, g, schema=schema, num_groups=3, weights=w,
            chunk_cols=2048)
    np.testing.assert_array_equal(np.asarray(got.n), np.asarray(ref.n))
    np.testing.assert_allclose(np.asarray(got.quad_diag),
                               np.asarray(ref.quad_diag),
                               rtol=1e-6, atol=5e-2)


def test_fused_impute_aggregate_loop_matches_unfused():
    """The fused impute+aggregate MICE loop == the unfused device loop
    (kernel='xla', trainer='solve', noise=False): identical codes, numeric
    write-backs within the split-precision scoring error (~1e-6 relative)
    plus the v2 Gram's f32-accumulation-order difference."""
    import jax
    import jax.numpy as jnp

    from duckdb_imputation_tpu.mice.device_round import (
        mice_loop_device, mice_loop_device_fused)

    rng = np.random.default_rng(23)
    n = 1024
    cls = rng.integers(0, 3, size=n)
    z = rng.normal(size=n)
    x = np.stack([cls * 2.0 + 0.3 * z,
                  0.7 * cls + 0.2 * rng.normal(size=n),
                  rng.normal(size=n)]).astype(np.float32)
    c = np.stack([cls, rng.integers(0, 5, size=n)]).astype(np.int32)
    nn = np.zeros((3, n), bool)
    cn = np.zeros((2, n), bool)
    nn[1, rng.random(n) < 0.2] = True
    cn[0, rng.random(n) < 0.2] = True
    schema = FeatureSchema(num_cols=3,
                           cat_keys=(tuple(range(3)), tuple(range(5))))
    kw = dict(schema=schema, num_cols_to_impute=(1,),
              cat_cols_to_impute=(0,), iters=2)

    with pltpu.force_tpu_interpret_mode():
        xf, cf = mice_loop_device_fused(
            jnp.asarray(x), jnp.asarray(c), jnp.asarray(nn),
            jnp.asarray(cn), chunk_cols=128, **kw)
        xf, cf = np.asarray(xf), np.asarray(cf)

    xu, cu, _ = mice_loop_device(
        jnp.asarray(x), jnp.asarray(c), jnp.asarray(nn), jnp.asarray(cn),
        jax.random.PRNGKey(0), kernel="xla", trainer="solve", noise=False,
        **kw)
    np.testing.assert_array_equal(cf, np.asarray(cu))
    np.testing.assert_allclose(xf, np.asarray(xu), rtol=2e-3, atol=2e-3)
    # observed cells untouched
    np.testing.assert_array_equal(xf[0], x[0])
    np.testing.assert_array_equal(xf[1][~nn[1]], x[1][~nn[1]])


def test_qda_predict_pallas_matches_device():
    """One-pass batched QDA kernel == the XLA Cholesky-factored device
    predict (same quad/lin/intercept; scores agree to split-precision, so
    class argmax matches everywhere off exact ties)."""
    import jax.numpy as jnp

    from duckdb_imputation_tpu.models.device import qda_predict_device
    from duckdb_imputation_tpu.ring.kernels.qda_pallas import (
        qda_predict_pallas,
    )
    from duckdb_imputation_tpu.ring.kernels.sigma_pallas import (
        _fast_cols_use_v3,
        _sizing_fast3,
    )

    rng = np.random.default_rng(41)
    schema = FeatureSchema(num_cols=2, cat_keys=((0, 1, 2), (0, 1)))
    assert _fast_cols_use_v3(schema)
    m = schema.sigma_size - 1
    C = 4
    chunk = 256
    n = _sizing_fast3(schema)[3] * chunk * 2
    x = rng.normal(size=(2, n)).astype(np.float32)
    c = np.stack([rng.integers(0, 3, n),
                  rng.integers(0, 2, n)]).astype(np.int32)
    A = rng.normal(size=(C, m, m)).astype(np.float32) * 0.4
    quad = -np.einsum("cij,ckj->cik", A, A) - 0.2 * np.eye(m,
                                                           dtype=np.float32)
    lin = rng.normal(size=(C, m)).astype(np.float32)
    b = rng.normal(size=C).astype(np.float32)

    want = np.asarray(qda_predict_device(
        jnp.asarray(quad), jnp.asarray(lin), jnp.asarray(b),
        jnp.asarray(x), jnp.asarray(c), schema=schema))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(qda_predict_pallas(
            jnp.asarray(quad), jnp.asarray(lin), jnp.asarray(b),
            jnp.asarray(x), jnp.asarray(c), schema=schema,
            chunk_cols=chunk))
    assert (got == want).mean() > 0.999, (got[:30], want[:30])

    # ragged row count: zero-padded rows sliced off
    n2 = n - 177
    with pltpu.force_tpu_interpret_mode():
        got2 = np.asarray(qda_predict_pallas(
            jnp.asarray(quad), jnp.asarray(lin), jnp.asarray(b),
            jnp.asarray(x[:, :n2]), jnp.asarray(c[:, :n2]), schema=schema,
            chunk_cols=chunk))
    assert got2.shape == (n2,)
    np.testing.assert_array_equal(got2, got[:n2])
