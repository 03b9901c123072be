"""Reference-surface API tests: the SQL-shaped entry points reproduce the
golden outputs through the parity layer (incl. the dynamic registration
grid)."""
import numpy as np

from duckdb_imputation_tpu import api
import golden_ring as G


def test_grid_function_sum(ring_test_table):
    gb, num, cat = ring_test_table
    res = api.sum_to_triple_3_3(num[:, 0], num[:, 1], num[:, 2],
                                cat[:, 0], cat[:, 1], cat[:, 2])
    assert res.to_dict() == G.SUM_ALL


def test_grid_group_by(ring_test_table):
    gb, num, cat = ring_test_table
    res = api.sum_to_triple_3_3(num[:, 0], num[:, 1], num[:, 2],
                                cat[:, 0], cat[:, 1], cat[:, 2],
                                group_by=gb - 1)
    dicts = res.to_dict()
    assert dicts[0] == G.SUM_GB1 and dicts[1] == G.SUM_GB2


def test_lift_then_sum_identity(ring_test_table):
    gb, num, cat = ring_test_table
    cols = [num[:, 0], num[:, 1], num[:, 2], cat[:, 0], cat[:, 1], cat[:, 2]]
    fused = api.sum_to_triple(*cols)
    lifted = api.sum_triple(api.to_cofactor(*cols))
    assert fused.to_dict() == lifted.to_dict()


def test_multiply_and_subtract(ring_test_table):
    gb, num, cat = ring_test_table
    a = api.sum_to_triple_2_2(num[gb == 1, 1], num[gb == 1, 2],
                              cat[gb == 1, 0], cat[gb == 1, 1])
    b = api.sum_to_triple_2_2(num[gb == 2, 0], num[gb == 2, 2],
                              cat[gb == 2, 0], cat[gb == 2, 2])
    assert api.multiply_triple(a, b).to_dict(style="num") == G.MUL_GB1_GB2

    cols = [num[:, 0], num[:, 1], num[:, 2], cat[:, 0], cat[:, 1], cat[:, 2]]
    schema = api.sum_to_triple(*cols).schema
    full = api.sum_to_triple(*cols, schema=schema)
    part = api.sum_to_triple(*cols, weights=(gb == 1).astype(np.float32),
                             schema=schema)
    rest = api.sum_to_triple(*cols, weights=(gb == 2).astype(np.float32),
                             schema=schema)
    assert api.subtract_triple(full, part).to_dict() == rest.to_dict()


def test_nb_grid(ring_test_table):
    gb, num, cat = ring_test_table
    res = api.sum_to_nb_agg_3_3(num[:, 0], num[:, 1], num[:, 2],
                                cat[:, 0], cat[:, 1], cat[:, 2])
    assert res.to_dict() == G.NB_SUM_ALL


def test_model_surface_iris():
    from sklearn.datasets import load_iris
    from sklearn.model_selection import train_test_split
    x, y = load_iris(return_X_y=True)
    xtr, xte, ytr, yte = train_test_split(x.astype(np.float32), y,
                                          test_size=0.33, random_state=42)
    cols = [xtr[:, j] for j in range(4)] + [ytr.astype(np.int64)]
    trip = api.sum_to_triple_4_1(*cols)
    params = api.linreg_train(trip, 0, 0.001, 0.0, 2000, False, False)
    pred = api.linreg_predict(params, False, False,
                              *[xte[:, j] for j in range(1, 4)],
                              yte.astype(np.int64))
    assert np.corrcoef(pred, xte[:, 0])[0, 1] > 0.8

    params = api.lda_train(trip, 0, 0.001, False)
    cls = api.lda_predict(params, False, *[xte[:, j] for j in range(4)])
    assert (cls == yte).mean() > 0.9

    grouped = api.sum_to_triple_4_0(*[xtr[:, j] for j in range(4)],
                                    group_by=ytr)
    qp = api.qda_train(grouped, [0, 1, 2])
    cls = api.qda_predict(qp, False, *[xte[:, j] for j in range(4)])
    assert (cls == yte).mean() > 0.9

    nb = api.sum_to_nb_agg_4_0(*[xtr[:, j] for j in range(4)], group_by=ytr)
    npar = api.nb_train(nb, [0, 1, 2])
    cls = api.nb_predict(npar, False, *[xte[:, j] for j in range(4)])
    assert (cls == yte).mean() > 0.9


def test_mice_surface():
    from sklearn.datasets import load_iris
    from duckdb_imputation_tpu.table import from_numpy
    x, y = load_iris(return_X_y=True)
    rng = np.random.default_rng(0)
    num = x.astype(np.float32)
    nn = np.zeros_like(num, bool)
    nn[rng.choice(len(x), 30, False), 0] = True
    t = from_numpy(num, y[:, None].astype(np.int64), nn,
                   np.zeros((len(x), 1), bool))
    out = api.run_MICE_baseline(t, con_columns_nulls=["num0"],
                                cat_columns_nulls=[], mice_iters=1,
                                linreg_iters=200, noise=False)
    rmse = np.sqrt(np.mean(
        (np.asarray(out.num_data)[0, nn[:, 0]] - num[nn[:, 0], 0]) ** 2))
    assert rmse < 0.6


def test_factorized_sum_matches_per_key_products():
    """factorized_sum ≡ sum over keys of multiply_triple — i.e. the fused
    contraction path equals the reference's sum_triple(multiply_triple(A,B))
    plan (README.md:163-174) computed key by key, and both equal the triple
    of the physically materialized join."""
    import jax
    rng = np.random.default_rng(7)
    keys = 6
    n1, n2 = 40, 28
    gb1 = rng.integers(0, keys, n1)
    b = rng.normal(size=n1).astype(np.float32)
    d = rng.integers(0, 3, n1).astype(np.int64) * 2
    gb2 = rng.integers(0, keys, n2)
    a_col = rng.normal(size=n2).astype(np.float32)
    f = rng.integers(0, 2, n2).astype(np.int64) + 10

    A = api.sum_to_triple(b, d, group_by=gb1, num_groups=keys)
    B = api.sum_to_triple(a_col, f, group_by=gb2, num_groups=keys)
    fused = api.factorized_sum(A, B)

    total = None
    for k in range(keys):
        ak = api.Cofactor(jax.tree.map(lambda x, k=k: x[k], A.triple), A.schema)
        bk = api.Cofactor(jax.tree.map(lambda x, k=k: x[k], B.triple), B.schema)
        prod = api.multiply_triple(ak, bk)
        total = prod if total is None else total + prod

    for lhs, rhs in zip(jax.tree.leaves(fused.triple),
                        jax.tree.leaves(total.triple)):
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   rtol=1e-5, atol=1e-4)

    # vs the materialized join (schema fixed so vocab/order match)
    ii, jj = np.nonzero(gb1[:, None] == gb2[None, :])
    joined = api.sum_to_triple(b[ii], a_col[jj], d[ii], f[jj],
                               schema=fused.schema)
    assert float(np.asarray(fused.triple.n)) == len(ii)
    for lhs, rhs in zip(jax.tree.leaves(fused.triple),
                        jax.tree.leaves(joined.triple)):
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   rtol=1e-5, atol=1e-4)


def test_factorized_sum_nb_matches_per_key_products():
    import jax
    rng = np.random.default_rng(3)
    keys = 4
    gb1 = rng.integers(0, keys, 30)
    x1 = rng.normal(size=30).astype(np.float32)
    c1 = rng.integers(0, 3, 30).astype(np.int64)
    gb2 = rng.integers(0, keys, 20)
    x2 = rng.normal(size=20).astype(np.float32)

    A = api.sum_to_nb_agg(x1, c1, group_by=gb1, num_groups=keys)
    B = api.sum_to_nb_agg(x2, group_by=gb2, num_groups=keys)
    fused = api.factorized_sum_nb(A, B)

    total = None
    for k in range(keys):
        ak = api.NBValue(jax.tree.map(lambda x, k=k: x[k], A.agg), A.schema)
        bk = api.NBValue(jax.tree.map(lambda x, k=k: x[k], B.agg), B.schema)
        prod = api.multiply_nb_agg(ak, bk)
        total = prod if total is None else total + prod
    for lhs, rhs in zip(jax.tree.leaves(fused.agg), jax.tree.leaves(total.agg)):
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   rtol=1e-5, atol=1e-4)


def test_from_pandas_dispatch_and_nulls():
    """pandas ingestion: float ⇒ numeric, int/bool ⇒ categorical
    (the reference's type-dispatch rule), NaN/NA ⇒ null masks."""
    import pytest
    pd = pytest.importorskip("pandas")
    import numpy as np
    from duckdb_imputation_tpu.table import from_pandas

    df = pd.DataFrame({
        "a": [1.5, np.nan, 2.5, 3.0],
        "g": pd.array([4, None, 4, 8], dtype="Int64"),
        "flag": [True, False, True, False],
    })
    t = from_pandas(df)
    assert t.num_names == ("a",) and t.cat_names == ("g", "flag")
    assert np.asarray(t.num_null)[0].tolist() == [False, True, False, False]
    assert np.asarray(t.cat_null)[0].tolist() == [False, True, False, False]
    assert t.schema.cat_keys == ((4, 8), (0, 1))
    # raw values round-trip through codes
    assert t.cat_values()[0].tolist() == [4, 4, 4, 8]  # null slot = filler


def test_from_pandas_string_categories_round_trip():
    """String/object columns dictionary-encode at the door (sorted-unique
    labels → codes), and to_pandas decodes them back; nulls_as_na blanks
    the originally-missing slots."""
    import pytest
    pd = pytest.importorskip("pandas")
    import numpy as np
    from duckdb_imputation_tpu.table import from_pandas

    df = pd.DataFrame({
        "x": [0.5, 1.5, np.nan, 2.5],
        "color": ["red", None, "blue", "red"],
        "g": pd.array([7, 9, None, 7], dtype="Int64"),
    })
    t = from_pandas(df)
    assert t.cat_names == ("color", "g")
    assert t.cat_labels == (("blue", "red"), None)
    assert np.asarray(t.cat_null)[0].tolist() == [False, True, False, False]
    # sorted-unique labels: blue=0, red=1
    assert t.cat_values()[0].tolist() == [1, 0, 0, 1]  # null slot = filler

    back = t.to_pandas(nulls_as_na=True)
    got = back["color"].tolist()
    assert got[0] == "red" and got[2] == "blue" and got[3] == "red"
    assert pd.isna(got[1])
    assert back["g"][0] == 7 and back["g"][3] == 7 and pd.isna(back["g"][2])
    assert np.isnan(back["x"][2]) and back["x"][0] == 0.5
    # default: current cell values (post-impute surface), no blanking
    cur = t.to_pandas()
    assert cur["color"].tolist() == ["red", "blue", "blue", "red"]


def test_mice_over_string_categories():
    """End-to-end: MICE on a DataFrame with a string categorical column;
    imputed labels decode to valid category strings."""
    import pytest
    pd = pytest.importorskip("pandas")
    import numpy as np
    from duckdb_imputation_tpu.mice import run_mice_baseline
    from duckdb_imputation_tpu.table import from_pandas

    rng = np.random.default_rng(3)
    n = 400
    z = rng.normal(size=n)
    color = np.where(z > 0, "warm", "cool").astype(object)
    x = (z + 0.1 * rng.normal(size=n)).astype(np.float64)
    miss = rng.choice(n, n // 5, replace=False)
    color[miss] = None
    df = pd.DataFrame({"x": x, "color": color})
    t = from_pandas(df)
    out = run_mice_baseline(t, iters=2, noise=False)
    got = out.to_pandas()["color"].to_numpy()
    truth = np.where(z > 0, "warm", "cool")
    assert set(got) <= {"warm", "cool"}
    assert (got[miss] == truth[miss]).mean() > 0.9
