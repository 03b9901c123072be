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
