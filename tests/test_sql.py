"""SQL front-end tests — the reference's own pytest SQL strings run
near-verbatim against duckdb_imputation_tpu.sql and must produce the same
golden nested dicts (duckdb_extension/test/python/test_sum.py, test_lift.py,
test_mul.py, test_nb_*.py) plus the MICE driver statement sequence
(imputation/algorithms/imputation_base.cpp:21-142)."""
import numpy as np
import pytest

from duckdb_imputation_tpu import api, sql

import golden_ring as G


@pytest.fixture
def con():
    c = sql.connect()
    c.execute("CREATE TABLE test(gb INTEGER, a FLOAT, b FLOAT, c FLOAT, "
              "d INTEGER, e INTEGER, f INTEGER);")
    c.execute("INSERT INTO test VALUES (1,1,2,3,4,5,6), (1,5,6,7,8,9,10), "
              "(2,2,1,3,4,6,8), (2,5,7,6,8,10,12), (2,2,1,3,4,6,8)")
    return c


# -- ring op golden parity (test_sum.py / test_lift.py / test_mul.py) --------

def test_sum_no_lift_everything(con):
    res = con.execute(
        "SELECT sum_to_triple_3_3(a,b,c,d,e,f) from test").fetchall()
    assert res[0][0] == G.SUM_ALL


def test_sum_no_lift_group_by(con):
    res = con.execute(
        "SELECT sum_to_triple_3_3(a,b,c,d,e,f) from test GROUP BY gb"
    ).fetchall()
    assert res[0][0] == G.SUM_GB1
    assert res[1][0] == G.SUM_GB2


def test_sum_no_lift_having(con):
    res = con.execute("SELECT sum_to_triple_3_3(a,b,c,d,e,f) from test "
                      "GROUP BY gb HAVING gb = 2").fetchall()
    assert res[0][0] == G.SUM_GB2


def test_sum_equals_lift_then_sum(con):
    res = con.execute("SELECT sum_to_triple_3_3(a,b,c,d,e,f) from test "
                      "GROUP BY gb").fetchall()
    res2 = con.execute("SELECT sum_triple(to_cofactor(a,b,c,d,e,f)) "
                       "from test GROUP BY gb").fetchall()
    assert res[0][0] == res2[0][0]
    assert res[1][0] == res2[1][0]


def test_sum_where(con):
    res = con.execute("SELECT sum_to_triple_3_3(a,b,c,d,e,f) from test "
                      "where gb = 2").fetchall()
    assert res[0][0] == G.SUM_GB2


def test_lift_rows(con):
    res = con.execute("SELECT to_cofactor(a,b,c,d,e,f) from test").fetchall()
    assert res[0][0] == G.LIFT_ROW0
    assert res[3][0] == G.LIFT_ROW3


def test_multiply_join(con):
    res = con.execute(
        "SELECT multiply_triple(A, B) FROM ("
        "(SELECT sum_to_triple_2_2(b,c,d,e) AS A FROM test where gb = 1) "
        "INNER JOIN "
        "(SELECT sum_to_triple_2_2(a,c,d,f) AS B FROM test where gb = 2) "
        "ON TRUE)").fetchall()
    assert res[0][0] == G.MUL_GB1_GB2


def test_nb_sum(con):
    res = con.execute(
        "SELECT sum_to_nb_agg_3_3(a,b,c,d,e,f) from test").fetchall()
    assert res[0][0] == G.NB_SUM_ALL
    res = con.execute("SELECT sum_to_nb_agg_3_3(a,b,c,d,e,f) from test "
                      "GROUP BY gb").fetchall()
    assert res[0][0] == G.NB_SUM_GB1


def test_nb_lift_sum_identity(con):
    res = con.execute(
        "SELECT sum_nb_agg(to_nb_agg(a,b,c,d,e,f)) from test").fetchall()
    assert res[0][0] == G.NB_SUM_ALL


def test_nb_multiply_join(con):
    res = con.execute(
        "SELECT multiply_nb_agg(A, B) FROM ("
        "(SELECT sum_to_nb_agg_2_2(b,c,d,e) AS A FROM test where gb = 1) "
        "INNER JOIN "
        "(SELECT sum_to_nb_agg_2_2(a,c,d,f) AS B FROM test where gb = 2) "
        "ON TRUE)").fetchall()
    assert res[0][0] == G.NB_MUL


# -- plain SQL machinery ------------------------------------------------------

def test_scalar_queries(con):
    assert con.execute("SELECT COUNT(*) FROM test").fetchone()[0] == 5
    assert con.execute("SELECT AVG(a) FROM test").fetchone()[0] == \
        pytest.approx(3.0)
    assert con.execute("SELECT MODE(d) FROM test").fetchone()[0] == 4
    res = con.execute(
        "SELECT DISTINCT d FROM test ORDER BY d").fetchall()
    assert [r[0] for r in res] == [4, 8]


def test_where_order_limit(con):
    res = con.execute("SELECT a, b FROM test WHERE gb = 2 "
                      "ORDER BY a DESC LIMIT 2").fetchall()
    assert res[0] == (5.0, 7.0)
    assert len(res) == 2


def test_nulls_and_case(con):
    con.execute("CREATE TABLE t(x FLOAT, y FLOAT)")
    con.execute("INSERT INTO t VALUES (1, 10), (NULL, 20), (3, NULL)")
    res = con.execute("SELECT CASE WHEN x IS NULL THEN -1 ELSE x END, "
                      "COALESCE(y, 0) FROM t").fetchall()
    assert res == [(1.0, 10.0), (-1.0, 20.0), (3.0, 0.0)]
    assert con.execute(
        "SELECT COUNT(x) FROM t").fetchone()[0] == 2
    res = con.execute("SELECT x FROM t WHERE x IS NOT NULL").fetchall()
    assert [r[0] for r in res] == [1.0, 3.0]


def test_list_position_extract(con):
    res = con.execute(
        "SELECT list_position([4, 8], d), "
        "list_extract([0.5, 0.25], list_position([4, 8], d)) "
        "FROM test").fetchall()
    assert [r[0] for r in res] == [1, 2, 1, 2, 1]
    assert [r[1] for r in res] == [0.5, 0.25, 0.5, 0.25, 0.5]


# -- train/predict through SQL (the reference's text round-trip) ---------------

def test_linreg_struct_literal_round_trip(con):
    """The reference interpolates the triple's ToString() into the train
    call (imputation_base.cpp:116); the same flow must work here."""
    triple_dict = con.execute(
        "SELECT sum_to_triple_3_0(a,b,c) FROM test").fetchone()[0]
    q = (f"select linreg_train({triple_dict!r}"
         "::STRUCT(N int, lin_agg FLOAT[], quad_agg FLOAT[], "
         "lin_cat STRUCT(key INT, value FLOAT)[][], "
         "quad_num_cat STRUCT(key INT, value FLOAT)[][], "
         "quad_cat STRUCT(key1 INT, key2 INT, value FLOAT)[][]), "
         "0, 0.001::FLOAT, 0::FLOAT, 10000::INTEGER, false, false)")
    q = q.replace("'", "'")
    params = con.execute(q).fetchone()[0]
    # same training through the direct API
    t = api.sum_to_triple(
        np.array([1, 5, 2, 5, 2], np.float32),
        np.array([2, 6, 1, 7, 1], np.float32),
        np.array([3, 7, 3, 6, 3], np.float32))
    expected = api.linreg_train(t, 0, 0.001, 0.0, 10000, False, False)
    np.testing.assert_allclose(params, np.asarray(expected), rtol=1e-6)
    # predict through SQL matches predict through the API
    res = con.execute(
        f"SELECT linreg_predict({params!r}::FLOAT[], false, false, b, c) "
        "FROM test").fetchall()
    direct = api.linreg_predict(
        np.asarray(params, np.float32), False, False,
        np.array([2, 6, 1, 7, 1], np.float32),
        np.array([3, 7, 3, 6, 3], np.float32))
    np.testing.assert_allclose([r[0] for r in res], direct, rtol=1e-5)


def test_qda_list_aggregate(con):
    """The reference's QDA flow: LIST(agg), LIST(label) from a GROUP BY
    subquery, then qda_train over the text literals (test_QDA.py:51-57)."""
    rows = con.execute(
        "SELECT list(agg), list(gb) FROM (SELECT sum_to_triple_3_0(a,b,c) "
        "as agg, gb from test group by gb)").fetchall()
    triples, labels = rows[0]
    q = (f"select qda_train({triples!r}"
         "::STRUCT(N int, lin_agg FLOAT[], quad_agg FLOAT[], "
         "lin_cat STRUCT(key INT, value FLOAT)[][], "
         "quad_num_cat STRUCT(key INT, value FLOAT)[][], "
         "quad_cat STRUCT(key1 INT, key2 INT, value FLOAT)[][])[], "
         f"{labels}::int[], false)")
    params = con.execute(q).fetchone()[0]
    preds = con.execute(
        f"SELECT qda_predict({params!r}::float[], false, a, b, c) "
        "FROM test").fetchall()
    # the SQL text round-trip must match the direct-API path exactly
    a = np.array([1, 5, 2, 5, 2], np.float32)
    b = np.array([2, 6, 1, 7, 1], np.float32)
    c = np.array([3, 7, 3, 6, 3], np.float32)
    t = api.sum_to_triple(a, b, c,
                          group_by=np.array([0, 0, 1, 1, 1]), num_groups=2)
    direct_params = api.qda_train(t, np.array([1, 2]), normalize=False)
    np.testing.assert_allclose(params, np.asarray(direct_params), rtol=1e-6)
    direct = api.qda_predict(np.asarray(direct_params), False, a, b, c)
    # QDA returns the actual label VALUE (qda.cpp:483-486)
    assert [int(r[0]) for r in preds] == [int(v) for v in direct]
    assert set(int(r[0]) for r in preds) <= {1, 2}


def test_nb_list_aggregate(con):
    rows = con.execute(
        "SELECT list(agg), list(gb) FROM (SELECT sum_to_nb_agg_3_0(a,b,c) "
        "as agg, gb from test group by gb)").fetchall()
    aggs, labels = rows[0]
    q = (f"select nb_train({aggs!r}"
         "::STRUCT(N int, lin_agg FLOAT[], quad_agg FLOAT[], "
         "lin_cat STRUCT(key INT, value FLOAT)[][])[], "
         f"{labels}::int[])")
    params = con.execute(q).fetchone()[0]
    preds = con.execute(
        f"SELECT nb_predict({params!r}::float[], false, a, b, c) "
        "FROM test").fetchall()
    a = np.array([1, 5, 2, 5, 2], np.float32)
    b = np.array([2, 6, 1, 7, 1], np.float32)
    c = np.array([3, 7, 3, 6, 3], np.float32)
    t = api.sum_to_nb_agg(a, b, c,
                          group_by=np.array([0, 0, 1, 1, 1]), num_groups=2)
    direct_params = api.nb_train(t, np.array([1, 2]))
    np.testing.assert_allclose(params, np.asarray(direct_params), rtol=1e-6)
    direct = api.nb_predict(np.asarray(direct_params), False, a, b, c)
    assert [int(r[0]) for r in preds] == [int(v) for v in direct]


# -- the MICE driver statement sequence ----------------------------------------

def test_mice_driver_sql_sequence():
    """Replays run_MICE_baseline's statement shapes end-to-end: flag table,
    masked aggregate, text-literal train, CASE-WHEN predict into `rep`,
    patched column-swap write-back (imputation_base.cpp:21-142)."""
    rng = np.random.default_rng(0)
    n = 400
    b = rng.normal(size=n).astype(np.float32)
    c = rng.normal(size=n).astype(np.float32)
    a_true = (2.0 * b - c + 0.5).astype(np.float32)
    missing = rng.random(n) < 0.25
    a = a_true.copy()
    a[missing] = np.nan

    con = sql.connect()
    con.register("raw", {"a": a, "b": b, "c": c})
    # init_baseline: mean fill + _IS_NULL flag (partition.cpp:671-719)
    mean_a = con.execute("SELECT AVG(a) FROM raw").fetchone()[0]
    con.execute(
        f"CREATE TABLE t_complete AS SELECT COALESCE(a, {mean_a}) AS a, "
        "b, c, a IS NULL AS a_is_null FROM raw")
    # cofactor over clean rows only
    triple = con.execute(
        "SELECT sum_to_triple_3_0(a, b, c) FROM t_complete "
        "WHERE a_is_null IS FALSE").fetchone()[0]
    cast = ("::STRUCT(N int, lin_agg FLOAT[], quad_agg FLOAT[], "
            "lin_cat STRUCT(key INT, value FLOAT)[][], "
            "quad_num_cat STRUCT(key INT, value FLOAT)[][], "
            "quad_cat STRUCT(key1 INT, key2 INT, value FLOAT)[][])")
    params = con.execute(
        f"select linreg_train({triple!r}{cast}, 0, 0.001::FLOAT, 0::FLOAT, "
        "10000::INTEGER, false, false)").fetchone()[0]
    con.execute(
        f"CREATE TABLE rep AS SELECT CASE WHEN a_is_null THEN "
        f"linreg_predict({params!r}::FLOAT[], false, false, b, c) "
        "ELSE a END AS test FROM t_complete")
    con.execute("ALTER TABLE t_complete ALTER COLUMN a SET DEFAULT 10;")
    assert "rep" not in con.tables
    imputed = np.asarray(
        [r[0] for r in con.execute("SELECT a FROM t_complete").fetchall()],
        np.float32)
    # observed rows untouched; imputed rows close to truth on noiseless data
    np.testing.assert_allclose(imputed[~missing], a_true[~missing],
                               rtol=1e-5)
    assert float(np.abs(imputed[missing] - a_true[missing]).max()) < 0.05


def test_to_table_handoff():
    """SQL table → device Table → MICE via the API."""
    rng = np.random.default_rng(1)
    n = 200
    b = rng.normal(size=n).astype(np.float32)
    a = (b * 3.0).astype(np.float32)
    a[rng.random(n) < 0.2] = np.nan
    con = sql.connect()
    con.register("t", {"a": a, "b": b})
    table = con.to_table("t")
    out = api.run_MICE_baseline(table, con_columns_nulls=["a"],
                                mice_iters=2)
    vals = np.asarray(out.num_data)[0]
    mask = np.isnan(a)
    np.testing.assert_allclose(vals[mask], (b * 3.0)[mask], atol=0.05)


def test_readme_factorized_join_query(con):
    """The reference README's factorized-join example (README.md:163-174):
    per-key triples multiplied along the join, then ring-summed."""
    con.execute("CREATE TABLE test1(gb INTEGER, b FLOAT, c FLOAT, "
                "d INTEGER, e INTEGER)")
    con.execute("INSERT INTO test1 VALUES (1,2,3,4,5), (1,6,7,8,9), "
                "(2,1,3,4,6)")
    con.execute("CREATE TABLE test2(gb INTEGER, a FLOAT, c FLOAT, "
                "d INTEGER, f INTEGER)")
    con.execute("INSERT INTO test2 VALUES (1,2,3,4,6), (2,5,6,8,12), "
                "(2,2,3,4,8)")
    res = con.execute(
        "select sum_triple(multiply_triple(A,B)) FROM "
        "(SELECT gb as gb, sum_to_triple_2_2(b,c,d,e) AS A "
        "FROM test1 GROUP BY gb) as a "
        "INNER JOIN "
        "(SELECT gb as gb, sum_to_triple_2_2(a,c,d,f) AS B "
        "FROM test2 GROUP BY gb) as b "
        "on a.gb = b.gb").fetchall()
    out = res[0][0]
    # N of the join-multiplied sum: sum over keys of N1(k)*N2(k)
    assert out["N"] == 2 * 1 + 1 * 2
    assert len(out["lin_agg"]) == 4  # 2 num cols from each side


# -- regressions from code review ----------------------------------------------

def test_order_by_group_key_not_in_select(con):
    res = con.execute(
        "SELECT AVG(a) FROM test GROUP BY gb ORDER BY gb DESC").fetchall()
    assert [round(r[0], 4) for r in res] == [3.0, 3.0]
    res = con.execute(
        "SELECT COUNT(*) FROM test GROUP BY gb ORDER BY gb").fetchall()
    assert [r[0] for r in res] == [2, 3]


def test_order_by_hidden_column_after_distinct(con):
    # DISTINCT output ordered by a column evaluated pre-distinct
    res = con.execute("SELECT DISTINCT gb FROM test ORDER BY gb DESC"
                      ).fetchall()
    assert [r[0] for r in res] == [2, 1]


def test_order_by_string_desc():
    c = sql.connect()
    c.execute("CREATE TABLE s(v VARCHAR)")
    c.execute("INSERT INTO s VALUES ('a'), ('c'), ('b')")
    res = c.execute("SELECT v FROM s ORDER BY v DESC").fetchall()
    assert [r[0] for r in res] == ["c", "b", "a"]


def test_grid_suffix_casts_arguments(con):
    """The _<x>_<y> suffix IS the signature: integer columns in numeric
    slots are cast to FLOAT like DuckDB's implicit argument cast."""
    res = con.execute(
        "SELECT sum_to_triple_6_0(a,b,c,d,e,f) FROM test").fetchone()[0]
    assert len(res["lin_agg"]) == 6
    assert res["lin_cat"] == []
    with pytest.raises(sql.SQLError):
        con.execute("SELECT sum_to_triple_2_2(a,b,c) FROM test")


def test_modulo_sign():
    c = sql.connect()
    c.execute("CREATE TABLE m(x INTEGER)")
    c.execute("INSERT INTO m VALUES (-7), (7)")
    res = c.execute("SELECT x % 3 FROM m").fetchall()
    assert [r[0] for r in res] == [-1, 1]


def test_factorized_join_equals_materialized_join(con):
    """The factorized plan's FULL triple (including all categorical
    sections) equals aggregating over the physically materialized join.
    Pins the union-schema alignment of per-key triples: per-group vocabs
    differ, so this fails if products are combined without re-embedding."""
    con.execute("CREATE TABLE fj1(gb INTEGER, b FLOAT, c FLOAT, "
                "d INTEGER, e INTEGER)")
    con.execute("INSERT INTO fj1 VALUES (1,2,3,4,5), (1,6,7,8,9), "
                "(2,1,3,4,6)")
    con.execute("CREATE TABLE fj2(gb INTEGER, a FLOAT, c FLOAT, "
                "d INTEGER, f INTEGER)")
    con.execute("INSERT INTO fj2 VALUES (1,2,3,4,6), (2,5,6,8,12), "
                "(2,2,3,4,8)")
    fz = con.execute(
        "select sum_triple(multiply_triple(A,B)) FROM "
        "(SELECT gb as gb, sum_to_triple_2_2(b,c,d,e) AS A "
        "FROM fj1 GROUP BY gb) as a "
        "INNER JOIN "
        "(SELECT gb as gb, sum_to_triple_2_2(a,c,d,f) AS B "
        "FROM fj2 GROUP BY gb) as b "
        "on a.gb = b.gb").fetchone()[0]
    mat = con.execute(
        "SELECT sum_to_triple_4_4(t1.b, t1.c, t2.a, t2.c, "
        "t1.d, t1.e, t2.d, t2.f) FROM fj1 t1 "
        "INNER JOIN fj2 t2 ON t1.gb = t2.gb").fetchone()[0]
    assert fz == mat


def test_order_by_nulls_last():
    """DuckDB's default NULL placement is NULLS LAST for both ASC and DESC
    (default_null_order) — including INTEGER columns, whose null slots hold
    0 in the backing array and must not sort as the value 0."""
    con = sql.connect()
    con.execute("CREATE TABLE o(x FLOAT, y INTEGER)")
    con.execute("INSERT INTO o VALUES (2.5, NULL), (NULL, -1), (1.5, 2), "
                "(NULL, 0), (-0.5, 1)")
    rows = con.execute("SELECT x FROM o ORDER BY x").fetchall()
    assert [r[0] for r in rows] == [-0.5, 1.5, 2.5, None, None]
    rows = con.execute("SELECT x FROM o ORDER BY x DESC").fetchall()
    assert [r[0] for r in rows] == [2.5, 1.5, -0.5, None, None]
    rows = con.execute("SELECT y FROM o ORDER BY y").fetchall()
    assert [r[0] for r in rows] == [-1, 0, 1, 2, None]
    rows = con.execute("SELECT y FROM o ORDER BY y DESC").fetchall()
    assert [r[0] for r in rows] == [2, 1, 0, -1, None]
    # two-key sort: primary NULLS LAST dominates the secondary ordering
    rows = con.execute("SELECT y, x FROM o ORDER BY x, y DESC").fetchall()
    assert rows == [(1, -0.5), (2, 1.5), (None, 2.5), (0, None), (-1, None)]


def test_update_basic_and_3vl():
    """UPDATE: rows where the predicate is NULL keep the old value (3VL);
    SET expressions evaluate against the PRE-update row."""
    con = sql.connect()
    con.execute("CREATE TABLE u(a FLOAT, b FLOAT, g INTEGER)")
    con.execute("INSERT INTO u VALUES (1, 10, 1), (2, 20, 2), "
                "(NULL, 30, 3), (4, NULL, 4)")
    con.execute("UPDATE u SET b = b + 1 WHERE a > 1")
    assert [r[0] for r in con.execute("SELECT b FROM u").fetchall()] == \
        [10.0, 21.0, 30.0, None]  # a=NULL row untouched; b=NULL stays NULL
    # pre-update row semantics: a/b swap
    con.execute("UPDATE u SET a = b, b = a WHERE g = 2")
    assert con.execute("SELECT a, b FROM u WHERE g = 2").fetchone() == \
        (21.0, 2.0)
    # SET to NULL and unconditional update
    con.execute("UPDATE u SET a = NULL")
    assert all(r[0] is None
               for r in con.execute("SELECT a FROM u").fetchall())


def test_update_categorical_and_case():
    con = sql.connect()
    con.execute("CREATE TABLE u(x INTEGER, y FLOAT)")
    con.execute("INSERT INTO u VALUES (1, 0.5), (2, 1.5), (3, 2.5)")
    con.execute("UPDATE u SET x = CASE WHEN y > 1 THEN x * 10 ELSE x END")
    assert [r[0] for r in con.execute("SELECT x FROM u").fetchall()] == \
        [1, 20, 30]


def test_delete_3vl_and_all():
    """DELETE keeps rows whose predicate is FALSE or NULL."""
    con = sql.connect()
    con.execute("CREATE TABLE d(a FLOAT)")
    con.execute("INSERT INTO d VALUES (1), (2), (NULL), (4)")
    con.execute("DELETE FROM d WHERE a > 1")
    assert [r[0] for r in con.execute("SELECT a FROM d").fetchall()] == \
        [1.0, None]  # NULL predicate row survives
    con.execute("DELETE FROM d")
    assert con.execute("SELECT COUNT(*) FROM d").fetchone()[0] == 0


def test_update_delete_feed_aggregation():
    """Mutated tables flow into the ring aggregation correctly."""
    con = sql.connect()
    con.execute("CREATE TABLE t(a FLOAT, b FLOAT, d INTEGER)")
    con.execute("INSERT INTO t VALUES (1, 2, 1), (3, 4, 2), (5, 6, 1)")
    con.execute("DELETE FROM t WHERE d = 2")
    con.execute("UPDATE t SET a = a * 2")
    got = con.execute("SELECT sum_to_triple_2_1(a, b, d) FROM t").fetchone()[0]
    assert got["N"] == 2
    assert got["lin_agg"] == [12.0, 8.0]  # 2*1+2*5=12, 2+6=8
