"""SQL coverage of the reference's PARTITION statement sequences and NULL
logic (VERDICT #9).

Mirrors, statement-for-statement:
  * `init_baseline` (partition.cpp:671-719): AVG/MODE fills, `_IS_NULL`
    flag columns added via ADD COLUMN + rep-swap, COALESCE fills via
    rep-swap;
  * `partition` (partition.cpp:42-237): the `n_nulls` CASE-sum column,
    ORDER BY n_nulls, and the n_nulls range splits into t_complete_0 /
    t_complete_<col> / t_complete_2;
  * expression-input aggregates (test_lift.py:59 `to_cofactor(a+b+c)` and
    the fused-grid analogue);
  * 3-valued NULL logic edges: NULL in comparisons, arithmetic, AND/OR,
    aggregates, and GROUP BY.
"""
import numpy as np
import pytest

from duckdb_imputation_tpu import sql


@pytest.fixture
def con():
    """A 8-row table with NULLs in one numeric and one categorical column
    (the init_baseline shape: some rows complete, some 1-null, some
    2-null)."""
    c = sql.connect()
    c.execute("CREATE TABLE t(a FLOAT, b FLOAT, d INTEGER, e INTEGER)")
    c.execute(
        "INSERT INTO t VALUES "
        "(1, 2, 4, 1), (2, NULL, 8, 1), (3, 6, NULL, 2), (4, 8, 4, 2), "
        "(5, NULL, NULL, 1), (6, 12, 8, 2), (7, 14, 4, 1), (8, 16, 8, 2)")
    return c


# -- init_baseline (partition.cpp:671-719) -----------------------------------

def test_avg_mode_fill_values(con):
    """The fill-value query: AVG over a NULL column ignores NULLs; MODE
    returns the most frequent non-null category."""
    r = con.execute("SELECT AVG(b), MODE(d) FROM t LIMIT 10000").fetchone()
    vals = [2, 6, 8, 12, 14, 16]
    assert r[0] == pytest.approx(sum(vals) / len(vals))
    assert r[1] == 4  # three 4s vs three 8s -> ties break to the smaller


def test_init_baseline_statement_sequence(con):
    """The full init_baseline flow: CREATE ... AS SELECT *, flag columns
    via ADD COLUMN + rep-swap, COALESCE fill via rep-swap."""
    avg_b, mode_d = con.execute(
        "SELECT AVG(b), MODE(d) FROM t LIMIT 10000").fetchone()

    con.execute("CREATE TABLE t_complete AS SELECT * FROM t")

    # numeric null column b  (partition.cpp:695-703)
    con.execute("CREATE TABLE rep AS SELECT b IS NULL FROM t")
    con.execute("ALTER TABLE t_complete ADD COLUMN b_IS_NULL BOOLEAN "
                "DEFAULT false;")
    con.execute("ALTER TABLE t_complete ALTER COLUMN b_IS_NULL "
                "SET DEFAULT 10;")
    con.execute(f"CREATE TABLE rep AS SELECT COALESCE(b , {avg_b}) FROM t")
    con.execute("ALTER TABLE t_complete ALTER COLUMN b SET DEFAULT 10;")

    # categorical null column d  (partition.cpp:706-714)
    con.execute("CREATE TABLE rep AS SELECT d IS NULL FROM t")
    con.execute("ALTER TABLE t_complete ADD COLUMN d_IS_NULL BOOLEAN "
                "DEFAULT false;")
    con.execute("ALTER TABLE t_complete ALTER COLUMN d_IS_NULL "
                "SET DEFAULT 10;")
    con.execute(
        f"CREATE TABLE rep AS SELECT COALESCE(d , {int(mode_d)}) FROM t")
    con.execute("ALTER TABLE t_complete ALTER COLUMN d SET DEFAULT 10;")

    rows = con.execute(
        "SELECT a, b, d, b_IS_NULL, d_IS_NULL FROM t_complete "
        "ORDER BY a").fetchall()
    assert len(rows) == 8
    # row a=2 had b NULL: filled with avg, flag true
    assert rows[1][1] == pytest.approx(avg_b) and rows[1][3] is True
    # row a=3 had d NULL: filled with mode, flag true
    assert rows[2][2] == int(mode_d) and rows[2][4] is True
    # complete row a=1 untouched, flags false
    assert rows[0][1] == 2 and rows[0][3] is False and rows[0][4] is False
    # no NULLs remain
    n_nulls = con.execute(
        "SELECT COUNT(*) FROM t_complete WHERE b IS NULL OR d IS NULL"
    ).fetchone()[0]
    assert n_nulls == 0

    # and the masked cofactor over the flag column — the per-column MICE
    # aggregate (imputation_base.cpp:29)
    trip = con.execute(
        "SELECT sum_to_triple_2_1(a, b, d) FROM t_complete "
        "WHERE b_IS_NULL IS FALSE").fetchone()[0]
    assert trip["N"] == 6


def test_partition_n_nulls_flow(con):
    """partition's t_tmp with the CASE-sum n_nulls column + range splits
    (partition.cpp:61-237)."""
    con.execute(
        "CREATE TABLE t_tmp AS SELECT a::FLOAT AS a , b::FLOAT AS b , "
        "d::INTEGER AS d , e::INTEGER AS e , "
        "CASE WHEN b IS NULL THEN 1 ELSE 0 END + "
        "CASE WHEN d IS NULL THEN 1 ELSE 0 END::INTEGER AS n_nulls "
        "FROM t ORDER BY n_nulls")
    counts = con.execute(
        "SELECT n_nulls, COUNT(*) FROM t_tmp GROUP BY n_nulls "
        "ORDER BY n_nulls").fetchall()
    assert counts == [(0, 5), (1, 2), (2, 1)]

    con.execute("CREATE TABLE t_complete_0 AS SELECT a, b, d, e FROM t_tmp "
                "WHERE n_nulls = 0")
    avg_b = con.execute("SELECT AVG(b) FROM t").fetchone()[0]
    con.execute(
        f"CREATE TABLE t_complete_b AS SELECT a, COALESCE(b, {avg_b}) AS b,"
        " d, e FROM t_tmp WHERE n_nulls = 1 AND b IS NULL")
    con.execute(
        "CREATE TABLE t_complete_2 AS SELECT a, b, d, e FROM t_tmp "
        "WHERE n_nulls >= 2 AND n_nulls < 2 + 1")
    assert con.execute("SELECT COUNT(*) FROM t_complete_0").fetchone()[0] == 5
    assert con.execute("SELECT COUNT(*) FROM t_complete_b").fetchone()[0] == 1
    assert con.execute("SELECT COUNT(*) FROM t_complete_2").fetchone()[0] == 1
    # the 1-null-in-b partition row is a=2 with b COALESCEd
    row = con.execute("SELECT a, b FROM t_complete_b").fetchone()
    assert row[0] == 2 and row[1] == pytest.approx(avg_b)
    con.execute("DROP TABLE t_tmp")
    con.execute("DROP TABLE IF EXISTS t_complete_0")


def test_distinct_vocab_query(con):
    """build_list_of_uniq_categoricals (partition.cpp:722-733): SELECT
    DISTINCT ... WHERE col IS NOT NULL ORDER BY col."""
    rows = con.execute("SELECT DISTINCT d from t WHERE d IS NOT NULL "
                       "ORDER BY d").fetchall()
    assert [r[0] for r in rows] == [4, 8]


# -- expression-input aggregates (test_lift.py:59) ----------------------------

def test_cofactor_over_expression(con):
    r = con.execute("SELECT to_cofactor(a+b+a) FROM t WHERE a = 1"
                    ).fetchone()[0]
    assert r["N"] == 1
    assert r["lin_num"] == [4.0]  # 1+2+1


def test_fused_aggregate_over_expressions(con):
    """sum_to_triple over computed inputs equals the same aggregate over a
    pre-materialized projection."""
    direct = con.execute(
        "SELECT sum_to_triple_2_1(a*2, a+b, d) FROM t "
        "WHERE b IS NOT NULL AND d IS NOT NULL").fetchone()[0]
    con.execute("CREATE TABLE proj AS SELECT a*2 AS x, a+b AS y, d FROM t "
                "WHERE b IS NOT NULL AND d IS NOT NULL")
    mat = con.execute("SELECT sum_to_triple_2_1(x, y, d) FROM proj"
                      ).fetchone()[0]
    assert direct == mat
    assert direct["N"] == 5


# -- 3-valued NULL logic edges ------------------------------------------------

def test_null_comparison_filters_rows(con):
    # b > 0 is UNKNOWN for NULL b -> row dropped (not kept)
    assert con.execute("SELECT COUNT(*) FROM t WHERE b > 0"
                       ).fetchone()[0] == 6
    # NOT (b > 0) is also UNKNOWN for NULL b -> still dropped
    assert con.execute("SELECT COUNT(*) FROM t WHERE NOT (b > 0)"
                       ).fetchone()[0] == 0
    assert con.execute("SELECT COUNT(*) FROM t WHERE b = NULL"
                       ).fetchone()[0] == 0


def test_null_and_or_short_circuit(con):
    # FALSE AND NULL = FALSE; TRUE OR NULL = TRUE (not UNKNOWN)
    assert con.execute(
        "SELECT COUNT(*) FROM t WHERE a < 0 AND b > 0").fetchone()[0] == 0
    assert con.execute(
        "SELECT COUNT(*) FROM t WHERE a > 0 OR b > 999").fetchone()[0] == 8
    # TRUE AND NULL = UNKNOWN -> dropped for NULL-b rows
    assert con.execute(
        "SELECT COUNT(*) FROM t WHERE a > 0 AND b > 0").fetchone()[0] == 6


def test_null_arithmetic_propagates(con):
    rows = con.execute("SELECT a, b + 1 FROM t ORDER BY a").fetchall()
    assert rows[1][1] is None and rows[4][1] is None
    assert rows[0][1] == 3.0


def test_aggregates_ignore_nulls(con):
    r = con.execute("SELECT COUNT(*), COUNT(b), SUM(b), MIN(b), MAX(b) "
                    "FROM t").fetchone()
    assert r[0] == 8 and r[1] == 6
    assert r[2] == pytest.approx(58.0)
    assert r[3] == 2.0 and r[4] == 16.0


def test_group_by_with_null_dimension(con):
    """GROUP BY over a column containing NULLs: NULL forms its own group
    (DuckDB semantics)."""
    rows = con.execute("SELECT d, COUNT(*) FROM t GROUP BY d "
                       "ORDER BY d").fetchall()
    groups = {r[0]: r[1] for r in rows}
    assert groups[4] == 3 and groups[8] == 3 and groups[None] == 2


def test_case_when_over_null(con):
    rows = con.execute(
        "SELECT CASE WHEN b IS NULL THEN -1 ELSE b END FROM t ORDER BY a"
    ).fetchall()
    assert rows[1][0] == -1 and rows[4][0] == -1 and rows[0][0] == 2.0


def test_coalesce_chain_and_null_flags(con):
    rows = con.execute(
        "SELECT COALESCE(b, a, 0), b IS NOT NULL FROM t ORDER BY a"
    ).fetchall()
    assert rows[1][0] == 2.0 and rows[1][1] is False   # b NULL -> a
    assert rows[0][0] == 2.0 and rows[0][1] is True


def test_ignore_null_false_in_aggregate(con):
    """The ring aggregates see NULL-derived flag columns (IgnoreNull()=false
    in the reference, sum_state.h:54-56): a WHERE mask must drop NULL rows
    explicitly, not the aggregate."""
    r = con.execute("SELECT sum_to_triple_1_0(b) FROM t "
                    "WHERE b IS NOT NULL").fetchone()[0]
    assert r["N"] == 6
    assert r["lin_agg"] == [pytest.approx(58.0)]
