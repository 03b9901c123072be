"""Differential fuzz of the SQL engine against sqlite3 (stdlib).

The reference's entire user surface is SQL (SURVEY.md §2 L0); sql.py is a
hand-rolled tokenizer/parser/evaluator, and hand-written example queries
probe only a sliver of its semantic surface (3-valued NULL logic in every
operator, join + aggregate + HAVING combinations, CASE/COALESCE nesting).
sqlite3 implements the same semantics for the generated subset — numeric
expressions, comparisons, AND/OR/NOT, IS [NOT] NULL, CASE, COALESCE,
NULL-skipping aggregates, inner joins, GROUP BY/HAVING, DISTINCT — so a
seeded random-query generator run through both engines pins thousands of
semantic combinations no hand-written suite reaches.

Excluded by construction (known, documented divergences):
  * ORDER BY — default NULL placement differs (DuckDB: NULLS LAST; sqlite:
    NULLS FIRST); results are compared as multisets instead.
  * `/` and `%` — sqlite integer division truncates, DuckDB's does not.
  * string operations — the generator is numeric + NULL only.
  * float storage width — the engine stores FLOAT columns in f32 (the
    DuckDB FLOAT contract), sqlite REAL in f64, so data values and float
    literals are kept on dyadic grids (1/64 resp. 1/4) that both widths
    represent exactly; expression evaluation is f64 in both engines, so
    every comparison/DISTINCT/equality then agrees bit-for-bit.
"""
import math

import numpy as np
import random
import sqlite3

import pytest

from duckdb_imputation_tpu import sql


# ---------------------------------------------------------------------------
# shared data
# ---------------------------------------------------------------------------

def _gen_rows_t1(rng, n=45):
    rows = []
    for i in range(n):
        a = None if rng.random() < 0.15 else rng.randrange(-256, 257) / 64
        b = None if rng.random() < 0.15 else rng.randrange(-128, 385) / 64
        c = None if rng.random() < 0.2 else rng.randrange(5)
        d = rng.randrange(3)
        s = None if rng.random() < 0.15 else rng.choice(
            ["ap", "bq", "cr", "dz"])
        rows.append((i, a, b, c, d, s))
    return rows


def _gen_rows_t2(rng, n=14):
    rows = []
    for i in range(n):
        k = rng.randrange(5)
        v = None if rng.random() < 0.2 else rng.randrange(-192, 193) / 64
        w = rng.randrange(4)
        rows.append((k, v, w))
    return rows


def _gen_rows_t3(rng, n=12):
    """Third table for 3-way joins; sk is a NULL-HEAVY string join key
    (40% NULL — NULL never equals, so NULL-keyed rows match nothing)."""
    rows = []
    for i in range(n):
        u = rng.randrange(3)
        p = None if rng.random() < 0.2 else rng.randrange(-128, 129) / 64
        sk = None if rng.random() < 0.4 else rng.choice(
            ["ap", "bq", "cr", "dz", "zz"])
        rows.append((u, p, sk))
    return rows


def _lit(v):
    return "NULL" if v is None else repr(v)


def _make_engines(seed):
    rng = random.Random(seed)
    rows1, rows2 = _gen_rows_t1(rng), _gen_rows_t2(rng)
    rows3 = _gen_rows_t3(rng)

    con = sql.connect()
    con.execute("CREATE TABLE t1(id INTEGER, a FLOAT, b FLOAT, "
                "c INTEGER, d INTEGER, s VARCHAR)")
    con.execute("INSERT INTO t1 VALUES " + ", ".join(
        "(" + ", ".join(_lit(v) for v in r) + ")" for r in rows1))
    con.execute("CREATE TABLE t2(k INTEGER, v FLOAT, w INTEGER)")
    con.execute("INSERT INTO t2 VALUES " + ", ".join(
        "(" + ", ".join(_lit(v) for v in r) + ")" for r in rows2))
    con.execute("CREATE TABLE t3(u INTEGER, p FLOAT, sk VARCHAR)")
    con.execute("INSERT INTO t3 VALUES " + ", ".join(
        "(" + ", ".join(_lit(v) for v in r) + ")" for r in rows3))

    lite = sqlite3.connect(":memory:")
    lite.execute("CREATE TABLE t1(id INTEGER, a REAL, b REAL, "
                 "c INTEGER, d INTEGER, s TEXT)")
    lite.executemany("INSERT INTO t1 VALUES (?,?,?,?,?,?)", rows1)
    lite.execute("CREATE TABLE t2(k INTEGER, v REAL, w INTEGER)")
    lite.executemany("INSERT INTO t2 VALUES (?,?,?)", rows2)
    lite.execute("CREATE TABLE t3(u INTEGER, p REAL, sk TEXT)")
    lite.executemany("INSERT INTO t3 VALUES (?,?,?)", rows3)
    return con, lite, rng


# ---------------------------------------------------------------------------
# query generator
# ---------------------------------------------------------------------------

T1_NUM = ["id", "a", "b", "c", "d"]
T2_NUM = ["k", "v", "w"]


def _num_expr(rng, cols, depth):
    if depth <= 0 or rng.random() < 0.35:
        r = rng.random()
        if r < 0.55:
            return rng.choice(cols)
        if r < 0.78:
            return str(rng.randrange(-4, 5))
        if r < 0.92:
            return repr(rng.randrange(-12, 13) / 4)
        if r < 0.97:
            return "NULL"
        # scalar subquery leaf (single-row aggregate over t1)
        fn = rng.choice(["AVG", "MIN", "MAX", "COUNT"])
        col = rng.choice(["a", "b", "c"])
        return f"(SELECT {fn}({col}) FROM t1)"
    kind = rng.randrange(5)
    if kind < 3:
        op = rng.choice(["+", "-", "*"])
        return (f"({_num_expr(rng, cols, depth - 1)} {op} "
                f"{_num_expr(rng, cols, depth - 1)})")
    if kind == 3:
        els = (f" ELSE {_num_expr(rng, cols, depth - 1)}"
               if rng.random() < 0.7 else "")
        return (f"(CASE WHEN {_bool_expr(rng, cols, depth - 1)} "
                f"THEN {_num_expr(rng, cols, depth - 1)}{els} END)")
    return (f"COALESCE({_num_expr(rng, cols, depth - 1)}, "
            f"{_num_expr(rng, cols, depth - 1)})")


_STR_LITS = ["'ap'", "'bq'", "'cr'", "'dz'", "'zz'"]  # 'zz' never occurs


def _str_pred(rng, scol):
    """String-keyed predicate leaf (equality/IN/IS NULL only — inequality
    would drag in collation differences)."""
    r = rng.random()
    if r < 0.4:
        op = rng.choice(["=", "<>"])
        return f"({scol} {op} {rng.choice(_STR_LITS)})"
    if r < 0.7:
        neg = "NOT " if rng.random() < 0.4 else ""
        items = ", ".join(rng.choice(_STR_LITS)
                          for _ in range(rng.randrange(1, 4)))
        return f"({scol} {neg}IN ({items}))"
    neg = "NOT " if rng.random() < 0.5 else ""
    return f"({scol} IS {neg}NULL)"


def _bool_expr(rng, cols, depth, scol=None):
    if depth <= 0 or rng.random() < 0.4:
        r = rng.random()
        if scol is not None and rng.random() < 0.15:
            return _str_pred(rng, scol)
        if r < 0.6:
            op = rng.choice(["=", "<>", "<", "<=", ">", ">="])
            return (f"({_num_expr(rng, cols, 1)} {op} "
                    f"{_num_expr(rng, cols, 1)})")
        if r < 0.72:                  # [NOT] BETWEEN (3VL on all 3 operands)
            neg = "NOT " if rng.random() < 0.4 else ""
            return (f"({_num_expr(rng, cols, 1)} {neg}BETWEEN "
                    f"{_num_expr(rng, cols, 0)} AND "
                    f"{_num_expr(rng, cols, 0)})")
        if r < 0.84:                  # [NOT] IN value list (may hold NULL)
            neg = "NOT " if rng.random() < 0.4 else ""
            items = ", ".join(_num_expr(rng, cols, 0)
                              for _ in range(rng.randrange(1, 4)))
            return f"({_num_expr(rng, cols, 1)} {neg}IN ({items}))"
        if r < 0.9:                   # [NOT] IN subquery
            neg = "NOT " if rng.random() < 0.4 else ""
            sub = "SELECT w FROM t2"
            if rng.random() < 0.5:
                sub += f" WHERE v > {rng.randrange(-2, 3)}"
            return f"({rng.choice(cols)} {neg}IN ({sub}))"
        neg = "NOT " if rng.random() < 0.5 else ""
        return f"({rng.choice(cols)} IS {neg}NULL)"
    kind = rng.randrange(3)
    if kind == 0:
        return (f"({_bool_expr(rng, cols, depth - 1, scol)} AND "
                f"{_bool_expr(rng, cols, depth - 1, scol)})")
    if kind == 1:
        return (f"({_bool_expr(rng, cols, depth - 1, scol)} OR "
                f"{_bool_expr(rng, cols, depth - 1, scol)})")
    return f"(NOT {_bool_expr(rng, cols, depth - 1, scol)})"


def _agg_expr(rng, cols):
    fn = rng.choice(["SUM", "AVG", "MIN", "MAX", "COUNT"])
    base = f"{fn}({_num_expr(rng, cols, 1)})"
    r = rng.random()
    if r < 0.12:                      # aggregate wrapped in COALESCE
        return f"COALESCE({base}, {rng.randrange(-2, 3)})"
    if r < 0.2:                       # aggregate inside CASE
        return (f"(CASE WHEN COUNT(*) > {rng.randrange(1, 6)} THEN {base} "
                f"ELSE {_agg_expr_plain(rng, cols)} END)")
    return base


def _agg_expr_plain(rng, cols):
    fn = rng.choice(["SUM", "MIN", "MAX", "COUNT"])
    return f"{fn}({_num_expr(rng, cols, 1)})"


def _having(rng, cols):
    r = rng.random()
    if r < 0.15:                      # 3VL NOT over an aggregate compare
        return (f"NOT ({_agg_expr_plain(rng, cols)} "
                f"{rng.choice(['>', '<'])} {rng.randrange(-2, 3)})")
    if r < 0.25:                      # IS [NOT] NULL over an aggregate
        neg = "NOT " if rng.random() < 0.5 else ""
        return f"({_agg_expr_plain(rng, cols)} IS {neg}NULL)"
    one = (f"{_agg_expr(rng, cols)} "
           f"{rng.choice(['>', '<', '>='])} {rng.randrange(-2, 3)}")
    if rng.random() < 0.3:
        two = (f"{_agg_expr(rng, cols)} "
               f"{rng.choice(['>', '<='])} {rng.randrange(-1, 4)}")
        return f"({one} {rng.choice(['AND', 'OR'])} {two})"
    return one


def _make_query(rng):
    shape = rng.randrange(19)
    if shape == 15:                   # 3-way join [+ GROUP BY + HAVING]
        cols = ["t1.a", "t1.b", "t2.v", "t3.p"]
        j2 = rng.choice(["JOIN", "LEFT JOIN"])
        j3 = rng.choice(["JOIN", "LEFT JOIN"])
        base = (f"FROM t1 {j2} t2 ON t1.d = t2.w "
                f"{j3} t3 ON t1.d = t3.u")
        if rng.random() < 0.5:
            items = ", ".join(["t2.w", "COUNT(*)"]
                              + [_agg_expr(rng, cols) for _ in range(2)])
            q = f"SELECT {items} {base}"
            if rng.random() < 0.5:
                q += f" WHERE {_bool_expr(rng, cols, 2)}"
            q += " GROUP BY t2.w"
            if rng.random() < 0.4:
                q += f" HAVING {_having(rng, cols)}"
            return q
        items = ", ".join(_num_expr(rng, cols, 2)
                          for _ in range(rng.randrange(1, 4)))
        q = f"SELECT {items} {base}"
        if rng.random() < 0.6:
            q += f" WHERE {_bool_expr(rng, cols, 2, scol='t1.s')}"
        return q
    if shape == 16:                   # NULL-heavy STRING join key
        cols = ["t1.a", "t1.c", "t3.p", "t3.u"]
        jkw = rng.choice(["JOIN", "LEFT JOIN", "LEFT OUTER JOIN"])
        items = ", ".join(["t1.id"] + [_num_expr(rng, cols, 2)
                                       for _ in range(rng.randrange(1, 3))])
        q = f"SELECT {items} FROM t1 {jkw} t3 ON t1.s = t3.sk"
        if rng.random() < 0.6:
            q += f" WHERE {_bool_expr(rng, cols, 2, scol='t3.sk')}"
        return q
    if shape == 17:                   # ORDER BY on an EXPRESSION
        # explicit NULLS FIRST/LAST aligns the engines' default NULL
        # placement; the unique id tiebreak makes the selected row set
        # deterministic, so the multiset compare validates the ordering
        e = _num_expr(rng, T1_NUM, 2)
        while e.lstrip("-").isdigit():
            # a bare integer literal in ORDER BY is POSITIONAL in sqlite
            e = _num_expr(rng, T1_NUM, 2)
        q = f"SELECT id, {e} FROM t1"
        if rng.random() < 0.5:
            q += f" WHERE {_bool_expr(rng, T1_NUM, 2)}"
        q += (f" ORDER BY {e} {rng.choice(['ASC', 'DESC'])} "
              f"NULLS {rng.choice(['FIRST', 'LAST'])}, id "
              f"LIMIT {rng.randrange(1, 15)}")
        if rng.random() < 0.4:
            q += f" OFFSET {rng.randrange(0, 8)}"
        return q
    if shape == 18:                   # USING join (derived left side)
        jkw = rng.choice(["JOIN", "LEFT JOIN"])
        # c is nullable: NULL keys must NOT match (NULL never equals)
        lk = rng.choice(["d", "c"])
        cols = ["a", "v", "w"]
        items = ", ".join(_num_expr(rng, cols, 2)
                          for _ in range(rng.randrange(1, 3)))
        q = (f"SELECT {items} FROM (SELECT {lk} AS k, a FROM t1) "
             f"{jkw} t2 USING (k)")
        if rng.random() < 0.5:
            q += f" WHERE {_bool_expr(rng, cols, 2)}"
        return q
    if shape == 14:                   # ORDER BY unique key + LIMIT/OFFSET
        # the id column is unique and non-null, so both engines agree on
        # the selected row set even though general ORDER BY NULL placement
        # differs (see module docstring)
        items = ", ".join(["id"] + [_num_expr(rng, T1_NUM, 2)
                                    for _ in range(rng.randrange(1, 3))])
        q = f"SELECT {items} FROM t1"
        if rng.random() < 0.6:
            q += f" WHERE {_bool_expr(rng, T1_NUM, 2)}"
        q += f" ORDER BY id ORDER_DIR LIMIT {rng.randrange(1, 20)}"
        q = q.replace("ORDER_DIR", rng.choice(["ASC", "DESC"]))
        if rng.random() < 0.5:
            q += f" OFFSET {rng.randrange(0, 10)}"
        return q
    if shape < 4:                     # plain projection [+ WHERE] [DISTINCT]
        distinct = "DISTINCT " if shape == 3 else ""
        items = ", ".join(_num_expr(rng, T1_NUM, 3)
                          for _ in range(rng.randrange(1, 4)))
        if rng.random() < 0.25:       # string column rides along
            items = "s, " + items
        q = f"SELECT {distinct}{items} FROM t1"
        if rng.random() < 0.7:
            q += f" WHERE {_bool_expr(rng, T1_NUM, 3, scol='s')}"
        return q
    if shape < 6:                     # whole-table aggregates [+ WHERE]
        items = ", ".join(["COUNT(*)"] + [_agg_expr(rng, T1_NUM)
                                          for _ in range(2)])
        q = f"SELECT {items} FROM t1"
        if rng.random() < 0.7:
            q += f" WHERE {_bool_expr(rng, T1_NUM, 2, scol='s')}"
        return q
    if shape < 9:                     # GROUP BY [+ WHERE] [+ HAVING]
        key = rng.choice(["c", "d", "s", "s"])  # string-keyed half the time
        items = ", ".join([key, "COUNT(*)"]
                          + [_agg_expr(rng, T1_NUM) for _ in range(2)])
        q = f"SELECT {items} FROM t1"
        if rng.random() < 0.6:
            q += f" WHERE {_bool_expr(rng, T1_NUM, 2, scol='s')}"
        q += f" GROUP BY {key}"
        if rng.random() < 0.5:
            q += f" HAVING {_having(rng, T1_NUM)}"
        return q
    if shape < 11:                    # inner/LEFT join with qualified cols
        cols = ["t1.a", "t1.b", "t1.c", "t2.v", "t2.w"]
        items = ", ".join(_num_expr(rng, cols, 2)
                          for _ in range(rng.randrange(1, 3)))
        jkw = rng.choice(["JOIN", "LEFT JOIN", "LEFT OUTER JOIN"])
        q = f"SELECT {items} FROM t1 {jkw} t2 ON t1.d = t2.w"
        if rng.random() < 0.6:
            q += f" WHERE {_bool_expr(rng, cols, 2, scol='t1.s')}"
        return q
    if shape < 13:                    # derived-table FROM (subquery)
        inner_items = ", ".join(
            f"{_num_expr(rng, T1_NUM, 2)} AS x{i}" for i in range(3))
        inner = f"SELECT {inner_items} FROM t1"
        if rng.random() < 0.6:
            inner += f" WHERE {_bool_expr(rng, T1_NUM, 2)}"
        cols = ["x0", "x1", "x2"]
        items = ", ".join(_num_expr(rng, cols, 2)
                          for _ in range(rng.randrange(1, 3)))
        q = f"SELECT {items} FROM ({inner})"
        if rng.random() < 0.5:
            q += f" WHERE {_bool_expr(rng, cols, 2)}"
        return q
    # join + GROUP BY + aggregates [+ HAVING]; LEFT variant groups the
    # unmatched rows' NULL key into its own group (sqlite semantics)
    cols = ["t1.a", "t1.b", "t2.v"]
    items = ", ".join(["t2.w", "COUNT(*)"]
                      + [_agg_expr(rng, cols) for _ in range(2)])
    jkw = rng.choice(["JOIN", "LEFT JOIN"])
    q = f"SELECT {items} FROM t1 {jkw} t2 ON t1.d = t2.w"
    if rng.random() < 0.5:
        q += f" WHERE {_bool_expr(rng, cols, 2)}"
    q += " GROUP BY t2.w"
    if rng.random() < 0.4:
        q += f" HAVING {_having(rng, cols)}"
    return q


# ---------------------------------------------------------------------------
# result comparison
# ---------------------------------------------------------------------------

def _norm(v):
    """None stays None; strings stay; bools → ints; every number → float."""
    if v is None:
        return None
    if isinstance(v, bool):
        return float(int(v))
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, bool):
        return float(int(v))
    if isinstance(v, str):
        return v
    return float(v)


def _sort_key(row):
    # str() keys: only used to pre-sort both sides before the greedy
    # tolerant matching, which scans the full remaining list anyway
    return tuple((v is not None, str(v)) for v in row)


def _row_close(rg, rw):
    if len(rg) != len(rw):
        return False
    for vg, vw in zip(rg, rw):
        if (vg is None) != (vw is None):
            return False
        if vg is None:
            continue
        if isinstance(vg, str) or isinstance(vw, str):
            if vg != vw:
                return False
        elif not math.isclose(vg, vw, rel_tol=1e-4, abs_tol=1e-4):
            return False
    return True


def _assert_same(q, got, want):
    """Tolerant multiset equality: rows matched greedily within float
    tolerance (the engine computes FLOAT columns in f32, sqlite in f64, so
    sorting rows and zipping misaligns ties — e.g. 4.0 vs 3.99999…96)."""
    assert len(got) == len(want), (
        f"row count {len(got)} != {len(want)}\n  {q}\n  got={got}\n"
        f"  want={want}")
    g = sorted((tuple(_norm(v) for v in r) for r in got), key=_sort_key)
    w = [tuple(_norm(v) for v in r) for r in want]
    w.sort(key=_sort_key)
    remaining = list(w)
    for rg in g:
        for i, rw in enumerate(remaining):
            if _row_close(rg, rw):
                del remaining[i]
                break
        else:
            raise AssertionError(
                f"unmatched row {rg!r}\n  {q}\n  got={g}\n  want={w}")


def _make_mutation(rng, next_id):
    """One UPDATE/DELETE statement runnable verbatim on both engines.

    SET expressions for FLOAT columns stay on the dyadic grid with small
    magnitude (col ± small int, plain col/literal, COALESCE) so the f32
    write-back is exact; INTEGER columns only receive integer-valued
    expressions (sqlite is flex-typed and would happily store 2.5 in an
    INTEGER column while this engine rounds). DELETEs target ids and are
    paired with fresh-id INSERTs so the table never drains and the id
    column stays unique (shape-14 ORDER BY id relies on that)."""
    kind = rng.randrange(7)
    if kind == 6:                     # INSERT INTO … SELECT (self-append)
        # offset keeps ids unique: every existing id < next_id
        return ([f"INSERT INTO t1 SELECT id + {next_id}, a, b, c, d, s "
                 f"FROM t1 WHERE {_bool_expr(rng, T1_NUM, 2, scol='s')}"],
                next_id * 2)
    if kind == 4:                     # UPDATE the string col
        val = rng.choice(_STR_LITS + ["NULL", "s"])
        return ([f"UPDATE t1 SET s = {val} "
                 f"WHERE {_bool_expr(rng, T1_NUM, 2, scol='s')}"], next_id)
    if kind == 5:                     # subquery shapes in SET/WHERE
        r = rng.random()
        if r < 0.5:
            # SET from a scalar subquery — MIN/MAX/COUNT stay dyadic-exact
            # (AVG would write f64-only values; see docstring)
            fn = rng.choice(["MIN", "MAX", "COUNT"])
            return ([f"UPDATE t1 SET a = (SELECT {fn}(v) FROM t2) "
                     f"WHERE {_bool_expr(rng, T1_NUM, 2)}"], next_id)
        # WHERE with an IN-subquery / scalar-subquery compare (read-only
        # use of AVG is fine: both engines see identical dyadic inputs)
        w = rng.choice([
            "c IN (SELECT w FROM t2 WHERE v IS NOT NULL)",
            "a > (SELECT AVG(v) FROM t2)",
            "d NOT IN (SELECT w FROM t2 WHERE v > 0)"])
        col = rng.choice(["a", "b"])
        return ([f"UPDATE t1 SET {col} = {col} + 1 WHERE {w}"], next_id)
    if kind == 0:                     # UPDATE float col
        col = rng.choice(["a", "b"])
        r = rng.random()
        if r < 0.3:
            val = f"{rng.choice(['a', 'b'])} + {rng.randrange(-3, 4)}"
        elif r < 0.5:
            val = repr(rng.randrange(-256, 257) / 64)
        elif r < 0.65:
            val = "NULL"
        elif r < 0.85:
            val = f"COALESCE({rng.choice(['a', 'b'])}, {rng.randrange(3)})"
        else:
            val = rng.choice(["a", "b"])
        return ([f"UPDATE t1 SET {col} = {val} "
                 f"WHERE {_bool_expr(rng, T1_NUM, 2)}"], next_id)
    if kind == 1:                     # UPDATE int col (integer-valued expr)
        col = rng.choice(["c", "d"])
        val = rng.choice(["c", "d", "NULL" if col == "c" else "0",
                          str(rng.randrange(5)),
                          f"d + {rng.randrange(3)}"])
        return ([f"UPDATE t1 SET {col} = {val} "
                 f"WHERE {_bool_expr(rng, T1_NUM, 2)}"], next_id)
    if kind == 2:                     # multi-assignment sees pre-update row
        return (["UPDATE t1 SET a = b, b = a "
                 f"WHERE {_bool_expr(rng, T1_NUM, 1)}"], next_id)
    # DELETE two ids + INSERT two fresh rows (unique new ids)
    ids = f"{rng.randrange(next_id)}, {rng.randrange(next_id)}"
    stmts = [f"DELETE FROM t1 WHERE id IN ({ids})"]
    rows = _gen_rows_t1(rng, n=2)
    rows = [(next_id + i,) + r[1:] for i, r in enumerate(rows)]
    stmts.append("INSERT INTO t1 VALUES " + ", ".join(
        "(" + ", ".join(_lit(v) for v in r) + ")" for r in rows))
    return stmts, next_id + 2


def _run_differential(seed, n_queries):
    con, lite, rng = _make_engines(seed)
    next_id = 45                      # == len(_gen_rows_t1(...))
    for i in range(n_queries):
        if i % 7 == 6:                # interleave a table mutation
            stmts, next_id = _make_mutation(rng, next_id)
            for s in stmts:
                con.execute(s)
                lite.execute(s)
        q = _make_query(rng)
        got = con.execute(q).fetchall()
        want = lite.execute(q).fetchall()
        _assert_same(q, got, want)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sql_differential_vs_sqlite(seed):
    _run_differential(seed, n_queries=150)


def test_float_expression_precision_consistency():
    """Regression: expression evaluation must use ONE float width.

    0.478 is not f32-exact; (a - i) evaluated in f64 but COALESCE/CASE
    outputs demoted to f32 made `x <= COALESCE(x, 0)` FALSE for non-null
    x (found by a non-dyadic variant of the differential fuzz; the dyadic
    fuzz above cannot see width demotion, hence this directed test)."""
    con = sql.connect()
    con.execute("CREATE TABLE t(a FLOAT, i INTEGER)")
    con.execute("INSERT INTO t VALUES (0.478, 7), (-3.141, 2), (NULL, 1)")
    sub = "(SELECT (a - i) AS x FROM t)"
    r = con.execute(
        f"SELECT 1 FROM {sub} WHERE x <= COALESCE(x, 0)").fetchall()
    assert len(r) == 2, r
    r = con.execute(
        f"SELECT 1 FROM {sub} WHERE x = (CASE WHEN 0 = 0 THEN x END)"
    ).fetchall()
    assert len(r) == 2, r
    # aggregate results must not lose width either: SUM over the f64
    # expression equals the f64 sum exactly
    r = con.execute(f"SELECT SUM(x) FROM {sub}").fetchall()
    want = (np.float32(0.478) - 7.0) + (np.float32(-3.141) - 2.0)
    assert r[0][0] == want, (r, want)


def test_malformed_queries_raise_sqlerror_only():
    """Parser/evaluator robustness: mutated (token-deleted / duplicated /
    swapped / garbage-injected) queries must either execute or raise
    SQLError — never leak numpy/KeyError/IndexError internals."""
    from duckdb_imputation_tpu.sql import SQLError
    rng = random.Random(0)
    con, _, qrng = _make_engines(0)
    for _ in range(400):
        toks = _make_query(qrng).split(" ")
        m = rng.random()
        if m < 0.4 and len(toks) > 2:
            del toks[rng.randrange(len(toks))]
        elif m < 0.7:
            j = rng.randrange(len(toks))
            toks.insert(j, toks[j])
        elif m < 0.85:
            j = rng.randrange(len(toks) - 1)
            toks[j], toks[j + 1] = toks[j + 1], toks[j]
        else:
            toks.insert(rng.randrange(len(toks)),
                        rng.choice(["$", "nosuchcol", ")", "(", "'unterm",
                                    "9e999", "::", "FROM", ","]))
        bad = " ".join(toks)
        try:
            con.execute(bad).fetchall()
        except SQLError:
            pass
