"""Native columnar store / CSV loader tests (C++ via ctypes)."""
import os
import shutil
import subprocess

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


@pytest.fixture(scope="module")
def csv_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("native") / "t.csv"
    rows = [
        "a,b,d,e",
        "1.5,2,4,5",
        "2.5,,8,9",          # null b
        "3.5,1,4,NULL",      # null e
        "NaN,7,12,5",        # null a
        "5.0,3,8,9",
    ]
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_load_csv_types_and_values(csv_file):
    from duckdb_imputation_tpu.table.native import load_csv
    t = load_csv(csv_file)
    assert t.n_rows == 5
    assert t.n_cols == 4
    assert [t.col_name(c) for c in range(4)] == ["a", "b", "d", "e"]
    # dispatch rule: '1.5' etc -> numeric; pure ints -> categorical
    assert t.is_numeric(0) and not t.is_numeric(2)
    np.testing.assert_allclose(t.col_f32(0), [1.5, 2.5, 3.5, 0.0, 5.0])
    np.testing.assert_array_equal(t.col_null(0), [0, 0, 0, 1, 0])
    np.testing.assert_array_equal(t.col_i64(2), [4, 8, 4, 12, 8])
    # b: '2','1','7','3' + one null — ints but null makes it still int col
    assert not t.is_numeric(1)
    np.testing.assert_array_equal(t.col_null(1), [0, 1, 0, 0, 0])


def test_vocab_and_codes(csv_file):
    from duckdb_imputation_tpu.table.native import load_csv
    t = load_csv(csv_file)
    np.testing.assert_array_equal(t.col_vocab(2), [4, 8, 12])
    np.testing.assert_array_equal(t.col_codes(2), [0, 1, 0, 2, 1])
    # null rows get code -1
    assert t.col_codes(1)[1] == -1


def test_to_device_table(csv_file):
    from duckdb_imputation_tpu.table.native import read_csv
    tbl = read_csv(csv_file)
    assert tbl.schema.num_cols == 1
    assert tbl.schema.cat_cols == 3
    assert tbl.n_rows == 5
    assert bool(np.asarray(tbl.num_null)[0, 3])      # NaN a -> null
    assert tbl.schema.cat_keys[1] == (4, 8, 12)      # column d vocab


def test_column_swap(csv_file):
    from duckdb_imputation_tpu.table.native import load_csv
    t = load_csv(csv_file)
    new = np.arange(5, dtype=np.float32)
    t.swap_col_f32(0, new)
    np.testing.assert_array_equal(t.col_f32(0), new)


def test_parallel_parse_large(tmp_path):
    """Multithreaded parse produces identical results to numpy on a larger
    file (row-range partition boundaries exercised)."""
    rng = np.random.default_rng(0)
    n = 50_000
    a = rng.normal(size=n).astype(np.float32)
    b = rng.integers(0, 50, size=n)
    lines = ["a,b"] + [f"{float(a[i]):.7g},{b[i]}" for i in range(n)]
    p = tmp_path / "big.csv"
    p.write_text("\n".join(lines) + "\n")
    from duckdb_imputation_tpu.table.native import load_csv
    t = load_csv(str(p), n_threads=4)
    assert t.n_rows == n
    np.testing.assert_allclose(t.col_f32(0), a, rtol=1e-6)
    np.testing.assert_array_equal(t.col_i64(1), b)
