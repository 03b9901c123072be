"""Auxiliary subsystem tests: checkpoint/resume, triple validation,
phase timing."""
import dataclasses

import numpy as np
import pytest

from duckdb_imputation_tpu import FeatureSchema
from duckdb_imputation_tpu.ring import sum_to_triple, sum_to_nb_agg
from duckdb_imputation_tpu.table import from_numpy
from duckdb_imputation_tpu.mice import run_mice_baseline
from duckdb_imputation_tpu.utils import (
    MiceCheckpointer,
    PhaseTimer,
    TripleValidationError,
    load_table,
    save_table,
    validate_nb,
    validate_triple,
)


def _table(n=200, seed=0):
    rng = np.random.default_rng(seed)
    num = rng.normal(size=(n, 3)).astype(np.float32)
    cat = rng.integers(0, 4, size=(n, 1))
    nn = np.zeros_like(num, bool)
    nn[rng.choice(n, n // 5, False), 0] = True
    return from_numpy(num, cat, nn, np.zeros_like(cat, bool)), num, nn


def test_table_checkpoint_roundtrip(tmp_path):
    t, num, nn = _table()
    path = str(tmp_path / "ckpt.npz")
    save_table(path, t, extra={"completed_iters": 3})
    t2, extra = load_table(path)
    assert extra["completed_iters"] == 3
    np.testing.assert_array_equal(np.asarray(t.num_data),
                                  np.asarray(t2.num_data))
    np.testing.assert_array_equal(np.asarray(t.cat_codes),
                                  np.asarray(t2.cat_codes))
    assert t2.schema == t.schema
    assert t2.num_names == t.num_names


def test_mice_checkpoint_resume(tmp_path):
    """Kill MICE after round 1, resume, and land on the same table as an
    uninterrupted run (noise off, deterministic)."""
    path = str(tmp_path / "mice.npz")
    kw = dict(linreg_iters=200, noise=False)
    t, num, nn = _table()
    full = run_mice_baseline(t, iters=3, **kw)

    ck = MiceCheckpointer(path)

    class Stop(Exception):
        pass

    def stop_after_1(table, it):
        ck(table, it)
        if it == 0:
            raise Stop

    t2, _, _ = _table()
    with pytest.raises(Stop):
        run_mice_baseline(t2, iters=3, on_iteration=stop_after_1, **kw)

    resumed_t, done = ck.resume()
    out = run_mice_baseline(resumed_t, iters=3, start_iter=done, **kw)
    np.testing.assert_allclose(np.asarray(out.num_data),
                               np.asarray(full.num_data), rtol=1e-4,
                               atol=1e-4)


def test_validate_triple_passes_and_catches():
    rng = np.random.default_rng(0)
    n = 1000
    num = rng.normal(size=(2, n)).astype(np.float32)
    cat = rng.integers(0, 3, size=(1, n)).astype(np.int32)
    schema = FeatureSchema(num_cols=2, cat_keys=((0, 1, 2),))
    t = sum_to_triple(num, cat, None, schema=schema)
    validate_triple(t, schema)

    bad = dataclasses.replace(t, lin_cat=t.lin_cat.at[0].add(5.0))
    with pytest.raises(TripleValidationError, match="counts sum"):
        validate_triple(bad, schema)

    nan = dataclasses.replace(t, quad=t.quad.at[0, 0].set(np.nan))
    with pytest.raises(TripleValidationError, match="non-finite"):
        validate_triple(nan, schema)

    nb = sum_to_nb_agg(num, cat, None, schema=schema)
    validate_nb(nb, schema)


def test_phase_timer_json():
    timer = PhaseTimer()
    with timer.phase("x"):
        pass
    assert "total_s" in timer.to_json()
