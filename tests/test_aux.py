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


def _ckpt_table(n=4096, seed=3):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(n, 2))
    num = np.stack([z[:, 0], 2 * z[:, 0] + z[:, 1], z[:, 1] - z[:, 0],
                    rng.normal(size=n)], 1).astype(np.float32)
    cat = ((z[:, 0] > 0).astype(int) * 3 + 4)[:, None]
    nn = np.zeros_like(num, bool)
    cn = np.zeros_like(cat, bool)
    nn[rng.choice(n, n // 5, False), 1] = True
    cn[rng.choice(n, n // 5, False), 0] = True
    from duckdb_imputation_tpu.table import from_numpy
    return from_numpy(num, cat, nn, cn), nn


def test_sharded_checkpoint_kill_and_resume(tmp_path):
    """run_mice_sharded round-boundary checkpointing on the 8-device mesh
    (round-4 verdict ask #6): a run killed after 2 of 4 rounds and resumed
    reproduces the uninterrupted 4-round trajectory EXACTLY — noise keys
    fold the global round index, so the stochastic stream is identical."""
    from duckdb_imputation_tpu.mice.sharded_round import run_mice_sharded
    from duckdb_imputation_tpu.parallel import make_mesh

    mesh = make_mesh()
    path = str(tmp_path / "sharded.ckpt")
    kw = dict(mesh=mesh, kernel="xla", trainer="solve", noise=True, seed=9)

    t0, nn = _ckpt_table()
    straight = run_mice_sharded(t0, iters=4, **kw)

    t1, _ = _ckpt_table()
    run_mice_sharded(t1, iters=2, checkpoint_path=path, **kw)  # "killed"
    t2, _ = _ckpt_table()
    resumed = run_mice_sharded(t2, iters=4, checkpoint_path=path, **kw)

    np.testing.assert_array_equal(np.asarray(resumed.cat_codes),
                                  np.asarray(straight.cat_codes))
    np.testing.assert_allclose(np.asarray(resumed.num_data),
                               np.asarray(straight.num_data),
                               rtol=1e-6, atol=1e-6)


def test_sharded_delta_checkpoint_kill_and_resume(tmp_path):
    """Same for the sharded DELTA loop: each resumed chunk recomputes
    `full` from the current table (the delta algebra's own invariant), so
    the trajectory matches within f32 re-accumulation tolerance."""
    from duckdb_imputation_tpu.mice.sharded_round import (
        run_mice_sharded_delta,
    )
    from duckdb_imputation_tpu.parallel import make_mesh

    mesh = make_mesh()
    path = str(tmp_path / "delta.ckpt")
    kw = dict(mesh=mesh, trainer="solve", noise=False, seed=9)

    t0, nn = _ckpt_table()
    straight = run_mice_sharded_delta(t0, iters=3, **kw)
    t1, _ = _ckpt_table()
    run_mice_sharded_delta(t1, iters=1, checkpoint_path=path, **kw)
    t2, _ = _ckpt_table()
    resumed = run_mice_sharded_delta(t2, iters=3, checkpoint_path=path, **kw)

    np.testing.assert_array_equal(np.asarray(resumed.cat_codes),
                                  np.asarray(straight.cat_codes))
    np.testing.assert_allclose(np.asarray(resumed.num_data)[1, nn[:, 1]],
                               np.asarray(straight.num_data)[1, nn[:, 1]],
                               rtol=1e-4, atol=1e-4)


def test_stream_checkpoint_kill_and_resume(tmp_path):
    """Out-of-core checkpointing: a killed streaming run resumes WITHOUT
    re-running the two streaming read passes (the checkpoint carries the
    full triple + dirty cache) and lands on the uninterrupted trajectory;
    noise keys fold (round, column), so the stream survives the resume."""
    from duckdb_imputation_tpu.mice.streaming import run_mice_stream
    from duckdb_imputation_tpu.ring.streaming import chunks_from_arrays

    rng = np.random.default_rng(5)
    n = 3000
    z0 = rng.normal(size=n).astype(np.float32)
    z1 = rng.normal(size=n).astype(np.float32)
    num = np.stack([z0, 2 * z0 + z1, rng.normal(size=n).astype(np.float32)])
    cat = ((z0 > 0).astype(np.int64) * 3 + 4)[None, :]
    nn = np.zeros((3, n), bool)
    cn = np.zeros((1, n), bool)
    nn[1, rng.random(n) < 0.1] = True
    cn[0, rng.random(n) < 0.1] = True
    raw = num.copy()
    raw[nn] = np.nan
    src = chunks_from_arrays(raw, cat, nn, cn, chunk_rows=512)
    path = str(tmp_path / "stream.ckpt")
    kw = dict(noise=True, seed=4, linreg_iters=300, chunk_rows=512)

    straight = run_mice_stream(src, iters=3, **kw)
    run_mice_stream(src, iters=1, checkpoint_path=path, **kw)  # "killed"

    calls = {"n": 0}
    import duckdb_imputation_tpu.mice.streaming as ms
    orig = ms.aggregate_stream

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    ms.aggregate_stream = counting
    try:
        resumed = run_mice_stream(src, iters=3, checkpoint_path=path, **kw)
    finally:
        ms.aggregate_stream = orig
    assert calls["n"] == 0, "resume must not re-run the streaming passes"

    np.testing.assert_array_equal(np.asarray(resumed.dirty.cat_codes),
                                  np.asarray(straight.dirty.cat_codes))
    np.testing.assert_allclose(np.asarray(resumed.dirty.num_data),
                               np.asarray(straight.dirty.num_data),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(resumed.idx, straight.idx)
