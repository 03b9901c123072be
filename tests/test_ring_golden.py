"""Golden-value tests for the ring ops, pinned to the reference's pytest suite
(exact nested-dict equality — sorted key order, packed upper triangle,
section ordering all included)."""
import numpy as np
import pytest

from duckdb_imputation_tpu import FeatureSchema
from duckdb_imputation_tpu.ring import (
    dict_to_triple,
    lift,
    nb_lift,
    nb_multiply,
    nb_to_dict,
    sum_nb_aggs,
    sum_to_nb_agg,
    sum_to_nb_agg_grouped,
    sum_to_triple,
    sum_to_triple_grouped,
    sum_triples,
    triple_multiply,
    triple_to_dict,
    triple_sub,
)
import golden_ring as G


def tslice(t, i):
    """Take group i out of a batched triple."""
    import jax
    return jax.tree.map(lambda x: x[i], t)


def test_sum_everything(ring_test_table):
    _, num, cat = ring_test_table
    schema = FeatureSchema.infer(num, cat)
    t = sum_to_triple(num.T, schema.encode(cat).T, schema=schema)
    assert triple_to_dict(t, schema) == G.SUM_ALL


def test_sum_group_by(ring_test_table):
    gb, num, cat = ring_test_table
    schema = FeatureSchema.infer(num, cat)
    groups = (gb - 1).astype(np.int32)  # gb in {1,2} -> {0,1}
    t = sum_to_triple_grouped(num.T, schema.encode(cat).T, groups,
                              schema=schema, num_groups=2)
    assert triple_to_dict(tslice(t, 0), schema) == G.SUM_GB1
    assert triple_to_dict(tslice(t, 1), schema) == G.SUM_GB2


def test_sum_where(ring_test_table):
    """HAVING gb = 2 ≡ masked aggregation (test_sum.py:35-38)."""
    gb, num, cat = ring_test_table
    schema = FeatureSchema.infer(num, cat)
    t = sum_to_triple(num.T, schema.encode(cat).T,
                      weights=(gb == 2).astype(np.float32), schema=schema)
    assert triple_to_dict(t, schema) == G.SUM_GB2


def test_fused_equals_lift_then_sum(ring_test_table):
    """Algebraic identity: sum_to_triple ≡ sum_triple(to_cofactor(…))
    (test_sum.py:40-52)."""
    _, num, cat = ring_test_table
    schema = FeatureSchema.infer(num, cat)
    codes = schema.encode(cat).T
    fused = sum_to_triple(num.T, codes, schema=schema)
    lifted = sum_triples(lift(num.T, codes, schema=schema))
    assert triple_to_dict(fused, schema) == triple_to_dict(lifted, schema)


def test_lift_rows(lift_test_table):
    _, num, cat = lift_test_table
    schema = FeatureSchema.infer(num, cat)
    t = lift(num.T, schema.encode(cat).T, schema=schema)
    # per-row serialization uses the row's own singleton vocab, like the
    # reference's per-row maps
    for i, expected in ((0, G.LIFT_ROW0), (3, G.LIFT_ROW3)):
        row_schema = FeatureSchema.infer(num[i:i + 1], cat[i:i + 1])
        row = lift(num[i:i + 1].T, row_schema.encode(cat[i:i + 1]).T,
                   schema=row_schema)
        assert triple_to_dict(tslice(row, 0), row_schema, style="num") == expected
    # and the global-vocab lift must agree after re-densification
    d0, _ = dict_to_triple(G.LIFT_ROW0)
    assert float(d0.n) == 1.0


def test_multiply_join(ring_test_table):
    """Factorized join: multiply_triple of two partial aggregates
    (test_mul.py:23-27). Side A: (b,c | d,e) where gb=1; side B: (a,c | d,f)
    where gb=2."""
    gb, num, cat = ring_test_table
    a_num, a_cat = num[:, [1, 2]], cat[:, [0, 1]]   # b,c | d,e
    b_num, b_cat = num[:, [0, 2]], cat[:, [0, 2]]   # a,c | d,f
    sa = FeatureSchema.infer(a_num[gb == 1], a_cat[gb == 1])
    sb = FeatureSchema.infer(b_num[gb == 2], b_cat[gb == 2])
    ta = sum_to_triple(a_num[gb == 1].T, sa.encode(a_cat[gb == 1]).T,
                       schema=sa)
    tb = sum_to_triple(b_num[gb == 2].T, sb.encode(b_cat[gb == 2]).T,
                       schema=sb)
    prod = triple_multiply(ta, tb)
    assert triple_to_dict(prod, sa.concat(sb), style="num") == G.MUL_GB1_GB2


def test_subtract_is_delta_inverse(ring_test_table):
    """full - part == rest (the MICE delta algebra, imputation/triple/sub.cpp)."""
    gb, num, cat = ring_test_table
    schema = FeatureSchema.infer(num, cat)
    codes = schema.encode(cat).T
    full = sum_to_triple(num.T, codes, schema=schema)
    part = sum_to_triple(num.T, codes, weights=(gb == 1).astype(np.float32),
                         schema=schema)
    rest = sum_to_triple(num.T, codes, weights=(gb == 2).astype(np.float32),
                         schema=schema)
    delta = triple_sub(full, part)
    assert triple_to_dict(delta, schema) == triple_to_dict(rest, schema)


# ---------------- NB aggregate variants ----------------

def test_nb_sum_everything(ring_test_table):
    _, num, cat = ring_test_table
    schema = FeatureSchema.infer(num, cat)
    t = sum_to_nb_agg(num.T, schema.encode(cat).T, schema=schema)
    assert nb_to_dict(t, schema) == G.NB_SUM_ALL


def test_nb_sum_group_by(ring_test_table):
    gb, num, cat = ring_test_table
    schema = FeatureSchema.infer(num, cat)
    t = sum_to_nb_agg_grouped(num.T, schema.encode(cat).T,
                              (gb - 1).astype(np.int32),
                              schema=schema, num_groups=2)
    assert nb_to_dict(tslice(t, 0), schema) == G.NB_SUM_GB1


def test_nb_fused_equals_lift_then_sum(ring_test_table):
    _, num, cat = ring_test_table
    schema = FeatureSchema.infer(num, cat)
    codes = schema.encode(cat).T
    fused = sum_to_nb_agg(num.T, codes, schema=schema)
    lifted = sum_nb_aggs(nb_lift(num.T, codes, schema=schema))
    assert nb_to_dict(fused, schema) == nb_to_dict(lifted, schema)


def test_nb_multiply(ring_test_table):
    gb, num, cat = ring_test_table
    a_num, a_cat = num[:, [1, 2]], cat[:, [0, 1]]
    b_num, b_cat = num[:, [0, 2]], cat[:, [0, 2]]
    sa = FeatureSchema.infer(a_num[gb == 1], a_cat[gb == 1])
    sb = FeatureSchema.infer(b_num[gb == 2], b_cat[gb == 2])
    ta = sum_to_nb_agg(a_num[gb == 1].T, sa.encode(a_cat[gb == 1]).T,
                       schema=sa)
    tb = sum_to_nb_agg(b_num[gb == 2].T, sb.encode(b_cat[gb == 2]).T,
                       schema=sb)
    assert nb_to_dict(nb_multiply(ta, tb), sa.concat(sb), style="num") == G.NB_MUL


def test_dict_round_trip():
    t, schema = dict_to_triple(G.SUM_ALL)
    assert triple_to_dict(t, schema) == G.SUM_ALL


def test_chunked_sum_matches():
    """Streaming scan path == single-block path on a larger random table."""
    rng = np.random.default_rng(0)
    n = 5000
    num = rng.normal(size=(n, 3)).astype(np.float32)
    cat = rng.integers(0, 7, size=(n, 2))
    schema = FeatureSchema.infer(num, cat)
    codes = schema.encode(cat).T
    w = rng.integers(0, 2, size=n).astype(np.float32)
    a = sum_to_triple(num.T, codes, w, schema=schema)
    b = sum_to_triple(num.T, codes, w, schema=schema, row_chunk=512)
    np.testing.assert_allclose(np.asarray(a.quad), np.asarray(b.quad),
                               rtol=1e-6, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(a.lin_cat), np.asarray(b.lin_cat))
