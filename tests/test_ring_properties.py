"""Property fuzz of the ring algebra on RANDOM schemas and data.

The golden tests (test_ring_golden.py) pin the reference's exact literals on
ONE 5-row table; these tests pin the algebraic LAWS the MICE/factorized
drivers rely on, across randomized shapes — including degenerate ones
(0 numeric cols, 0 cat cols, vocab size 1, n=1, empty groups).

All data is drawn on a dyadic grid (multiples of 1/8, small magnitude) so
f32 ring sums/products are EXACT and every law can be asserted with
array_equal — the same trick the SQL differential fuzz uses. Laws:

  sum:      commutative, associative, (a+b)−b == a, zero identity
  fused:    sum_to_triple == reduce(lift)            (sum_no_lift contract)
  multiply: bilinear (distributes over +), N/lin/quad block semantics vs a
            MATERIALIZED cross join (mul.cpp:19-611 contract)
  grouped:  GROUP BY == per-group masked sums; out-of-range ids dropped
  delta:    full == observed + dirty                 (the MICE invariant)
  serialize: triple_to_dict → dict_to_triple is the identity
"""
import numpy as np
import pytest

from duckdb_imputation_tpu.ring.serialize import (dict_to_nb, dict_to_triple,
                                                  nb_to_dict, triple_to_dict)
from duckdb_imputation_tpu.ring.sum import (lift, nb_lift, sum_nb_aggs,
                                            sum_to_nb_agg, sum_to_triple,
                                            sum_to_triple_grouped,
                                            sum_triples)
from duckdb_imputation_tpu.ring.triple import (nb_multiply, triple_add,
                                               triple_multiply, triple_sub)
from duckdb_imputation_tpu.schema import FeatureSchema

N_TRIALS = 12


def _rand_schema(rng, allow_empty=True):
    d = int(rng.integers(0 if allow_empty else 1, 4))
    c = int(rng.integers(0 if d else 1, 3))
    keys = []
    for _ in range(c):
        size = int(rng.integers(1, 5))
        vals = rng.choice(np.arange(-3, 12), size=size, replace=False)
        keys.append(tuple(int(v) for v in sorted(vals)))
    return FeatureSchema(num_cols=d, cat_keys=tuple(keys))


def _rand_data(rng, schema, n):
    """Dyadic-grid data: f32 ring ops are exact."""
    x = (rng.integers(-16, 17, size=(schema.num_cols, n)) / 8.0
         ).astype(np.float32)
    codes = np.stack([rng.integers(0, len(k), size=n)
                      for k in schema.cat_keys]).astype(np.int32) \
        if schema.cat_cols else np.zeros((0, n), np.int32)
    return x, codes


def _field_items(t):
    return [(f, np.asarray(getattr(t, f)))
            for f in ("n", "lin", "quad", "lin_cat", "num_cat", "cat_cat")]


def _assert_triple_equal(a, b, msg=""):
    for f, av in _field_items(a):
        bv = np.asarray(getattr(b, f))
        np.testing.assert_array_equal(av, bv, err_msg=f"{msg}:{f}")


def _assert_nb_equal(a, b, msg=""):
    for f in ("n", "lin", "quad_diag", "lin_cat"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)),
                                      err_msg=f"{msg}:{f}")


def test_sum_group_laws():
    rng = np.random.default_rng(100)
    for trial in range(N_TRIALS):
        schema = _rand_schema(rng)
        n = int(rng.integers(1, 40))
        xa, ca = _rand_data(rng, schema, n)
        xb, cb = _rand_data(rng, schema, n)
        xc, cc = _rand_data(rng, schema, n)
        a = sum_to_triple(xa, ca, None, schema=schema)
        b = sum_to_triple(xb, cb, None, schema=schema)
        c = sum_to_triple(xc, cc, None, schema=schema)
        _assert_triple_equal(triple_add(a, b), triple_add(b, a),
                             f"commute t{trial}")
        _assert_triple_equal(triple_add(triple_add(a, b), c),
                             triple_add(a, triple_add(b, c)),
                             f"assoc t{trial}")
        _assert_triple_equal(triple_sub(triple_add(a, b), b), a,
                             f"sub-inverse t{trial}")


def test_fused_equals_lift_sum_random():
    rng = np.random.default_rng(101)
    for trial in range(N_TRIALS):
        schema = _rand_schema(rng)
        n = int(rng.integers(1, 60))
        x, c = _rand_data(rng, schema, n)
        fused = sum_to_triple(x, c, None, schema=schema)
        lifted = sum_triples(lift(x, c, schema=schema))
        _assert_triple_equal(fused, lifted, f"t{trial}")
        nb_f = sum_to_nb_agg(x, c, None, schema=schema)
        nb_l = sum_nb_aggs(nb_lift(x, c, schema=schema))
        _assert_nb_equal(nb_f, nb_l, f"nb t{trial}")


def _materialized_product(xa, ca, xb, cb, sa, sb):
    """Triple over the CROSS JOIN of two row sets — the semantic ground
    truth of multiply_triple (README.md:163-174: a join is the product of
    per-key triples; with a single key the join is the cross product)."""
    na, nb = xa.shape[-1], xb.shape[-1]
    ia, ib = np.repeat(np.arange(na), nb), np.tile(np.arange(nb), na)
    x = np.concatenate([xa[:, ia], xb[:, ib]], axis=0)
    c = np.concatenate([ca[:, ia], cb[:, ib]], axis=0).astype(np.int32)
    return sum_to_triple(x, c, None, schema=sa.concat(sb))


def test_multiply_matches_materialized_cross_join():
    rng = np.random.default_rng(102)
    for trial in range(N_TRIALS):
        sa = _rand_schema(rng)
        sb = _rand_schema(rng, allow_empty=False)
        na, nb = int(rng.integers(1, 12)), int(rng.integers(1, 12))
        xa, ca = _rand_data(rng, sa, na)
        xb, cb = _rand_data(rng, sb, nb)
        ta = sum_to_triple(xa, ca, None, schema=sa)
        tb = sum_to_triple(xb, cb, None, schema=sb)
        prod = triple_multiply(ta, tb)
        ref = _materialized_product(xa, ca, xb, cb, sa, sb)
        _assert_triple_equal(prod, ref, f"t{trial}")


def test_multiply_is_bilinear():
    rng = np.random.default_rng(103)
    for trial in range(N_TRIALS):
        sa, sb = _rand_schema(rng), _rand_schema(rng, allow_empty=False)
        xa1, ca1 = _rand_data(rng, sa, int(rng.integers(1, 15)))
        xa2, ca2 = _rand_data(rng, sa, int(rng.integers(1, 15)))
        xb, cb = _rand_data(rng, sb, int(rng.integers(1, 15)))
        a1 = sum_to_triple(xa1, ca1, None, schema=sa)
        a2 = sum_to_triple(xa2, ca2, None, schema=sa)
        b = sum_to_triple(xb, cb, None, schema=sb)
        lhs = triple_multiply(triple_add(a1, a2), b)
        rhs = triple_add(triple_multiply(a1, b), triple_multiply(a2, b))
        _assert_triple_equal(lhs, rhs, f"t{trial}")
        # NB ring distributes too
        na1 = sum_to_nb_agg(xa1, ca1, None, schema=sa)
        na2 = sum_to_nb_agg(xa2, ca2, None, schema=sa)
        nb_ = sum_to_nb_agg(xb, cb, None, schema=sb)
        _assert_nb_equal(nb_multiply(na1 + na2, nb_),
                         nb_multiply(na1, nb_) + nb_multiply(na2, nb_),
                         f"nb t{trial}")


def test_grouped_equals_per_group_masked():
    rng = np.random.default_rng(104)
    for trial in range(N_TRIALS):
        schema = _rand_schema(rng)
        n = int(rng.integers(2, 80))
        num_groups = int(rng.integers(1, 6))
        x, c = _rand_data(rng, schema, n)
        # include out-of-range ids (dropped) and possibly empty groups
        g = rng.integers(-1, num_groups + 1, size=n).astype(np.int32)
        got = sum_to_triple_grouped(x, c, g, schema=schema,
                                    num_groups=num_groups, method="masked")
        got_sorted = sum_to_triple_grouped(x, c, g, schema=schema,
                                           num_groups=num_groups,
                                           method="sorted")
        for gi in range(num_groups):
            w = (g == gi).astype(np.float32)
            ref = sum_to_triple(x, c, w, schema=schema)
            for f, av in _field_items(ref):
                np.testing.assert_array_equal(
                    np.asarray(getattr(got, f))[gi], av,
                    err_msg=f"masked t{trial} g{gi}:{f}")
                np.testing.assert_array_equal(
                    np.asarray(getattr(got_sorted, f))[gi], av,
                    err_msg=f"sorted t{trial} g{gi}:{f}")


def test_delta_partition_invariant():
    """full == observed-part + dirty-part for random masks — the identity
    the whole delta-MICE regime stands on (imputation_low.cpp:85-110)."""
    rng = np.random.default_rng(105)
    for trial in range(N_TRIALS):
        schema = _rand_schema(rng)
        n = int(rng.integers(1, 64))
        x, c = _rand_data(rng, schema, n)
        w = (rng.random(n) < 0.5).astype(np.float32)
        full = sum_to_triple(x, c, None, schema=schema)
        obs = sum_to_triple(x, c, w, schema=schema)
        dirty = sum_to_triple(x, c, 1.0 - w, schema=schema)
        _assert_triple_equal(full, triple_add(obs, dirty), f"t{trial}")
        _assert_triple_equal(triple_sub(full, dirty), obs, f"sub t{trial}")


def test_serialize_round_trip_random():
    rng = np.random.default_rng(106)
    for trial in range(N_TRIALS):
        schema = _rand_schema(rng)
        n = int(rng.integers(1, 40))
        x, c = _rand_data(rng, schema, n)
        t = sum_to_triple(x, c, None, schema=schema)
        d = triple_to_dict(t, schema)
        t2, s2 = dict_to_triple(d, schema)
        assert s2 == schema
        _assert_triple_equal(t, t2, f"t{trial}")
        nb = sum_to_nb_agg(x, c, None, schema=schema)
        nb2, s3 = dict_to_nb(nb_to_dict(nb, schema), schema)
        assert s3 == schema
        _assert_nb_equal(nb, nb2, f"nb t{trial}")
