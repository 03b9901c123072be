"""Serialization between the dense Triple/NBAgg pytrees and the reference's
nested key/value dict format.

The reference emits triples as nested LIST/STRUCT values (SumStateFinalize,
/root/reference/duckdb_extension/src/triple/sum/sum_state.cpp:116-464) whose
Python shape (via duckdb fetchall) is

  {'N': int,
   'lin_agg'|'lin_num': [f32]*d,
   'quad_agg'|'quad_num': packed upper triangle, index row*d - row(row+1)/2 + col
                          (ML/utils.cpp:192-199),
   'lin_cat':      [[{'key','value'}] per cat col]          (sorted by key),
   'quad_num_cat': [[{'key','value'}] per (num i, cat j)]   num-major order,
   'quad_cat':     [[{'key1','key2','value'}] per pair i<=j] sorted (key1,key2)}

Aggregate results (sum_to_triple / sum_triple) use field names lin_agg /
quad_agg; scalar ops (to_cofactor lift, multiply_triple) use lin_num /
quad_num — we reproduce that naming split via `style`.

Map-entry inclusion follows the reference's semantics: a key exists in a
section map iff it was ever touched for the group. With a table-wide vocab
that means: lin_cat / quad_num_cat entries appear iff the category's count
(lin_cat value) is nonzero; quad_cat entries appear iff the pair value is
nonzero. This only matters for grouped aggregates where a group sees a strict
subset of the vocab.

This module is a host-side boundary (numpy), used by tests, interchange, and
debugging — never inside the compute path.
"""
from __future__ import annotations

import numpy as np

from ..schema import FeatureSchema
from .triple import NBAgg, Triple


def _np(x):
    return np.asarray(x)


def pack_upper(quad: np.ndarray) -> list[float]:
    """Dense symmetric [d,d] -> packed upper triangle (row-major, row<=col)."""
    d = quad.shape[-1]
    out = []
    for r in range(d):
        for c in range(r, d):
            out.append(float(quad[r, c]))
    return out


def unpack_upper(packed, d: int) -> np.ndarray:
    quad = np.zeros((d, d), np.float32)
    k = 0
    for r in range(d):
        for c in range(r, d):
            quad[r, c] = packed[k]
            quad[c, r] = packed[k]
            k += 1
    return quad


def triple_to_dict(t: Triple, schema: FeatureSchema, style: str = "agg") -> dict:
    """Dense triple -> reference nested dict. style: 'agg' (sum results) or
    'num' (lift / multiply results)."""
    assert style in ("agg", "num")
    lin_name = "lin_agg" if style == "agg" else "lin_num"
    quad_name = "quad_agg" if style == "agg" else "quad_num"
    d, c = schema.num_cols, schema.cat_cols
    offs = schema.offsets
    lin_cat = _np(t.lin_cat)
    num_cat = _np(t.num_cat)
    cat_cat = _np(t.cat_cat)

    # which vocab slots are "present" for this aggregate (count != 0)
    present = lin_cat != 0

    lin_cat_out = []
    for j in range(c):
        keys = schema.cat_keys[j]
        sec = []
        for k_i, key in enumerate(keys):
            v = offs[j] + k_i
            if present[v]:
                sec.append({"key": int(key), "value": float(lin_cat[v])})
        lin_cat_out.append(sec)

    num_cat_out = []
    for i in range(d):          # num-major (lift.cpp / finalize emit order)
        for j in range(c):
            keys = schema.cat_keys[j]
            sec = []
            for k_i, key in enumerate(keys):
                v = offs[j] + k_i
                if present[v]:
                    sec.append({"key": int(key), "value": float(num_cat[i, v])})
            num_cat_out.append(sec)

    cat_cat_out = []
    for j1 in range(c):
        for j2 in range(j1, c):
            sec = []
            block = cat_cat[offs[j1]:offs[j1 + 1], offs[j2]:offs[j2 + 1]]
            entries = []
            for a in range(block.shape[0]):
                for b in range(block.shape[1]):
                    val = block[a, b]
                    if val != 0:
                        entries.append((int(schema.cat_keys[j1][a]),
                                        int(schema.cat_keys[j2][b]),
                                        float(val)))
            entries.sort(key=lambda e: (e[0], e[1]))  # std::map<pair> order
            sec = [{"key1": k1, "key2": k2, "value": v} for k1, k2, v in entries]
            cat_cat_out.append(sec)

    return {
        "N": int(round(float(_np(t.n)))),
        lin_name: [float(x) for x in _np(t.lin)],
        quad_name: pack_upper(_np(t.quad)),
        "lin_cat": lin_cat_out,
        "quad_num_cat": num_cat_out,
        "quad_cat": cat_cat_out,
    }


def nb_to_dict(t: NBAgg, schema: FeatureSchema, style: str = "agg") -> dict:
    """Dense NB aggregate -> reference 4-field dict
    (sum_to_nb_agg.cpp:18-35 / lift_to_nb_agg.cpp:101-118)."""
    assert style in ("agg", "num")
    lin_name = "lin_agg" if style == "agg" else "lin_num"
    quad_name = "quad_agg" if style == "agg" else "quad_num"
    offs = schema.offsets
    lin_cat = _np(t.lin_cat)
    lin_cat_out = []
    for j in range(schema.cat_cols):
        sec = []
        for k_i, key in enumerate(schema.cat_keys[j]):
            v = offs[j] + k_i
            if lin_cat[v] != 0:
                sec.append({"key": int(key), "value": float(lin_cat[v])})
        lin_cat_out.append(sec)
    return {
        "N": int(round(float(_np(t.n)))),
        lin_name: [float(x) for x in _np(t.lin)],
        quad_name: [float(x) for x in _np(t.quad_diag)],
        "lin_cat": lin_cat_out,
    }


def dict_to_triple(d: dict, schema: FeatureSchema | None = None
                   ) -> tuple[Triple, FeatureSchema]:
    """Reference nested dict -> dense triple (the extract_data analogue,
    ML/utils.cpp:6-150). If no schema is given, one is built from the keys
    present in the dict's own maps (sorted, like n_cols_1hot_expansion)."""
    lin = d.get("lin_agg", d.get("lin_num"))
    quad = d.get("quad_agg", d.get("quad_num"))
    nd = len(lin)
    if schema is None:
        cat_keys = tuple(
            tuple(sorted(int(e["key"]) for e in sec)) for sec in d["lin_cat"])
        schema = FeatureSchema(num_cols=nd, cat_keys=cat_keys)
    offs = schema.offsets
    v = schema.vocab_size
    lin_cat = np.zeros((v,), np.float32)
    num_cat = np.zeros((nd, v), np.float32)
    cat_cat = np.zeros((v, v), np.float32)

    def slot(j, key):
        return offs[j] + schema.cat_keys[j].index(int(key))

    for j, sec in enumerate(d["lin_cat"]):
        for e in sec:
            lin_cat[slot(j, e["key"])] = e["value"]
    k = 0
    for i in range(nd):
        for j in range(schema.cat_cols):
            for e in d["quad_num_cat"][k]:
                num_cat[i, slot(j, e["key"])] = e["value"]
            k += 1
    k = 0
    for j1 in range(schema.cat_cols):
        for j2 in range(j1, schema.cat_cols):
            for e in d["quad_cat"][k]:
                a, b = slot(j1, e["key1"]), slot(j2, e["key2"])
                cat_cat[a, b] = e["value"]
                cat_cat[b, a] = e["value"]
            k += 1
    t = Triple(
        n=np.float32(d["N"]),
        lin=np.asarray(lin, np.float32),
        quad=unpack_upper(quad, nd),
        lin_cat=lin_cat, num_cat=num_cat, cat_cat=cat_cat)
    return t, schema


def dict_to_nb(d: dict, schema: FeatureSchema | None = None
               ) -> tuple[NBAgg, FeatureSchema]:
    lin = d.get("lin_agg", d.get("lin_num"))
    quad = d.get("quad_agg", d.get("quad_num"))
    nd = len(lin)
    if schema is None:
        cat_keys = tuple(
            tuple(sorted(int(e["key"]) for e in sec)) for sec in d["lin_cat"])
        schema = FeatureSchema(num_cols=nd, cat_keys=cat_keys)
    offs = schema.offsets
    lin_cat = np.zeros((schema.vocab_size,), np.float32)
    for j, sec in enumerate(d["lin_cat"]):
        for e in sec:
            lin_cat[offs[j] + schema.cat_keys[j].index(int(e["key"]))] = e["value"]
    t = NBAgg(n=np.float32(d["N"]), lin=np.asarray(lin, np.float32),
              quad_diag=np.asarray(quad, np.float32), lin_cat=lin_cat)
    return t, schema


def align_triple(t: Triple, schema: FeatureSchema,
                 target: FeatureSchema) -> Triple:
    """Re-embed a dense triple into a superset vocabulary layout.

    The reference's ring sums merge hash maps, so triples with different
    key sets combine implicitly (SumStateCombine, sum_state.cpp:37-96);
    dense triples must instead be scattered into a common (union) schema
    before elementwise combination."""
    import jax.numpy as jnp
    if target == schema:
        return t
    m = jnp.asarray(schema.vocab_map(target))
    vn = target.vocab_size
    d = schema.num_cols
    batch = t.n.shape  # () or (G,)
    lin_cat = jnp.zeros(batch + (vn,), t.lin_cat.dtype).at[..., m].set(t.lin_cat)
    num_cat = jnp.zeros(batch + (d, vn), t.num_cat.dtype) \
        .at[..., :, m].set(t.num_cat)
    cat_cat = jnp.zeros(batch + (vn, vn), t.cat_cat.dtype) \
        .at[..., m[:, None], m[None, :]].set(t.cat_cat)
    return Triple(n=t.n, lin=t.lin, quad=t.quad, lin_cat=lin_cat,
                  num_cat=num_cat, cat_cat=cat_cat)


def align_nb(t: NBAgg, schema: FeatureSchema, target: FeatureSchema) -> NBAgg:
    """NB-aggregate version of align_triple."""
    import jax.numpy as jnp
    if target == schema:
        return t
    m = jnp.asarray(schema.vocab_map(target))
    batch = t.n.shape
    lin_cat = jnp.zeros(batch + (target.vocab_size,),
                        t.lin_cat.dtype).at[..., m].set(t.lin_cat)
    return NBAgg(n=t.n, lin=t.lin, quad_diag=t.quad_diag, lin_cat=lin_cat)
