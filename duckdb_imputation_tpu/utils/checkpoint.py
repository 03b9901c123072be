"""Checkpoint / resume for tables and MICE runs.

The reference has none (SURVEY.md §5): its MICE state is the database
tables, restartable only by accident. Here the state is an explicit pytree,
so checkpointing is a dependency-free npz dump of (columns, masks, schema,
iteration counter); `run_mice_*(…, checkpoint_path=…, on_iteration=…)`
writes one per MICE round and resumes mid-run.
"""
from __future__ import annotations

import dataclasses
import io
import json
import os

import jax.numpy as jnp
import numpy as np

from ..schema import FeatureSchema
from ..table.table import Table


def save_table(path: str, t: Table, extra: dict | None = None,
               arrays: dict | None = None) -> None:
    """Atomic npz snapshot of a Table. `extra` rides as JSON metadata;
    `arrays` is an optional dict of additional numpy arrays stored under
    `x_<name>` keys (load_table returns them)."""
    meta = {
        "num_cols": t.schema.num_cols,
        "cat_keys": [list(k) for k in t.schema.cat_keys],
        "num_names": list(t.num_names),
        "cat_names": list(t.cat_names),
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    np.savez_compressed(
        tmp,
        num_data=np.asarray(t.num_data),
        cat_codes=np.asarray(t.cat_codes),
        num_null=np.asarray(t.num_null),
        cat_null=np.asarray(t.cat_null),
        meta=json.dumps(meta),
        **{f"x_{k}": np.asarray(v) for k, v in (arrays or {}).items()})
    os.replace(tmp + ".npz", path)


def load_table(path: str) -> tuple[Table, dict]:
    t, extra, _ = load_table_arrays(path)
    return t, extra


def load_table_arrays(path: str) -> tuple[Table, dict, dict]:
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    schema = FeatureSchema(
        num_cols=int(meta["num_cols"]),
        cat_keys=tuple(tuple(int(v) for v in k) for k in meta["cat_keys"]))
    t = Table(
        num_data=jnp.asarray(z["num_data"]),
        cat_codes=jnp.asarray(z["cat_codes"]),
        num_null=jnp.asarray(z["num_null"]),
        cat_null=jnp.asarray(z["cat_null"]),
        schema=schema,
        num_names=tuple(meta["num_names"]),
        cat_names=tuple(meta["cat_names"]))
    arrays = {k[2:]: z[k] for k in z.files if k.startswith("x_")}
    return t, meta.get("extra", {}), arrays


@dataclasses.dataclass
class StreamCheckpointer:
    """Checkpoint/resume for out-of-core MICE (mice/streaming.py): persists
    everything `run_mice_stream` needs to resume WITHOUT re-running the two
    streaming read passes — the full Triple, the dirty-row cache table, the
    dirty global indices, the stream fills/schema, and the completed round.
    All O(dirty + (P+V)²), never O(n)."""
    path: str

    def save(self, t: Table, full, idx: np.ndarray, fills, ss,
             completed_iters: int) -> None:
        extra = {
            "completed_iters": completed_iters,
            "fills": {
                "num_means": [float(v) for v in fills.num_means],
                "cat_modes": [int(v) for v in fills.cat_modes],
                "num_null_counts": [int(v) for v in fills.num_null_counts],
                "cat_null_counts": [int(v) for v in fills.cat_null_counts],
            },
            "ss": {
                "nullable_num": list(ss.nullable_num),
                "nullable_cat": list(ss.nullable_cat),
                "n_rows": int(ss.n_rows),
            },
        }
        save_table(self.path, t, extra, arrays={
            "idx": np.asarray(idx, np.int64),
            "full_n": np.asarray(full.n), "full_lin": np.asarray(full.lin),
            "full_quad": np.asarray(full.quad),
            "full_lin_cat": np.asarray(full.lin_cat),
            "full_num_cat": np.asarray(full.num_cat),
            "full_cat_cat": np.asarray(full.cat_cat)})

    def resume(self):
        """-> (t, full, idx, fills, ss, completed_iters) or None."""
        if not os.path.exists(self.path):
            return None
        from ..ring.streaming import StreamFills, StreamSchema
        from ..ring.triple import Triple

        t, extra, arr = load_table_arrays(self.path)
        full = Triple(n=jnp.asarray(arr["full_n"]),
                      lin=jnp.asarray(arr["full_lin"]),
                      quad=jnp.asarray(arr["full_quad"]),
                      lin_cat=jnp.asarray(arr["full_lin_cat"]),
                      num_cat=jnp.asarray(arr["full_num_cat"]),
                      cat_cat=jnp.asarray(arr["full_cat_cat"]))
        f = extra["fills"]
        fills = StreamFills(
            num_means=tuple(f["num_means"]),
            cat_modes=tuple(f["cat_modes"]),
            num_null_counts=tuple(f["num_null_counts"]),
            cat_null_counts=tuple(f["cat_null_counts"]))
        s = extra["ss"]
        ss = StreamSchema(schema=t.schema,
                          nullable_num=tuple(s["nullable_num"]),
                          nullable_cat=tuple(s["nullable_cat"]),
                          n_rows=int(s["n_rows"]))
        return t, full, np.asarray(arr["idx"]), fills, ss, \
            int(extra["completed_iters"])


@dataclasses.dataclass
class MiceCheckpointer:
    """on_iteration callback: persist the table after every MICE round and
    report the round to resume from."""
    path: str

    def __call__(self, t: Table, iteration: int) -> None:
        save_table(self.path, t, extra={"completed_iters": iteration + 1})

    def resume(self) -> tuple[Table, int] | None:
        if not os.path.exists(self.path):
            return None
        t, extra = load_table(self.path)
        return t, int(extra.get("completed_iters", 0))
