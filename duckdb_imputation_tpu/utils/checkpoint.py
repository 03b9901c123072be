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


def save_table(path: str, t: Table, extra: dict | None = None) -> None:
    meta = {
        "num_cols": t.schema.num_cols,
        "cat_keys": [list(k) for k in t.schema.cat_keys],
        "num_names": list(t.num_names),
        "cat_names": list(t.cat_names),
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    np.savez_compressed(
        tmp if tmp.endswith(".npz") else tmp,
        num_data=np.asarray(t.num_data),
        cat_codes=np.asarray(t.cat_codes),
        num_null=np.asarray(t.num_null),
        cat_null=np.asarray(t.cat_null),
        meta=json.dumps(meta))
    os.replace(tmp if tmp.endswith(".npz") else tmp + ".npz", path)


def load_table(path: str) -> tuple[Table, dict]:
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
    return t, meta.get("extra", {})


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
