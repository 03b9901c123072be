"""Columnar table abstraction: a pytree of device arrays + null masks.

Replaces the reference's DuckDB storage layer for the imputation workload:

- columns: f32[n] numeric / i64[n] categorical, held as [n, d] matrices
  (MXU-friendly); FLOAT/DOUBLE ⇒ numeric, anything else ⇒ categorical —
  the reference's dispatch rule (triple/lift.cpp:34-37).
- null masks: bool[n] per nullable column — the `<col>_IS_NULL` flag columns
  that `init_baseline` materializes (imputation/algorithms/partition.cpp:
  671-719).
- write-back: functional column replace (jnp.where) — this dissolves the
  reference's patched `ALTER TABLE … SET DEFAULT` zero-copy column-segment
  swap (duckdb_imputation.patch:26-175): replacing one column is already
  O(column) and touches nothing else; with donated buffers it is in-place.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..schema import FeatureSchema


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Table:
    """Columnar table. All arrays share leading row count n.

    num_data: f32[n, d_num] — numeric columns (current, possibly imputed).
    cat_codes: i32[n, d_cat] — categorical columns as LOCAL per-column codes
      against `schema` (static field).
    num_null: bool[n, d_num] — True where the value was ORIGINALLY missing.
    cat_null: bool[n, d_cat].
    """
    num_data: jax.Array
    cat_codes: jax.Array
    num_null: jax.Array
    cat_null: jax.Array
    schema: FeatureSchema = dataclasses.field(
        metadata=dict(static=True))
    num_names: tuple[str, ...] = dataclasses.field(
        default=(), metadata=dict(static=True))
    cat_names: tuple[str, ...] = dataclasses.field(
        default=(), metadata=dict(static=True))

    @property
    def n_rows(self) -> int:
        return self.num_data.shape[0] if self.num_data.ndim else 0

    def cat_values(self) -> np.ndarray:
        """Decode codes back to raw category values (host)."""
        codes = np.asarray(self.cat_codes)
        out = np.zeros_like(codes, dtype=np.int64)
        for j in range(self.schema.cat_cols):
            out[:, j] = self.schema.decode(j, codes[:, j])
        return out

    def with_num_col(self, j: int, values: jax.Array,
                     only_null: bool = True) -> "Table":
        """Write-back for a numeric column: replace (masked) values — the
        `CASE WHEN col_IS_NULL THEN pred ELSE col END` + column swap of the
        MICE loop (imputation_base.cpp:137-139)."""
        col = self.num_data[:, j]
        new = jnp.where(self.num_null[:, j], values, col) if only_null else values
        return dataclasses.replace(
            self, num_data=self.num_data.at[:, j].set(new))

    def with_cat_col(self, j: int, codes: jax.Array,
                     only_null: bool = True) -> "Table":
        col = self.cat_codes[:, j]
        new = jnp.where(self.cat_null[:, j], codes, col) if only_null else codes
        return dataclasses.replace(
            self, cat_codes=self.cat_codes.at[:, j].set(new))

    def null_count_per_row(self) -> jax.Array:
        """The `n_nulls` row histogram column of `partition`
        (partition.cpp:61-73)."""
        return (jnp.sum(self.num_null, axis=1)
                + jnp.sum(self.cat_null, axis=1)).astype(jnp.int32)


def from_numpy(num_data=None, cat_data=None, num_null=None, cat_null=None,
               num_names=(), cat_names=(), schema: FeatureSchema | None = None
               ) -> Table:
    """Build a Table from host arrays. NaNs in num_data and negative values
    in cat_data are treated as missing when explicit masks are absent.
    Missing cells are left as-is (call mice.partition.init_fill to fill)."""
    if num_data is None:
        n = len(cat_data)
        num_data = np.zeros((n, 0), np.float32)
    num_data = np.asarray(num_data, np.float32)
    n = num_data.shape[0]
    if cat_data is None:
        cat_data = np.zeros((n, 0), np.int64)
    cat_data = np.asarray(cat_data)
    if num_null is None:
        num_null = np.isnan(num_data)
    if cat_null is None:
        cat_null = cat_data < 0
    num_null = np.asarray(num_null, bool)
    cat_null = np.asarray(cat_null, bool)
    if schema is None:
        # vocab from OBSERVED values only (missing cells don't define classes)
        keys = []
        for j in range(cat_data.shape[1]):
            obs = cat_data[~cat_null[:, j], j]
            keys.append(tuple(int(v) for v in np.unique(obs)))
        schema = FeatureSchema(num_cols=num_data.shape[1],
                               cat_keys=tuple(keys))
    codes = schema.encode(np.where(cat_null,
                                   np.array([k[0] if k else 0 for k in schema.cat_keys])[None, :] if schema.cat_cols else cat_data,
                                   cat_data)) if schema.cat_cols else np.zeros((n, 0), np.int32)
    if not num_names:
        num_names = tuple(f"num{j}" for j in range(num_data.shape[1]))
    if not cat_names:
        cat_names = tuple(f"cat{j}" for j in range(cat_data.shape[1]))
    return Table(
        num_data=jnp.asarray(np.where(num_null, 0.0, num_data), jnp.float32),
        cat_codes=jnp.asarray(codes, jnp.int32),
        num_null=jnp.asarray(num_null),
        cat_null=jnp.asarray(cat_null),
        schema=schema, num_names=num_names, cat_names=cat_names)
