"""Sigma-matrix assembly and related transforms from dense triples.

In the reference, `build_sigma_matrix` (ML/utils.cpp:176-310 keyed overload,
:313-483 self-building overload) scatters the triple's nested maps into a
dense (1+d+V)² double matrix, and `n_cols_1hot_expansion` (:520-576) rebuilds
the category dictionary. With the dense Triple those become pure index
selection: the triple IS the sigma matrix in blocks; excluding a label column
or dropping first categories is a gather on the vocab axis.

All solver-side math here is float64 numpy on the host — the same
precision/provider (LAPACK) the reference uses for training, and the right
tool: sigma is a tiny (≤ few-hundred)² matrix; the FLOPs live in the
aggregation, not the solve.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..schema import FeatureSchema
from ..ring.triple import Triple


@dataclasses.dataclass(frozen=True)
class VocabSelection:
    """A selection of vocab slots: the kept schema + flat indices into V."""
    schema: FeatureSchema       # schema restricted to kept columns/categories
    slots: np.ndarray           # i64[V'] indices into the original vocab axis
    kept_cols: tuple[int, ...]  # original cat column ids that survive


def select_vocab(schema: FeatureSchema, exclude_cat: int | None = None,
                 drop_first: bool = False) -> VocabSelection:
    """Build the vocab gather for sigma assembly.

    exclude_cat: drop an entire categorical column (the label exclusion of
      build_sigma_matrix's `label_categorical_sigma`, ML/utils.cpp:211-215).
    drop_first: drop the first category of every kept column (QDA,
      ML/utils.cpp:565-572)."""
    offs = schema.offsets
    slots: list[int] = []
    keys: list[tuple[int, ...]] = []
    kept: list[int] = []
    for j in range(schema.cat_cols):
        if exclude_cat is not None and j == exclude_cat:
            continue
        start = offs[j] + (1 if drop_first else 0)
        slots.extend(range(start, offs[j + 1]))
        keys.append(schema.cat_keys[j][1 if drop_first else 0:])
        kept.append(j)
    return VocabSelection(
        schema=FeatureSchema(num_cols=schema.num_cols, cat_keys=tuple(keys)),
        slots=np.asarray(slots, np.int64),
        kept_cols=tuple(kept),
    )


def build_sigma(t: Triple, schema: FeatureSchema,
                exclude_cat: int | None = None,
                drop_first: bool = False) -> tuple[np.ndarray, VocabSelection]:
    """Dense f64 sigma matrix [[N, lin, lin_cat],[…]] with optional label
    exclusion / drop-first. Returns (sigma, selection)."""
    sel = select_vocab(schema, exclude_cat, drop_first)
    d = schema.num_cols
    s = sel.slots
    n = float(np.asarray(t.n))
    lin = np.asarray(t.lin, np.float64)
    quad = np.asarray(t.quad, np.float64)
    lin_cat = np.asarray(t.lin_cat, np.float64)[s]
    num_cat = np.asarray(t.num_cat, np.float64)[:, s]
    cat_cat = np.asarray(t.cat_cat, np.float64)[np.ix_(s, s)]
    p = 1 + d + len(s)
    sigma = np.zeros((p, p), np.float64)
    sigma[0, 0] = n
    sigma[0, 1:1 + d] = lin
    sigma[1:1 + d, 0] = lin
    sigma[1:1 + d, 1:1 + d] = quad
    sigma[0, 1 + d:] = lin_cat
    sigma[1 + d:, 0] = lin_cat
    sigma[1:1 + d, 1 + d:] = num_cat
    sigma[1 + d:, 1:1 + d] = num_cat.T
    sigma[1 + d:, 1 + d:] = cat_cat
    return sigma, sel


def standardize_sigma(sigma: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """In-place sigma standardization (ML/utils.cpp:580-599): convert to the
    Gram matrix of standardized data. Returns (means, std); sigma's first
    row/col sums are zeroed (standardized columns sum to 0)."""
    p = sigma.shape[0]
    n = sigma[0, 0]
    means = sigma[0, :].copy() / n
    std = np.sqrt(np.diag(sigma) / n - (sigma[0, :] / n) ** 2)
    for i in range(1, p):
        for j in range(1, p):
            sigma[i, j] = (sigma[i, j] - means[i] * sigma[0, j]
                           - means[j] * sigma[0, i]
                           + n * means[j] * means[i]) / (std[i] * std[j])
    sigma[0, 1:] = 0.0
    sigma[1:, 0] = 0.0
    return means, std


def class_sums(t: Triple, schema: FeatureSchema, label: int,
               sel: VocabSelection) -> np.ndarray:
    """Per-class sum vectors from the triple's own categorical sections — the
    factorized GROUP BY label (build_sum_vector, lda.cpp:58-144).

    Returns f64[C, P'] where C = |vocab(label)| and P' = 1 + d + V' (the
    label-excluded sigma width): row c = [count_c, Σ x_num per col,
    Σ onehot(other cats)] over rows with label == category c."""
    offs = schema.offsets
    lab = np.arange(offs[label], offs[label + 1])
    s = sel.slots
    d = schema.num_cols
    counts = np.asarray(t.lin_cat, np.float64)[lab]              # [C]
    num_sums = np.asarray(t.num_cat, np.float64)[:, lab]         # [d, C]
    cat_sums = np.asarray(t.cat_cat, np.float64)[np.ix_(lab, s)] # [C, V']
    out = np.zeros((len(lab), 1 + d + len(s)), np.float64)
    out[:, 0] = counts
    out[:, 1:1 + d] = num_sums.T
    out[:, 1 + d:] = cat_sums
    return out
