"""Model parameter bundles: save/load the flat float32 parameter vectors
with enough schema metadata to serve predictions later.

The reference has no persistence at all — a trained model lives only as a
FLOAT[] SQL value inside one connection (imputation_base.cpp:46-49 trains
and predicts in the same statement sequence). For production serving the
flat vector (whose layout is the reference's serialization contract,
lda.cpp:335-415 / regression.cpp:313-348 / qda.cpp:85-112 /
naive_bayes.cpp:44-97) is stored in an .npz beside the feature schema:
column names in training order, per-column category vocabularies, the
label binding, and the flags (normalize / variance) that change the
parse of the vector.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..schema import FeatureSchema

MODELS = ("linreg", "lda", "qda", "nb")


@dataclasses.dataclass(frozen=True)
class ModelBundle:
    model: str                   # linreg | lda | qda | nb
    params: np.ndarray           # flat f32 — the reference layout
    schema: FeatureSchema        # FEATURE schema (what the triple ran over)
    num_names: tuple[str, ...]   # numeric feature cols, training order
    cat_names: tuple[str, ...]   # categorical feature cols, training order
    label_name: str
    label_kind: str              # 'num' (linreg) | 'cat'
    label_keys: tuple[int, ...]  # label vocab (class values; () for linreg)
    normalize: bool = False
    has_variance: bool = False   # linreg: params carry the noise std


def save_model(path: str, bundle: ModelBundle) -> None:
    keys = bundle.schema.cat_keys
    np.savez(
        path,
        model=np.array(bundle.model),
        params=np.asarray(bundle.params, np.float32),
        num_cols=np.array(bundle.schema.num_cols),
        cat_sizes=np.array([len(k) for k in keys], np.int64),
        cat_keys_flat=(np.concatenate([np.asarray(k, np.int64)
                                       for k in keys])
                       if keys else np.zeros(0, np.int64)),
        num_names=np.array(bundle.num_names),
        cat_names=np.array(bundle.cat_names),
        label_name=np.array(bundle.label_name),
        label_kind=np.array(bundle.label_kind),
        label_keys=np.asarray(bundle.label_keys, np.int64),
        normalize=np.array(bundle.normalize),
        has_variance=np.array(bundle.has_variance),
    )


def load_model(path: str) -> ModelBundle:
    z = np.load(path, allow_pickle=False)
    sizes = z["cat_sizes"]
    flat = z["cat_keys_flat"]
    keys, off = [], 0
    for s in sizes:
        keys.append(tuple(int(v) for v in flat[off:off + int(s)]))
        off += int(s)
    schema = FeatureSchema(num_cols=int(z["num_cols"]),
                           cat_keys=tuple(keys))
    return ModelBundle(
        model=str(z["model"]),
        params=np.asarray(z["params"], np.float32),
        schema=schema,
        num_names=tuple(str(s) for s in z["num_names"]),
        cat_names=tuple(str(s) for s in z["cat_names"]),
        label_name=str(z["label_name"]),
        label_kind=str(z["label_kind"]),
        label_keys=tuple(int(v) for v in z["label_keys"]),
        normalize=bool(z["normalize"]),
        has_variance=bool(z["has_variance"]),
    )
