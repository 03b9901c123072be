"""LDA train/predict from a cofactor triple — the analogue of
/root/reference/examples/example_lda.cpp, through the reference-parity API."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from sklearn.datasets import load_iris
from sklearn.model_selection import train_test_split

from duckdb_imputation_tpu import api


def main():
    x, y = load_iris(return_X_y=True)
    xtr, xte, ytr, yte = train_test_split(
        x.astype(np.float32), y, test_size=0.33, random_state=42)

    # SELECT sum_to_triple_4_1(s_length, s_width, p_length, p_width, target)
    triple = api.sum_to_triple_4_1(*[xtr[:, j] for j in range(4)],
                                   ytr.astype(np.int64))
    # SELECT lda_train(triple, 0, 0.001, false)
    params = api.lda_train(triple, 0, shrinkage=0.001)
    # SELECT lda_predict(params, false, cols…)
    pred = api.lda_predict(params, False, *[xte[:, j] for j in range(4)])
    print(f"LDA accuracy on iris test split: {(pred == yte).mean():.3f}")


if __name__ == "__main__":
    main()
