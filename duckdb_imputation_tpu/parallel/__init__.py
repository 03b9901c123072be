from .mesh import DATA_AXIS, make_mesh, replicated, row_sharding
from .overlap import sum_to_triple_overlapped
from .sharded import (
    build_vocab_sharded,
    factorized_join_sum_sharded,
    sum_to_triple_grouped_sharded,
    sum_to_triple_sharded,
)
from .sharded2d import make_mesh_2d, sum_to_triple_sharded2d
from .wide import (
    cg_solve_wide,
    linreg_train_wide,
    mice_column_step_wide,
    predict_wide,
    sigma_wide,
)

__all__ = ["DATA_AXIS", "make_mesh", "replicated", "row_sharding",
           "build_vocab_sharded", "factorized_join_sum_sharded",
           "sum_to_triple_grouped_sharded",
           "sum_to_triple_sharded", "make_mesh_2d", "sum_to_triple_sharded2d",
           "sum_to_triple_overlapped", "sigma_wide", "cg_solve_wide",
           "linreg_train_wide", "predict_wide", "mice_column_step_wide"]
