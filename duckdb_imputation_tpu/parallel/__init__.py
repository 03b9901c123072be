from .mesh import DATA_AXIS, make_mesh, replicated, row_sharding
from .sharded import (
    build_vocab_sharded,
    sum_to_triple_grouped_sharded,
    sum_to_triple_sharded,
)

__all__ = ["DATA_AXIS", "make_mesh", "replicated", "row_sharding",
           "build_vocab_sharded", "sum_to_triple_grouped_sharded",
           "sum_to_triple_sharded"]
