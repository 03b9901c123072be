from .triple import (
    NBAgg,
    Triple,
    nb_multiply,
    sigma_from_triple,
    triple_add,
    triple_from_sigma,
    triple_multiply,
    triple_scale,
    triple_sub,
)
from .sum import (
    lift,
    masked_sigma,
    nb_lift,
    onehot_block,
    sum_nb_aggs,
    sum_to_nb_agg,
    sum_to_nb_agg_grouped,
    sum_to_triple,
    sum_to_triple_grouped,
    sum_triples,
)
from .striped import sigma_stripe, sigma_striped
from .streaming import (Chunk, aggregate_stream, assemble_filled_triple,
                        chunks_from_arrays)
from .serialize import (
    dict_to_nb,
    dict_to_triple,
    nb_to_dict,
    pack_upper,
    triple_to_dict,
    unpack_upper,
)

__all__ = [
    "NBAgg", "Triple", "nb_multiply", "sigma_from_triple", "triple_add",
    "triple_from_sigma", "triple_multiply", "triple_scale", "triple_sub",
    "lift", "masked_sigma", "nb_lift", "onehot_block", "sum_nb_aggs",
    "sum_to_nb_agg", "sum_to_nb_agg_grouped", "sum_to_triple",
    "sum_to_triple_grouped", "sum_triples", "dict_to_nb", "dict_to_triple",
    "nb_to_dict", "pack_upper", "triple_to_dict", "unpack_upper",
    "sigma_stripe", "sigma_striped",
    "Chunk", "aggregate_stream", "assemble_filled_triple",
    "chunks_from_arrays",
]
