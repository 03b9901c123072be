from .baseline import run_mice_baseline
from .factorized import run_mice_factorized, run_mice_star
from .low import run_mice_low
from .high import run_mice_high
from .partition import Partitions, build_partitions, init_fill, observed_weights
from .sharded_round import run_mice_sharded
from .streaming import StreamImputation, impute_csv_stream, run_mice_stream

__all__ = ["run_mice_baseline", "run_mice_factorized", "run_mice_star",
           "run_mice_low",
           "run_mice_high",
           "Partitions", "build_partitions", "init_fill", "observed_weights",
           "run_mice_sharded",
           "StreamImputation", "impute_csv_stream", "run_mice_stream"]
