from .profiling import PhaseTimer, device_trace
from .checkpoint import MiceCheckpointer, load_table, save_table
from .validate import TripleValidationError, validate_nb, validate_triple

__all__ = ["PhaseTimer", "device_trace", "MiceCheckpointer", "load_table",
           "save_table", "TripleValidationError", "validate_nb",
           "validate_triple"]
