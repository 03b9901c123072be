from .table import Table, from_numpy, from_pandas

__all__ = ["Table", "from_numpy", "from_pandas"]
