from .table import Table, from_numpy

__all__ = ["Table", "from_numpy"]
