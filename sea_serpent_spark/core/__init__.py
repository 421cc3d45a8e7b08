from .column import Column
from .filter import Filter
from .table import Table

__all__ = ["Column", "Filter", "Table"]
