from .ast import (
    Commit, Delete, Drop, Equals, Has, Keep, Rename, SelectionBlock, Set,
    TypeSelector,
)
from .osmfilter import parse_osmfilter, FilterParseError
from .vector import CompiledFilter
from .oracle import oracle_evaluate

__all__ = [
    "Commit", "Delete", "Drop", "Equals", "Has", "Keep", "Rename",
    "SelectionBlock", "Set", "TypeSelector",
    "parse_osmfilter", "FilterParseError", "CompiledFilter", "oracle_evaluate",
]
