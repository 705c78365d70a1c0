"""OSMFilter statement AST.

Mirrors the reference's statement enums
(``/root/reference/src/filter/osmfilter/logic.rs:5-62``): three selector
kinds (TYPE / HAS / EQUALS) and the modifier/terminal statements, plus
the nestable selection block.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TypeSelector:
    node: bool = False
    way: bool = False
    relation: bool = False


@dataclass(frozen=True)
class Has:
    key: str


@dataclass(frozen=True)
class Equals:
    key: str
    value: str


Selector = TypeSelector | Has | Equals


@dataclass(frozen=True)
class Commit:
    pass


@dataclass(frozen=True)
class Drop:
    pass


@dataclass(frozen=True)
class Set:
    key: str
    value: str


@dataclass(frozen=True)
class Rename:
    old_key: str
    new_key: str


@dataclass(frozen=True)
class Keep:
    keys: tuple[str, ...]


@dataclass(frozen=True)
class Delete:
    keys: tuple[str, ...]


@dataclass
class SelectionBlock:
    selector: Selector
    statements: list = field(default_factory=list)


Statement = Commit | Drop | Set | Rename | Keep | Delete | SelectionBlock
