"""OSMFilter DSL parser.

Hand-rolled recursive parser of the reference's pest grammar
(``/root/reference/src/filter/osmfilter/osmfilter.pest:1-62``):

* header ``OSMFilter v?X.Y.Z`` followed by a blank line; a version
  mismatch only warns (``parse.rs:122-131``)
* ``#`` comments to end of line; blank lines allowed between statements
* selectors (``TYPE a, b`` / ``HAS "k"`` / ``EQUALS "k" "v"``) own a
  tab-indented block of one or more statements; blocks nest
* modifiers ``SET/RENAME/KEEP/DELETE`` and terminals ``COMMIT/DROP``
* quoted strings support the grammar's escapes
  (``\\" \\\\ \\/ \\b \\f \\n \\r \\t \\uXXXX``)
"""

from __future__ import annotations

import re
import warnings

from .ast import (
    Commit, Delete, Drop, Equals, Has, Keep, Rename, SelectionBlock, Set,
    TypeSelector, Statement,
)

ENGINE_FILTER_VERSION = "0.2.0"

_HEADER_RE = re.compile(r"^OSMFilter v?(\d+)\.(\d+)\.(\d+)\s*$")
_ESCAPES = {'"': '"', "\\": "\\", "/": "/", "b": "\b", "f": "\f",
            "n": "\n", "r": "\r", "t": "\t"}


class FilterParseError(ValueError):
    pass


def _check_escapes(s: str) -> str:
    """Validate escape-sequence FORM but keep the raw span: the
    reference's pest grammar accepts ``\\" \\\\ \\/ \\b \\f \\n \\r
    \\t \\uXXXX`` syntactically yet ``get_inner_string``
    (parse.rs:13-15) returns the span as-is — escapes stay literal in
    the parsed program ("TODO: think more about what/how to escape" in
    the grammar).  Matching byte-for-byte means NOT unescaping here;
    malformed escapes are still parse errors, as in pest."""
    i = 0
    while i < len(s):
        if s[i] == "\\":
            if i + 1 >= len(s):
                raise FilterParseError(f"dangling escape in string: {s!r}")
            nxt = s[i + 1]
            if nxt in _ESCAPES:
                i += 2
            elif nxt == "u":
                if not re.fullmatch(r"[0-9a-fA-F]{4}", s[i + 2:i + 6]):
                    raise FilterParseError(f"bad \\u escape in string: {s!r}")
                i += 6
            else:
                raise FilterParseError(f"bad escape \\{nxt} in string: {s!r}")
        else:
            i += 1
    return s


def _strip_comment(line: str) -> str:
    """Remove a trailing '# …' comment (quotes considered)."""
    in_str = False
    i = 0
    while i < len(line):
        c = line[i]
        if c == "\\" and in_str:
            i += 2
            continue
        if c == '"':
            in_str = not in_str
        elif c == "#" and not in_str:
            return line[:i].rstrip()
        i += 1
    return line.rstrip()


def _parse_quoted_list(rest: str, line_no: int) -> list[str]:
    """Parse `"a", "b", …` — returns raw-span strings (escape forms
    validated, not transformed — see :func:`_check_escapes`)."""
    items = []
    i = 0
    n = len(rest)
    while i < n:
        if rest[i] != '"':
            raise FilterParseError(f"line {line_no}: expected quoted string at {rest[i:]!r}")
        j = i + 1
        buf = []
        while j < n and rest[j] != '"':
            if rest[j] == "\\":
                buf.append(rest[j:j + 2])
                j += 2
            else:
                buf.append(rest[j])
                j += 1
        if j >= n:
            raise FilterParseError(f"line {line_no}: unterminated string")
        items.append(_check_escapes("".join(buf)))
        i = j + 1
        if i < n:
            if rest[i:i + 2] == ", ":
                i += 2
            elif rest[i] == " ":
                i += 1
            else:
                raise FilterParseError(f"line {line_no}: unexpected {rest[i:]!r}")
    return items


def _parse_statement_line(text: str, line_no: int):
    """Returns (ast_node, is_selector)."""
    if text == "COMMIT":
        return Commit(), False
    if text == "DROP":
        return Drop(), False
    for kw, cls, arity in (("SET ", Set, 2), ("RENAME ", Rename, 2),
                           ("EQUALS ", Equals, 2), ("HAS ", Has, 1)):
        if text.startswith(kw):
            args = _parse_quoted_list(text[len(kw):], line_no)
            if len(args) != arity:
                raise FilterParseError(
                    f"line {line_no}: {kw.strip()} takes {arity} argument(s), got {len(args)}")
            node = cls(*args)
            return node, isinstance(node, (Has, Equals))
    for kw, cls in (("KEEP ", Keep), ("DELETE ", Delete)):
        if text.startswith(kw):
            args = _parse_quoted_list(text[len(kw):], line_no)
            if not args:
                raise FilterParseError(f"line {line_no}: {kw.strip()} needs at least one key")
            return cls(tuple(args)), False
    if text.startswith("TYPE "):
        names = [t.strip() for t in text[len("TYPE "):].split(",")]
        sel = TypeSelector(node="node" in names, way="way" in names,
                           relation="relation" in names)
        bad = set(names) - {"node", "way", "relation"}
        if bad:
            raise FilterParseError(f"line {line_no}: unknown TYPE {sorted(bad)}")
        return sel, True
    raise FilterParseError(f"line {line_no}: unrecognized statement {text!r}")


def parse_osmfilter(source: str) -> list[Statement]:
    """Parse a full OSMFilter file into a statement list.

    Raises :class:`FilterParseError` on malformed input (the reference
    panics; we raise so callers can fall back to CEL, mirroring
    ``create_filter`` at ``src/filter/mod.rs:18-28``)."""
    lines = source.split("\n")
    # --- header ---
    idx = 0
    while idx < len(lines) and not lines[idx].strip():
        idx += 1
    if idx >= len(lines):
        raise FilterParseError("empty filter file")
    m = _HEADER_RE.match(lines[idx])
    if not m:
        raise FilterParseError(f"missing OSMFilter header, got {lines[idx]!r}")
    version = ".".join(m.groups())
    if version != ENGINE_FILTER_VERSION:
        warnings.warn(
            f"OSMFilter version mismatch: file {version}, engine {ENGINE_FILTER_VERSION}",
            stacklevel=2,
        )
    idx += 1

    # --- body: indentation-stack parse ---
    root: list[Statement] = []
    # stack of (indent_level, statements_list); selectors push a level
    stack: list[tuple[int, list]] = [(0, root)]
    pending_selector: tuple[int, SelectionBlock] | None = None

    for line_no in range(idx, len(lines)):
        raw = lines[line_no]
        text = _strip_comment(raw)
        if not text.strip():
            continue
        indent = len(raw) - len(raw.lstrip("\t"))
        body = text.strip()
        if pending_selector is not None:
            sel_indent, block = pending_selector
            if indent != sel_indent + 1:
                raise FilterParseError(
                    f"line {line_no + 1}: selector must be followed by a "
                    f"tab-indented block (expected indent {sel_indent + 1}, got {indent})")
            stack.append((indent, block.statements))
            pending_selector = None
        else:
            while stack and indent < stack[-1][0]:
                stack.pop()
            if not stack or indent != stack[-1][0]:
                raise FilterParseError(f"line {line_no + 1}: bad indentation")
        node, is_selector = _parse_statement_line(body, line_no + 1)
        if is_selector:
            block = SelectionBlock(selector=node, statements=[])
            stack[-1][1].append(block)
            pending_selector = (indent, block)
        else:
            stack[-1][1].append(node)

    if pending_selector is not None:
        raise FilterParseError("selector at end of file with no indented block")
    return root
