"""OPL ``%hex%`` escape/unescape kernels.

Char classes and semantics from the reference (which follows the Osmium
OPL implementation):

* escape set — everything EXCEPT code points 33-36, 38-43, 45-60,
  62-63, 65-126, 161-172, 174-1535
  (``/root/reference/src/writers/opl.rs:23-34``);
* escape form — ``%`` + lowercase hex code point + ``%``
  (``writers/opl.rs:38-49``);
* unescape — ``%`` starts an escape, consumes up to the next ``%`` (or
  end of string), invalid hex / invalid code points are silently
  dropped (``/root/reference/src/readers/opl.rs:67-91``).

Both directions are single compiled-regex passes (C speed), applied
per string — suitable for ``map_batches`` over string columns.
"""

from __future__ import annotations

import re

# characters that do NOT need escaping (writers/opl.rs:23-34)
_SAFE = (
    "\u0021-\u0024"   # 33-36
    "\u0026-\u002b"   # 38-43
    "\\--\u003c"      # 45-60 (needs '-' escaped inside class)
    "\u003e-\u003f"   # 62-63
    "\u0041-\u007e"   # 65-126
    "\u00a1-\u00ac"   # 161-172
    "\u00ae-\u05ff"   # 174-1535
)
UNSAFE_PATTERN = f"[^{_SAFE}]"
_UNSAFE_RE = re.compile(UNSAFE_PATTERN)
_ESCAPE_RE = re.compile(r"%([^%]*)(?:%|$)")


def _esc_one(m: re.Match) -> str:
    return f"%{ord(m.group(0)):x}%"


def escape_opl(s: str) -> str:
    return _UNSAFE_RE.sub(_esc_one, s)


def _unesc_one(m: re.Match) -> str:
    try:
        return chr(int(m.group(1), 16))
    except (ValueError, OverflowError):
        return ""


def unescape_opl(s: str) -> str:
    if "%" not in s:
        return s
    return _ESCAPE_RE.sub(_unesc_one, s)


def should_escape_char(c: str) -> bool:
    return _UNSAFE_RE.match(c) is not None
