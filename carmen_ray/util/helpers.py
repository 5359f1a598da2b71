"""Standard place-name format helpers — the registry carmen seeds its
Handlebars environment with (lib/util/helpers.js: `moveNumberToEnd` plus
the handlebars-helpers 'comparison' pack) and merges user-supplied
helpers over (index.js:68-74 `options.formatHelpers`).

Here templates are the single-brace subset (config.render_place_name):
`{name}` substitutes a value, `{helperName value}` routes it through a
registered helper. Block conditionals (`{{#if ...}}`) are out of scope —
none of the reference's shipped templates use them.
"""

from __future__ import annotations

import re

_NUM_FIRST = re.compile(r"^(\d+) ([^\d]+)$")


def move_number_to_end(s):
    """helpers.js:5-10 — '1 main st' → 'main st 1'; anything without a
    leading-number shape (or a non-string) passes through untouched."""
    if isinstance(s, str):
        return _NUM_FIRST.sub(r"\2 \1", s)
    return s


def _is_truthy(v) -> bool:
    return bool(v)


# the handlebars-helpers 'comparison' subset carmen loads (unary/binary
# predicates; in the single-brace template subset they render as
# ''/'true' but user helpers can call them)
DEFAULT_HELPERS = {
    "moveNumberToEnd": move_number_to_end,
    "eq": lambda a, b=None: a == b,
    "ne": lambda a, b=None: a != b,
    "lt": lambda a, b=None: a < b,
    "lte": lambda a, b=None: a <= b,
    "gt": lambda a, b=None: a > b,
    "gte": lambda a, b=None: a >= b,
    "and": lambda *args: all(_is_truthy(a) for a in args),
    "or": lambda *args: any(_is_truthy(a) for a in args),
    "not": lambda a: not _is_truthy(a),
    "isFalsey": lambda a: not _is_truthy(a),
    "isTruthy": _is_truthy,
    "default": lambda a, b="": a if _is_truthy(a) else b,
}

_PLACEHOLDER = re.compile(r"\{(\w+)((?:\s+[^{}\s]+)*)\}")


def render_template(fmt: str, vals: dict, helpers: dict | None = None) -> str:
    """Substitute `{key}` placeholders and `{helper arg ...}` helper
    calls; unresolved placeholders are stripped like the reference's
    post-render cleanup (format-features.js:108)."""
    table = {**DEFAULT_HELPERS, **(helpers or {})}

    def sub(m: re.Match) -> str:
        head, rest = m.group(1), m.group(2)
        args = rest.split() if rest else []
        if not args:
            v = vals.get(head)
            return "" if v is None else str(v)
        fn = table.get(head)
        if fn is None:
            return ""
        resolved = [vals.get(a, a) for a in args]
        try:
            out = fn(*resolved)
        except Exception:
            return ""
        if out is None or out is False:
            return ""
        if out is True:
            return "true"
        return str(out)

    return _PLACEHOLDER.sub(sub, fmt)
