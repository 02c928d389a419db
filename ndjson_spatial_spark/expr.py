"""Selector-expression compiler: the reference's query mini-language -> Catalyst.

The reference navigates schemaless JSON documents with selector paths compiled
by a nom grammar (`/root/reference/ndjson-common/src/json_selector_parser.rs`):

    selector   := 'd' index? ('.' identifier index?)*      (parser.rs:216-243)
    index      := '[' uint ']'
    comparison := selector cmp literal                     (parser.rs:294-304)
    cmp        := '<' | '<=' | '>' | '>=' | '==' | '!='
    literal    := i64 | f64 | bool | null | bare-string    (tried in that
                  order; first grammar that accepts wins, filter.rs:36-50;
                  string literals are the UNQUOTED rest of the expression,
                  e.g. `d.product == Virtual Currency`)

This module re-implements that grammar (~100 lines, SURVEY §7 phase 1) and
compiles it to a `pyspark.sql.Column` so the predicate stays JVM-side and
Catalyst pushes it into the parquet scan.  One compiler is shared by filter /
pick-field / join / agg / sort, mirroring the reference's single
`select_from_json_object` evaluator (`ndjson/src/filter.rs:74-118`).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["Selector", "parse_selector", "parse_comparison", "compile_filter",
           "selector_column", "selector_output_name"]

_SELECTOR_RE = re.compile(
    r"^d(?P<head_idx>\[\d+\])?(?P<rest>(?:\.[A-Za-z_][A-Za-z0-9_]*(?:\[\d+\])*)*)$"
)
_COMPARATORS = ("<=", ">=", "==", "!=", "<", ">")  # two-char first


@dataclass(frozen=True)
class Selector:
    """A parsed selector path: sequence of ('key', name) / ('index', n) steps."""

    steps: tuple

    @property
    def field_names(self) -> tuple:
        return tuple(s[1] for s in self.steps if s[0] == "key")


def parse_selector(text: str) -> Selector:
    """Parse `d`, `d[5]`, `d.a.b`, `d.a[2].c` (grammar parser.rs:216-243)."""
    text = text.strip()
    m = _SELECTOR_RE.match(text)
    if not m:
        raise ValueError(f"invalid selector: {text!r}")
    steps = []
    if m.group("head_idx"):
        steps.append(("index", int(m.group("head_idx")[1:-1])))
    rest = m.group("rest")
    for part in re.finditer(r"\.([A-Za-z_][A-Za-z0-9_]*)((?:\[\d+\])*)", rest):
        steps.append(("key", part.group(1)))
        for idx in re.finditer(r"\[(\d+)\]", part.group(2)):
            steps.append(("index", int(idx.group(1))))
    return Selector(tuple(steps))


def selector_column(sel: Selector | str) -> Column:
    """Selector -> Column: struct field access + array indexing.

    `d` alone (empty path) is invalid for column access — the reference only
    uses it with an index (`d[5]`), which maps to indexing a root array col.
    """
    if isinstance(sel, str):
        sel = parse_selector(sel)
    col: Column | None = None
    for kind, v in sel.steps:
        if kind == "key":
            col = F.col(v) if col is None else col.getField(v)
        else:
            if col is None:
                raise ValueError("root-level index requires an array root column")
            col = col.getItem(v)
    if col is None:
        raise ValueError("empty selector `d` selects the whole row; not a column")
    return col


def selector_output_name(sel: Selector | str) -> str:
    """Join path segments with `_` — the reference's agg/group output naming
    (`ndjson/src/aggregate.rs:34-41`): d.properties.AREA -> properties_AREA."""
    if isinstance(sel, str):
        sel = parse_selector(sel)
    return "_".join(sel.field_names)


def _parse_literal(text: str):
    """Typed-literal cascade, same order as the reference (filter.rs:36-50):
    i64 -> f64 -> bool -> null -> bare string (rest of line, unquoted)."""
    t = text.strip()
    if re.fullmatch(r"[+-]?\d+", t):
        return int(t)
    try:
        if re.fullmatch(r"[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?", t):
            return float(t)
    except ValueError:
        pass
    if t == "true":
        return True
    if t == "false":
        return False
    if t == "null":
        return None
    return t  # bare string: unquoted rest of expression


def parse_comparison(expression: str):
    """Split `d.path <cmp> literal` -> (Selector, cmp, typed literal).

    Split at the LEFTMOST comparator occurrence across all operators
    (longest match when two share a position, so `<=` beats `<`): bare
    string literals containing a later comparator survive — e.g.
    `d.product == a>=b` compares against the string `a>=b` instead of
    mis-splitting at `>=` (the reference tries typed grammars over the
    whole remainder, filter.rs:36-50, so it has the same behavior).
    """
    best = None  # (position, comparator)
    for cmp in _COMPARATORS:
        idx = expression.find(cmp)
        if idx > 0 and (
            best is None
            or idx < best[0]
            or (idx == best[0] and len(cmp) > len(best[1]))
        ):
            best = (idx, cmp)
    if best is None:
        raise ValueError(f"no comparator found in: {expression!r}")
    idx, cmp = best
    lhs = expression[:idx].strip()
    rhs = expression[idx + len(cmp):].strip()
    return parse_selector(lhs), cmp, _parse_literal(rhs)


def compile_filter(expression: str) -> Column:
    """Filter expression -> boolean Column.

    Null/missing semantics match the reference (filter.rs:65-69,
    json_selector_parser.rs:103-181): a missing/null field fails every
    comparison except an explicit `== null`; `!= null` keeps rows where the
    field is present and non-null.  In Spark, comparisons with NULL are
    already null-propagating (row dropped by filter), so only the explicit
    null comparators need special casing.
    """
    sel, cmp, lit = parse_comparison(expression)
    col = selector_column(sel)
    if lit is None:
        if cmp == "==":
            return col.isNull()
        if cmp == "!=":
            return col.isNotNull()
        raise ValueError(f"null literal only supports ==/!=, got {cmp}")
    ops = {
        "<": col.__lt__,
        "<=": col.__le__,
        ">": col.__gt__,
        ">=": col.__ge__,
        "==": col.__eq__,
        "!=": col.__ne__,
    }
    return ops[cmp](F.lit(lit))
