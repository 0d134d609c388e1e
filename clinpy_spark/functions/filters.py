"""Declarative filter-spec compiler — "filters as data".

The reference's ``Variants.filter`` accepts sqlalchemy-filters spec
dicts (``{"field": ..., "op": ..., "value": ...}``; reference
assays/variants.py:53-81, ``apply_filters`` at :70-73) so a YAML/JSON
pipeline can express predicates without writing code. This compiles the
same vocabulary to a single Spark ``Column`` — one boolean expression
Catalyst folds into the scan (predicate pushdown works exactly as if
the user had written ``df.filter(...)`` by hand; specs never leave the
driver, no UDF).

Supported ops (the sqlalchemy-filters set): ``==``/``eq``, ``!=``/
``ne``, ``>``/``gt``, ``>=``/``ge``, ``<``/``lt -> lt``, ``<=``/``le``,
``like``, ``ilike``, ``not_ilike``, ``in``, ``not_in``, ``is_null``,
``is_not_null``; boolean combinators ``{"and": [...]}``,
``{"or": [...]}``, ``{"not": [...]}``. A LIST of specs is an implicit
AND, matching sqlalchemy-filters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BINARY = {
    "==": lambda c, v: c == v,
    "eq": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    "ne": lambda c, v: c != v,
    ">": lambda c, v: c > v,
    "gt": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "ge": lambda c, v: c >= v,
    "<": lambda c, v: c < v,
    "lt": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    "le": lambda c, v: c <= v,
    "like": lambda c, v: c.like(v),
    "ilike": lambda c, v: c.ilike(v),
    "not_ilike": lambda c, v: ~c.ilike(v),
    "in": lambda c, v: c.isin(list(v)),
    "not_in": lambda c, v: ~c.isin(list(v)),
}
_UNARY = {
    "is_null": lambda c: c.isNull(),
    "is_not_null": lambda c: c.isNotNull(),
}


def spec_to_column(spec: dict) -> Column:
    """One spec dict -> a Spark boolean Column."""
    if not isinstance(spec, dict):
        raise ValueError(f"filter spec must be a dict, got {type(spec).__name__}")
    # boolean combinators
    for key, combine in (("and", "and"), ("or", "or"), ("not", "not")):
        if key in spec:
            subs = [spec_to_column(s) for s in spec[key]]
            if not subs:
                raise ValueError(f"empty '{key}' combinator")
            if combine == "not":
                if len(subs) != 1:
                    raise ValueError("'not' takes exactly one sub-spec")
                return ~subs[0]
            out = subs[0]
            for s in subs[1:]:
                out = (out & s) if combine == "and" else (out | s)
            return out
    field, op = spec.get("field"), spec.get("op")
    if field is None or op is None:
        raise ValueError(f"spec needs 'field' and 'op': {spec!r}")
    col = F.col(field)
    if op in _UNARY:
        return _UNARY[op](col)
    if op in _BINARY:
        if "value" not in spec:
            raise ValueError(f"op {op!r} needs 'value': {spec!r}")
        return _BINARY[op](col, spec["value"])
    raise ValueError(f"unknown filter op {op!r}")


def specs_to_column(specs) -> Column:
    """A spec dict, or a list of them (implicit AND), -> one Column."""
    if isinstance(specs, dict):
        return spec_to_column(specs)
    cols = [spec_to_column(s) for s in specs]
    if not cols:
        raise ValueError("empty filter spec list")
    out = cols[0]
    for c in cols[1:]:
        out = out & c
    return out
