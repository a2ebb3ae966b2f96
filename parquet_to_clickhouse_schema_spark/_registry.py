"""Shared query/oracle registration helper (used by every operator module).

One definition instead of twelve copies: `QUERIES, ORACLES, q = new_registry()`
gives a module its local tables plus the registering decorator. Duplicate
keys raise at import time — both for queries and oracles — so a collision
can never silently pair a query with the wrong oracle.
"""

from __future__ import annotations


def new_registry():
    queries: dict = {}
    oracles: dict[str, str] = {}

    def q(name: str, oracle: str | None = None):
        def deco(fn):
            if name in queries:
                raise ValueError(f"duplicate query key in module: {name}")
            queries[name] = fn
            if oracle is not None:
                if name in oracles:
                    raise ValueError(f"duplicate oracle key in module: {name}")
                oracles[name] = oracle
            return fn

        return deco

    return queries, oracles, q
