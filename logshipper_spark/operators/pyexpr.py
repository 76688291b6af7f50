"""Compiled ``python``-filter rewrites.

The reference's ``python`` filter (``logshipper/filters.py::prepare_python``
[approx]) compiles an arbitrary Python statement once and runs it per
message.  Arbitrary per-row Python is forbidden here (BASELINE.json
input_hint: vectorized only), so the escape hatch is narrowed to a
documented expression subset with two lowering paths:

* ``{"sql": "..."}``   — native Spark SQL expression (``F.expr``): the fast
  path, stays inside whole-stage codegen.  Preferred.
* ``{"expr": "..."}``  — a Python expression over column names where each
  name is bound to a pandas ``Series`` for the whole Arrow batch
  (``text.str.upper()``, ``value * 2 + other``).  Compiled ONCE into a
  vectorized ``pandas_udf`` — never row-at-a-time.
"""

from __future__ import annotations

import ast

import pandas as pd
from pyspark.sql import Column, functions as F


def _referenced_names(expr: str) -> list[str]:
    tree = ast.parse(expr, mode="eval")
    names = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and node.id not in names:
            names.append(node.id)
    return names


_SAFE_GLOBALS = {"pd": pd, "abs": abs, "min": min, "max": max, "round": round, "len": len}


def compile_python_rewrite(params: dict | str, cols: dict[str, Column]) -> Column:
    """Compile a python-rewrite spec to a Column (native or pandas-UDF)."""
    if isinstance(params, str):
        params = {"expr": params}
    if "sql" in params:
        return F.expr(params["sql"])
    expr = params["expr"]
    rtype = params.get("type", "string")
    names = [n for n in _referenced_names(expr) if n in cols]
    code = compile(expr, "<python-rewrite>", "eval")

    @F.pandas_udf(rtype)
    def _rewrite(*series: pd.Series) -> pd.Series:
        scope = dict(zip(names, series))
        out = eval(code, dict(_SAFE_GLOBALS), scope)  # noqa: S307 — documented subset
        if not isinstance(out, pd.Series):
            out = pd.Series([out] * len(series[0] if series else []))
        return out

    return _rewrite(*[cols[n] for n in names])
