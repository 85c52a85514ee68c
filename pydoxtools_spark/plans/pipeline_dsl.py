"""Declarative column-pipeline DSL — the reference's extension surface
(SURVEY.md §2.9) re-expressed on Catalyst.

reference primitive (operators_base.py)      | here
---------------------------------------------|--------------------------
Operator .input/.out/.t/.cache/.default      | node(name, fn, inputs, default)
FunctionOperator (:279-317)                  | node with a Column-fn
ElementWiseOperator (:320-341)               | element_wise (transform HOF)
Alias (:233-256)                             | alias(new=old)
Constant (:259-273)                          | constant(name, value)
Configuration (:368-413)                     | config(name, default) +
                                             |   overrides at apply()
DictSelector / DataMerger (:344-365)         | element_at / struct nodes
multiple outputs (document_base.py:742-748)  | struct node + select fields

The reference resolves nodes by recursive pull with memoization
(document_base.py:633-776); here resolution is a topological expansion
into ONE select — Catalyst's subexpression elimination replaces the
memoization, and unused nodes are never computed (column pruning ==
the reference's lazy evaluation).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class PipelineDSL:
    def __init__(self) -> None:
        self._nodes: dict[str, tuple] = {}   # name -> ("node", fn, inputs, default)
        self._configs: dict[str, object] = {}

    # ---------------------------------------------------- declaration

    def node(self, name: str, fn: Callable[..., Column],
             inputs: list[str] | None = None, default=None) -> "PipelineDSL":
        """An Operator: fn maps input Columns -> output Column.
        `default` = value-on-null (the reference's .default(v) value-on-
        exception; SQL expressions yield null on failure)."""
        self._nodes[name] = ("node", fn, inputs or [], default)
        return self

    def element_wise(self, name: str, array_input: str,
                     fn: Callable[[Column], Column]) -> "PipelineDSL":
        """ElementWiseOperator: map fn over an array column (transform)."""
        return self.node(name, lambda arr: F.transform(arr, fn), [array_input])

    def alias(self, new: str, old: str) -> "PipelineDSL":
        return self.node(new, lambda c: c, [old])

    def constant(self, name: str, value) -> "PipelineDSL":
        self._nodes[name] = ("const", value, [], None)
        return self

    def config(self, name: str, default) -> "PipelineDSL":
        """Typed config node, overridable at apply() — precedence
        override > declared default (document.py:899-903)."""
        self._configs[name] = default
        return self

    def merge(self, name: str, *inputs: str) -> "PipelineDSL":
        """DataMerger: kwargs -> one struct."""
        return self.node(
            name,
            lambda *cols: F.struct(*[c.alias(i) for c, i in zip(cols, inputs)]),
            list(inputs),
        )

    # ------------------------------------------------------ resolution

    def resolve(self, name: str, df: DataFrame,
                overrides: dict | None = None,
                _seen: tuple = ()) -> Column:
        overrides = overrides or {}
        if name in _seen:
            raise ValueError(f"cycle at {name}: {_seen}")
        if name in overrides and name in self._configs:
            return F.lit(overrides[name])
        if name in self._configs:
            return F.lit(self._configs[name])
        if name not in self._nodes:
            if name in df.columns:
                return F.col(name)
            raise KeyError(f"unknown pipeline output: {name}")
        kind, fn, inputs, default = self._nodes[name]
        if kind == "const":
            return F.lit(fn)
        args = [self.resolve(i, df, overrides, _seen + (name,)) for i in inputs]
        out = fn(*args)
        if default is not None:
            out = F.coalesce(out, F.lit(default))
        return out

    def apply(self, df: DataFrame, outputs: list[str],
              overrides: dict | None = None) -> DataFrame:
        """Compute the requested outputs as columns in one select —
        ancestors shared, unrequested nodes never evaluated."""
        cols = [self.resolve(n, df, overrides).alias(n) for n in outputs]
        return df.select(*df.columns, *cols)
