"""Fluent pipeline API mirroring the reference's builder surface
(includes/builders.hpp:57-2259, SURVEY.md §2.5) and MultiPipe
composition (includes/multipipe.hpp:127-1016).

A ``Pipe`` wraps a lazy DataFrame; every method returns a new Pipe, so
composition is pure plan building — Catalyst does chaining/fusion
(whole-stage codegen) where the reference hand-fuses operators
(multipipe.hpp:243-271). ``union_`` mirrors unionMultiPipes
(multipipe.hpp:901-940).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from windflow_spark.operators import core, joins, sessions, windows
# NB: the operators package __init__ re-exports the pane_farm /
# win_mapreduce FUNCTIONS under the same names as their modules, so any
# module-level import of those names binds the function — import the
# callables explicitly
from windflow_spark.operators.pane_farm import (
    pane_farm as _pane_farm,
    sliding_agg as _sliding_agg,
)
from windflow_spark.operators.win_mapreduce import win_mapreduce as _win_mapreduce


class Pipe:
    """Lazy operator pipeline over a DataFrame (MultiPipe analogue)."""

    def __init__(self, df: DataFrame, keys: Sequence[str] = ()):
        self.df = df
        self.keys = tuple(keys)

    # -- composition ---------------------------------------------------
    @classmethod
    def source(cls, df: DataFrame) -> "Pipe":
        """add_source (multipipe.hpp:339-365): seed the pipeline."""
        return cls(df)

    def map(self, **cols: Column | str) -> "Pipe":
        return Pipe(core.map_(self.df, **cols), self.keys)

    def map_pandas(self, fn: Callable, schema) -> "Pipe":
        return Pipe(core.map_pandas(self.df, fn, schema), self.keys)

    def filter(self, predicate: Column | str) -> "Pipe":
        return Pipe(core.filter_(self.df, predicate), self.keys)

    def flat_map(self, emit: Column | str, alias: str, keep: Sequence[str] | None = None) -> "Pipe":
        return Pipe(core.flat_map(self.df, emit, alias, keep), self.keys)

    def key_by(
        self,
        *keys: str,
        num_partitions: int | None = None,
        routing: Column | str | None = None,
    ) -> "Pipe":
        """Sets the pipeline key (Key_Farm routing; kf_nodes.hpp:67-78).
        The physical repartition is deferred to the next stateful op
        (Spark inserts the exchange); pass num_partitions to force one,
        or ``routing`` for a custom routing expression (the pluggable
        routing_func_t of builders.hpp:190 — see core.key_by)."""
        if num_partitions or routing is not None:
            df = core.key_by(
                self.df, *keys, num_partitions=num_partitions, routing=routing
            )
        else:
            df = self.df
        return Pipe(df, keys)

    def accumulate(self, order_by: Sequence[Column | str], **aggs: Column) -> "Pipe":
        return Pipe(core.accumulate(self.df, self.keys, order_by, aggs), self.keys)

    def drop_regressions(
        self, order_col: Column | str, arrival_by: Sequence[Column | str]
    ) -> "Pipe":
        """Reference out-of-order drop rule on the current key
        (win_seq.hpp:289-305): discard rows whose ``order_col`` does not
        strictly advance the per-key max over the ``arrival_by`` order.
        See core.drop_regressions."""
        return Pipe(
            core.drop_regressions(self.df, self.keys, order_col, arrival_by),
            self.keys,
        )

    def union_(self, *others: "Pipe") -> "Pipe":
        df = self.df
        for o in others:
            df = df.unionByName(o.df)
        return Pipe(df, self.keys)

    # -- windowed patterns --------------------------------------------
    def win_seq(self, unit_col: Column | str, spec: windows.WinSpec, aggs: dict[str, Column] | None = None,
                nic_fn: Callable | None = None, nic_schema=None, origin: int = 0) -> "Pipe":
        return Pipe(
            windows.win_seq(self.df, self.keys, unit_col, spec, aggs=aggs,
                            nic_fn=nic_fn, nic_schema=nic_schema, origin=origin),
            self.keys,
        )

    def sliding_agg(self, unit_col: Column | str, spec: windows.WinSpec,
                    aggs: dict[str, tuple[str, str]], origin: int = 0) -> "Pipe":
        """Cost-routed sliding aggregation (direct vs pane decomposition
        by overlap ratio AND estimated input size — see
        pane_farm.sliding_agg). ``aggs``: name → (op, col)."""
        return Pipe(
            _sliding_agg(self.df, self.keys, unit_col, spec, aggs, origin=origin),
            self.keys,
        )

    def pane_farm(self, unit_col: Column | str, spec: windows.WinSpec,
                  partial_aggs: dict[str, Column], merge_aggs: dict[str, Column], origin: int = 0) -> "Pipe":
        return Pipe(_pane_farm(self.df, self.keys, unit_col, spec, partial_aggs, merge_aggs, origin=origin), self.keys)

    def win_mapreduce(self, unit_col: Column | str, spec: windows.WinSpec,
                      partial_aggs: dict[str, Column], merge_aggs: dict[str, Column],
                      degree: int = 8, origin: int = 0) -> "Pipe":
        return Pipe(
            _win_mapreduce(self.df, self.keys, unit_col, spec, partial_aggs, merge_aggs, degree=degree, origin=origin),
            self.keys,
        )

    def session(self, unit_col: Column | str, gap: int, **aggs: Column) -> "Pipe":
        return Pipe(sessions.session_windows(self.df, self.keys, unit_col, gap, aggs), self.keys)

    def join_dim(self, dim: DataFrame, on, how: str = "inner") -> "Pipe":
        return Pipe(joins.broadcast_dim_join(self.df, dim, on, how), self.keys)

    # -- sinks ---------------------------------------------------------
    def ordered(self, *cols: str) -> "Pipe":
        """WF_Collector analogue: ordered result emission
        (wf_nodes.hpp:399-468) — a sort at the plan tail."""
        return Pipe(self.df.orderBy(*cols), self.keys)

    def sink_parquet(self, path: str, mode: str = "overwrite", partition_by: Sequence[str] = ()) -> None:
        w = self.df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    def collect_pandas(self):
        return self.df.toPandas()
