from windflow_spark.operators.core import (
    map_,
    filter_,
    flat_map,
    key_by,
    accumulate,
)
from windflow_spark.operators.windows import WinSpec, assign_wids, win_seq
from windflow_spark.operators.pane_farm import pane_farm
from windflow_spark.operators.win_mapreduce import win_mapreduce
from windflow_spark.operators.sessions import session_windows
from windflow_spark.operators.joins import asof_join

__all__ = [
    "map_",
    "filter_",
    "flat_map",
    "key_by",
    "accumulate",
    "WinSpec",
    "assign_wids",
    "win_seq",
    "pane_farm",
    "win_mapreduce",
    "session_windows",
    "asof_join",
]
