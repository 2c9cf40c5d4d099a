"""windflow_spark — a from-scratch PySpark-native streaming analytics engine.

Reproduces the operator algebra and window semantics of the WindFlow
data-stream-processing library (reference: /root/reference, C++17 /
FastFlow) as idiomatic Spark DataFrame / Structured Streaming plans:

- basic operators: Source, Map, Filter, FlatMap, Accumulator, Sink
  (reference: includes/{source,map,filter,flatmap,accumulator,sink}.hpp)
- windowed patterns: Win_Seq, Win_Farm, Key_Farm, Pane_Farm,
  Win_MapReduce over count-based (CB) and time-based (TB) windows in
  tumbling / sliding / hopping shapes
  (reference: includes/{win_seq,win_farm,key_farm,pane_farm,win_mapreduce}.hpp)
- engine extensions mandated by the target spec: session windows,
  watermarked stream-stream (as-of) join, exactly-once sinks,
  checkpoint resume, skew-aware two-level aggregation.

Everything is expressed as DataFrame plan shapes so Catalyst owns
optimization; Python only runs inside Arrow-vectorized pandas UDFs.
"""

from windflow_spark.session import get_spark
from windflow_spark.api import Pipe
from windflow_spark.operators.windows import WinSpec, win_seq
from windflow_spark.operators.pane_farm import pane_farm, sliding_agg
from windflow_spark.operators.win_mapreduce import win_mapreduce

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "Pipe",
    "WinSpec",
    "win_seq",
    "pane_farm",
    "sliding_agg",
    "win_mapreduce",
    "__version__",
]
