from windflow_spark.functions import (dedup, multimodal, sampling,
                                      similarity, text)

__all__ = ["text", "dedup", "similarity", "multimodal", "sampling"]
