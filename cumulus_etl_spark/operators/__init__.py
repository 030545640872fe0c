from cumulus_etl_spark.operators import (
    bloom,
    corpus,
    dedup,
    graph,
    multimodal,
    quantize,
    sampling,
    similarity,
    skew,
    textstats,
    zorder,
)

__all__ = [
    "bloom",
    "corpus",
    "dedup",
    "graph",
    "multimodal",
    "quantize",
    "sampling",
    "similarity",
    "skew",
    "textstats",
    "zorder",
]
