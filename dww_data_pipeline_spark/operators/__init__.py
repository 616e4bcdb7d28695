from dww_data_pipeline_spark.operators import (
    dedup,
    density,
    documents,
    sequence,
    similarity,
)

__all__ = ["dedup", "density", "documents", "sequence", "similarity"]
