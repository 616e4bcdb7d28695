from dww_data_pipeline_spark.functions import dates, fuzzy, geo, strings, text, vectors

__all__ = ["dates", "fuzzy", "geo", "strings", "text", "vectors"]
