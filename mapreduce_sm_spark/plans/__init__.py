from mapreduce_sm_spark.plans.pipeline import Pipeline, SortSpec

__all__ = ["Pipeline", "SortSpec"]
