from sclera_spark.ml.registry import MLRegistry, classify, cluster, impute

__all__ = ["MLRegistry", "classify", "cluster", "impute"]
