from sclera_spark.nlp.ops import NlpRegistry, nlp_op

__all__ = ["NlpRegistry", "nlp_op"]
