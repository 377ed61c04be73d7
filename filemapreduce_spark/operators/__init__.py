from filemapreduce_spark.operators import money, textops, vectors
from filemapreduce_spark.operators.asof import asof_join

__all__ = ["money", "textops", "vectors", "asof_join"]
