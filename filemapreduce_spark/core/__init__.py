from filemapreduce_spark.core.engine import FileEngine, Job
from filemapreduce_spark.core.parents import attach_parents, dir_of

__all__ = ["FileEngine", "Job", "attach_parents", "dir_of"]
