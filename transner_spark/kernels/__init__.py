"""Pure-Python semantic kernels.

Every kernel here is a pure function over plain Python values. They are
used in two places:

1. the single-node oracle (``transner_spark.kernels.oracle``) that pytest
   uses as the ground truth, and
2. the Spark pandas/Arrow UDF stages (``transner_spark.operators``), which
   call the very same functions over Arrow batch rows.

This shared-kernel design makes Spark/oracle parity hold by construction;
the tests then pin the kernels themselves against hand-written cases taken
from the reference's documented request/response examples.
"""
