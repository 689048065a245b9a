from parconnect_spark.streaming.checkpoint import SuperstepCheckpoint
from parconnect_spark.streaming.metrics import SuperstepMetrics, shuffle_totals

__all__ = ["SuperstepCheckpoint", "SuperstepMetrics", "shuffle_totals"]
