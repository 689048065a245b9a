from parconnect_spark.streaming.checkpoint import SuperstepCheckpoint
from parconnect_spark.streaming.metrics import SuperstepMetrics

__all__ = ["SuperstepCheckpoint", "SuperstepMetrics"]
