from parconnect_spark.streaming.checkpoint import SuperstepCheckpoint
from parconnect_spark.streaming.metrics import (
    IoTelemetry,
    SuperstepMetrics,
    shuffle_totals,
    spill_totals,
)

__all__ = [
    "IoTelemetry",
    "SuperstepCheckpoint",
    "SuperstepMetrics",
    "shuffle_totals",
    "spill_totals",
]
