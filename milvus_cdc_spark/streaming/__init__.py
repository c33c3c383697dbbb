from milvus_cdc_spark.streaming.cascade import (
    cascade_epoch,
    cascade_until_current,
    changes_to_ops,
)
from milvus_cdc_spark.streaming.engine import CdcTask, run_until_drained
from milvus_cdc_spark.streaming.publish import publish_round

__all__ = [
    "CdcTask",
    "run_until_drained",
    "cascade_epoch",
    "cascade_until_current",
    "changes_to_ops",
    "publish_round",
]
