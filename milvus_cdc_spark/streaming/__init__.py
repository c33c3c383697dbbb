from milvus_cdc_spark.streaming.cascade import (
    cascade_epoch,
    cascade_until_current,
    changes_to_ops,
    create_target_like,
    snapshot_hop,
)
from milvus_cdc_spark.streaming.engine import CdcTask, run_until_drained
from milvus_cdc_spark.streaming.publish import publish_round

__all__ = [
    "CdcTask",
    "run_until_drained",
    "cascade_epoch",
    "cascade_until_current",
    "changes_to_ops",
    "create_target_like",
    "snapshot_hop",
    "publish_round",
]
