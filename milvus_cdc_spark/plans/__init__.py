from milvus_cdc_spark.plans.manifest import Manifest, SnapshotTable

__all__ = ["Manifest", "SnapshotTable"]
