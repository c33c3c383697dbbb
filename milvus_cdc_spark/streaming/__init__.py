from milvus_cdc_spark.streaming.engine import CdcTask, run_until_drained

__all__ = ["CdcTask", "run_until_drained"]
