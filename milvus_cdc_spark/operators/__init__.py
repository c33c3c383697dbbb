from milvus_cdc_spark.operators.apply import apply_batch, dedup_last_writer

__all__ = ["apply_batch", "dedup_last_writer"]
