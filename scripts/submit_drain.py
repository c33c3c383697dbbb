"""spark-submit entry point for the CDC CLI.

``spark-submit`` executes a SCRIPT (it has no ``-m`` module mode), so this
thin wrapper forwards its argv to the same CLI that ``python -m
milvus_cdc_spark.streaming.cli`` exposes locally. The package itself rides
along via ``--py-files milvus_cdc_spark.zip`` (reference deploy analogue:
the server binary plus its config, /root/reference/server/main/main.go).

    zip -r milvus_cdc_spark.zip milvus_cdc_spark
    spark-submit --py-files milvus_cdc_spark.zip scripts/submit_drain.py \
        drain --log s3://bucket/changelog --table s3://bucket/transcripts \
        --checkpoint s3://bucket/ckpt/t1

Inside spark-submit the JVM already exists, so milvus_cdc_spark.session's
builder attaches to it; all CLI verbs (create/drain/tail/status/pause/
resume/delete/list/position/compact/vacuum/bootstrap) work unchanged.
"""

import sys

from milvus_cdc_spark.streaming.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
