"""spark-submit entry point for the CDC CLI.

``spark-submit`` executes a SCRIPT (it has no ``-m`` module mode), so this
thin wrapper forwards its argv to the same CLI that ``python -m
milvus_cdc_spark.streaming.cli`` exposes locally. The package itself rides
along via ``--py-files milvus_cdc_spark.zip`` (reference deploy analogue:
the server binary plus its config, /root/reference/server/main/main.go).

    zip -r milvus_cdc_spark.zip milvus_cdc_spark
    spark-submit --py-files milvus_cdc_spark.zip scripts/submit_drain.py \
        drain --log /mnt/lake/changelog --table /mnt/lake/transcripts \
        --checkpoint /mnt/lake/ckpt/t1

PATHS: ``--table``/``--tables-root``/``--checkpoint``/``--tasks-dir`` must
be on a POSIX-mounted filesystem shared by driver and executors (local
disk, NFS, Lustre, or an object store behind a FUSE mount such as
s3fs/goofys/gcsfuse) — SnapshotTable's manifest commits use atomic
``os.replace``/``O_EXCL`` for the single-writer lease, which raw
``s3://``-style URIs cannot provide. ``--log`` is read through Spark's
Hadoop readers and additionally accepts any Hadoop-supported URI. On a
catalog-backed deployment the manifest pointer swap would move to an
Iceberg/Hive catalog CAS (see plans/manifest.py docstring) and table
roots could then live directly on object storage.

Inside spark-submit the JVM already exists, so milvus_cdc_spark.session's
builder attaches to it; all CLI verbs (create/drain/tail/status/pause/
resume/delete/list/position/compact/vacuum/convert/bootstrap) work
unchanged.
"""

import sys

from milvus_cdc_spark.streaming.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
