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

PATHS: every manifest/pins/DLQ byte goes through the ``TableFS``
abstraction (plans/fs.py): the shipped ``LocalFS`` covers table roots on
a POSIX filesystem shared by driver and executors (local disk, NFS,
Lustre, or an object store behind a FUSE mount such as
s3fs/goofys/gcsfuse). Raw ``s3://``/``gs://`` table roots need the
object-store implementation of the eight verbs specified in plans/fs.py
(atomic PUT for the CURRENT pointer, conditional PUT/DELETE for the
single-writer lease, prefix LIST for versions/pins) — a mechanical
fill-in against that table, not a protocol change, because manifest
versions are immutable and only the pointer is ever replaced. ``--log``
is read through Spark's Hadoop readers and accepts any Hadoop-supported
URI today. On a catalog-backed deployment the pointer swap can instead
move to an Iceberg/Hive catalog CAS (see plans/manifest.py docstring).

Inside spark-submit the JVM already exists, so milvus_cdc_spark.session's
builder attaches to it; all CLI verbs (create/drain/tail/status/pause/
resume/delete/list/position/compact/vacuum/convert/bootstrap) work
unchanged.
"""

import sys

from milvus_cdc_spark.streaming.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
