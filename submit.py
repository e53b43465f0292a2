#!/usr/bin/env python3
"""spark-submit driver for the fsst_spark CLI.

Ship the package as a zip and point spark-submit at this file:

    python -m zipfile -c fsst_spark.zip fsst_spark
    spark-submit --py-files fsst_spark.zip submit.py \
        encode --input s3://corpus/pages --out s3://corpus/encoded \
        --cluster-by 'url_sort_key(url)'

Every CLI subcommand works unchanged (decode/verify/stats/advise/...).
``jobs.session.get_spark`` uses ``getOrCreate``, so the session inherits
whatever master/conf spark-submit supplies — the same entry point runs
at N and 4N executors with no code change.
"""

from fsst_spark.jobs.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
