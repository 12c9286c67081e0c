"""spark-submit entrypoint — the north rule's submission mode
("submitted via spark-submit --py-files on multi-executor clusters").

Package the library and hand the CLI to spark-submit; the master (and
executor topology) belongs entirely to the submit command, exactly as
on a real cluster:

    zip -r rfb_cnpj_etl_spark.zip rfb_cnpj_etl_spark  # package at zip root
    spark-submit --master <cluster-or-local[N]> \
        --py-files rfb_cnpj_etl_spark.zip \
        scripts/submit_replay.py \
        replay --state /data/state --manifest /data/manifest.jsonl \
               --log /data/changelog --batch-size 100000000

Every CLI verb works (replay / maintain / snapshot / checkpoint / ...):
this file only forwards argv — ``session.get_spark`` detects the
PythonRunner gateway and leaves the master to spark-submit, so the same
invocation moves from local[N] to a 1000-executor cluster by changing
only ``--master`` / ``--deploy-mode``. Exercised end-to-end (packaged
zip, fresh JVM, clean PYTHONPATH) by tests/test_spark_submit.py.
"""

from __future__ import annotations

import sys

from rfb_cnpj_etl_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
