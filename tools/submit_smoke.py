"""spark-submit entry point (north-rule packaging evidence).

Run via tools/submit.sh: the coastsat_spark package travels as a zip on
--py-files (no repo checkout on executors needed), exactly how the job
ships to a real multi-executor cluster. Prints one JSON line.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    # the package must be importable from the --py-files zip alone
    from pyspark.sql import SparkSession

    from coastsat_spark.datagen import webpages_df
    from coastsat_spark.plans import pipeline

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    docs = webpages_df(spark, 6_000)
    res = pipeline.run_flagship(spark, docs)
    n = res.timeseries.count()
    print(json.dumps({"submit_smoke": "ok", "timeseries_rows": n}))
    spark.stop()
    sys.exit(0 if n > 0 else 1)


if __name__ == "__main__":
    main()
