#!/usr/bin/env python
"""spark-submit launcher: ships as the job's main file while the package
rides `--py-files li_spark.zip` (added to the driver's sys.path by Spark).
A plain module file can't be the main script — `cli.py` uses package-
relative imports — so this 4-liner is the documented cluster entry point:

    zip -r li_spark.zip luceneindexer_spark
    spark-submit --py-files li_spark.zip submit_cli.py build \\
        --input s3://bucket/corpus --out s3://bucket/idx
"""
import sys

from luceneindexer_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
