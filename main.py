#!/usr/bin/env python3
"""spark-submit entrypoint: spark-submit --py-files knext_spark.zip main.py <verb> ..."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from knext_spark.cli import main  # noqa: E402

if __name__ == "__main__":
    main(sys.argv[1:])
