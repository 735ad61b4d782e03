"""`python -m binancedatapipeline_spark` → the CLI in cli.py."""

import sys

from binancedatapipeline_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
