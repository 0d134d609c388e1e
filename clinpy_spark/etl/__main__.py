"""CLI parity with the reference's ETL entry point
(``python3 create_project.py -y config.yaml``, create_project.py:18-29):

    python -m clinpy_spark.etl -y config.yaml -o /data/myproject

The YAML shape is documented on :func:`clinpy_spark.etl.create_project`.
"""

from __future__ import annotations

import argparse
import os

from clinpy_spark.etl import create_project
from clinpy_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-y", "--yaml", required=True, help="project config YAML")
    ap.add_argument("-o", "--out", required=True, help="project directory (parquet tables)")
    ap.add_argument("--cpus", type=int, default=None, help="local core count override")
    args = ap.parse_args()

    spark = get_spark("clinpy-spark-etl", cpus=args.cpus)
    catalog = create_project(spark, args.out, args.yaml)
    for t in sorted(f.removesuffix(".parquet") for f in os.listdir(args.out)):
        print(f"{t}: {catalog.table(t).count()} rows")


if __name__ == "__main__":
    main()
