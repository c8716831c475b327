"""Dump `.explain("formatted")` of named queries to files — the
optimization-round evidence trail (plans/r14/<query>_{before,after}.txt).

Usage: python tools/dump_plan_files.py <outdir> <suffix> <query> [query ...]
e.g.   python tools/dump_plan_files.py plans/r14 after corpus_ingest_e2e
Runs at $SPARK_GRAFT_SF_DIR (default sf0.1) so plan shapes match bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from gomapreduce_spark.queries import QUERIES
    from gomapreduce_spark.session import get_spark
    from tools.explain_audit import plan_str

    spark = get_spark("dump_plan_files")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan_str(df))
        print("wrote", path)


if __name__ == "__main__":
    main()
