#!/usr/bin/env python
"""spark-submit entry point for the KG-construction pipeline (north_rule:
``spark-submit --py-files pkg.zip submit_kg.py``).

Builds the package zip with ``python submit_kg.py --make-zip`` then:

    spark-submit --py-files orionbelt_pkg.zip submit_kg.py \
        --pages <dir-or-synth:N> --out /path/to/out [--slices 64]

``--pages synth:N`` synthesizes N deterministic pages (sandbox mode);
a directory runs against real parquet pages with the input_hint schema
``(url, warc_ts, html, text, lang)``.  Output: ``edges/`` partitioned by
subject-hash bucket (+ hot-entity salt), ``class_hierarchy/``, a
``_manifest.jsonl`` of per-slice lineage+metrics — re-running resumes
from the manifest.
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile


def make_zip(out: str = "orionbelt_pkg.zip") -> str:
    root = os.path.dirname(os.path.abspath(__file__))
    pkg = os.path.join(root, "orionbelt_ontology_builder_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--make-zip", action="store_true")
    ap.add_argument("--pages", default="synth:10000")
    ap.add_argument("--out", default="/tmp/kg_out")
    ap.add_argument("--slices", type=int, default=64)
    args = ap.parse_args()

    if args.make_zip:
        print(make_zip())
        return

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("orionbelt-kg-construct").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from orionbelt_ontology_builder_spark.pipeline import pages as P
    from orionbelt_ontology_builder_spark.pipeline import run as R

    if args.pages.startswith("synth:"):
        pages = P.synthesize_pages(spark, int(args.pages.split(":", 1)[1]))
    else:
        pages = spark.read.parquet(args.pages)

    out = R.run_pipeline(spark, pages, args.out, n_slices=args.slices)
    n = out["edges"].count()
    print(f"edges written: {n} -> {args.out}/edges", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
