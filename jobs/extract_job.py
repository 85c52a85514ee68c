"""spark-submit entry point for the extraction pipeline.

    spark-submit --py-files pydoxtools_spark.zip jobs/extract_job.py \
        --input  /path/documents_in.parquet \
        --pdf-elements /path/pdf_elements.parquet \
        --output /path/out --run-id r42 --parallelism 512

On a cluster the session comes from spark-submit's conf (master,
executors); get-or-create here only fills local defaults.  The run is
resumable: re-submitting after a failure anti-joins committed doc_ids
(pipeline.run_resumable) — the output snapshot IS the checkpoint.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None)
    ap.add_argument("--pdf-elements", default=None)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--parallelism", type=int, default=256)
    ap.add_argument("--max-pages", type=int, default=None)
    ap.add_argument("--pdf-blobs", default=None,
                    help="parquet of (ref, content) raw PDF bytes")
    ap.add_argument("--doc-blobs", default=None,
                    help="parquet of (ref, content) docx/odt/epub/rtf zips")
    ap.add_argument("--input-dir", default=None,
                    help="ingest a raw file directory instead of --input "
                         "(format-probed per blob; doc_id = path)")
    args = ap.parse_args()
    if bool(args.input) == bool(args.input_dir):
        ap.error("exactly one of --input / --input-dir is required")

    from pyspark.sql import SparkSession

    from pydoxtools_spark.pipeline import ingest_blobs, run_resumable

    spark = SparkSession.builder.appName("pydoxtools-extract").getOrCreate()
    kwargs = {}
    if args.input_dir:
        from pydoxtools_spark.sources.loaders import load_directory

        from pyspark.sql import functions as F

        blobs = load_directory(spark, args.input_dir).select(
            F.col("path").alias("ref"), "content")
        parts = ingest_blobs(spark, blobs)
        docs = parts["documents_in"]
        kwargs["pdf_blobs"] = parts["pdf_blobs"]
        kwargs["doc_blobs"] = parts["doc_blobs"]
    else:
        docs = spark.read.parquet(args.input)
        if args.pdf_blobs:
            kwargs["pdf_blobs"] = spark.read.parquet(args.pdf_blobs)
        if args.doc_blobs:
            kwargs["doc_blobs"] = spark.read.parquet(args.doc_blobs)
    pdf = spark.read.parquet(args.pdf_elements) if args.pdf_elements else None
    result = run_resumable(
        spark, docs, pdf, args.output,
        run_id=args.run_id, parallelism=args.parallelism,
        max_pages=args.max_pages, **kwargs,
    )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
