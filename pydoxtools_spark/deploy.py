"""Cluster deployment helpers: package the engine for
`spark-submit --py-files` (north rule launch mode)."""

from __future__ import annotations

import os
import zipfile


def make_pyfiles_zip(out_path: str = "/tmp/pydoxtools_spark.zip") -> str:
    """Zip the package for --py-files.  Usage on a real cluster:

        spark-submit --py-files $(python -c 'from pydoxtools_spark.deploy \
            import make_pyfiles_zip; print(make_pyfiles_zip())') \
            jobs/extract_job.py --input <iceberg table> --output <table>
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for base, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in base:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(base, f)
                    zf.write(full, os.path.relpath(full, root))
    return out_path
