"""Forked-worker preload daemon: identical to pyspark.daemon but
imports the heavy kernel dependencies (numpy/pandas/pyarrow and the
parser modules every mapInPandas kernel pulls in) ONCE in the daemon
process, so every forked worker inherits them via copy-on-write
instead of re-importing (~1 s of pure import time per worker,
measured; at 32 fresh workers that is a whole wall-second on the
first kernel stage of a session — guide §4.5 taken one level up:
heavyweight init once per EXECUTOR, not per task).

Select with spark.python.daemon.module=pydoxtools_spark.daemon_preload
(session.get_spark sets it when the package is importable).  Import
failures fall through silently: the daemon then behaves exactly like
the stock pyspark.daemon.
"""

try:  # best effort — a missing optional dep must not kill the daemon
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyspark.sql.pandas.serializers  # noqa: F401
    import pyspark.sql.pandas.types  # noqa: F401
except Exception:  # pragma: no cover
    pass

try:
    import pydoxtools_spark.functions.htmlparse  # noqa: F401
    import pydoxtools_spark.functions.pdfparse  # noqa: F401
except Exception:  # pragma: no cover
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
