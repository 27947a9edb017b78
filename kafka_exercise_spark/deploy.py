"""Ship this package to executor Python workers — the ``--py-files`` analog.

Operators that run imperative per-partition logic (``mapInPandas`` /
``applyInPandas``) reference module-level functions, which cloudpickle
serializes *by reference*: the worker must be able to ``import
kafka_exercise_spark``. On a real cluster that is solved at submit time
(``spark-submit --py-files engine.whl``); in-process the same mechanism is
``SparkContext.addPyFile`` — the zip is distributed to every executor and
prepended to worker ``sys.path``, making the engine importable regardless of
the driver process's working directory or PYTHONPATH (the driver harness
imports ``__spark_entry__`` from an arbitrary cwd).

Zipping ~40 small .py files happens once per SparkContext (guarded), costs
milliseconds, and ships kilobytes — negligible against any query.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_FLAG = "_kafka_exercise_spark_shipped"


def ship_package(spark: SparkSession) -> None:
    """Zip this package and addPyFile it, once per SparkContext."""
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_FLAG, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.mkdtemp(prefix="kes_pyfiles_"), "kafka_exercise_spark.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for fname in files:
                if fname.endswith(".py"):
                    full = os.path.join(root, fname)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    sc.addPyFile(zpath)
    setattr(sc, _SHIPPED_FLAG, True)
