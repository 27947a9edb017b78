"""User-defined function surface: scalar / aggregate / table functions.

ksqlDB ships a UDF/UDAF/UDTF plugin system (the reference uses only
built-ins — SURVEY.md §2.5 lists the custom surface as absent); the Spark
engine's equivalent is registration into the SQL function catalog, after
which ksql-dialect statements and plain ``spark.sql`` both resolve the
name. Three tiers, in descending preference:

- **Scalar via Catalyst expression** (``register_scalar_sql``): the
  function body is a SQL expression, inlined by Catalyst into whole-stage
  codegen — zero Python at runtime. This is how the dialect's own
  DATETOSTRING/TIMESTAMPTOSTRING are implemented (ksql.py); prefer it
  whenever the logic is expressible.
- **Aggregate via Arrow** (``register_udaf_pandas``): a pandas
  grouped-aggregate UDF — Arrow-batched columnar transfer, one Python call
  per group per partition. The right tier for numeric aggregates SQL can't
  express (trimmed means, custom robust stats).
- **Table function** (``register_udtf``): Spark 4 Python UDTF — a Python
  call per input row, rows out. The LAST-resort tier: use for genuinely
  row-expanding logic with per-row state that neither ``explode`` over a
  JVM array expression nor ``mapInPandas`` fits. At 100 TB a UDTF in a hot
  path is a design smell; the tests pin one as the extension-surface
  proof, not as an operator building block.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_scalar_sql(
    spark: SparkSession, name: str, params: str, returns: str, body_sql: str
) -> None:
    """Register a scalar SQL function (Catalyst-inlined, codegen'd).

    ``params`` like ``"x DOUBLE, y DOUBLE"``, ``returns`` the SQL return
    type, ``body_sql`` a SQL expression over the parameter names. Session
    scoped — the engine analog of installing a ksqlDB UDF jar.
    """
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
        f"RETURNS {returns} RETURN {body_sql}"
    )


def register_udaf_pandas(spark: SparkSession, name: str, fn, return_type: str):
    """Register a pandas grouped-aggregate UDF as a SQL aggregate.

    ``fn`` takes one or more ``pandas.Series`` and returns a scalar; the
    exchange is Arrow-batched. Returns the registered UDF (also usable as
    a DataFrame column function).
    """
    from pyspark.sql.functions import PandasUDFType, pandas_udf  # noqa: PLC0415

    agg = pandas_udf(fn, return_type, PandasUDFType.GROUPED_AGG)
    spark.udf.register(name, agg)
    return agg


def register_udtf(spark: SparkSession, name: str, cls, return_type: str):
    """Register a Spark 4 Python UDTF class under ``name``.

    ``cls`` is a plain class with an ``eval(self, ...)`` generator method;
    it is wrapped with the ``@udtf`` decorator here so callers don't
    import pyspark internals.
    """
    from pyspark.sql.functions import udtf  # noqa: PLC0415

    wrapped = udtf(cls, returnType=return_type)
    spark.udtf.register(name, wrapped)
    return wrapped
