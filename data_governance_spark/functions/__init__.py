"""Scalar / column-expression function library.

All hot-path functions are built from ``pyspark.sql.functions`` so they
stay inside whole-stage codegen; Python UDFs exist only where the JVM
has no equivalent (diacritics strip, stopword title-case — see
``standardize``).
"""

from data_governance_spark.functions import text  # noqa: F401
