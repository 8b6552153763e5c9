"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (smoke, sf0.001).
``queries()`` / ``oracle_sql()`` — the correctness gate: each Spark pipeline
is hash-compared against its DuckDB oracle at sf0.01.

Implementation lives in ``next_plaid_spark/``; this module is just the
driver-facing shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from next_plaid_spark import queries as _q  # noqa: E402

SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: batch semantic search — exact MaxSim top-10 for 10 queries
    over the documents corpus at sf0.001 (brute-force path; the ANN funnel
    is exercised via ``queries()``)."""
    return _q.q_maxsim_brute_topk(spark, SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
