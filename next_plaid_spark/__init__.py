"""next_plaid_spark — a PySpark-native multi-vector (late-interaction) search
and data-processing engine with the query capabilities of lightonai/next-plaid.

Design stance (SURVEY.md §7): everything is a DataFrame pipeline. Index build
is a batch ETL job producing partitioned Parquet tables; search is a join
funnel over a *query DataFrame*; metadata filtering is ordinary Spark SQL
behind the reference's restricted WHERE grammar; keyword search is a BM25
aggregation over a postings table; fusion/boosts are window expressions.

Nothing here copies reference code — reference files are cited in docstrings
as ``path:line`` for behavioral parity only.
"""

__version__ = "0.1.0"

from next_plaid_spark.session import get_spark  # noqa: F401
