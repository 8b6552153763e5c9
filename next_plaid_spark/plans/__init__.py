from next_plaid_spark.plans.builder import IndexBuilder  # noqa: F401
from next_plaid_spark.plans.searcher import BatchSearcher, SearchParams  # noqa: F401
