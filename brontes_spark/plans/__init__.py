from .registry import REGISTRY, QuerySpec, queries, oracle_sql
from . import relational, timeseries, llm_data, mev_fixture, univ3_fixture  # noqa: F401  (registration side effects)

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql"]
