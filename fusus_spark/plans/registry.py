"""Single registry of all driver-exposed queries and their oracles."""

from __future__ import annotations

from fusus_spark.plans.relational_queries import RELATIONAL_ORACLES, RELATIONAL_QUERIES
from fusus_spark.plans.web_queries import WEB_ORACLES, WEB_QUERIES

QUERIES = {**WEB_QUERIES, **RELATIONAL_QUERIES}
ORACLES = {**WEB_ORACLES, **RELATIONAL_ORACLES}

# Every oracle key must have a query; some queries are rows-only.
assert set(ORACLES) <= set(QUERIES), sorted(set(ORACLES) - set(QUERIES))
