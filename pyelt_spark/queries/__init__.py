"""Driver-contract query registry, split per subject area.

Each area module (cdc / tpch / events / docs / embeddings) defines its
Spark callables ``(spark, sf_dir) -> DataFrame`` plus their DuckDB oracle
SQL twins, and exports them as per-module ``QUERIES`` / ``ORACLES`` dicts.
This package merges them — plus the declared second domain's queries —
into the single registry the driver consumes. Column names/aliases match
exactly between each Spark query and its oracle; float aggregates are
decimal-cast (order-independent, exact) or rounded doubles so the
driver's value-hash compare is stable.
"""

from __future__ import annotations

from pyelt_spark.entry_domain import DOMAIN_ORACLES, DOMAIN_QUERIES
from pyelt_spark.queries import cdc, docs, embeddings, events, tpch
from pyelt_spark.queries.cdc import *  # noqa: F401,F403
from pyelt_spark.queries.common import *  # noqa: F401,F403
from pyelt_spark.queries.common import _dec, _t  # noqa: F401
from pyelt_spark.queries.docs import *  # noqa: F401,F403
from pyelt_spark.queries.embeddings import *  # noqa: F401,F403
from pyelt_spark.queries.events import *  # noqa: F401,F403
from pyelt_spark.queries.tpch import *  # noqa: F401,F403

QUERIES = {}
ORACLES = {}
for _m in (cdc, tpch, events, docs, embeddings):
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)
QUERIES.update(DOMAIN_QUERIES)
ORACLES.update(DOMAIN_ORACLES)
