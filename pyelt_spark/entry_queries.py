"""Compatibility alias for the driver-contract query registry.

The registry lives in :mod:`pyelt_spark.queries`, split per subject area
(cdc / tpch / events / docs / embeddings — see that package); this module
re-exports the identical surface (``QUERIES``, ``ORACLES``, the ``q_*``
callables and ``SQL_*`` oracle strings) so existing imports keep working.
"""

from __future__ import annotations

from pyelt_spark.queries import *  # noqa: F401,F403
from pyelt_spark.queries import ORACLES, QUERIES  # noqa: F401
from pyelt_spark.queries.common import _dec, _t  # noqa: F401
