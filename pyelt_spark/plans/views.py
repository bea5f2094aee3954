"""Generated views: current-state, ensemble joins, valueset decodes.

Reference parity:
* entity current-state view — hub LEFT OUTER JOIN each active sat (+type
  filter for hybrid sats) (pyelt/process/ddl.py:505-531)
* valueset decode join — LEFT OUTER JOIN valset ON code + name + active
  (ddl.py:518-526); valuesets themselves are SCD2-tracked code tables
  (pyelt/datalayers/valset.py:7-24, load at etl.py:848-890)
* ensemble view — BFS join chain over declared entity links
  (pyelt/helpers/query_maker.py:157-208)

Spark shape: plain DataFrame builders over LakeTable / Scd2Table reads;
dimension-sized inputs (valuesets) are broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyelt_spark.operators.scd2 import Scd2Merge, Scd2Table
from pyelt_spark.storage.lake import LakeTable


def current_state_view(
    hub: LakeTable,
    sats: dict[str, tuple[Scd2Table, list[str]]],
    hub_keys: list[str],
    sat_type_filter: dict[str, str] | None = None,
) -> DataFrame:
    """Hub LEFT JOIN each sat's ACTIVE rows (ddl.py:505-531).

    ``sats`` maps a prefix → (sat table, columns to expose); exposed
    columns are prefixed to avoid collisions. ``sat_type_filter`` filters a
    hybrid sat to one type value (ddl.py:513-516 semantics)."""
    out = hub.read()
    for prefix, (sat, cols) in sats.items():
        cur = sat.current()
        if sat_type_filter and prefix in sat_type_filter:
            cur = cur.filter(F.col("type") == sat_type_filter[prefix])
        sel = cur.select(
            *[F.col(k) for k in hub_keys],
            *[F.col(c).alias(f"{prefix}_{c}") for c in cols],
        )
        out = out.join(sel, hub_keys, "left")
    return out


class ValuesetTable:
    """SCD2-tracked code→description reference data (valset.py:7-24).

    One Scd2Table keyed by (valueset, code) — the hybrid-sat pattern with
    the valueset name as the type discriminator."""

    def __init__(self, spark, path: str, num_buckets: int = 8):
        self.table = Scd2Table(spark, path, num_buckets)
        self.merge = Scd2Merge(
            business_keys=["valueset", "code"],
            payload_cols=["description"],
            order_by=["seq"],
            op_col="op",
            ts_col="ts",
            source_system="valuesets",
        )

    def apply_batch(self, rows: DataFrame, batch_id: int) -> dict:
        """rows: (valueset, code, description, seq, ts[, op])."""
        return self.merge.apply_batch(self.table, rows, batch_id)

    def decode_view(
        self, df: DataFrame, code_col: str, valueset: str, out_col: str | None = None
    ) -> DataFrame:
        """LEFT JOIN the active valueset rows to decode a code column
        (ddl.py:518-526). The valueset side is broadcast — it is dimension
        data by construction."""
        out_col = out_col or f"{code_col}_descr"
        vs = F.broadcast(
            self.table.current()
            .filter(F.col("valueset") == valueset)
            .select(F.col("code").alias(code_col), F.col("description").alias(out_col))
        )
        return df.join(vs, code_col, "left")


def ensemble_view(base: DataFrame, joins: list[tuple[DataFrame, list[str] | F.Column, str]]) -> DataFrame:
    """Chained LEFT JOIN ensemble (query_maker.py:157-208): each element is
    (frame, on, how)."""
    out = base
    for frame, on, how in joins:
        out = out.join(frame, on, how)
    return out


def ensemble_from_graph(
    entities: dict[str, DataFrame],
    links: list[tuple[str, str, list[str]]],
    start: str,
) -> DataFrame:
    """BFS join-chain builder over a declared entity graph — the reference's
    ensemble construction (pyelt/helpers/query_maker.py:157-208): starting
    from ``start``, walk the declared links breadth-first and LEFT JOIN each
    newly reached entity on its link columns. Unreachable entities are
    ignored (as in the reference, which only emits joins it can path to).

    ``links``: (entity_a, entity_b, join_cols) — undirected edges.
    """
    from collections import deque

    out = entities[start]
    visited = {start}
    queue = deque([start])
    adj: dict[str, list[tuple[str, list[str]]]] = {}
    for a, b, cols in links:
        adj.setdefault(a, []).append((b, cols))
        adj.setdefault(b, []).append((a, cols))
    while queue:
        cur = queue.popleft()
        for nxt, cols in adj.get(cur, []):
            if nxt in visited:
                continue
            visited.add(nxt)
            queue.append(nxt)
            out = out.join(entities[nxt], cols, "left")
    return out
