"""Object-style read-back over a Pipe's vault (the reference ORM's read
semantics re-expressed Spark-side).

The reference ships a small ORM that hydrates entity objects from
hub+sat state and saves new rows back (dv_objects.py:36-369: hub
``load()`` returns id-keyed rows, sat attributes load lazily on first
access with an ``_active`` filter, ``new()``/``save()`` insert via
NOT-EXISTS / revision-increment SQL; usage shapes in orm/test_orm.py).

Spark-native differences, on purpose:

* Reads are **set-at-a-time**: ``load()`` is one collect of the hub
  (optionally filtered), and the FIRST access to any sat attribute
  loads that sat's active rows for the whole loaded set in ONE collect
  (keyed by hub ``_key``), then serves every row from the cached dict —
  the lazy-load contract of ``EntityRow.__getattribute__`` without a
  per-row query.
* Writes route through the SAME set-based merges as any source batch
  (``HubMerge`` / ``Scd2Merge`` ``apply_batch`` with the next free
  batch id): the reference's NOT-EXISTS hub insert and sat revision
  increment are exactly the merge's distinct-bk / hashdiff semantics,
  and save() stays exactly-once and crash-safe for free. A batch of
  one is still a batch.

This is a convenience layer for small result sets (operator consoles,
tests); anything analytical should stay a DataFrame query.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from pyelt_spark.plans.domain import HubEntity

_NEW = "new"
_LOADED = "loaded"


class SatRow:
    """One satellite's current active version for one entity key."""

    def __init__(self, values: dict[str, Any]):
        self.__dict__.update(values)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        vals = {k: v for k, v in self.__dict__.items() if not k.startswith("_")}
        return f"SatRow({vals})"


class EntityRow:
    """One hub row; sat attributes resolve lazily through the reader."""

    def __init__(self, reader: "EntityData", key: str | None, values: dict[str, Any]):
        object.__setattr__(self, "_reader", reader)
        object.__setattr__(self, "_key", key)
        object.__setattr__(self, "_status", _LOADED if key else _NEW)
        object.__setattr__(self, "_pending_sats", {})
        for k, v in values.items():
            object.__setattr__(self, k, v)

    def __getattr__(self, item: str):
        # only fires for attributes NOT set on the instance: sat names
        reader: EntityData = object.__getattribute__(self, "_reader")
        if item in reader._sat_attrs:
            return reader._sat_row(object.__getattribute__(self, "_key"), item)
        raise AttributeError(item)

    def set_sat(self, attr: str, **payload: Any) -> None:
        """Queue new sat payload for this entity (written on save())."""
        reader: EntityData = object.__getattribute__(self, "_reader")
        if attr not in reader._sat_attrs:
            raise KeyError(f"unknown sat {attr!r}; have {sorted(reader._sat_attrs)}")
        self._pending_sats.setdefault(attr, {}).update(payload)


class EntityData:
    """Reader/writer for one declared entity over a compiled Pipe.

    ``EntityData(pipe, Customer).load()`` → dict keyed by hub ``_key``;
    ``row.<bk col>`` reads hub columns, ``row.default.<payload col>``
    reads the Default sat's current active version (lazy, one collect
    per sat). ``new(...)`` + ``save()`` push rows back through the
    entity's merges.
    """

    def __init__(self, pipe, entity: type[HubEntity]):
        self.pipe = pipe
        self.entity = entity
        self.owner = entity.__entity_owner__
        # attribute name = nested sat class name, lowercased (the
        # reference exposes `row.naamgegevens` for class Naamgegevens)
        self._sat_attrs: dict[str, str] = {
            sat.__name__.lower(): name for name, sat in entity.__sats__.items()
        }
        self._sat_cache: dict[str, dict[str, SatRow]] = {}
        self.rows: dict[str, EntityRow] = {}
        self._pending: list[EntityRow] = []

    # ------------------------------------------------------------- reading

    def load(self, filter: str | None = None) -> dict[str, EntityRow]:
        """Hydrate hub rows (optionally filtered by a SQL expression over
        hub columns). Mirrors HubData.load(filter) — one collect. Also
        drops the lazy sat cache: a re-load is a request for CURRENT
        state, and another writer (or a pipe.run) may have revised sats
        since the cache filled (ADVICE r4)."""
        df = self.pipe.hub_table(self.entity).read()
        if filter:
            df = df.filter(filter)
        self._sat_cache = {}
        self.rows = {}
        for r in df.collect():
            d = r.asDict()
            key = d.pop("_key")
            self.rows[key] = EntityRow(self, key, {"_key": key, **d})
        return self.rows

    def _sat_row(self, key: str | None, attr: str) -> SatRow | None:
        if key is None:
            return None
        if attr not in self._sat_cache:
            name = self._sat_attrs[attr]
            cur = (
                self.pipe.sat_table(name)
                .current()
                .select("_key", *self._payload_cols(name), "_revision")
            )
            self._sat_cache[attr] = {
                r["_key"]: SatRow(r.asDict()) for r in cur.collect()
            }
        return self._sat_cache[attr].get(key)

    def _payload_cols(self, sat_name: str) -> list[str]:
        return list(self.pipe.sat_merges[sat_name].payload_cols)

    # ------------------------------------------------------------- writing

    def new(self, **fields: Any) -> EntityRow:
        """A pending entity row: business-key columns required, sat
        payload may be attached via set_sat(). Nothing is written until
        save()."""
        missing = [c for c in self.owner.__bk__ if c not in fields]
        if missing:
            raise ValueError(f"missing business key column(s) {missing}")
        row = EntityRow(self, None, fields)
        self._pending.append(row)
        return row

    def _next_batch_id(self) -> int:
        """Pipe-wide high-water mark: the max batch id any of the pipe's
        tables ever committed, plus the runs registry (a skipped-empty
        source batch leaves no table commit but does leave a run record —
        deriving from this entity's commits alone could reuse its id,
        ADVICE r4)."""
        pipe = self.pipe
        ids: set[int] = {0}
        for t in (
            list(pipe.hubs.values())
            + list(pipe.links.values())
            + list(pipe.valuesets.values())
        ):
            ids |= t.committed_batch_ids()
        for s in pipe.sats.values():
            ids |= s.committed_batch_ids()
        ids |= {int(r["run_id"]) for r in pipe.runs_log() if r.get("run_id") is not None}
        return max(ids) + 1

    def save(self, ts: str = "1970-01-01") -> dict[str, Any]:
        """Write all pending rows through the entity's hub + sat merges
        as ONE microbatch at the next free batch id. Existing bks are
        no-ops in the hub (distinct-key insert) and unchanged payloads
        are no-ops in the sats (hashdiff) — the reference's NOT-EXISTS /
        revision-update semantics, set-based and exactly-once.

        Each touched sat receives ONLY the pending rows that queued
        payload for it via ``set_sat``: a hub-only row mixed into a sat's
        merge would arrive as an all-null payload, which the hashdiff
        treats as a change — writing a spurious null revision over the
        key's active data (ADVICE r4, medium).

        SINGLE-WRITER per pipe: the next batch id is derived from the
        commit logs, so two concurrent EntityData writers can compute the
        same id. The merge's idempotence then makes the loser a silent
        no-op — detected here (the hub merge reports the duplicate) and
        raised instead of dropped."""
        if not self._pending:
            return {"saved": 0}
        pipe, owner = self.pipe, self.owner
        hub_t = pipe.hub_table(self.entity)
        batch_id = self._next_batch_id()

        sat_payloads: dict[str, list[str]] = {
            self._sat_attrs[a]: self._payload_cols(self._sat_attrs[a])
            for a in self._sat_attrs
        }
        all_cols = list(owner.__bk__) + sorted(
            {c for cols in sat_payloads.values() for c in cols}
        )
        data = []
        for row in self._pending:
            d = {c: getattr(row, c, None) for c in owner.__bk__}
            for attr, payload in row._pending_sats.items():
                d.update(payload)
            touched_sats = sorted(self._sat_attrs[a] for a in row._pending_sats)
            data.append(tuple(d.get(c) for c in all_cols) + (touched_sats,))
        seq = pipe.order_by[0]
        ev = (
            pipe.spark.createDataFrame(
                data,
                schema=self._save_schema(all_cols, sat_payloads)
                + ", _sats array<string>",
            )
            .withColumn(seq, F.lit(batch_id).cast("long"))
            .withColumn(pipe.ts_col, F.lit(ts).cast("timestamp"))
        )
        if pipe.op_col:
            ev = ev.withColumn(pipe.op_col, F.lit("U"))

        out: dict[str, Any] = {"batch_id": batch_id, "saved": len(self._pending)}
        hub_res = pipe.hub_merges[owner].apply_batch(hub_t, ev.drop("_sats"), batch_id)
        if "skipped_duplicate_batch" in hub_res:
            raise RuntimeError(
                f"batch id {batch_id} already committed on {owner.__hub_name__}: "
                "another writer raced this save() (EntityData is single-writer "
                "per pipe) — reload and retry"
            )
        out[owner.__hub_name__] = hub_res
        touched = {
            self._sat_attrs[a] for r in self._pending for a in r._pending_sats
        }
        for name in touched:
            # only rows that queued payload for THIS sat; hub-only rows
            # must not reach the hashdiff as all-null payloads
            sev = ev.filter(F.array_contains(F.col("_sats"), F.lit(name))).drop("_sats")
            for c in pipe.sat_merges[name].business_keys:
                sev = sev.filter(F.col(c).isNotNull())
            out[name] = pipe.sat_merges[name].apply_batch(
                pipe.sats[name], sev, batch_id
            )
        self._pending = []
        self._sat_cache = {}  # saved payloads invalidate the lazy cache
        return out

    def _save_schema(self, cols: list[str], sat_payloads: dict[str, list[str]]):
        """Schema from declared Col types; business-key columns take the
        LIVE hub schema's type when the table exists (a string-typed bk
        appended to a long-typed hub would poison the parquet union)."""
        types: dict[str, str] = {}
        for name, sat in self.entity.__sats__.items():
            for cname, col in getattr(sat, "__cols__", {}).items():
                types[cname] = getattr(col, "dtype", None) or "string"
        hub_schema = self.pipe.hub_table(self.entity)._schema()
        if hub_schema is not None:
            for f in hub_schema.fields:
                if f.name in cols:
                    types[f.name] = f.dataType.simpleString()
        return ", ".join(f"{c} {types.get(c, 'string')}" for c in cols)
