"""Pre-flight model validation — the reference's validate_domains /
validate_mappings_before_ddl phase (pyelt/helpers/validations.py:14-301,
invoked at pipeline.py:130-133): pure-Python checks that fail fast with
actionable messages BEFORE any data moves."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from pyelt_spark.operators.scd2 import Scd2Merge


class ModelValidationError(ValueError):
    pass


# --------------------------------------------------------------------------
# declared ROW validations — run by Pipe.run as a pipeline stage, the
# reference's pipe.validations list (pyelt/pipeline.py:675-679 auto-invoke;
# declaration surface pyelt/mappings/validations.py:44-76)
# --------------------------------------------------------------------------


@dataclass
class RowCondition:
    """SorValidation analog (validations.py:44-59, applied by
    etl.py:373-388): rows where the SQL ``condition`` holds are INVALID —
    they are quarantined and never reach the vault merges."""

    condition: str
    message: str


@dataclass
class DuplicateKeys:
    """set_check_for_duplicate_keys analog (validations.py:50-59, applied
    by etl.py:349-371): more than one row per (batch, keys) marks EVERY
    row of the group invalid. Opt-in — a CDC change stream legitimately
    carries several events per business key, so declare this only for
    grains that must be unique per batch (e.g. key + sequence)."""

    keys: list[str] = field(default_factory=list)
    message: str = "duplicate key"


def validate_merge_model(merge: Scd2Merge, event_schema: T.StructType) -> list[str]:
    """Validate an Scd2Merge declaration against an incoming event schema.
    Returns warnings; raises ModelValidationError on hard errors."""
    errors, warnings = [], []
    fields = {f.name: f for f in event_schema.fields}

    if not merge.business_keys:
        errors.append("business_keys must not be empty")
    for c in merge.business_keys:
        if c not in fields:
            errors.append(f"business key column '{c}' missing from event schema")
    if not merge.order_by:
        errors.append("order_by must not be empty (need a monotone sequence column)")
    for c in merge.order_by:
        if c not in fields:
            errors.append(f"order_by column '{c}' missing from event schema")
    if merge.order_by and merge.order_by[0] in fields:
        t = fields[merge.order_by[0]].dataType
        if not isinstance(t, (T.LongType, T.IntegerType, T.ShortType)):
            errors.append(
                f"order_by[0] '{merge.order_by[0]}' must be an integral sequence, got {t.simpleString()}"
            )
    if merge.ts_col not in fields:
        errors.append(f"ts column '{merge.ts_col}' missing from event schema")
    overlap = set(merge.business_keys) & set(merge.payload_cols)
    if overlap:
        errors.append(f"columns cannot be both key and payload: {sorted(overlap)}")
    for c in merge.payload_cols:
        if c not in fields:
            warnings.append(
                f"payload column '{c}' absent from this batch's schema (treated as NULL)"
            )
    reserved = set(merge.sys.all()) | {"_bucket", "_op", "_verdict"}
    clash = reserved & set(fields)
    if clash:
        errors.append(f"event schema uses reserved system column names: {sorted(clash)}")
    if merge.op_col and merge.op_col not in fields:
        warnings.append(f"op column '{merge.op_col}' absent — all events treated as upserts")

    if errors:
        raise ModelValidationError("; ".join(errors))
    return warnings
