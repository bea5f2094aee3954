"""Mapping-boilerplate codegen (reference helpers/mappingcreator.py:1-115).

The reference reflects a database table via SQLAlchemy and prints
SorToEntityMapping boilerplate — available source fields as a comment
block, one ``map_field`` line per sat column, casts for non-text types.
Spark-side the source of truth is a DataFrame schema (anything
``spark.read`` can load is reflectable), and the emitted skeleton is the
declarative ``HubEntity``/``SorToEntityMapping`` form this engine uses.

Both generators return Python source text; they never touch the vault.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Spark simpleString → Col dtype (everything else passes through verbatim;
# the reference's oracle_type_to_postgres_type analog)
_DTYPES = {
    "string": "string",
    "bigint": "long",
    "int": "int",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "timestamp": "timestamp",
    "date": "date",
    "binary": "binary",
}


def _cols(source: DataFrame | T.StructType) -> list[tuple[str, str]]:
    schema = source.schema if isinstance(source, DataFrame) else source
    return [
        (f.name, _DTYPES.get(f.dataType.simpleString(), f.dataType.simpleString()))
        for f in schema.fields
        if not f.name.startswith("_")
    ]


def entity_code(
    source: DataFrame | T.StructType,
    entity_name: str,
    bk: list[str],
    exclude: list[str] | None = None,
) -> str:
    """Emit a ``HubEntity`` declaration whose Default sat carries every
    reflected non-system, non-bk column with its Spark type."""
    skip = set(bk) | set(exclude or [])
    lines = [
        f"class {entity_name}(HubEntity):",
        f"    __bk__ = {bk!r}",
        "",
        "    class Default(Sat):",
    ]
    payload = [(n, d) for n, d in _cols(source) if n not in skip]
    if not payload:
        lines.append("        pass")
    for name, dtype in payload:
        arg = "" if dtype == "string" else f"{dtype!r}"
        lines.append(f"        {name} = Col({arg})")
    return "\n".join(lines) + "\n"


def mapping_code(
    source: DataFrame | T.StructType,
    entity_name: str,
    source_name: str = "source",
) -> str:
    """Emit a ``SorToEntityMapping`` skeleton for an EXISTING entity:
    available source fields as a comment block (ten per line, like the
    reference), a filter stub, and a field_map with one identity entry
    per reflected column to edit down."""
    cols = _cols(source)
    lines = [f"def {source_name}_to_{entity_name.lower()}_mappings():"]
    lines.append(f"    # available fields in {source_name.upper()}:")
    for i in range(0, len(cols), 10):
        lines.append("    # " + ", ".join(n for n, _ in cols[i : i + 10]))
    lines.append("    return [")
    lines.append("        SorToEntityMapping(")
    lines.append(f"            entity={entity_name},")
    lines.append("            filter=None,  # e.g. \"src = '...'\"")
    lines.append("            field_map={")
    for name, dtype in cols:
        expr = name if dtype == "string" else f"CAST({name} AS {dtype})"
        lines.append(f"                {name!r}: {expr!r},")
    lines.append("            },")
    lines.append("        ),")
    lines.append("    ]")
    return "\n".join(lines) + "\n"
