"""Domain-model documentation generator: graphviz DOT + markdown from the
declared domain classes.

Parity target: the reference's wiki/graphviz doc maker
(/root/reference/pyelt/helpers/domain_graphviz_doc_maker.py:1-290), which
walks domain modules and emits (a) one main digraph — hub boxes colored
per module, subtype-inheritance edges, link nodes wired to their leg hubs
— and (b) a per-entity detail section: class/sat docstrings plus a detail
digraph of the hub ringed by its satellites (subtype sats included).
Re-expressed over this engine's declarative layer (plans/domain.py):
pure-metadata introspection, zero Spark, deterministic output (sorted
member walks, no global mutable registry). The DokuWiki wrapper syntax is
replaced by fenced ```dot blocks in plain markdown so the output renders
on any modern wiki; `render_svg` shells out to graphviz only if present.
"""

from __future__ import annotations

import inspect
from types import ModuleType
from typing import Iterable

from pyelt_spark.plans.domain import (
    HubEntity,
    HybridSat,
    LinkEntity,
    camel_to_snake,
)

_PALETTE = ["green", "yellow", "red", "blue", "gray", "orange", "purple"]


def _discover(modules: Iterable[ModuleType | type]):
    """Yield (cls, module_name) for every HubEntity / LinkEntity declared
    in the given modules (or passed directly as classes)."""
    for mod in modules:
        if isinstance(mod, type):
            yield mod, mod.__module__
            continue
        for _, cls in sorted(inspect.getmembers(mod, inspect.isclass)):
            if cls.__module__ != mod.__name__:
                continue
            if issubclass(cls, (HubEntity, LinkEntity)) and cls not in (
                HubEntity,
                LinkEntity,
            ):
                yield cls, mod.__name__


def _module_colors(pairs) -> dict[str, str]:
    colors: dict[str, str] = {}
    for _, mod in pairs:
        if mod not in colors:
            colors[mod] = _PALETTE[len(colors) % len(_PALETTE)]
    return colors


def _hub_node(name: str, anchor: str, color: str) -> str:
    return (
        f'{name} [shape="box" penwidth="3" color="{color}" '
        f'URL="#{anchor}_details" style="filled" gradientangle="270" '
        f'fillcolor="white:aqua"];\n'
    )


def main_graph(modules: Iterable[ModuleType | type], colors: dict[str, str] | None = None) -> str:
    """The overview digraph: one box per hub (subtype entities share the
    base hub and get their own box + an `onormal` inheritance edge, the
    reference's make_hub_graph_subclass), one ellipse per link with an
    edge to every leg's hub (dynamic legs dashed)."""
    pairs = list(_discover(modules))
    colors = colors or _module_colors(pairs)
    seen: set[str] = set()
    out = [
        "digraph domain_model {",
        "node [shape=box];",
        'edge [arrowhead="none"];',
        "overlap=false;",
    ]
    # hubs first (roots, then subtype chains), then links
    for cls, mod in pairs:
        if not (inspect.isclass(cls) and issubclass(cls, HubEntity)):
            continue
        color = colors.get(mod, "black")
        if not cls.__subtype__:
            if cls.__hub_name__ not in seen:
                seen.add(cls.__hub_name__)
                out.append(_hub_node(cls.__hub_name__, cls.__dbname__, color))
        else:
            # a subtype's __dbname__ is its OWNER's (it shares the base
            # hub), so the node is named from the class itself — the
            # reference's sub_cls.__name__.lower()
            node = camel_to_snake(cls.__name__)
            if node in seen:
                continue
            seen.add(node)
            base = cls.__mro__[1]
            base_node = (
                base.__hub_name__
                if not base.__subtype__
                else camel_to_snake(base.__name__)
            )
            out.append(_hub_node(node, node, color))
            out.append(f'{node} -> {base_node} [arrowhead="onormal"];\n')
    for cls, mod in pairs:
        if not (inspect.isclass(cls) and issubclass(cls, LinkEntity)):
            continue
        color = colors.get(mod, "black")
        name = cls.__dbname__
        if name in seen:
            continue
        seen.add(name)
        out.append(f'{name} [shape="ellipse" color="{color}"];\n')
        link = cls.__link__
        for leg, ref in link.cls_get_link_refs().items():
            out.append(f'{name} -> {ref.entity.__hub_name__} [label="{leg}"];\n')
        for leg in link.cls_get_dynamic_refs():
            out.append(f'{name} -> {name}_{leg} [label="{leg}" style="dashed"];\n')
    out.append("}")
    return "\n".join(out) + "\n"


def entity_detail_graph(entity: type[HubEntity], color: str = "black") -> str:
    """Hub box ringed by its satellite ellipses — every sat across the
    subtype MRO, hybrid sats annotated with their type grain (the
    reference's make_entity_graph + detail_graphs_subclasses, collapsed:
    our __sats__ already collects the MRO)."""
    out = [
        f"digraph {entity.__dbname__} {{",
        "node [shape=box];",
        'edge [arrowhead="none"];',
        _hub_node(entity.__hub_name__, entity.__dbname__, color).rstrip(),
    ]
    for name, sat in entity.__sats__.items():
        label = name
        if issubclass(sat, HybridSat):
            label += r"\n(types: " + ", ".join(sorted(sat.cls_get_types())) + ")"
        out.append(f'{name} [shape="ellipse" label="{label}"];')
        out.append(f"{entity.__hub_name__} -> {name};")
    out.append("}")
    return "\n".join(out) + "\n"


def _clean_docstring(doc: str) -> str:
    return inspect.cleandoc(doc).replace("\t", " ")


def entity_details_md(entity: type[HubEntity], color: str = "black") -> str:
    """Markdown detail section: heading, entity + per-sat docstrings,
    fenced detail graph (the reference's make_detail_graphs /
    make_doc_from_docstring)."""
    parts = [f"## {entity.__name__.upper()}_DETAILS\n"]
    if entity.__doc__:
        parts.append(f"**{entity.__name__}**: {_clean_docstring(entity.__doc__)}\n")
    for name, sat in entity.__sats__.items():
        own_doc = sat.__dict__.get("__doc__")  # not the Sat/HybridSat base doc
        if own_doc:
            parts.append(f"*{name}*: {_clean_docstring(own_doc)}\n")
        cols = ", ".join(c.name for c in sat.cls_get_columns())
        if cols:
            parts.append(f"*{name}* columns: {cols}\n")
    parts.append("```dot\n" + entity_detail_graph(entity, color) + "```\n")
    return "\n".join(parts)


def domain_doc(modules: Iterable[ModuleType | type]) -> str:
    """The full document: main graph + one detail section per entity."""
    pairs = list(_discover(modules))
    colors = _module_colors(pairs)
    parts = [
        "# DOMAIN\n",
        "```dot\n" + main_graph([c for c, _ in pairs], colors) + "```\n",
    ]
    for cls, mod in pairs:
        if issubclass(cls, HubEntity):
            parts.append(entity_details_md(cls, colors.get(mod, "black")))
    return "\n".join(parts)


def render_svg(dot_source: str, out_path: str) -> bool:
    """Render via the graphviz CLI if installed; returns False (and writes
    nothing) when `dot` is absent — documentation tooling must not make
    the engine depend on graphviz."""
    import shutil
    import subprocess

    if not shutil.which("dot"):
        return False
    svg = subprocess.run(
        ["dot", "-Tsvg"], input=dot_source.encode(), capture_output=True
    )
    if svg.returncode != 0:
        return False
    with open(out_path, "wb") as f:
        f.write(svg.stdout)
    return True
