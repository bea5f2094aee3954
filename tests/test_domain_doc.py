"""Domain doc generator (reference
helpers/domain_graphviz_doc_maker.py:1-290 parity): main graph shape,
subtype inheritance edges, link leg edges, detail sections. Pure
metadata — no SparkSession involved."""

import tests.test_domain as domain_mod
from pyelt_spark.helpers.domain_doc import (
    domain_doc,
    entity_detail_graph,
    entity_details_md,
    main_graph,
    render_svg,
)
from tests.test_domain import Baz, Foo, Patient, PatientHandelingLink


def test_main_graph_nodes_and_edges():
    g = main_graph([domain_mod])
    assert g.startswith("digraph domain_model {")
    # root hubs appear once, boxed (\n prefix: node defs, not edge attrs)
    assert g.count('\nfoo_hub [shape="box"') == 1
    assert '\npatient_hub [shape="box"' in g
    # subtype gets its own node + onormal inheritance edge to the base hub
    assert "baz [" in g
    assert 'baz -> foo_hub [arrowhead="onormal"]' in g
    # link node wired to every typed leg's hub, dynamic leg dashed
    assert "patient_handeling_link [" in g
    assert 'patient_handeling_link -> patient_hub [label="patient"]' in g
    assert 'patient_handeling_link -> handeling_hub [label="handeling"]' in g
    assert 'style="dashed"' in g
    assert g.rstrip().endswith("}")


def test_entity_detail_graph_sats():
    g = entity_detail_graph(Patient)
    assert "patient_hub [" in g
    assert "patient_sat [" in g and "patient_hub -> patient_sat;" in g
    # hybrid sat annotated with its type grain
    assert "patient_sat_adres [" in g
    assert "types: bezoekadres, postadres" in g


def test_subtype_detail_includes_inherited_sats():
    g = entity_detail_graph(Baz)
    # __sats__ collects across the MRO: base sats + the subtype's own
    for sat in ("foo_sat", "foo_sat_bar", "foo_sat_qux"):
        assert f"foo_hub -> {sat};" in g


def test_details_md_docstrings_and_columns():
    md = entity_details_md(Baz)
    assert md.startswith("## BAZ_DETAILS")
    assert "Subtype entity" in md  # Baz's own docstring
    assert "*foo_sat* columns: test1, test1a" in md
    assert "```dot" in md


def test_domain_doc_end_to_end(tmp_path):
    doc = domain_doc([domain_mod])
    assert doc.startswith("# DOMAIN")
    assert "## FOO_DETAILS" in doc and "## PATIENT_DETAILS" in doc
    # deterministic: two runs, identical output (no global registry)
    assert doc == domain_doc([domain_mod])
    # svg render degrades gracefully when graphviz is absent
    ok = render_svg(main_graph([Foo, PatientHandelingLink]), str(tmp_path / "d.svg"))
    assert ok in (True, False)
