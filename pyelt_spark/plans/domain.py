"""Declarative domain-model layer — the reference's authoring surface.

The reference declares a domain as plain classes and derives everything
else through metaclasses (pyelt/datalayers/dv_metaclasses.py:9-189:
OrderedTableMetaClass keeps member order, HubEntityMetaClass derives hub +
sat names, LinkEntityMetaClass wires link refs; pyelt/datalayers/dv.py:38-134
defines DvTable/Hub/Sat/HybridSat/Link/HybridLink/LinkReference/
DynamicLinkReference; behavior verified by the reference's own
tests/unit_test_model/test02_dv.py:29-50 — e.g. ``Foo.Bar`` → ``foo_sat_bar``,
``Foo.Default`` → ``foo_sat``).

This module reproduces that authoring surface; execution compiles to the
engine's existing one-shuffle bucket-pruned merges (operators/scd2.py,
operators/hubs.py) — declaration derives names, ordered columns and the
merge set, it never introduces a new execution path.

Naming conventions (reference parity):

* entity ``PatientAdres``      → hub  ``patient_adres_hub``
* nested ``class Adres(Sat)``  → sat  ``patient_adres_sat_adres``
* nested ``class Default(Sat)``→ sat  ``patient_adres_sat``
* subtype entity ``Zorginstelling(Organisatie)`` shares ``organisatie_hub``
  and names its sats ``organisatie_sat_zorginstelling``; its hub rows carry
  ``type='zorginstelling'`` (HubEntityMetaClass subtype branch)
* link entity ``PatientHandelingLink`` → link ``patient_handeling_link``
"""

from __future__ import annotations

import re
from collections import OrderedDict


def camel_to_snake(name: str) -> str:
    """``PatientAdres`` → ``patient_adres`` (helpers/global_helper_functions
    camelcase_to_underscores analog)."""
    s = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", name)
    return re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s).lower()


class Col:
    """Ordered column declaration (Columns.TextColumn analog). ``key=True``
    adds the column to the sat grain on top of the entity's business key
    (the reference expresses sat grain via its FK + PK columns)."""

    __slots__ = ("dtype", "key", "name")

    def __init__(self, dtype: str = "string", key: bool = False):
        self.dtype = dtype
        self.key = key
        self.name: str | None = None

    def __set_name__(self, owner, name):
        self.name = name

    def __repr__(self):  # pragma: no cover
        return f"Col({self.name!r}, {self.dtype!r}{', key' if self.key else ''})"


class RefCol(Col):
    """Valueset-decoded column (Columns.RefColumn analog,
    dv_metaclasses.py:59-64): stores the raw code; views decode it against
    the named valueset (plans/views.py valueset_decode)."""

    __slots__ = ("valueset_name",)

    def __init__(self, valueset_name: str, dtype: str = "string"):
        super().__init__(dtype)
        self.valueset_name = valueset_name


class _OrderedColsMeta(type):
    """Member order preserved across the MRO (OrderedTableMetaClass:
    dv_metaclasses.py:9-93). Python 3.7+ class bodies are insertion-ordered,
    so walking ``__mro__`` in reverse and updating an OrderedDict reproduces
    the reference's __ordereddict__ semantics without __prepare__."""

    def __new__(mcs, name, bases, classdict):
        cls = super().__new__(mcs, name, bases, classdict)
        cols: "OrderedDict[str, Col]" = OrderedDict()
        for base in reversed(cls.__mro__):
            for k, v in vars(base).items():
                if isinstance(v, Col):
                    cols[k] = v
        cls.__cols__ = cols
        return cls


class Sat(metaclass=_OrderedColsMeta):
    """Declarative satellite: payload columns in declared order. The entity
    metaclass assigns ``__dbname__`` (dv.py:54-72)."""

    __dbname__: str = ""

    @classmethod
    def cls_get_name(cls) -> str:
        return cls.__dbname__ or camel_to_snake(cls.__name__)

    @classmethod
    def cls_get_short_name(cls) -> str:
        return cls.__name__.lower().replace("_sat", "")

    @classmethod
    def cls_get_columns(cls) -> list[Col]:
        return list(cls.__cols__.values())

    @classmethod
    def payload_cols(cls) -> list[str]:
        return [c.name for c in cls.cls_get_columns() if not c.key]

    @classmethod
    def grain_cols(cls) -> list[str]:
        """Extra key columns beyond the entity business key."""
        return [c.name for c in cls.cls_get_columns() if c.key]


class HybridSat(Sat):
    """Type column as part of the key (dv.py:74-88): one sat stores N typed
    row families — e.g. one address sat with type ∈ {postadres, bezoekadres}."""

    class Types:
        pass

    @classmethod
    def cls_get_types(cls) -> list[str]:
        return [v for k, v in vars(cls.Types).items() if not k.startswith("__")]

    @classmethod
    def grain_cols(cls) -> list[str]:
        return ["type"] + super().grain_cols()


class RecordStatusSat(Sat):
    """Delete-propagation sat marker (dv.py:90-91). The engine derives its
    rows from head tombstones (plans/pipeline.py record_status) instead of
    storing a separate table."""

    deleted = Col("timestamp")


class _HubEntityMeta(type):
    """HubEntityMetaClass analog (dv_metaclasses.py:95-148): derives the hub
    name, walks nested Sat classes assigning convention names, collects the
    sat map across the MRO, and marks subtype entities (shared hub)."""

    def __new__(mcs, name, bases, classdict):
        cls = super().__new__(mcs, name, bases, classdict)
        if name == "HubEntity":
            return cls
        direct = any(b.__name__ == "HubEntity" for b in bases)
        # the ancestor that directly subclasses HubEntity owns the hub
        owner = None
        for c in cls.__mro__:
            if any(b.__name__ == "HubEntity" for b in c.__bases__):
                owner = c
        owner = owner or cls
        cls.__entity_owner__ = owner
        cls.__dbname__ = camel_to_snake(owner.__name__)
        cls.__hub_name__ = cls.__dbname__ + "_hub"
        # reference subtype string: dv_metaclasses.py:116 —
        # name.lower().replace('entity','').replace('hub','') (NOT snake
        # case: Zorginstelling → 'zorginstelling')
        cls.__subtype__ = (
            "" if direct else name.lower().replace("entity", "").replace("hub", "")
        )
        # name this class's nested sats by convention
        for attr, sat in vars(cls).items():
            if isinstance(sat, type) and issubclass(sat, Sat):
                short = camel_to_snake(attr).replace("_sat", "").replace("sat", "")
                dbname = f"{cls.__dbname__}_sat_{short}".replace("_default", "")
                sat.__dbname__ = dbname
                sat.__entity__ = cls
        # sat collection across the MRO (base sats inherited, subclass wins)
        sats: "OrderedDict[str, type[Sat]]" = OrderedDict()
        for base in reversed(cls.__mro__):
            for attr, sat in vars(base).items():
                if isinstance(sat, type) and issubclass(sat, Sat) and sat.__dbname__:
                    sats[sat.__dbname__] = sat
        cls.__sats__ = sats
        return cls


class HubEntity(metaclass=_HubEntityMeta):
    """One hub + 0..n sats (dv.py:130-134). Subclasses declare:

    * ``__bk__``   — business-key column names (the hub's bk)
    * nested ``class X(Sat)`` members — satellites

    Subclassing a concrete entity creates a SUBTYPE sharing the base hub
    (``__subtype__`` set, hub rows typed) — the Organisatie/Zorginstelling
    pattern in the reference's _domainmodel.py:82-97.
    """

    __bk__: list[str] = []
    __sats__: "OrderedDict[str, type[Sat]]" = OrderedDict()


class LinkReference:
    """Typed leg of a link (dv.py:113-130): points at a HubEntity; the leg's
    FK columns default to the target entity's business key."""

    def __init__(self, entity: type[HubEntity], name: str = "", key_cols: list[str] | None = None):
        self.entity = entity
        self._explicit_name = bool(name)
        self.name = name or camel_to_snake(entity.__name__)
        self.key_cols = key_cols or list(entity.__bk__)

    def __set_name__(self, owner, name):
        # the attribute name is the leg name UNLESS the declaration named
        # the leg explicitly (LinkReference(Patient, name="subject"))
        if not self._explicit_name:
            self.name = camel_to_snake(name)


class DynamicLinkReference:
    """Runtime-typed leg (dv.py:136-137, used in _domainmodel.py:121-131):
    the row itself says which entity type the leg points at. Declares a
    discriminator column (``type_col``) and the dynamic key column; the FK
    hash is computed over (type, key) so keys of different entity types
    never collide."""

    def __init__(self, type_col: str = "dyn_type", key_col: str = "dyn_key", name: str = "dynamic"):
        self.type_col = type_col
        self.key_col = key_col
        self.name = name

    def __set_name__(self, owner, name):
        self.name = camel_to_snake(name)


class Link:
    """Link table body: declare LinkReference / DynamicLinkReference class
    attributes (dv.py:93-111). Subclass ``HybridLink`` for a type
    discriminator in the link key."""

    @classmethod
    def cls_get_link_refs(cls) -> "OrderedDict[str, LinkReference]":
        out: "OrderedDict[str, LinkReference]" = OrderedDict()
        for base in reversed(cls.__mro__):
            for k, v in vars(base).items():
                if isinstance(v, LinkReference):
                    out[k] = v
        return out

    @classmethod
    def cls_get_dynamic_refs(cls) -> "OrderedDict[str, DynamicLinkReference]":
        out: "OrderedDict[str, DynamicLinkReference]" = OrderedDict()
        for base in reversed(cls.__mro__):
            for k, v in vars(base).items():
                if isinstance(v, DynamicLinkReference):
                    out[k] = v
        return out


class HybridLink(Link):
    """Link with a ``type`` discriminator column in the key (dv.py:99-111):
    one physical link stores N typed association families."""

    class Types:
        pass

    @classmethod
    def cls_get_types(cls) -> list[str]:
        out = []
        for k, v in vars(cls.Types).items():
            if k.startswith("__"):
                continue
            out.append(camel_to_snake(v.__name__) if isinstance(v, type) else str(v))
        return out


class _LinkEntityMeta(type):
    """LinkEntityMetaClass analog (dv_metaclasses.py:150-189)."""

    def __new__(mcs, name, bases, classdict):
        cls = super().__new__(mcs, name, bases, classdict)
        if name == "LinkEntity":
            return cls
        cls.__dbname__ = (
            camel_to_snake(name).replace("_link", "").replace("_entity", "") + "_link"
        )
        link = classdict.get("Link")
        if link is None:
            for base in cls.__mro__:
                link = vars(base).get("Link")
                if isinstance(link, type) and issubclass(link, Link):
                    break
        cls.__link__ = link
        # convention-name any sats hanging off the link (reference allows
        # link sats: dv_metaclasses.py:173-183)
        sats: "OrderedDict[str, type[Sat]]" = OrderedDict()
        for attr, sat in vars(cls).items():
            if isinstance(sat, type) and issubclass(sat, Sat):
                short = camel_to_snake(attr).replace("_sat", "").replace("sat", "")
                sat.__dbname__ = f"{camel_to_snake(name)}_sat_{short}".replace("_default", "")
                sats[sat.__dbname__] = sat
        cls.__sats__ = sats
        return cls


class LinkEntity(metaclass=_LinkEntityMeta):
    """A link plus its optional sats; declare a nested ``class Link(Link)``
    (or HybridLink) holding the leg references."""

    __sats__: "OrderedDict[str, type[Sat]]" = OrderedDict()
