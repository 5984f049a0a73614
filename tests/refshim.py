"""Run the REFERENCE's triple-emission code in-process as a genuine oracle.

The reference's ``RDFModel.to_triples`` (minmodkg/libraries/rdf/rdf_model.py:214-266)
and ``minmodkg.transformations`` are pure Python, but their modules import
packages absent from this sandbox (rdflib, drepr, slugify, serde, statickg,
httpx, tqdm, fastapi, sqlalchemy/bcrypt via kgrel.user, shapely/pyproj via
misc.geo).  None of those packages' *behavior* is exercised on the
``MineralSite.from_dict(...).to_triples()`` path except:

- ``rdflib``'s namespace constants + ``NamespaceManager`` curie binding,
- ``drepr.writers.turtle_writer.MyLiteral.n3`` literal formatting,
- ``slugify.slugify``.

Those three are faked here following their public, documented semantics
(RDF 1.1 N3: plain quoting for xsd:string, ``"lex"^^prefix:dt`` otherwise).
Everything else is an import-time placebo.  The oracle therefore genuinely
executes the reference's schema machinery, id minting, and property
emission — only literal surface formatting comes from this shim.

Usage::

    ref = load_reference()
    site = ref.mineral_site.MineralSite.from_dict(raw_json_dict)
    triples = site.to_triples()
"""

from __future__ import annotations

import importlib
import os
import sys
import types
from types import SimpleNamespace

REF_PATH = "/root/reference"

# -- fake rdflib ---------------------------------------------------------------


class URIRef(str):
    pass


class _NS(str):
    """Namespace constant: str(NS) is the namespace IRI, NS.attr a URIRef."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return URIRef(str(self) + name)


RDF = _NS("http://www.w3.org/1999/02/22-rdf-syntax-ns#")
RDFS = _NS("http://www.w3.org/2000/01/rdf-schema#")
OWL = _NS("http://www.w3.org/2002/07/owl#")
SKOS = _NS("http://www.w3.org/2004/02/skos/core#")
XSD = _NS("http://www.w3.org/2001/XMLSchema#")

_XSD_STRING = str(XSD) + "string"


class Literal:
    def __init__(self, value, datatype=None, lang=None, normalize=None):
        self.value = value
        self.datatype = datatype
        self.lang = lang

    def __repr__(self):
        return f"Literal({self.value!r}, datatype={self.datatype!r})"


class NamespaceManager:
    def __init__(self, graph=None, bind_namespaces=None):
        self._bindings: list[tuple[str, str]] = []  # (namespace, alias)

    def bind(self, alias, namespace, **kw):
        self._bindings.append((str(namespace), alias))

    def curie(self, uri: str) -> str | None:
        for ns, alias in self._bindings:
            if uri.startswith(ns):
                return f"{alias}:{uri[len(ns):]}"
        return None

    def normalizeUri(self, uri):  # rdflib API name
        c = self.curie(str(uri))
        return c if c is not None else f"<{uri}>"


class Graph:
    def __init__(self, *a, **kw):
        self.namespace_manager = NamespaceManager()


class _Node:  # rdflib.term.Node
    pass


def _escape_literal(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


class MyLiteral(Literal):
    """drepr's turtle-writer literal: N3 text with Turtle shorthand —
    xsd:string stays a plain quoted literal (RDF 1.1), other datatypes get
    a curie'd ``^^`` suffix, booleans lowercase."""

    def n3(self, namespace_manager=None):
        v = self.value
        if isinstance(v, bool):
            lex = "true" if v else "false"
        else:
            lex = str(v)
        q = f'"{_escape_literal(lex)}"'
        if self.lang:
            return f"{q}@{self.lang}"
        dt = self.datatype
        if dt is None or str(dt) == _XSD_STRING:
            return q
        cur = namespace_manager.curie(str(dt)) if namespace_manager else None
        return f"{q}^^{cur}" if cur else f'{q}^^<{dt}>'


# -- slugify (python-slugify subset: ascii lowercase, runs of non-alnum → '-')


def _slugify(text: str, separator: str = "-") -> str:
    import re
    import unicodedata

    text = unicodedata.normalize("NFKD", str(text))
    text = text.encode("ascii", "ignore").decode("ascii").lower()
    text = re.sub(r"[^a-z0-9]+", separator, text)
    return text.strip(separator)


# -- module factory ------------------------------------------------------------


def _mod(name: str, **attrs) -> types.ModuleType:
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


class _AnyInt:
    def __getattr__(self, name):
        return 500


def _install_shims() -> None:
    if "rdflib" in sys.modules and not hasattr(sys.modules["rdflib"], "_refshim"):
        raise RuntimeError("real rdflib already imported; shim cannot take over")

    rdflib = _mod(
        "rdflib",
        _refshim=True,
        RDF=RDF,
        RDFS=RDFS,
        OWL=OWL,
        SKOS=SKOS,
        XSD=XSD,
        Graph=Graph,
        URIRef=URIRef,
        Literal=Literal,
    )
    _mod("rdflib.term", Node=_Node, Literal=Literal, URIRef=URIRef)
    _mod("rdflib.namespace", NamespaceManager=NamespaceManager)
    rdflib.term = sys.modules["rdflib.term"]
    rdflib.namespace = sys.modules["rdflib.namespace"]

    drepr = _mod("drepr")
    writers = _mod("drepr.writers")
    tw = _mod("drepr.writers.turtle_writer", MyLiteral=MyLiteral)
    drepr.writers = writers
    writers.turtle_writer = tw

    _mod("slugify", slugify=_slugify)

    # serde: yaml/csv/json loaders (pyyaml is available in this sandbox)
    def _yaml_deser(path):
        import yaml

        with open(path) as f:
            return yaml.safe_load(f)

    def _csv_deser(path):
        import csv

        with open(path) as f:
            return list(csv.reader(f))

    def _json_deser(path):
        import json

        with open(path) as f:
            return json.load(f)

    def _json_ser(obj, path, **kw):
        import json

        with open(path, "w") as f:
            json.dump(obj, f)

    serde = _mod("serde")
    serde.yaml = _mod("serde.yaml", deser=_yaml_deser, ser=lambda o, p: None)
    serde.csv = _mod("serde.csv", deser=_csv_deser)
    serde.json = _mod("serde.json", deser=_json_deser, ser=_json_ser)

    def import_attr(path: str):
        module, attr = path.rsplit(".", 1)
        return getattr(importlib.import_module(module), attr)

    statickg = _mod("statickg")
    statickg.helper = _mod("statickg.helper", import_attr=import_attr)

    class _HttpxResponse:  # only referenced in type hints / error paths
        pass

    _mod("httpx", Response=_HttpxResponse, post=None, Client=None)
    _mod("tqdm", tqdm=lambda it=None, **kw: it)

    class _HTTPException(Exception):
        def __init__(self, status_code=500, detail=""):
            super().__init__(detail)
            self.status_code = status_code
            self.detail = detail

    _mod(
        "fastapi",
        Response=type("Response", (), {}),
        HTTPException=_HTTPException,
        status=_AnyInt(),
    )

    # internal placebos: dodge sqlalchemy/bcrypt (kgrel.user) and
    # shapely/pyproj (misc.geo) — only names imported at module top-level
    def is_valid_user_uri(uri: str) -> bool:
        return (
            uri.startswith("https://minmod.isi.edu/users/s/")
            or uri.startswith("https://minmod.isi.edu/users/u/")
            or uri.startswith("https://minmod.isi.edu/users/a/")
        )

    def get_username(uri: str) -> str:
        return uri.rsplit("/", 1)[1] if is_valid_user_uri(uri) else uri

    _mod(
        "minmodkg.models.kgrel.user",
        get_username=get_username,
        is_valid_user_uri=is_valid_user_uri,
        User=type("User", (), {}),
    )

    def _geo_unavailable(*a, **kw):
        raise NotImplementedError("shapely/pyproj not available in sandbox shim")

    _mod(
        "minmodkg.misc.geo",
        merge_wkt=_geo_unavailable,
        merge_wkts=_geo_unavailable,
        reproject_wkt=_geo_unavailable,
    )


_REF_CACHE: SimpleNamespace | None = None


def load_reference() -> SimpleNamespace:
    """Install shims, put the reference on sys.path, and import its triple
    emission + transformations + grade-tonnage modules."""
    global _REF_CACHE
    if _REF_CACHE is not None:
        return _REF_CACHE
    os.environ.setdefault("CFG_DIR", os.path.join(REF_PATH, "tests/resources"))
    _install_shims()
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    mineral_site = importlib.import_module("minmodkg.models.kg.mineral_site")
    transformations = importlib.import_module("minmodkg.transformations")
    grade_tonnage = importlib.import_module("minmodkg.grade_tonnage_model")
    deserializer = importlib.import_module("minmodkg.misc.deserializer")
    _REF_CACHE = SimpleNamespace(
        mineral_site=mineral_site,
        transformations=transformations,
        grade_tonnage=grade_tonnage,
        deserializer=deserializer,
    )
    return _REF_CACHE
