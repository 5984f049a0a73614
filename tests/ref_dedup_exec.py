"""Executed-reference dedup merge machinery (A3/A4/A5 + CDR chain).

Loads the reference's OWN merge decision code so tests and oracles can run
it on duck-typed sites:

- ``RefValue`` / ``RefListID`` / ``RefListStr`` / ``RefGeoCoordinate`` /
  ``RefRockType`` / ``RefGeologyInfo`` — imported from the reference FILE
  ``minmodkg/models/kgrel/custom_types/ref_value.py`` (its sqlalchemy /
  shapely package siblings are duck-stubbed in sys.modules first; the
  class bodies that run are the reference's verbatim code, including the
  7-field ``RefGeologyInfo.from_sites`` merge).
- ``DedupMineralSite.from_sites`` (dedup_mineral_site.py:204-294),
  ``DedupMineralSite.select_inventories`` (:316-383) and
  ``top_5_deposit_types`` (:460-493) — AST-extracted from the reference
  file and exec'd (the kgrel class tree is SQLAlchemy-bound and cannot be
  imported whole in this container).
- ``SiteScore`` / ``SiteAndScore`` — the reference's real dataclasses
  (site_and_score.py, pure module loaded by file).

Used by tests/test_reference_oracle.py (A3 attribute-merge fuzz) and by
plans/kg_oracles.py (the kg_cdr_export expected-record chain).
"""

from __future__ import annotations

import ast
import importlib.util
import sys
import types
from dataclasses import dataclass
from types import SimpleNamespace
from typing import Optional

REF = "/root/reference/minmodkg"

_CACHE = None


@dataclass
class DuckGeoCoordinate:
    """Stand-in for custom_types/location.py GeoCoordinate (whose module
    imports shapely): same fields + to_dict shape (location.py:95-101)."""

    lat: Optional[float] = None
    lon: Optional[float] = None

    def to_dict(self):
        return {"lat": self.lat, "lon": self.lon}


class DuckDedupMineralSite:
    """Kwarg-capture stand-in for the SQLAlchemy-mapped DedupMineralSite;
    ``select_inventories`` is bound to the reference's extracted method
    after load (so ``from_sites``' trailing call runs reference code)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


@dataclass
class DuckDMSAndInventory:
    dms: object
    invs: list


class DuckInvView(SimpleNamespace):
    """MineralInventoryView duck: carries the grade-tonnage totals and the
    reference's ``to_dedup_view`` projection (mineral_site.py kgrel)."""

    def to_dedup_view(self, site_id, dedup_site_id):
        return DuckInvView(
            commodity=self.commodity,
            contained_metal=self.contained_metal,
            tonnage=self.tonnage,
            grade=self.grade,
            date=self.date,
            site_id=site_id,
            dedup_site_id=dedup_site_id,
        )


def _file_mod(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _extract(tree, src_path, node_filter, ns):
    fn = next(node_filter(tree))
    mod = ast.Module(body=[fn], type_ignores=[])
    code = compile(ast.fix_missing_locations(mod), src_path, "exec")
    exec(code, ns)
    return ns[fn.name]


def _load_ref_cdr_formatter():
    """The reference's EXECUTED ``format_dedup_site``
    (integrations/cdr/cdr.py:120-201): cdr_schemas.py is imported directly
    (pure pydantic); the formatter function is extracted from cdr.py by
    AST because the module's top-level imports (httpx/serde/loguru) are
    not in this container.  Same technique as tests/test_export.py."""
    schemas = _file_mod(
        "ref_cdr_schemas_shared", f"{REF}/integrations/cdr/cdr_schemas.py"
    )
    src = f"{REF}/integrations/cdr/cdr.py"
    tree = ast.parse(open(src).read())
    ns = {
        "DedupSite": schemas.DedupSite,
        "DedupSiteRecord": schemas.DedupSiteRecord,
        "DepositTypeCandidate": schemas.DepositTypeCandidate,
        "MINMOD_SYSTEM": "minmod",  # cdr_helper.py:25 default
        "DedupMineralSitePublic": object,
        "InternalID": str,
        "list": list,
        "dict": dict,
    }

    def _toplevel_fn(t):
        for node in t.body:
            if isinstance(node, ast.FunctionDef) and node.name == "format_dedup_site":
                yield node

    return _extract(tree, src, _toplevel_fn, ns)


def load_ref_dedup():
    """Load (cached) the executed-reference dedup namespace."""
    global _CACHE
    if _CACHE is not None:
        return _CACHE

    # refshim puts the reference on sys.path and installs the rdflib /
    # serde import placebos its pure modules expect
    sys.path.insert(0, "/root/repo/tests") if "/root/repo/tests" not in sys.path else None
    import refshim

    refshim.load_reference()

    # -- duck-stub the custom_types package surface (its __init__ imports
    #    sqlalchemy; location.py imports shapely) ---------------------------
    dsd = _file_mod(
        "minmodkg.models.kgrel.custom_types.dedup_site_deposit_type",
        f"{REF}/models/kgrel/custom_types/dedup_site_deposit_type.py",
    )
    pkg = types.ModuleType("minmodkg.models.kgrel.custom_types")
    pkg.DedupMineralSiteDepositType = dsd.DedupMineralSiteDepositType
    sys.modules["minmodkg.models.kgrel.custom_types"] = pkg
    loc = types.ModuleType("minmodkg.models.kgrel.custom_types.location")
    loc.GeoCoordinate = DuckGeoCoordinate
    sys.modules["minmodkg.models.kgrel.custom_types.location"] = loc

    rv = _file_mod(
        "minmodkg.models.kgrel.custom_types.ref_value",
        f"{REF}/models/kgrel/custom_types/ref_value.py",
    )
    sas = _file_mod(
        "ref_dedup_site_and_score",
        f"{REF}/models/kgrel/custom_types/site_and_score.py",
    )

    src_path = f"{REF}/models/kgrel/dedup_mineral_site.py"
    tree = ast.parse(open(src_path).read())

    def _method(cls_name, fn_name):
        def gen(t):
            for cls in ast.walk(t):
                if isinstance(cls, ast.ClassDef) and cls.name == cls_name:
                    for node in cls.body:
                        if (
                            isinstance(node, ast.FunctionDef)
                            and node.name == fn_name
                        ):
                            # strip @classmethod so the exec'd function is
                            # plain (we pass cls explicitly)
                            node.decorator_list = []
                            yield node

        return gen

    def _toplevel(fn_name):
        def gen(t):
            for node in t.body:
                if isinstance(node, ast.FunctionDef) and node.name == fn_name:
                    yield node

        return gen

    # MINMOD_NS.mr.id — namespace.py:26-28 (assert prefix, strip)
    _MR = "https://minmod.isi.edu/resource/"

    def _mr_id(uri):
        assert uri.startswith(_MR), uri
        return uri[len(_MR):]

    minmod_ns = SimpleNamespace(mr=SimpleNamespace(id=_mr_id))

    typing_mod = __import__("typing")
    select_inventories = _extract(
        tree,
        src_path,
        _method("DedupMineralSite", "select_inventories"),
        {
            "TypedDict": typing_mod.TypedDict,
            "DedupMineralInventoryView": object,
            "MineralInventoryView": object,
            "InternalID": str,
            "bool": bool,
            "dict": dict,
            "list": list,
        },
    )
    DuckDedupMineralSite.select_inventories = select_inventories

    top5_ns = {
        "RefDepositType": rv.RefDepositType,
        "DedupMineralSiteDepositType": dsd.DedupMineralSiteDepositType,
        "MINMOD_NS": minmod_ns,
        "SiteScore": sas.SiteScore,
        "MineralSite": object,
    }
    top_5_deposit_types = _extract(
        tree, src_path, _toplevel("top_5_deposit_types"), top5_ns
    )

    from_sites_ns = {
        "SiteScore": sas.SiteScore,
        "SiteAndScore": sas.SiteAndScore,
        "RefValue": rv.RefValue,
        "RefListID": rv.RefListID,
        "RefListStr": rv.RefListStr,
        "RefGeoCoordinate": rv.RefGeoCoordinate,
        "RefGeologyInfo": rv.RefGeologyInfo,
        "GeoCoordinate": DuckGeoCoordinate,
        "top_5_deposit_types": top_5_deposit_types,
        "DedupMineralSite": DuckDedupMineralSite,
        "DedupMineralSiteAndInventory": DuckDMSAndInventory,
        "MineralSiteAndInventory": object,
        "InternalID": str,
        "Optional": Optional,
        "Sequence": typing_mod.Sequence,
    }
    from_sites = _extract(
        tree, src_path, _method("DedupMineralSite", "from_sites"), from_sites_ns
    )

    _CACHE = SimpleNamespace(
        from_sites=lambda sites, dedup_site_id=None: from_sites(
            DuckDedupMineralSite, sites, dedup_site_id
        ),
        format_dedup_site=_load_ref_cdr_formatter(),
        select_inventories=select_inventories,
        top_5_deposit_types=top_5_deposit_types,
        RefValue=rv.RefValue,
        RefGeologyInfo=rv.RefGeologyInfo,
        SiteScore=sas.SiteScore,
        SiteAndScore=sas.SiteAndScore,
        DuckInvView=DuckInvView,
        DuckDMSAndInventory=DuckDMSAndInventory,
    )
    return _CACHE
