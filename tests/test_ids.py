"""Tests for deterministic id minting (ref: minmodkg/transformations.py)."""

from __future__ import annotations

import hashlib

from ta2_minmod_kg_spark.functions import ids


def test_slugify_basic():
    assert ids.slugify("Forrestania Nickel Project") == "forrestania-nickel-project"
    assert ids.slugify("mrdata.usgs.gov/mrds") == "mrdata-usgs-gov-mrds"
    assert ids.slugify("A__B") == "a-b"
    assert ids.slugify("don't") == "dont"
    assert ids.slugify("1,000 tonnes") == "1000-tonnes"
    assert ids.slugify("  -- x --  ") == "x"
    assert ids.slugify("Çà-été") == "ca-ete"


def test_shorten_id():
    assert ids.shorten_id("abc", 120) == "abc"
    long = "x" * 130
    out = ids.shorten_id(long, 120)
    assert out.startswith("x" * 120 + "__")
    assert out.endswith(hashlib.sha256(long.encode()).hexdigest()[:8])
    assert len(out) == 130


def test_make_site_id():
    sid = ids.make_site_id("admin", "https://mrdata.usgs.gov/mrds", "10014570")
    assert sid == "site__mrdata-usgs-gov-mrds__10014570__admin"
    # trailing slash + scheme stripped
    assert ids.make_site_id("u1", "http://example.com/db/", "r 1") == (
        "site__example-com-db__r-1__u1"
    )


def test_username_helpers():
    assert ids.get_username("https://minmod.isi.edu/users/s/sri") == "sri"
    assert ids.get_username("https://minmod.isi.edu/users/u/alice") == "alice"
    assert ids.is_system_user("https://minmod.isi.edu/users/s/sri")
    assert not ids.is_system_user("https://minmod.isi.edu/users/u/alice")
    assert not ids.is_valid_user_uri("https://minmod.isi.edu/users/x/evil")


def test_group_ids():
    sites = ["site__b__1__u", "site__a__1__u", "site__c__1__u"]
    assert ids.dedup_group_id(sites) == "dedup_site__a__1__u"
    assert ids.sameas_group_id(sites) == "grp_site__a__1__u"


def test_document_uri():
    assert ids.make_document_uri({"uri": "https://x.org/d"}, "s") == "https://x.org/d"
    assert ids.make_document_uri({"doi": "10.1/abc"}, "s") == "https://doi.org/10.1/abc"
    u = ids.make_document_uri({"title": "A Report"}, "site__x__1__u__user_u__")
    assert u == ids.MR_NS + "site__x__1__u__user_u____doc__a-report"


def test_reference_uri():
    doc_id = "x-org-d"
    # no property, no page info → plain __ref
    assert (
        ids.make_reference_uri({}, doc_id)
        == ids.MR_NS + doc_id + "__ref"
    )
    # page info present → sha-derived suffix, deterministic
    ref = {"page_info": [{"page": 3, "bounding_box": None}]}
    u1 = ids.make_reference_uri(ref, doc_id)
    u2 = ids.make_reference_uri(ref, doc_id)
    assert u1 == u2 and "__ref__" in u1
    # bounding box changes the id
    ref2 = {
        "page_info": [
            {
                "page": 3,
                "bounding_box": {"x_min": 0.0, "x_max": 1.0, "y_min": 0.0, "y_max": 2.0},
            }
        ]
    }
    assert ids.make_reference_uri(ref2, doc_id) != u1


def test_source_uri():
    assert (
        ids.get_source_uri("https://mrdata.usgs.gov/mrds")
        == ids.MR_NS + "source__https-mrdata-usgs-gov-mrds"
    )
