"""Q4 full LOD closure vs a direct transcription of the reference's
CONSTRUCT semantics (kgsync_listener.py:103-118):

    <uri> (!(owl:sameAs|rdf:type|mo:normalized_uri))* ?s . ?s ?p ?o .
    FILTER (?p != owl:sameAs)
"""

from __future__ import annotations

from ta2_minmod_kg_spark.plans.serving import LOD_NO_FOLLOW, lod_closure


def _oracle(triples: list[tuple], start: str) -> set[tuple]:
    """Driver-side reference semantics, written independently of the
    Spark implementation (BFS over the same exclusion rules)."""
    reached, frontier = {start}, [start]
    while frontier:
        nxt = []
        for s, p, o in triples:
            if s in [f for f in frontier] and p not in LOD_NO_FOLLOW:
                if o not in reached:
                    reached.add(o)
                    nxt.append(o)
        frontier = nxt
    return {
        (s, p, o) for s, p, o in triples if s in reached and p != "owl:sameAs"
    }


FIXTURE = [
    # main site → document → pages (2 hops), with a cycle back
    ("mr:site1", "mo:name", '"Site One"'),
    ("mr:site1", "mo:reference", "mr:ref1"),
    ("mr:ref1", "mo:document", "mr:doc1"),
    ("mr:doc1", "mo:title", '"Doc"'),
    ("mr:doc1", "mo:of_site", "mr:site1"),  # cycle
    # rdf:type must not be FOLLOWED, but the triple itself IS emitted
    ("mr:site1", "rdf:type", "mo:MineralSite"),
    ("mo:MineralSite", "mo:label", '"class"'),  # unreachable via rdf:type
    # normalized_uri must not be followed either
    ("mr:site1", "mo:normalized_uri", "mr:Q42"),
    ("mr:Q42", "mo:label", '"entity"'),  # unreachable
    # owl:sameAs: neither followed nor emitted
    ("mr:site1", "owl:sameAs", "mr:site2"),
    ("mr:site2", "mo:name", '"Other"'),  # unreachable
    # an unrelated site
    ("mr:site9", "mo:name", '"Nine"'),
]


def test_lod_closure_matches_reference_semantics(spark):
    t = spark.createDataFrame(FIXTURE, "subj string, pred string, obj string")
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in lod_closure(t, "mr:site1").collect()
    }
    want = _oracle(FIXTURE, "mr:site1")
    assert got == want
    # the exclusion rules really bit: typed-class, entity, sameAs-target
    # and unrelated triples are absent; the cycle did not loop forever
    assert ("mo:MineralSite", "mo:label", '"class"') not in got
    assert ("mr:Q42", "mo:label", '"entity"') not in got
    assert ("mr:site1", "owl:sameAs", "mr:site2") not in got
    assert ("mr:site2", "mo:name", '"Other"') not in got
    assert ("mr:site9", "mo:name", '"Nine"') not in got
    # but the rdf:type triple of a reached subject is emitted
    assert ("mr:site1", "rdf:type", "mo:MineralSite") in got


def test_lod_closure_on_corpus_site(spark):
    """On real engine triples: the closure contains the site's own rows,
    reaches its reference/document subtree, and equals the oracle."""
    from ta2_minmod_kg_spark.operators import extract
    from ta2_minmod_kg_spark.sources import synthetic

    ingest = synthetic.synthesize_ingest(spark, 30, partitions=2)
    triples = extract.extract_triples(ingest).select("subj", "pred", "obj")
    rows = [(r["subj"], r["pred"], r["obj"]) for r in triples.collect()]
    start = next(s for s, p, o in rows if p == "mo:source_id")
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in lod_closure(triples, start).collect()
    }
    assert got == _oracle(rows, start)
    assert any(p == "mo:reference" or p.startswith("mo:") for _, p, _ in got)
    assert len(got) > 5
