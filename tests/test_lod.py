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


def test_lod_entity_json_tree(spark):
    """Q4b render_entity_json (ref api/routers/lod.py:207-257) against a
    hand-computed tree over a hostile subgraph: a cycle (revisited node →
    @id/@label stub), a multi-valued predicate (list), typed literals
    (int/decimal/boolean), an absolute-uri node, and rdf:type/rdfs:label
    relabeling to @type/@label."""
    from ta2_minmod_kg_spark.plans.serving import lod_entity_json

    rows = [
        ("mr:site1", "rdf:type", "mo:MineralSite"),
        ("mr:site1", "rdfs:label", '"Main \\"Site\\""'),
        ("mr:site1", "mo:year", '"1912"^^xsd:integer'),
        ("mr:site1", "mo:score", '"0.5"^^xsd:decimal'),
        ("mr:site1", "mo:flag", '"true"^^xsd:boolean'),
        ("mr:site1", "mo:aliases", '"a1"'),
        ("mr:site1", "mo:aliases", '"a2"'),
        ("mr:site1", "mo:child", "mr:inv1"),
        ("mr:inv1", "rdf:type", "mo:MineralInventory"),
        ("mr:inv1", "mo:doc", "<https://docs.example.org/d1>"),
        ("mr:inv1", "mo:parent", "mr:site1"),  # cycle back to the root
        ("<https://docs.example.org/d1>", "rdfs:label", '"Doc One"'),
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = lod_entity_json(df, "mr:site1")
    MR = "https://minmod.isi.edu/resource/"
    assert got == {
        "@id": MR + "site1",
        "@type": {"@id": "https://minmod.isi.edu/ontology/MineralSite"},
        "@label": 'Main "Site"',
        "year": 1912,
        "score": 0.5,
        "flag": True,
        "aliases": ["a1", "a2"],
        "child": {
            "@id": MR + "inv1",
            "@type": {"@id": "https://minmod.isi.edu/ontology/MineralInventory"},
            "doc": {
                "@id": "https://docs.example.org/d1",
                "@label": "Doc One",
            },
            # cycle: the root is already visited → @id (+@label) stub
            "parent": {"@id": MR + "site1", "@label": 'Main "Site"'},
        },
    }, got


def test_lod_entity_json_on_corpus_closure(spark):
    """The tree over a real synthetic-corpus closure: root is the start
    subject, every nested node dict carries @id, and every triple of the
    closure's root appears in the tree."""
    from pyspark.sql import functions as F

    from ta2_minmod_kg_spark.operators import extract
    from ta2_minmod_kg_spark.plans.serving import lod_closure, lod_entity_json
    from ta2_minmod_kg_spark.sources import synthetic

    ingest = synthetic.synthesize_ingest(spark, 20, partitions=2)
    triples = extract.extract_triples(ingest).select("subj", "pred", "obj")
    start = (
        triples.filter(F.col("pred") == "mo:source_id")
        .orderBy("subj")
        .first()["subj"]
    )
    closure = lod_closure(triples, start)
    tree = lod_entity_json(closure, start)
    assert tree["@id"].endswith(start.split(":", 1)[1])
    n_root_preds = (
        closure.filter(F.col("subj") == start).select("pred").distinct().count()
    )
    assert len(tree) == n_root_preds + 1  # +1 for @id

    def walk(node):
        if isinstance(node, dict):
            assert "@id" in node, node
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    for k, v in tree.items():
        if k != "@id":
            walk(v)


def test_parse_term_language_tagged_literal_degrades():
    """ADVICE r04 (low): a language-tagged literal "x"@en (or any
    unrecognized quoted-literal tail) must degrade to a plain string, not
    raise ValueError out of the public tree render."""
    from ta2_minmod_kg_spark.plans.serving import _parse_term

    assert _parse_term('"hello"@en') == ("lit", "hello")
    assert _parse_term('"a\\"b"@fr-CA') == ("lit", 'a"b')
    # malformed tail without any closing quote still returns a string
    kind, val = _parse_term('"dangling')
    assert kind == "lit" and isinstance(val, str)
    # the recognized forms are unchanged
    assert _parse_term('"5"^^xsd:integer') == ("lit", 5)
    assert _parse_term('"t"') == ("lit", "t")
