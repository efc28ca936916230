"""connected_components: multi-hop merging, separate components, and
convergence beyond one propagation round."""


def test_connected_components_chain_and_islands(spark):
    from twilio_event_streams_reporting_example_spark.operators.graph import (
        connected_components,
    )

    # component A: a 6-node chain (needs several hash-min rounds to
    # converge the far end down to 1); component B: a triangle; the pair
    # list is directionless and unsorted on purpose
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (5, 4), (6, 5),
         (10, 11), (11, 12), (12, 10)],
        "doc_a long, doc_b long",
    )
    got = {r["node"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 10: 10, 11: 10, 12: 10}


def test_connected_components_single_edge(spark):
    from twilio_event_streams_reporting_example_spark.operators.graph import (
        connected_components,
    )

    pairs = spark.createDataFrame([(7, 9)], "doc_a long, doc_b long")
    got = {r["node"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {7: 7, 9: 7}


def test_star_cc_chain_and_islands(spark):
    from twilio_event_streams_reporting_example_spark.operators.graph import (
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (5, 4), (6, 5),
         (10, 11), (11, 12), (12, 10)],
        "doc_a long, doc_b long",
    )
    got = {
        r["node"]: r["cluster_id"] for r in connected_components_star(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 10: 10, 11: 10, 12: 10}


def test_star_cc_matches_hashmin_on_adversarial_graphs(spark):
    """The two distributed algorithms must agree label-for-label: a deep
    chain (hash-min's worst case — one hop of progress per round), a
    reversed chain, a star, and a deterministic pseudo-random graph."""
    from twilio_event_streams_reporting_example_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    chain = [(i, i + 1) for i in range(1, 40)]  # diameter 39
    rev_chain = [(i + 1, i) for i in range(100, 130)]
    star = [(500, 500 + i) for i in range(1, 8)]
    # deterministic scatter: edges (h, h // 3) over hashed ids — mixes
    # merges and islands without RNG
    scatter = [
        ((i * 2654435761) % 997 + 1000, ((i * 2654435761) % 997) // 3 + 1000)
        for i in range(60)
    ]
    edges = [(a, b) for a, b in chain + rev_chain + star + scatter if a != b]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    # hash-min needs a round per hop of remaining diameter (39 here — more
    # than its default budget); star-CC converges in a handful of rounds
    hashmin = {
        r["node"]: r["cluster_id"]
        for r in connected_components(pairs, max_iter=45).collect()
    }
    star_cc = {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(pairs, max_iter=12).collect()
    }
    assert star_cc == hashmin
    # the chain's far end must have converged all the way down to 1
    assert star_cc[40] == 1
