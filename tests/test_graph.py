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
