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
        for r in connected_components_star(pairs, max_iter=12, local_threshold=0).collect()
    }
    assert star_cc == hashmin
    # the chain's far end must have converged all the way down to 1
    assert star_cc[40] == 1


def test_cc_matches_union_find_on_random_graphs(spark):
    """Both distributed algorithms vs an independent driver-side
    union-find oracle over seeded random graphs — including self-loops,
    duplicate/reversed edges, and many small components (the dedup
    shape)."""
    import random

    from twilio_event_streams_reporting_example_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    def union_find(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical: every node -> min of its component
        out = {}
        for n in list(parent):
            r = find(n)
            out[n] = min(out.get(r, r), r)
        return {n: find(n) for n in parent}

    for seed in (7, 23):
        rng = random.Random(seed)
        nodes = list(range(1, 120))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(90)
        ] + [(n, n) for n in rng.sample(nodes, 5)]  # self-loops
        edges += [(b, a) for a, b in rng.sample(edges, 20)]  # reversed dups
        want = union_find(edges)
        # union-find roots are path-compressed mins only if we normalize:
        roots = {}
        for n, r in want.items():
            roots.setdefault(r, set()).add(n)
        canon = {n: min(m) for r, m in roots.items() for n in m}
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got_hm = {
            r["node"]: r["cluster_id"]
            for r in connected_components(pairs, local_threshold=0).collect()
        }
        got_st = {
            r["node"]: r["cluster_id"]
            for r in connected_components_star(pairs, local_threshold=0).collect()
        }
        # the default path routes these tiny graphs through the bounded
        # union-find fast path — it must agree with both distributed loops
        got_local_hm = {
            r["node"]: r["cluster_id"] for r in connected_components(pairs).collect()
        }
        got_local_st = {
            r["node"]: r["cluster_id"]
            for r in connected_components_star(pairs).collect()
        }
        assert got_hm == canon, f"hash-min mismatch seed={seed}"
        assert got_st == canon, f"star mismatch seed={seed}"
        assert got_local_hm == canon, f"local fast path mismatch seed={seed}"
        assert got_local_st == canon, f"local star fast path mismatch seed={seed}"
