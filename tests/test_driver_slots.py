"""The driver's CORRECTNESS snapshot records only the first 50 queries()
entries (observed rounds 1-4). Pin the curation invariant: every operator
family holds at least one of those slots, so no family can silently lose
all driver-recorded correctness rows to registration-order drift."""

from window_aggregation_spark.suite import SUITE

DRIVER_CAP = 50

FAMILIES = {
    "w_": "core window / reference parity",
    "text_": "text analysis",
    "dedup_": "deduplication",
    "sim_": "similarity search",
    "mm_": "multimodal",
    "stream_": "streaming",
    "asof_": "as-of join",
    "range_": "range join",
    "skew_": "skew mitigation",
    "corpus_": "corpus prep",
    "pipeline_": "composed pipeline",
    "search_": "lexical retrieval",
    # round-6 families
    "join_": "join acceleration",
    "ts_": "time series",
    "cdc_": "change data capture",
    "agg_": "relational reporting",
    "dq_": "data quality",
    "graph_": "graph analytics",  # slotted once the family grew to 2
}

# Registered families WITHOUT a guaranteed driver slot (fully judge/
# gate-sim covered; they earn anchors once the family grows)
EXTRA_PREFIXES = {
    "src_": "source formats",
}


def test_every_family_keeps_a_driver_slot():
    head = list(SUITE)[:DRIVER_CAP]
    for prefix, label in FAMILIES.items():
        n = sum(1 for name in head if name.startswith(prefix))
        assert n >= 1, f"family {label!r} ({prefix}*) has no driver slot"
    # corpus prep specifically had zero rows across rounds 1-4: keep >= 5
    assert sum(1 for n in head if n.startswith("corpus_")) >= 5


def test_prefixes_cover_every_query():
    known = set(FAMILIES) | set(EXTRA_PREFIXES)
    for name in SUITE:
        assert any(name.startswith(p) for p in known), name


def test_no_registered_query_lost_by_reorder():
    # the priority reorder must be a permutation, never a filter
    from window_aggregation_spark import suite as s

    assert len(SUITE) >= 75
    assert set(s._DRIVER_PRIORITY) <= set(SUITE)
    assert len(list(SUITE)[:DRIVER_CAP]) == len(s._DRIVER_PRIORITY) == 50


def test_driver_rotation_recency():
    """VERDICT r10 #1: driver history is the durable record, so the head
    must rotate oldest-record-first — no registered query may sit
    un-slotted with a driver record more than MAX_AGE rounds behind the
    newest recorded round, and a never-recorded query must hold a slot
    immediately. (The family-anchor test above bounds how aggressively
    rotation can evict; this one bounds how long it can procrastinate.)"""
    import json
    import re
    from pathlib import Path

    MAX_AGE = 5
    root = Path(__file__).resolve().parents[1]
    latest: dict[str, int] = {}
    maxr = 0
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)", f.name).group(1))
        maxr = max(maxr, r)
        for q in json.loads(f.read_text()):
            latest[q] = r
    assert maxr > 0, "no CORRECTNESS files found"
    head = set(list(SUITE)[:DRIVER_CAP])
    stale = sorted(
        n for n in SUITE
        if n not in head and maxr - latest.get(n, 0) > MAX_AGE
    )
    assert not stale, (
        f"queries with driver records >{MAX_AGE} rounds old are not "
        f"scheduled for re-recording: {stale}"
    )
    unrecorded = sorted(n for n in SUITE if n not in latest and n not in head)
    assert not unrecorded, (
        f"never-recorded queries without a driver slot: {unrecorded}"
    )
