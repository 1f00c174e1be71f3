"""Connected components over a pair list — turning pairwise near-duplicate
edges (MinHash/SimHash output) into duplicate *clusters*, the step a
production dedup pipeline needs before it can pick one representative per
group. Absent from the reference (SURVEY.md §2.2: no joins at all).

Algorithm: iterative minimum-label propagation (the DataFrame form of the
alternating large-star/small-star technique from Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14). Each node starts labeled with
itself; every round each node adopts the minimum label in its closed
neighborhood; converged when no label changes. Rounds are O(graph diameter)
— near-duplicate graphs are unions of small dense cliques, so 2-4 rounds in
practice.

Scale design:
- state between rounds is one (node, label) row per node — never the closure;
- each round is one shuffle (symmetrized edges joined to labels, min-agg);
- ``localCheckpoint`` cuts lineage each round so plans do not grow with the
  iteration count (the classic iterative-DataFrame trap);
- convergence is a cheap count of changed labels (AQE-coalesced aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _cut(df: DataFrame, reliable: bool) -> DataFrame:
    """Materialize + cut lineage. ``reliable=False`` (default): eager
    ``localCheckpoint`` — executor-local blocks, the fast path for local
    mode and short-lived jobs. ``reliable=True``: eager ``checkpoint`` to
    the session's checkpoint dir (``sc.setCheckpointDir`` — HDFS/object
    store on a real cluster), which survives executor loss; at 100 TB an
    iterative job that loses one executor mid-loop would otherwise die with
    its local blocks (guide §5). Same rows either way."""
    return df.checkpoint(eager=True) if reliable else df.localCheckpoint(eager=True)


def _union_find_components(rows) -> dict:
    """Driver-side min-label closure over symmetrized (a, b) rows: classic
    union-find, then one pass assigning each node the MINIMUM id in its
    set — exactly the distributed loop's converged labels."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp_min: dict = {}
    for n in parent:
        r = find(n)
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    return {n: comp_min[find(n)] for n in parent}


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    reliable_checkpoint: bool = False,
    local_max_edges: int = 100_000,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    ``edges`` is an undirected pair list; isolated nodes don't appear (a
    caller wanting singleton clusters unions the full id table afterwards).

    ``reliable_checkpoint=True`` swaps every per-round ``localCheckpoint``
    for a reliable ``checkpoint`` into the session's checkpoint dir (set
    ``spark.sparkContext.setCheckpointDir`` first) — required on real
    clusters where an executor lost mid-iteration would take its local
    blocks (and the whole loop) with it; local mode keeps the cheap
    default.

    PERF (r12, guide §1.2 — the BPE-trainer precedent): at or below
    ``local_max_edges`` symmetrized rows (counted on the ALREADY
    materialized edge table, so the gate is one cheap job) the closure
    runs on the driver via union-find instead of the iterative loop — the
    loop costs ~(checkpoint + probe + AQE stage jobs) × rounds of pure
    fixed overhead, ~90 jobs and seconds of driver gaps for a
    batch-bounded graph that a dict closes in milliseconds. Labels are
    identical by construction (min id reachable; pinned by
    test_cc_local_vs_distributed). The local path takes only NUMERIC node
    ids (Python and Spark order strings differently); above the cap — the
    100 TB regime for from-scratch corpus closures — the distributed loop
    runs unchanged, and the collect is bounded by the cap."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # symmetrize once; both directions feed every round. ONE pass over the
    # edge pipeline (r11, guide §2.4): explode [(a,b),(b,a)] — identical
    # rows to union(e, reversed), but the upstream edge computation (often
    # an expensive MinHash-pairs plan) runs once, not once per union branch
    # (measured: q_dedup_clusters spent ~2× its pair-pipeline cost here).
    # Plain array-of-structs under explode is codegen-safe (the 160× trap
    # is transform-BUILT arrays — see gram_postings).
    sym = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("a"), F.col("b").alias("b")),
                    F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
                )
            ).alias("s")
        )
        .select("s.a", "s.b")
        .distinct()
    )
    sym = _cut(sym, reliable_checkpoint)

    from pyspark.sql.types import IntegerType, LongType, ShortType, StructField, StructType

    node_type = sym.schema["a"].dataType
    if isinstance(node_type, (LongType, IntegerType, ShortType)):
        # the count reads the materialized checkpoint blocks — one cheap job
        if sym.count() <= local_max_edges:
            labels = _union_find_components(
                (r["a"], r["b"]) for r in sym.collect()
            )
            schema = StructType(
                [StructField("node", node_type), StructField("component", node_type)]
            )
            return edges.sparkSession.createDataFrame(
                sorted(labels.items()), schema
            )

    labels = _cut(
        sym.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node")),
        reliable_checkpoint,
    )

    for _ in range(max_iter):
        # each node's new label: min over its own label and neighbors' labels
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(sym.a.alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # checkpoint FIRST, then derive both the convergence probe and the
        # next round's labels from the materialized rows (r11): the old
        # order (count, then checkpoint) executed the round's join pipeline
        # twice per iteration — once for `changed`, once for the lineage
        # cut. Same labels, half the per-iteration work.
        new_labels = _cut(
            labels.join(neighbor_min, "node", "left").select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias(
                    "new_label"
                ),
                "label",
            ),
            reliable_checkpoint,
        )
        changed = new_labels.filter(F.col("new_label") != F.col("label")).limit(1).count()
        labels = new_labels.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def incremental_components(
    state: DataFrame,
    new_edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    delta_only: bool = False,
    reliable_checkpoint: bool = False,
    local_max_edges: int = 100_000,
) -> DataFrame:
    """Fold a NEW batch's edges into stored (node, label) component state
    WITHOUT recomputing connected components over all history — the cluster
    twin of the incremental dedup family (``incremental_dedup`` /
    ``minhash_history_matches`` / ``exactsubstr_clean_incremental``): a
    nightly crawl folds its history-match edges into yesterday's canonical
    cluster labels instead of re-running the closure over every edge ever
    seen (the r8 verdict's #1 missing piece).

    ``state``: (node, label) — the converged output of
    ``connected_components`` over all prior edges (label = min reachable
    id). ``new_edges``: edges incident to the new batch — within-batch
    pairs plus batch-vs-history matches; endpoints may or may not exist in
    ``state``. Returns the UPDATED full (node, component) state — or, with
    ``delta_only=True``, ONLY the changed/new rows (the upsert set for a
    STORED cluster table maintained via ``merge_into(..., key="node")``:
    at 100 TB the state table is corpus-sized, so a per-batch maintenance
    pass must rewrite the touched id-ranges, never the whole table — the
    streaming curation loop uses this form).

    Correctness: converged labels compress each history component to a
    star, and each stored label IS its component's minimum. So running
    min-label components over the new edges REWRITTEN through the stars
    (endpoint → stored label; unknown endpoint → itself) yields, for every
    touched star, the min over all merged components' minima and new ids —
    exactly the from-scratch label. History rows then update through ONE
    label-keyed join against the (old label → new component) remap;
    untouched components never move. Pinned against a from-scratch rebuild
    in ``tests/test_clustering.py``.

    Scale shape: the iterative part runs on a graph of size O(new batch's
    edges) — independent of corpus size. History state is read once to
    slice the touched stars (semi-join on the broadcast endpoint set) and
    once for the remap join; the endpoint set, star slice, and remap table
    are all bounded by the batch's edge endpoints — batch-sized by
    construction — so broadcasting them is deliberate and safe (the
    corpus-scale ``state`` side always streams; the same bounded-build
    justification as the contamination probe set).

    ``reliable_checkpoint``: see ``connected_components`` — flows through
    to every lineage cut in this maintenance pass and the inner closure.
    """
    # positional contract like minhash_history_matches: first column = node,
    # second = its stored component label (connected_components' output
    # (node, component) plugs in directly)
    state = state.select(
        F.col(state.columns[0]).alias("node"), F.col(state.columns[1]).alias("label")
    )
    # the batch's edges are BOUNDED by contract but often come off an
    # expensive pipeline (history band-matches); materialize them once —
    # they feed `ends`, `mapped`, and (via connected_components) `sym`
    # (r11: the 3× recompute was most of q_dedup_clusters_incremental's
    # wall-clock)
    e = _cut(
        new_edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
            F.col("a").isNotNull() & F.col("b").isNotNull()
        ),
        reliable_checkpoint,
    )
    ends = e.select(F.explode(F.array("a", "b")).alias("node")).distinct()
    # ONE pass over corpus-scale state: the stars of endpoints history knows
    star = state.join(F.broadcast(ends), "node", "left_semi").select("node", "label")
    # r9 VERDICT #8: the correctness argument REQUIRES stored labels to be
    # converged minima (label = min reachable id ⇒ label <= node). A
    # non-canonical state table — crash mid-maintenance, manual edit —
    # would silently mislabel; check the necessary condition on the star
    # slice (batch-bounded rows only, so the guard costs O(batch)). A
    # filter on assert_true(...).isNull() cannot be pruned.
    star = star.filter(
        F.assert_true(
            F.col("label") <= F.col("node"),
            F.concat(
                F.lit("incremental_components: non-canonical state (label "),
                F.col("label").cast("string"),
                F.lit(" > node "),
                F.col("node").cast("string"),
                F.lit(
                    ") — the cluster state table is not a converged"
                    " connected_components output; rebuild it from scratch"
                    " before folding further batches"
                ),
            ),
        ).isNull()
    )
    star_a = F.broadcast(star.select(F.col("node").alias("a"), F.col("label").alias("la")))
    star_b = F.broadcast(star.select(F.col("node").alias("b"), F.col("label").alias("lb")))
    mapped = (
        e.join(star_a, "a", "left")
        .join(star_b, "b", "left")
        .select(
            F.coalesce("la", F.col("a")).alias("a"),
            F.coalesce("lb", F.col("b")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
    )
    # the small iterative closure over rewritten edges (reps + new ids only)
    cc = connected_components(
        mapped, src="a", dst="b", max_iter=max_iter,
        reliable_checkpoint=reliable_checkpoint, local_max_edges=local_max_edges,
    )
    # feeds the remap AND the new-node rows
    cc = _cut(cc, reliable_checkpoint)
    remap = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("_old"), F.col("component").alias("_new")
    )
    updated_hist = state.join(
        F.broadcast(remap), state["label"] == F.col("_old"), "left"
    ).select("node", F.coalesce("_new", "label").alias("component"))
    new_rows = (
        ends.join(F.broadcast(star.select("node")), "node", "left_anti")
        # cc is batch-sized too — broadcast keeps the whole new-rows branch
        # exchange-free instead of letting stats pick a sort-merge
        .join(F.broadcast(cc), "node")
        .select("node", "component")
    )
    if delta_only:
        # only rows whose label actually changed (inner remap join — the
        # touched components) plus brand-new nodes: the upsert set a stored
        # cluster table needs (merge_into on node), NOT a full-state rewrite
        changed = state.join(
            F.broadcast(remap), state["label"] == F.col("_old"), "inner"
        ).select("node", F.col("_new").alias("component"))
        return changed.unionByName(new_rows)
    return updated_hist.unionByName(new_rows)


def duplicate_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Cluster summary from near-duplicate pairs: (component, n_members,
    keep_id) — keep the minimum id, drop the rest. This is the final step of
    a dedup pipeline: pairs → components → one representative per cluster."""
    cc = connected_components(pairs, src=src, dst=dst)
    return cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("keep_id"),
    )
