"""Connected components over a pair graph — the clustering stage of a
near-duplicate pipeline (exact/LSH/SimHash pairs in, one cluster id per
doc out; keep min-id per cluster → the survivor set).

Algorithm: iterative min-label propagation on the undirected edge set —
``label(v) ← min(label(v), min label over neighbors)`` until a fixpoint.
Each round is one shuffle join + one groupBy over the *edge* table, so
cost is O(rounds · |E|); the round count is the graph diameter. Dedup
graphs are unions of near-cliques (every LSH band bucket pairs all its
members, verified pairs inherit that shape), so the diameter — and the
round count — is small and independent of corpus size. The 100 TB
posture: |E| is linear in true-duplicate count (the pair producers are
canonicalized + bucket-capped, see ops/dedup.py), labels/edges are two
narrow long columns, and every round truncates lineage via
``localCheckpoint`` so plan size stays O(1) across iterations.

For graphs whose shape is NOT known to be clique-like,
:func:`connected_components_star` implements the alternating
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14): each round is the same
shuffle-join + groupBy primitive over the edge set, but the round
count is logarithmic in the largest component (O(log² n) proven for
the alternating variant, O(log n) observed) instead of the diameter —
a 300-node chain converges in ~9 rounds where min-label needs 299.
``ops.dedup.dedup_clusters`` routes through it so adversarial chains
of near-dup pairs (doc A≈B≈C≈… drift chains) can't blow the round
budget.

Reference provenance: the reference engine has no clustering stage (its
dedup is the SQL UPSERT on page url, SURVEY §2.1 S5); this operator is
part of the training-data-pipeline surface the brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_CC_ITERS = 50  # diameter guard; dedup graphs converge in ~2-4


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iters: int = MAX_CC_ITERS,
) -> DataFrame:
    """edges (src, dst) undirected → (id, component); ``component`` is
    the minimum node id reachable from ``id``.

    ``nodes`` (single column ``id``) optionally widens the universe to
    isolated nodes (each becomes its own singleton component). Raises
    if the fixpoint isn't reached within ``max_iters`` rounds — for the
    dedup-graph shapes this feeds on, hitting the cap means the input
    wasn't a dedup graph (see module docstring).
    """
    sym = edges.select(
        F.col("src").cast("long").alias("a"), F.col("dst").cast("long").alias("b")
    ).union(
        edges.select(
            F.col("dst").cast("long").alias("a"), F.col("src").cast("long").alias("b")
        )
    )
    universe = sym.select(F.col("a").alias("id"))
    if nodes is not None:
        universe = universe.union(nodes.select(F.col("id").cast("long")))
    labels = (
        universe.distinct().select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )
    sym = sym.localCheckpoint(eager=True)

    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        # F.least skips nulls, so isolated nodes keep their own label
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["a"], "left")
            .select("id", F.least("label", "nbr_label").alias("label"))
            .localCheckpoint(eager=True)
        )
        n_changed = (
            labels.withColumnRenamed("label", "old")
            .join(new_labels, "id")
            .where(F.col("old") != F.col("label"))
            .count()
        )
        labels = new_labels
        if n_changed == 0:
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds — "
        "input graph is not dedup-shaped (see operators/components.py)"
    )


def connected_components_star(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iters: int = MAX_CC_ITERS,
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris
    et al., SoCC'14) — same contract as :func:`connected_components`
    (edges (src, dst) undirected → (id, component), component = min
    reachable id) but the round count is logarithmic in component size
    instead of the diameter, so chain-shaped graphs converge too.

    Edges are kept canonical (u < v). Per round:

    * large-star: for every node u, hook each strictly-larger neighbor
      v to m(u) = min(Γ(u) ∪ {u}) — one groupBy over the symmetric
      view + one join back.
    * small-star: for every node v with smaller neighbors, hook those
      neighbors AND v itself to their minimum — one groupBy over the
      canonical view + one join back.

    The fixpoint is a forest of depth-1 stars rooted at each
    component's minimum id. Termination requires BOTH operations to
    leave the edge set unchanged in the same round (a common fixpoint
    of large-star and small-star is provably a star forest: the small
    fixpoint forces ≤1 smaller neighbor per node — a parent-pointer
    forest — and the large fixpoint flattens any depth-2 path; either
    check alone admits non-star fixpoints, e.g. small∘large maps the
    chain a-b-x-c to {(a,b),(a,x),(b,c)} which small∘large then fixes
    only on the NEXT round). Set equality is exact: count match + one
    anti-join emptiness probe per op (both sides are distinct sets).
    Every round localCheckpoints so plan depth stays O(1).
    """
    e = (
        edges.select(
            F.col("src").cast("long").alias("u"),
            F.col("dst").cast("long").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    universe = e.select(F.col("u").alias("id")).union(
        e.select(F.col("v").alias("id"))
    )
    if nodes is not None:
        universe = universe.union(nodes.select(F.col("id").cast("long")))
    universe = universe.distinct().localCheckpoint(eager=True)

    def _same(a: DataFrame, n_a: int, b: DataFrame, n_b: int) -> bool:
        return (
            n_a == n_b
            and a.join(b, ["u", "v"], "left_anti").limit(1).count() == 0
        )

    n_edges = e.count()
    if n_edges == 0:
        return universe.select("id", F.col("id").alias("component"))
    for _ in range(max_iters):
        # ---- large-star over the symmetric view: m(u) = min(Γ⁺(u));
        # emit (m, v) for every neighbor v > u (v > u ≥ m, no loops)
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("u", "mn").alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("m").alias("u"), F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_large = large.count()
        # ---- small-star over the canonical (smaller ← larger) view:
        # for each v, m = min of its smaller neighbors; hook those
        # neighbors and v itself to m, dropping the m self-loop
        mins = large.groupBy("v").agg(F.min("u").alias("m"))
        hooked = large.join(mins, "v")
        small = (
            hooked.select(F.col("m").alias("a"), F.col("u").alias("b"))
            .union(hooked.select(F.col("m").alias("a"), F.col("v").alias("b")))
            .where(F.col("a") != F.col("b"))
            .select(F.col("a").alias("u"), F.col("b").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_small = small.count()
        converged = _same(large, n_large, e, n_edges) and _same(
            small, n_small, large, n_large
        )
        e, n_edges = small, n_small
        if converged:
            labels = e.select(
                F.col("v").alias("id"), F.col("u").alias("component")
            )
            return universe.join(labels, "id", "left").select(
                "id", F.coalesce("component", "id").alias("component")
            )
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iters} "
        "rounds (log-bounded — this indicates a bug, not an input shape)"
    )
