"""Iterative graph operator: connected components over near-duplicate pairs.

Pairwise near-dup detection (plans/text.py) is only half of deduplication —
near-duplication is NOT transitive, so a training-data pipeline needs the
transitive closure: group pairs into clusters and keep one representative
per cluster.  Spark has no built-in connected components; this implements
min-label propagation as a driver-side loop of DataFrame joins, each
iteration truncated with ``localCheckpoint`` so the physical plan stays
flat instead of growing with the iteration count.

Convergence: label(v) <- min(label(v), min over neighbors) reaches the
component minimum in O(graph diameter) rounds; near-dup clusters are
shallow (diameter << 10), and the loop exits on the first round with zero
label changes (bounded at ``_MAX_ITERS`` as a runaway guard).

Scale notes (100 TB): each round is one shuffle (neighbor-min groupBy) plus
one join on the id — both on the same key, so with AQE the exchange reuses
partitioning.  For billion-edge graphs replace the plain propagation with
the large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14) — same API, fewer rounds; the pair graph
from LSH bucketing is far smaller than the corpus, so the simple loop holds
well past the fixture scale.

The DuckDB oracle states the same semantics declaratively: a recursive CTE
computes reachability and takes min(reachable id) per node — exact
cross-engine check of an operator Spark itself cannot express in one query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.materialize import materialize_once
from .text import dedup_ngram_jaccard

_MAX_ITERS = 30


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Min-label propagation over an undirected edge list.

    Returns (id, comp) for every vertex that appears in ``edges``; comp is
    the minimum vertex id of the component.  Isolated vertices (no edges)
    are by definition their own component and never enter the edge list.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.persist()
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint()
    )
    for _ in range(_MAX_ITERS):
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("id").alias("b"), F.col("comp").alias("nbr_comp")
                ),
                "b",
            )
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("nbr_comp").alias("nbr_comp"))
        )
        proposed = labels.join(nbr_min, "id", "left").select(
            "id",
            F.col("comp").alias("old_comp"),
            F.least("comp", F.coalesce("nbr_comp", "comp")).alias("comp"),
        )
        proposed = proposed.localCheckpoint()
        changed = proposed.where(F.col("comp") != F.col("old_comp")).count()
        labels = proposed.drop("old_comp")
        if changed == 0:
            break
    else:
        # partially-propagated labels are silently WRONG — refuse them.
        # Deep graphs (diameter > _MAX_ITERS) belong to the O(log n)
        # connected_components_star path.
        sym.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {_MAX_ITERS} rounds "
            "(graph diameter too large); use connected_components_star"
        )
    sym.unpersist()
    return labels


def connected_components_star(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iters: int = 50
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    billion-edge path that ``connected_components``' docstring promises.

    Plain min-label propagation needs O(diameter) rounds; the alternating
    star operations contract the graph in O(log n) rounds regardless of
    diameter (a 10^6-node chain finishes in ~20 rounds instead of 10^6).
    Both operations are one groupBy-min plus one equi-join on the SAME
    key, so each round is two key-co-located shuffles and AQE reuses the
    exchange.

    Invariant: edges stay canonically oriented u > v ("point to the
    smaller id"), which both steps preserve — large-star hangs every
    larger neighbor under the neighborhood minimum, small-star re-hangs
    the smaller ones.  Convergence = the edge multiset is a fixed point,
    detected by (count, sum(xxhash64(u, v))) equality across rounds
    (collision odds ~2^-64; the iteration cap is a second guard).  The
    converged state is a star forest: every edge is (member, component
    min).

    Returns (id, comp) for every vertex that appears in ``edges`` — the
    exact contract of ``connected_components``, equivalence-tested in
    ``tests/test_graph_star.py``.
    """
    vertices = (
        edges.select(F.col(src).cast("long").alias("id"))
        .unionByName(edges.select(F.col(dst).cast("long").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    e = (
        edges.where(F.col(src) != F.col(dst))
        .select(
            F.greatest(F.col(src), F.col(dst)).cast("long").alias("u"),
            F.least(F.col(src), F.col(dst)).cast("long").alias("v"),
        )
        .distinct()
        .localCheckpoint()
    )

    def _signature(df: DataFrame) -> tuple[int, int]:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum: exact and overflow-free under ANSI mode even
            # summing 2^63-magnitude hashes over billions of edges
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).first()
        return int(row["n"]), int(row["h"])

    def _large_star(df: DataFrame) -> DataFrame:
        sym = df.select("u", "v").unionByName(
            df.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", "u").alias("m"))
        )
        return (
            sym.where(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def _small_star(df: DataFrame) -> DataFrame:
        mins = df.groupBy("u").agg(F.min("v").alias("m"))
        rehung = (
            df.join(mins, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        kept = mins.select("u", F.col("m").alias("v"))
        return rehung.unionByName(kept).distinct()

    sig = _signature(e)
    for _ in range(max_iters):
        e = _small_star(_large_star(e)).localCheckpoint()
        new_sig = _signature(e)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        # same refusal as connected_components: a partially-contracted
        # star set yields silently wrong labels — never return it
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iters} "
            "rounds (raise max_iters; O(log n) rounds suffice for any "
            "graph that fits a cluster)"
        )
    members = e.select(F.col("u").alias("id"), F.col("v").alias("comp"))
    # every vertex of the INPUT is its own component floor: covers star
    # roots and vertices whose only edges were self-loops
    return members.unionByName(
        vertices.select("id", F.col("id").alias("comp"))
    ).groupBy("id").agg(F.min("comp").alias("comp"))


def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_clusters`` with the O(log n) star algorithm in place of the
    O(diameter) propagation loop — same output contract, same DuckDB
    oracle, so the driver checks the scale path's correctness directly."""
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components_star(pairs, src="doc_a", dst="doc_b")
    return (
        comp.groupBy(F.col("comp").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("id")), lambda c: c.cast("string")
                ),
                ",",
            ).alias("members"),
        )
        .orderBy("cluster_id")
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: ngram-Jaccard pairs -> connected components.

    Output per cluster: the representative (min doc_id), member count, and
    the comma-joined sorted member list — fully checkable against the
    recursive-CTE oracle.
    """
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    return (
        comp.groupBy(F.col("comp").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("id")), lambda c: c.cast("string")
                ),
                ",",
            ).alias("members"),
        )
        .orderBy("cluster_id")
    )


# The pairs CTEs mirror plans/text.py DEDUP_NGRAM_ORACLE verbatim; the
# recursive part computes reachability (UNION dedups, so cycles terminate).
DEDUP_CLUSTERS_ORACLE = """
WITH RECURSIVE toks AS (
    SELECT doc_id,
           string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t
    FROM documents
), idx AS (
    SELECT doc_id, t,
           unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i
    FROM toks
), sh AS (
    SELECT DISTINCT doc_id,
           CASE WHEN len(t) >= 3
                THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                ELSE array_to_string(t, ' ') END AS shingle
    FROM idx
), sizes AS (
    SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM sh a JOIN sh b ON a.shingle = b.shingle
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
), pairs AS (
    SELECT doc_a, doc_b
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) >= 0.2
), edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION ALL
    SELECT doc_b, doc_a FROM pairs
), reach AS (
    SELECT DISTINCT src AS id, src AS r FROM edges
    UNION
    SELECT e.src AS id, reach.r FROM edges e JOIN reach ON reach.id = e.dst
), comp AS (
    SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
)
SELECT cluster_id,
       count(*) AS n_members,
       string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS members
FROM comp
GROUP BY cluster_id
ORDER BY cluster_id
"""


_PR_DAMP = 0.85
_PR_ITERS = 3
# Edge-cache partitioning: ADAPTIVE to input size, calibrated by the
# rule-42 sweep (SCALE.md).  Measured at sf0.1 (~10.8 MB lineitem,
# ~1.1M edges): 8 core-saturating tasks beat 32 slivers on per-stage
# scheduler overhead x 3 rounds (2.07 s vs 2.42 s median).  Measured at
# a 10x key-shifted graph (~108 MB): 32 beats 8 (8-9 s vs 14-20 s) —
# the fixture constant inverts under growth, so the count scales
# linearly with the driving table's bytes between those two calibration
# points and clamps to [8, defaultParallelism] (cores locally; total
# executor cores on a cluster, exactly the rule-42 extrapolation).
_PR_EDGE_PART_BYTES = 1_400_000  # lineitem bytes per edge partition (measured)
_PR_EDGE_PARTS_OVERRIDE: int | None = None  # test/sweep hook


def _edge_cache_partitions(spark: SparkSession, sf_dir: str) -> int:
    """Size the edge cache from the driving table's on-disk bytes; fall
    back to ``defaultParallelism`` (the scale-safe ceiling) when the
    input isn't a stat-able local path."""
    if _PR_EDGE_PARTS_OVERRIDE is not None:
        return _PR_EDGE_PARTS_OVERRIDE
    import os

    path = os.path.join(sf_dir, "lineitem.parquet")
    total = 0
    try:
        if os.path.isfile(path):
            total = os.path.getsize(path)
        else:
            for root, _, files in os.walk(path):
                total += sum(
                    os.path.getsize(os.path.join(root, f)) for f in files
                )
    except OSError:
        total = 0
    ceiling = spark.sparkContext.defaultParallelism
    if total <= 0:
        return max(8, ceiling)
    # floor OUTSIDE the min: on a <8-core host the floor of 8 still wins
    # (a few more partitions than cores is harmless; a 4-task sliver run
    # under the measured floor is not)
    return int(max(8, min(total // _PR_EDGE_PART_BYTES, ceiling)))


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer↔supplier trade graph (3 power iterations).

    The bipartite graph: an undirected edge per distinct (customer,
    supplier) pair observed in orders ⋈ lineitem.  Each iteration is one
    broadcast equi-join (rank shares onto edge sources) plus one
    partitioning-aligned aggregation (sum of incoming contributions by
    destination); the three rounds FUSE into one lazy DAG executed by a
    single action, checkpointed once at the end (r9 — see the loop
    comment for the measured rationale).

    Float parity: per-round contributions are accumulated as exact integer
    picounits (``round(contrib * 1e12)`` as BIGINT, the q7 trick), so every
    round's rank vector is bit-identical across engines and summation
    orders; the undirected graph means every node has degree >= 1, so no
    dangling-mass term is needed.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    # integer node ids (customer -> 2k, supplier -> 2k+1): long-keyed joins
    # and aggregates, no string hashing in the iteration hot path.  The
    # symmetrized edge set is repartitioned ON dst BEFORE dedup and
    # persisted: HashPartitioning(dst) satisfies both the dropDuplicates
    # clustering (dst ⊆ {src, dst} — equal pairs co-locate) and every
    # round's contribution groupBy(dst), so the per-iteration shuffle
    # vanishes — the edge exchange is paid exactly once, and the three
    # rounds are narrow map + in-place aggregate over the cached
    # partitioning.
    pairs = lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        (F.col("o_custkey") * 2).alias("cnode"),
        (F.col("l_suppkey") * 2 + 1).alias("snode"),
    )
    # symmetrize with explode, NOT a self-union: a union's two branches
    # are separate subtrees, so the union form SCANNED AND JOINED
    # lineitem⋈orders twice per edge-cache build (visible as two
    # BroadcastHashJoins in the r9 plan; measured ~0.4s of the build at
    # sf0.1).  explode emits both directions from one pass.
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("cnode").alias("src"), F.col("snode").alias("dst")
                ),
                F.struct(
                    F.col("snode").alias("src"), F.col("cnode").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    edges = (
        sym.repartition(_edge_cache_partitions(spark, sf_dir), "dst")
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    # static per-node state (degree, n) built once and checkpointed; each
    # round re-derives ranks by joining the fresh incoming sums onto it.
    # The degree table is checkpointed BEFORE the node count is taken:
    # deriving n via a broadcast subtree (deg.agg inside a crossJoin)
    # would execute the 1M-row degree shuffle twice — once for the
    # broadcast job, once for the main plan (measured ~0.5s at sf0.1).
    # n itself is one scalar; a driver-side count over the checkpointed
    # 16k-row table is the cheap, legitimate form.
    #
    # Degree is counted by DST, not src: the symmetric edge set has
    # deg(x) = |{(x,·)}| = |{(·,x)}| and the cache is HashPartitioning
    # (dst), so the dst-side count aggregates IN PLACE — the src-side
    # form paid a full exchange of the partial counts every build (r10).
    deg = (
        edges.groupBy("dst")
        .agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("dst", "src")
        .localCheckpoint()
    )
    n = float(deg.count())
    node_state = deg.select("src", "deg", F.lit(n).alias("n"))
    # no checkpoint on the seed ranks: it is a narrow select over the
    # already-checkpointed node_state, so round 1's broadcast subtree is
    # one map over a materialized RDD — flat either way, one job cheaper
    ranks = node_state.select(
        "src", "deg", "n", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    # The rank vector is node-cardinality (≪ edges), so it broadcasts into
    # the contribution join, and the contribution sum by destination is
    # satisfied by the cached HashPartitioning(dst) — each round is
    # SHUFFLE-FREE.  The three rounds build ONE lazy DAG executed by a
    # single action (r9, VERDICT r8 #5): each intermediate rank vector
    # feeds exactly one downstream broadcast, so every BroadcastExchange
    # subtree materializes exactly once within the action — the three
    # per-round driver-blocking checkpoint jobs collapse into one, with
    # no re-execution (interleaved A/B vs the per-round-checkpoint form,
    # SCALE.md rule 42: results bit-identical; wall-clock at parity at
    # fixture scale, where the rounds are scheduler-overhead-bound — the
    # win is the removed driver round trips, which price in at cluster
    # latencies, not local[32] ones).  Plan depth is bounded by the
    # constant _PR_ITERS, so the flat-lineage concern the old
    # checkpoints addressed does not apply at 3 rounds.  At
    # billion-node scale, swap the broadcasts for a co-partitioned
    # shuffle join on the node id (same trick, src-partitioned twin of
    # the edge cache) and re-introduce a checkpoint every ~10 rounds.
    for _ in range(_PR_ITERS):
        contrib = edges.join(
            F.broadcast(
                ranks.select(
                    F.col("src").alias("u"),
                    (F.col("pr") / F.col("deg")).alias("share"),
                )
            ),
            F.col("src") == F.col("u"),
        ).select("dst", F.round(F.col("share") * 1e12).cast("long").alias("ishare"))
        incoming = contrib.groupBy("dst").agg(
            (F.sum("ishare") / 1e12).alias("in_sum")
        )
        ranks = (
            incoming.join(F.broadcast(node_state), F.col("dst") == F.col("src"))
            .select(
                "src",
                "deg",
                "n",
                (
                    (1.0 - _PR_DAMP) / F.col("n")
                    + F.lit(_PR_DAMP) * F.col("in_sum")
                ).alias("pr"),
            )
        )
    # ONE eager checkpoint after the full 3-round DAG: executes the
    # whole iteration as a single action (the lazy-fusion win), leaves
    # the driver-facing plan a flat scan of the final 16k-row rank
    # vector, and makes the edge-cache unpersist below safe.
    ranks = ranks.localCheckpoint(eager=True)
    out = (
        ranks.select(
            F.concat(
                F.when(F.col("src") % 2 == 0, F.lit("c")).otherwise(F.lit("s")),
                (F.col("src") / 2).cast("long"),
            ).alias("node"),
            F.round("pr", 8).alias("pagerank"),
        )
        .orderBy(F.col("pagerank").desc(), "node")
        .limit(20)
    )
    # the final ranks are checkpointed, so the result no longer depends
    # on the cached edge lineage
    edges.unpersist()
    return out


GRAPH_PAGERANK_ORACLE = """
WITH pairs AS (
    SELECT DISTINCT o_custkey * 2 AS cnode, l_suppkey * 2 + 1 AS snode
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (
    SELECT cnode AS src, snode AS dst FROM pairs
    UNION ALL
    SELECT snode, cnode FROM pairs),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
pr0 AS (SELECT src, deg, 1.0 / nn.n AS pr FROM deg, nn),
pr1 AS (
    SELECT e.dst AS src, d.deg AS deg,
           (1.0 - 0.85) / nn.n
             + 0.85 * (sum(CAST(round(p.pr / p.deg * 1e12) AS BIGINT)) / 1e12)
               AS pr
    FROM edges e JOIN pr0 p ON p.src = e.src
    JOIN deg d ON d.src = e.dst, nn
    GROUP BY e.dst, d.deg, nn.n),
pr2 AS (
    SELECT e.dst AS src, d.deg AS deg,
           (1.0 - 0.85) / nn.n
             + 0.85 * (sum(CAST(round(p.pr / p.deg * 1e12) AS BIGINT)) / 1e12)
               AS pr
    FROM edges e JOIN pr1 p ON p.src = e.src
    JOIN deg d ON d.src = e.dst, nn
    GROUP BY e.dst, d.deg, nn.n),
pr3 AS (
    SELECT e.dst AS src,
           (1.0 - 0.85) / nn.n
             + 0.85 * (sum(CAST(round(p.pr / p.deg * 1e12) AS BIGINT)) / 1e12)
               AS pr
    FROM edges e JOIN pr2 p ON p.src = e.src, nn
    GROUP BY e.dst, nn.n)
SELECT CASE WHEN src % 2 = 0 THEN 'c' || (src // 2)
            ELSE 's' || (src // 2) END AS node,
       round(pr, 8) AS pagerank
FROM pr3
ORDER BY pagerank DESC, node
LIMIT 20
"""


_HIER_MAX_DEPTH = 8


def hier_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy traversal + rollup: aggregate every node to its tree root.

    Spark has no recursive CTE; this is the generic substitute — iterated
    pointer-jumping over an edge table.  The hierarchy: customer k's parent
    is k/10 (digit-stripping — a stand-in parent EDGE TABLE is built from
    it and the traversal uses ONLY that table, so the loop works for any
    parent relation).  Each round broadcast-joins the node-sized parent map
    and jumps every unfinished node one level; roots (k < 10) self-loop.
    Depth is bounded by _HIER_MAX_DEPTH (6 digits at sf0.1); per-round
    ``localCheckpoint`` keeps the plan flat (SCALE.md rule 9).  With
    pointer-DOUBLING (jump to grandparent each round) rounds drop to
    O(log depth) — single jumps here keep the oracle's semantics obvious.

    Output: per-root subtree size and total account balance (exact integer
    cents).  The DuckDB oracle is a textbook recursive CTE — the exact
    cross-engine check of a capability Spark itself lacks.
    """
    customer = load_table(spark, sf_dir, "customer")
    parents = customer.select(
        F.col("c_custkey").alias("child"),
        F.when(F.col("c_custkey") >= 10, (F.col("c_custkey") / 10).cast("long"))
        .otherwise(F.col("c_custkey"))
        .alias("parent"),
    )
    state = customer.select(
        "c_custkey",
        F.col("c_custkey").alias("cur"),
        F.col("c_acctbal").alias("bal"),
    ).localCheckpoint()
    for _ in range(_HIER_MAX_DEPTH):
        state = (
            state.join(
                # the parent map is customer-cardinality — no forced
                # hint (rule 59); each round is a child-keyed equi join
                # that shuffle-joins beyond the auto-broadcast threshold
                parents, F.col("cur") == F.col("child"), "left"
            )
            .select(
                "c_custkey",
                F.coalesce("parent", "cur").alias("cur"),
                "bal",
            )
            .localCheckpoint()
        )
    return (
        state.groupBy(F.col("cur").alias("root"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.round(
                F.sum(F.round(F.col("bal") * 100).cast("long")) / 100.0, 2
            ).alias("total_balance"),
        )
        .orderBy("root")
    )


HIER_ROLLUP_ORACLE = """
WITH RECURSIVE walk AS (
    SELECT c_custkey, c_custkey AS cur, c_acctbal AS bal
    FROM customer
    UNION ALL
    SELECT c_custkey, cur // 10 AS cur, bal
    FROM walk WHERE cur >= 10
), roots AS (
    SELECT c_custkey, cur AS root, bal
    FROM walk WHERE cur < 10)
SELECT root,
       count(*) AS n_nodes,
       round(sum(CAST(round(bal * 100) AS BIGINT)) / 100.0, 2)
           AS total_balance
FROM roots
GROUP BY root
ORDER BY root
"""


def hier_rollup_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hierarchy rollup again — as a NATIVE recursive CTE (Spark 4).

    ``hier_rollup`` implements the traversal as iterated pointer jumps
    because pre-4.x Spark had no recursion; Spark 4 ships WITH RECURSIVE,
    so the same semantics now also run as one declarative statement that
    Catalyst plans end-to-end (each recursion step is a join against the
    previous step's result — the same physical shape as the manual loop,
    minus the driver round-trips and checkpoint jobs).  Keeping BOTH forms
    documents the migration path; the DuckDB oracle is character-for-
    character the same query modulo two dialect splits: ``//`` vs ``DIV``,
    and decimal literals (Spark parses ``100.0`` as DECIMAL(4,1) — the
    divisor is cast to DOUBLE explicitly so the output type matches).
    """
    from ..catalog import load_table as _load

    _load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
WITH RECURSIVE walk AS (
    SELECT c_custkey, c_custkey AS cur, c_acctbal AS bal
    FROM customer
    UNION ALL
    SELECT c_custkey, cur DIV 10 AS cur, bal
    FROM walk WHERE cur >= 10
), roots AS (
    SELECT c_custkey, cur AS root, bal
    FROM walk WHERE cur < 10)
SELECT root,
       count(*) AS n_nodes,
       round(sum(CAST(round(bal * 100) AS BIGINT)) / CAST(100 AS DOUBLE), 2)
           AS total_balance
FROM roots
GROUP BY root
ORDER BY root
"""
    )


_TRI_MIN_COOCCUR = 3


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the supplier co-supply graph.

    Graph: an undirected edge between two suppliers that ship lines of the
    same order at least ``_TRI_MIN_COOCCUR`` distinct times (a meaningful
    "frequently co-supplying" projection of lineitem; the threshold keeps
    the projection sparse as sf grows).  Triangles are counted with the
    ordered node-iterator join: every edge is stored once as (a < b), a
    wedge join e1(a,b) ⋈ e2(b,c) builds open wedges a<b<c, and a final join
    against the edge set closes them — each triangle is produced exactly
    once because its vertices appear in ascending order.

    Scale notes (100 TB): the co-occurrence groupBy is the only wide
    shuffle (distinct (orderkey, s1, s2) triples); at fixture scale the
    optimizer auto-broadcasts the co-occurrence-thresholded edge set
    into both the wedge-build and the wedge-close join, making the
    triangle phase two broadcast hash joins with zero exchange.  The
    hints are deliberately NOT forced (rule 59): the edge set grows
    with the graph, so beyond the auto-broadcast threshold both joins
    degrade to shuffle joins on the wedge midpoint/endpoints; for
    graphs at that scale, additionally orient wedges by DEGREE instead
    of id (compact-forward) to bound per-vertex wedge fan-out by
    sqrt(|E|).

    Reference parity: the reference has no graph surface at all (SURVEY.md
    §2.1) — this is a north-star extension exercising the iterative/join
    family at a shape (self-join chains) TPC-H never hits.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    # r18 (guide §2.4/§1.2): the co-occurrence pairs used to come from a
    # per_order self-join — two full scan+distinct lineages of lineitem
    # plus the join's orderkey exchanges.  The basket_brand_pairs
    # pattern replaces it: ONE (orderkey → sorted distinct supplier
    # set) aggregate (map-side partial collect_set), C(k,2) pairs
    # emitted locally with nested array transforms — one lineitem scan,
    # one wide shuffle, identical (a < b, per-order-distinct) pairs.
    baskets = (
        lineitem.select(
            F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s")
        )
        .groupBy("ok")
        .agg(F.sort_array(F.collect_set("s")).alias("supps"))
    )
    pair_expr = F.flatten(
        F.transform(
            F.col("supps"),
            lambda x, i: F.transform(
                F.slice(F.col("supps"), i + 2, F.size(F.col("supps"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    cooccur = (
        baskets.select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    # r18: the edge frame used to be persist()-ed and then unpersist()-ed
    # at BUILD time (before the returned plan ever ran), so the n_nodes/
    # n_edges counts used the cache but every EXECUTION of the returned
    # frame recomputed the whole co-occurrence build once per reference —
    # three lineitem scans per run.  A lazy localCheckpoint is per-call
    # state with no unpersist footgun: the counts below materialize it,
    # and the wedge build, wedge close, and final aggregate all read the
    # same materialized rows.
    edges = (
        cooccur.where(F.col("n_orders") >= _TRI_MIN_COOCCUR)
        .select("a", "b")
        .transform(materialize_once)
    )
    # The edge set grows with the graph, so neither triangle join
    # carries a forced broadcast hint (rule 59): beyond the
    # auto-broadcast threshold both joins degrade to shuffle joins on
    # the wedge midpoint/endpoints — the compact-forward posture the
    # docstring describes — instead of OOMing the driver on a forced
    # build side.
    wedges = (
        edges.alias("e1")
        .join(
            edges.alias("e2"),
            F.col("e1.b") == F.col("e2.a"),
        )
        .select(F.col("e1.a").alias("a"), F.col("e1.b").alias("b"), F.col("e2.b").alias("c"))
    )
    triangles = wedges.join(
        edges.select(F.col("a").alias("ta"), F.col("b").alias("tc")),
        (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")),
    )
    n_nodes = (
        edges.select(F.col("a").alias("v"))
        .unionByName(edges.select(F.col("b").alias("v")))
        .distinct()
        .count()
    )
    n_edges = edges.count()
    return triangles.agg(
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        F.lit(n_edges).cast("long").alias("n_edges"),
        F.count(F.lit(1)).alias("n_triangles"),
    )


GRAPH_TRIANGLES_ORACLE = """
WITH per_order AS (
    SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem
), edges AS (
    SELECT x.s AS a, y.s AS b
    FROM per_order x JOIN per_order y ON x.ok = y.ok AND x.s < y.s
    GROUP BY x.s, y.s
    HAVING count(*) >= 3
), verts AS (
    SELECT a AS v FROM edges UNION SELECT b FROM edges
), tri AS (
    SELECT count(*) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e1.b = e2.a
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT (SELECT count(*) FROM verts) AS n_nodes,
       (SELECT count(*) FROM edges) AS n_edges,
       n_triangles
FROM tri
"""


QUERIES = {
    "dedup_clusters": dedup_clusters,
    "dedup_clusters_star": dedup_clusters_star,
    "graph_pagerank": graph_pagerank,
    "graph_triangles": graph_triangles,
    "hier_rollup": hier_rollup,
    "hier_rollup_sql": hier_rollup_sql,
}

ORACLES = {
    "dedup_clusters": DEDUP_CLUSTERS_ORACLE,
    "dedup_clusters_star": DEDUP_CLUSTERS_ORACLE,
    "graph_pagerank": GRAPH_PAGERANK_ORACLE,
    "graph_triangles": GRAPH_TRIANGLES_ORACLE,
    "hier_rollup": HIER_ROLLUP_ORACLE,
    "hier_rollup_sql": HIER_ROLLUP_ORACLE,
}
