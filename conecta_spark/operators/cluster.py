"""Near-duplicate cluster formation: connected components over a pair
graph (extension surface, SURVEY 2.4 -- the step after pair mining that a
training-data dedup pipeline actually ships: pairs -> clusters -> keep one
canonical doc per cluster).

Algorithm: min-label propagation to fixpoint -- every vertex ends up
labeled with the minimum id of its connected component.  Execution is
scale-adaptive (see :func:`connected_components`): graphs under an edge
threshold are solved by driver-side union-find (the pair graph is a tiny
derived artifact even from a huge corpus; distributed rounds would be pure
scheduler latency), larger ones by iterative label propagation with
pointer jumping (rounds ~ log diameter).

Scale notes (100 TB):

* state per round is two skinny relations: edges (a, b) and labels
  (vertex, label) -- payloads (text, shingles) never enter the loop.
* each round re-persists the new labels and unpersists the old (lineage
  would otherwise grow per round and re-execute everything on the final
  action).
* convergence is checked with a cheap ``changed == 0`` aggregate per
  round; pathological diameters cap at ``max_iter``.

The DuckDB oracle computes the same fixpoint declaratively via a recursive
transitive closure -- exact on the small oracle corpus, which is the point:
the iterative Spark path is checked against closed-form SQL semantics.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries import register, t
from .dedup import minhash_lsh_pairs


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
    small_graph_threshold: int = 1_000_000,
) -> DataFrame:
    """``(doc_id, cluster_id)`` for every vertex of ``edges``; cluster_id is
    the minimum vertex id in the component.  Vertices are the ids appearing
    in the edge list (singletons are trivially their own cluster -- callers
    union them in if wanted).

    Two execution paths, picked by measured edge count:

    * **small graph** (<= ``small_graph_threshold`` edges): collect the
      skinny (u, v) pairs and union-find on the driver.  A near-dup graph
      is a tiny derived artifact even when the corpus is 100 TB -- paying
      5+ distributed rounds of scheduler+shuffle latency to propagate
      labels through a few thousand edges is the wrong trade; 1M edges is
      ~16 MB collected.  The cutoff is explicit and conservative.
    * **large graph**: iterative min-label propagation with pointer
      jumping.  Each round takes the min over neighbors' labels AND the
      label's own label (path halving), so rounds ~ log(diameter) rather
      than diameter; both hops ride ONE shuffle-join per round (the jump
      is propagation over synthetic (u -> label(u)) edges unioned into
      the edge relation map-side), re-persisted generation over
      generation.

    Fault-tolerance note for the large-graph path: each generation is
    truncated with ``localCheckpoint`` (executor-local blocks) unless a
    reliable checkpoint directory is configured on the SparkContext, in
    which case ``checkpoint()`` is used instead.  localCheckpoint is the
    right default in local mode and on stable executors, but its blocks
    die with an executor -- on a real cluster with dynamic allocation or
    spot instances, set ``spark.sparkContext.setCheckpointDir(...)`` and
    this loop automatically switches to recoverable snapshots (the
    GraphX/GraphFrames iterative pattern).
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    # Small-graph probe: union-find needs neither symmetrization nor
    # dedup (parent pointers make both implicit), so probe the RAW pair
    # relation with ONE bounded collect -- a limit(threshold+1) either
    # returns the whole graph (solve it on the driver right here) or
    # proves it big (discard the probe rows, go distributed).  The
    # previous shape paid explode+distinct+persist+count+collect -- two
    # jobs and a shuffle -- before the driver saw a single edge.  The
    # threshold now counts raw pairs rather than deduped directed edges
    # (<= 2x looser); it is an explicit latency/size trade either way,
    # and both branches compute the same fixpoint.
    if small_graph_threshold > 0:
        raw = edges.select(src, dst).limit(
            small_graph_threshold + 1
        ).collect()
        if len(raw) <= small_graph_threshold:
            parent: dict = {}

            def find(x):
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:  # path compression
                    parent[x], x = root, parent[x]
                return root

            for u, v in raw:
                parent.setdefault(u, u)
                parent.setdefault(v, v)
                ru, rv = find(u), find(v)
                if ru != rv:
                    # union by min so the root IS the canonical min id
                    lo, hi = (ru, rv) if ru < rv else (rv, ru)
                    parent[hi] = lo
            rows = [(x, find(x)) for x in parent]
            return edges.sparkSession.createDataFrame(
                rows, "doc_id long, cluster_id long"
            )

    # Symmetrize in ONE pass over the edge relation (explode of the forward
    # + reversed struct).  A self-union would reference `edges` twice and
    # re-run the expensive pair-mining pipeline feeding it once per branch
    # -- persisting doesn't save the first job, whose two branches race the
    # cold cache.
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # Deliberately NOT narrowing spark.sql.shuffle.partitions to the
    # measured edge count: a quiet-host experiment showed 6.2s -> 4.6s at
    # 2.5k edges with 4 partitions, but under concurrent load the narrow
    # stages are hostage to single stragglers (measured bimodal 11s/40s
    # in the bench), and at production scale (>1M edges, the only time
    # this branch runs un-forced) the narrowed count equals the session
    # width anyway.  AQE's partition coalescing handles the reducer side
    # without shrinking the straggler-hiding map width.
    # Round 0 for free: initialize each vertex's label to min(self,
    # neighbors) with ONE aggregation over the symmetrized edges (every
    # vertex has a row in sym).  For shallow components -- the typical
    # near-dup cluster shape -- this IS the fixpoint, so the loop runs
    # one confirmation round instead of propagate+confirm; deeper graphs
    # just start one hop ahead.  Same shuffle key/size as a round's
    # aggregate, minus the join and union.
    # Each generation is an EAGER localCheckpoint, not a persist: a
    # round's plan references the previous generation three times (self
    # rows, labels-as-edges, join right side), so an un-truncated lineage
    # grows 3^rounds copies of the upstream pipeline -- plan ANALYSIS
    # (not execution; the cache would serve that) OOMed the driver at
    # ~5 rounds on a 24-vertex chain (tests/test_operators.py
    # test_connected_components_deep_graph_distributed).  Checkpointing
    # cuts every round's plan to a constant-size tree over two leaves --
    # the GraphFrames/GraphX iterative pattern.  The row-format/AQE cost
    # that ruled localCheckpoint out for the x66 self-join doesn't bite
    # here: the generation is a terminal skinny relation re-joined once,
    # and the old snapshots are GC-released with their DataFrames.
    # Reliability: localCheckpoint blocks live only on executors, so an
    # executor loss mid-loop is unrecoverable (the lineage is gone).  When
    # the user configured a reliable checkpoint dir, prefer checkpoint()
    # -- same constant-size-plan effect, survives executor loss.
    if edges.sparkSession.sparkContext.getCheckpointDir() is not None:
        _snapshot = lambda df_: df_.checkpoint(eager=True)  # noqa: E731
    else:
        _snapshot = lambda df_: df_.localCheckpoint(eager=True)  # noqa: E731
    labels = _snapshot(
        sym.groupBy("u")
        .agg(F.min("v").alias("__mn"))
        .select(
            F.col("u").alias("vertex"),
            F.least("u", "__mn").alias("label"),
        )
    )
    for _ in range(max_iter):
        # min over self, neighbors' labels, and label's label
        # (pointer jump).  The self branch is tagged so the aggregate can
        # carry each vertex's OLD label alongside the new minimum: the
        # convergence check is then a filter-count over the just-cached
        # relation -- one job, zero joins -- instead of the extra
        # shuffle-join-per-round it used to be.  (min(CASE self) is exact:
        # every vertex has exactly one self row per round.)
        self_rows = labels.select(
            "vertex", "label", F.lit(1).alias("is_self")
        )
        # Neighbor propagation and the pointer jump are ONE join: the jump
        # "label(label(u))" is neighbor propagation over the synthetic edge
        # (u -> label(u)), so appending labels-as-edges to sym (map-side
        # union of two skinny relations) folds both into a single
        # |E|+|V|-row shuffle join per round -- one fewer |V|-sized
        # shuffle join than the two-join form it replaces.
        hop_edges = sym.union(
            labels.select(F.col("vertex").alias("u"), F.col("label").alias("v"))
        )
        neighbor = hop_edges.join(labels, hop_edges.v == labels.vertex).select(
            F.col("u").alias("vertex"),
            "label",
            F.lit(0).alias("is_self"),
        )
        new_gen = _snapshot(
            self_rows.union(neighbor)
            .groupBy("vertex")
            .agg(
                F.min("label").alias("label"),
                F.min(
                    F.when(F.col("is_self") == 1, F.col("label"))
                ).alias("old_label"),
            )
        )
        # The eager checkpoint already materialized every partition; the
        # convergence check is a cheap filter-count over the snapshot.
        changed = new_gen.where(
            F.col("label") != F.col("old_label")
        ).count()
        labels = new_gen.select("vertex", "label")
        if changed == 0:
            break
    else:
        # max_iter rounds without convergence: labels may still split
        # true components.  Pointer jumping converges in O(log
        # diameter) rounds, so hitting this means a pathological graph
        # -- surface it instead of returning silently-wrong clusters.
        import logging

        logging.getLogger(__name__).warning(
            "connected_components: not converged after %d rounds "
            "(%d labels still changing); components may be split. "
            "Raise max_iter for high-diameter graphs.",
            max_iter,
            changed,
        )
    sym.unpersist()
    return labels.select(
        F.col("vertex").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def dedup_clusters(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Cluster rollup over the verified MinHash near-dup graph: one row per
    cluster with member count and sorted member list; cluster_id is the
    canonical (minimum) member doc_id.  SimHash edges were rejected here:
    on a low-vocabulary corpus signature collisions chain nearly the whole
    corpus into one component (measured: 489 of 500 docs at hamming<=3),
    while Jaccard-verified pairs stay semantically tight.  ``pairs`` lets a
    pipeline that already mined the graph pass it in instead of re-mining
    (the registry does this via dedup.shared_minhash_pairs)."""
    if pairs is None:
        pairs = minhash_lsh_pairs(
            df, threshold=threshold, text_col=text_col, id_col=id_col
        )
    cc = connected_components(pairs)
    return (
        cc.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sort_array(F.collect_list("doc_id")).alias("members"),
        )
    )


def _duck_clusters_sql(docs: str = "documents") -> str:
    # Recursive closure: each src reaches every vertex of its component, so
    # grouping reach by src and taking MIN(dst) is exactly min-label
    # propagation's fixpoint.  One outer group-by per component dedups the
    # per-src rows into per-cluster rows.  The edge list is the x07 pipeline
    # verbatim (nested WITH in a derived table), so the oracle checks the
    # whole pairs->clusters composition end to end.  ``docs`` parameterizes
    # the corpus relation so x67 can run the identical composition over a
    # bounded slice (see _duck_mh_sigs).
    from .dedup import _duck_mh_sigs

    return (
        "WITH RECURSIVE pairs AS ("
        f" SELECT doc_a, doc_b FROM ({_duck_mh_sigs(docs)}) q),"
        " edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs"
        "  UNION SELECT doc_b, doc_a FROM pairs),"
        " reach(src, dst) AS (SELECT u, u FROM edges"
        "  UNION SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),"
        " labeled AS (SELECT src, MIN(dst) AS cluster_id FROM reach GROUP BY src)"
        " SELECT cluster_id, COUNT(*) AS n_members,"
        " array_to_string(list_sort(list(src)), ',') AS members"
        " FROM labeled GROUP BY cluster_id"
    )


@register(
    "x26_dedup_clusters",
    _duck_clusters_sql(),
    "near-dup clusters: connected components over verified MinHash pairs",
)
def x26_dedup_clusters(spark, sf_dir) -> DataFrame:
    # The member list is serialized to a comma-joined string at the query
    # boundary: the driver's canonicalizer sorts result columns with pandas,
    # which cannot hash/sort array cells (r02 showed the crash) -- registered
    # outputs must stay scalar.  `dedup_clusters` itself keeps the typed
    # array column for programmatic use.
    from .dedup import shared_minhash_pairs

    cl = dedup_clusters(
        t(spark, sf_dir, "documents"),
        pairs=shared_minhash_pairs(spark, sf_dir, threshold=0.5),
    )
    return cl.select(
        "cluster_id",
        "n_members",
        F.array_join(
            F.transform("members", lambda x: x.cast("string")), ","
        ).alias("members"),
    )


#: Corpus slice for the DOWNSTREAM-subject cluster entries (x67, x50).
#: Each entry's SUBJECT is a stage downstream of pair mining (the
#: distributed CC branch; the canonical-prune aggregation) -- but their
#: r6 forms re-ran the ENTIRE x07 LSH pipeline over the full corpus
#: (~3.5 s each at sf0.1) that x26 had just mined in the same bench pass,
#: re-proving the repo's most expensive upstream to exercise a cheap
#: downstream.  Bounding the corpus to the first CC_SLICE docs keeps
#: every correctness gate identical (sf0.001/0.01 have 500 docs -- the
#: slice IS the corpus there) while the slice's component structure still
#: exercises multi-member clusters, quality ties, and >1 propagation
#: round at sf0.1.  Same precedent as X09_SLICE / BASELINE_SLICE:
#: bounded, labeled, oracle runs the identical slice.  Full-corpus pair
#: mining and clustering stay driver-proven through x26.
CC_SLICE = 1000


@register(
    "x67_dedup_clusters_distributed",
    _duck_clusters_sql(f"(SELECT * FROM documents WHERE doc_id < {CC_SLICE})"),
    "the same near-dup cluster rollup as x26, forced through the "
    "distributed label-propagation branch (small_graph_threshold=0) -- "
    "the code path a >1M-edge graph takes at 100 TB -- over a bounded "
    "corpus slice (the branch is the subject; full-corpus pair mining is "
    "x26's job).  Oracle: the same recursive-CTE closure over the "
    "identical slice",
)
def x67_clusters_distributed(spark, sf_dir) -> DataFrame:
    from .dedup import shared_minhash_pairs

    pairs = shared_minhash_pairs(spark, sf_dir, limit=CC_SLICE, threshold=0.5)
    cc = connected_components(pairs, small_graph_threshold=0)
    cl = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sort_array(F.collect_list("doc_id")).alias("members"),
    )
    return cl.select(
        "cluster_id",
        "n_members",
        F.array_join(
            F.transform("members", lambda x: x.cast("string")), ","
        ).alias("members"),
    )


# -- canonical-document selection (the "prune" half of dedup) ----------------


def keep_best_per_cluster(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """One canonical document per near-dup cluster: the member with the
    highest heuristic quality score (ties broken by lowest id).  This is
    the step that turns a cluster map into a deduplicated corpus -- near-dup
    pipelines don't keep an arbitrary member, they keep the best one.

    Scale notes: ``clusters`` is the skinny (doc_id, cluster_id) relation;
    the join pulls only (id, text) long enough to score it, and the text
    dies before the per-cluster reduction -- only (cluster_id, doc_id, q)
    shuffles.  The reduction is an AGGREGATION, not a rank window: argmax
    over (q, id) is ``max(struct(q, -id))`` for numeric ids (one
    HashAggregate with map-side partial combine), and a max-q
    aggregate + tie join-back + min-id aggregate otherwise.  A window
    would funnel a whole cluster's rows through one task -- near-dup
    clusters are small when the threshold is sane, but a degenerate
    threshold (or an adversarial corpus) forms giant components, and the
    r4 verdict flagged that as the one unprotected hot key in the repo.
    Partial aggregation is the salting pattern with the salt managed by
    the engine: every task combines its local rows first, so per-task
    input stays bounded no matter how large one cluster grows (pinned by
    the degenerate-threshold test in tests/test_round4d_ops.py).
    """
    from pyspark.sql.types import NumericType

    from ..functions.text import quality_score

    scored = clusters.join(
        docs.select(id_col, F.round(quality_score(), 6).alias("q")), id_col
    )
    id_type = scored.schema[id_col].dataType
    if isinstance(id_type, NumericType):
        # single skew-immune aggregate: lexicographic struct max gives
        # highest q, then (via negation) lowest id on ties
        best = F.max(
            F.struct(F.col("q"), (-F.col(id_col)).alias("nid"))
        ).alias("best")
        return (
            scored.groupBy("cluster_id")
            .agg(best, F.count(F.lit(1)).alias("n_members"))
            .select(
                "cluster_id",
                (-F.col("best.nid")).cast(id_type).alias("kept_doc"),
                F.col("best.q").alias("kept_quality"),
                F.col("n_members").cast("long").alias("n_members"),
            )
        )
    # non-numeric ids: max-q + members aggregate, join back on the (few)
    # tied rows, min-id aggregate -- three partial-combining shuffles,
    # still no per-key task funnel
    # eager localCheckpoint, not persist(): both the tops aggregate and
    # the tie-break join read this relation, and a persist() here would
    # leak CacheManager entries across repeated invocations in one
    # session (the checkpointed RDD is GC-released with the DataFrame)
    scored = scored.select(
        "cluster_id", F.col(id_col).alias("__id"), "q"
    ).localCheckpoint(eager=True)
    tops = scored.groupBy("cluster_id").agg(
        F.max("q").alias("kept_quality"),
        F.count(F.lit(1)).alias("n_members"),
    )
    return (
        scored.join(
            tops.withColumnRenamed("cluster_id", "__tc"),
            (F.col("cluster_id") == F.col("__tc"))
            & (F.col("q") == F.col("kept_quality")),
        )
        .groupBy("cluster_id", "kept_quality", "n_members")
        .agg(F.min("__id").alias("kept_doc"))
        .select(
            "cluster_id",
            "kept_doc",
            "kept_quality",
            F.col("n_members").cast("long").alias("n_members"),
        )
    )


def _duck_keep_best_sql(docs: str = "documents") -> str:
    # ``docs`` parameterizes only the pair-mining corpus (see _duck_mh_sigs);
    # the quality-scoring join stays keyed on the labeled srcs, which are a
    # subset of the slice by construction.
    from ..functions.text import _duck_quality

    from .dedup import _duck_mh_sigs

    return (
        "WITH RECURSIVE pairs AS ("
        f" SELECT doc_a, doc_b FROM ({_duck_mh_sigs(docs)}) q),"
        " edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs"
        "  UNION SELECT doc_b, doc_a FROM pairs),"
        " reach(src, dst) AS (SELECT u, u FROM edges"
        "  UNION SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),"
        " labeled AS (SELECT src, MIN(dst) AS cluster_id FROM reach GROUP BY src),"
        " scored AS (SELECT l.cluster_id, l.src AS doc_id,"
        f"  round({_duck_quality()}, 6) AS q"
        "  FROM labeled l JOIN documents d ON d.doc_id = l.src),"
        " ranked AS (SELECT cluster_id, doc_id, q,"
        "  row_number() OVER (PARTITION BY cluster_id ORDER BY q DESC, doc_id) AS rn,"
        "  COUNT(*) OVER (PARTITION BY cluster_id) AS n_members FROM scored)"
        " SELECT cluster_id, doc_id AS kept_doc, q AS kept_quality,"
        " CAST(n_members AS BIGINT) AS n_members FROM ranked WHERE rn = 1"
    )


@register(
    "x50_keep_best_per_cluster",
    _duck_keep_best_sql(f"(SELECT * FROM documents WHERE doc_id < {CC_SLICE})"),
    "canonical-doc selection: per near-dup cluster keep the highest-quality "
    "member (the prune step that produces the deduplicated corpus), over "
    "the bounded CC_SLICE corpus -- the subject is the skew-immune prune "
    "aggregation, not the pair mining x26 proves at full scale",
)
def x50_keep_best(spark, sf_dir) -> DataFrame:
    from .dedup import shared_minhash_pairs

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < CC_SLICE)
    pairs = shared_minhash_pairs(spark, sf_dir, limit=CC_SLICE, threshold=0.5)
    return keep_best_per_cluster(d, connected_components(pairs))
