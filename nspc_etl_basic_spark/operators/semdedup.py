"""SemDeDup-style SEMANTIC deduplication over an embedding column: the
curation stage that removes *meaning-level* duplicates MinHash/LSH text
dedup cannot see (translations, paraphrases, templated rewrites), per
Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540).

The published recipe: k-means-cluster the corpus embeddings, then
within each cluster mark pairs above a cosine threshold as semantic
duplicates and keep ONE representative per duplicate group. Clustering
is what makes the quadratic pair step tractable — pairs are only ever
formed INSIDE a cluster, so the cost is sum over clusters of |cell|^2
instead of |corpus|^2.

Engine mapping (every stage an existing, oracle-proven primitive):

1. ``train_ivf_centroids`` (operators/similarity.py) — fixed-point
   integer Lloyd iterations, so the trained codebook is bit-identical
   cross-engine and a DuckDB oracle replays it;
2. cell assignment is a pure PROJECTION (the codebook rides the plan as
   literals — no shuffle, no join; same contract as ``ivf_topk``);
3. within-cell candidate pairs: ONE self-equi-join keyed by the 8-byte
   cell id, ``id_a < id_b``, exact round-6 cosine >= threshold — the
   same verify arithmetic as ``embedding_neardup``;
4. duplicate groups: ``neardup_components`` min-label propagation with
   pointer jumping (pairs never cross cells, so components are
   cell-local by construction — the iteration runs on the candidate
   graph, never the corpus);
5. keep rule: the group's MINIMUM id survives (deterministic; the
   paper keeps a random/centroid-farthest member — min-id is the
   engine-wide tie rule and equally valid for dedup semantics).

100 TB stance: the embedding payload is touched by exactly two corpus
passes (training partials + assignment projection) and ONE shuffle (the
cell-keyed self-join); propagation shuffles only (id, label) pairs of
the candidate graph. ``n_cells`` must grow with the corpus — the paper
uses tens of thousands of clusters at web scale so each cell holds
O(10^4) vectors and the in-cell quadratic stays bounded; 16 cells is
the test-scale setting, not the production one. A degenerate cell
(zero vectors, saturated embeddings) concentrating the self-join is the
same hot-key shape as LSH's ``max_bucket_size`` guard — cap cells with
``max_cell_size`` when the embedding distribution is untrusted.

Reference parity: no counterpart in /root/reference — extension surface
(LLM-pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nspc_etl_basic_spark.operators.dedup import (
    components_onepass,
    incremental_components,
)
from nspc_etl_basic_spark.operators.similarity import (
    _ivf_cells_sorted,
    dot,
    norm,
    train_ivf_centroids,
)

__all__ = [
    "auto_n_cells",
    "semantic_contaminated_ids",
    "semantic_decontaminate",
    "semantic_dedup",
    "semantic_dedup_incremental",
]

# Default in-cell population the auto n_cells derivation targets. The
# paper's web-scale runs keep cells at O(10^4) vectors; 1024 keeps the
# per-cell quadratic at ~1M cosine verifies per cell (task-sized on any
# executor) while matching the measured sf1 lever (n_cells ∝ n: 64
# cells cut the sf1 wall 170.7 s -> 155 s, and the win grows with n).
DEFAULT_TARGET_CELL_SIZE = 1024


def auto_n_cells(n: int, target_cell_size: int = DEFAULT_TARGET_CELL_SIZE) -> int:
    """Corpus-derived cell count: ``max(16, n // target_cell_size)`` —
    n_cells must GROW with the corpus or the in-cell quadratic does
    (SemDeDup trains tens of thousands of clusters at web scale). The
    16 floor keeps toy corpora from degenerating to one cell."""
    if target_cell_size < 1:
        raise ValueError(
            f"target_cell_size must be >= 1, got {target_cell_size}"
        )
    return max(16, int(n) // int(target_cell_size))


def _assign_cells(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, __v, __n, cell): frozen-codebook cell assignment — a pure
    projection (the codebook rides the plan as literals)."""
    return df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
        norm(F.col(vec_col)).alias("__n"),
    ).select(
        id_col,
        "__v",
        "__n",
        F.element_at(
            _ivf_cells_sorted(F.col("__v"), centroids, F.col("__n")), 1
        )["cent_id"].alias("cell"),
    )


def semantic_dedup(
    emb: DataFrame,
    n_cells: int | None = None,
    n_iter: int = 3,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    max_cell_size: int | None = None,
    target_cell_size: int = DEFAULT_TARGET_CELL_SIZE,
    train_fraction: float | None = None,
    train_salt: str = "semdedup_train",
    corpus_count: int | None = None,
) -> DataFrame:
    """One row per input vector: ``(id_col, cell, group_id, keep)``
    where ``cell`` is the trained-k-means cluster, ``group_id`` is the
    minimum id in the vector's semantic-duplicate group (connected
    component of the within-cell cosine >= threshold graph; singletons
    map to themselves), and ``keep`` marks the group representative —
    filtering on ``keep`` IS the SemDeDup corpus.

    Pass ``centroids`` to reuse an already-trained codebook (e.g. the
    one IVF search trained); otherwise ``train_ivf_centroids`` runs
    here with the engine's fixed-point determinism contract.
    ``max_cell_size`` drops cells larger than the cap BEFORE the
    self-join (dropped vectors keep cell/group/keep semantics as
    singletons) — the hot-key guard for degenerate clusterings.

    Scale-safe defaults (both levers MEASURED at the sf1 stress tier,
    SCALE.md): with ``n_cells=None`` the cell count derives from the
    corpus — ``auto_n_cells(count, target_cell_size)`` — so the
    in-cell quadratic stays bounded as the corpus grows instead of
    relying on caller discipline; ``train_fraction`` trains the
    codebook on a deterministic hash-sample of the corpus (the
    standard k-means practice — codebook quality saturates long before
    full-corpus coverage) while assignment still covers every vector.
    The sample is ``hash_bucket``-membership (pure projection,
    engine-replayable), so sampled training keeps the determinism
    contract: same data, same codebook, any partitioning.

    CHANGED in round 10 — ``n_cells`` default went ``16`` -> ``None``
    (auto). Two consequences a default-arg caller must know: (1) the
    auto path runs an eager ``emb.count()`` Spark action at PLAN-BUILD
    time (pass ``corpus_count`` when the size is already known — e.g.
    from an upstream count or a table statistic — and no extra action
    runs); (2) for corpora past ~16k vectors the derived cell count
    GROWS with n, so a default-arg call clusters at a different — and
    deliberately scale-correct — granularity than the old fixed 16;
    pass ``n_cells=16`` explicitly to reproduce pre-round-10 output.
    ``corpus_count`` is trusted as given. It feeds ``auto_n_cells``,
    so a stale count yields a different derived cell count and
    therefore a different (still valid) clustering granularity and
    group labeling — the determinism contract holds for the VALUE
    actually passed, not across different values. Pass the true count
    wherever an oracle or replay derives ``n_cells`` from it.
    """
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    # `is None`, not truthiness: an empty codebook from a caller that
    # expected reuse must raise, never silently retrain (retraining
    # would unfreeze cell boundaries behind the caller's back)
    if centroids is None:
        if n_cells is None:
            n = corpus_count if corpus_count is not None else emb.count()
            n_cells = auto_n_cells(n, target_cell_size)
        train = emb
        if train_fraction is not None:
            from nspc_etl_basic_spark.operators.sampling import hash_sample

            train = hash_sample(emb, id_col, train_fraction, train_salt)
        cents = train_ivf_centroids(
            train, n_cells=n_cells, n_iter=n_iter, vec_col=vec_col,
            id_col=id_col,
        )
    elif not centroids:
        raise ValueError("centroids was provided but is empty")
    else:
        cents = centroids
    assigned = _assign_cells(emb, cents, id_col, vec_col)
    # materialize the assignment ONCE: three consumers read it (both
    # self-join branches and the final group attach), and the n_cells
    # higher-order-fold scoring is the dominant compute — recomputing
    # it per consumer measured 1.6x the whole operator's wall at sf1.
    # localCheckpoint (not cache): lineage is cut so the CC fixpoint's
    # plans stay graph-sized, and ContextCleaner frees the blocks when
    # the result goes out of scope (the corpus_quality_select pattern).
    assigned = assigned.localCheckpoint(eager=True)
    pairable = assigned
    if max_cell_size is not None:
        w = Window.partitionBy("cell")
        pairable = (
            assigned.withColumn("__csz", F.count(F.lit(1)).over(w))
            .filter(F.col("__csz") <= max_cell_size)
            .drop("__csz")
        )
    a = pairable.select(
        F.col(id_col).alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
        "cell",
    )
    b = pairable.select(
        F.col(id_col).alias("id_b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
        "cell",
    )
    cos = F.round(
        dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 6
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("cell", "id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
    # duplicate groups in ONE grouped-Arrow union-find pass keyed by the
    # cell (round 12): pairs never cross cells, so components are
    # cell-local by construction and the generic O(log diameter)
    # min-label fixpoint (a dozen-job iteration) is pure overhead here —
    # components_onepass computes the identical min-id-per-component
    # labels fully distributed (one shuffle keyed by cell, per-task work
    # bounded by the cell-size bound). Singletons take the left-join
    # coalesce instead of the fixpoint's union pass — same rows out.
    comps = components_onepass(pairs, id_col=id_col, key_col="cell").select(
        F.col(id_col), F.col("component_id").alias("group_id")
    )
    return (
        assigned.select(id_col, "cell")
        .join(comps, id_col, "left")
        .select(
            id_col,
            F.col("cell").cast("long").alias("cell"),
            F.coalesce(F.col("group_id"), F.col(id_col))
            .cast("long")
            .alias("group_id"),
            (
                F.col(id_col)
                == F.coalesce(F.col("group_id"), F.col(id_col))
            ).alias("keep"),
        )
    )


def semantic_dedup_incremental(
    base: DataFrame,
    batch: DataFrame,
    existing_labels: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    base_assigned: DataFrame | None = None,
) -> DataFrame:
    """Continuous-ingest SemDeDup: merge a NEW embedding batch into
    EXISTING semantic-duplicate groups without recomputing the corpus
    fixpoint — the same incremental story the text tier already has
    (``incremental_lsh_pairs`` + ``incremental_components``), now for
    the embedding tier. Returns ``(id_col, cell, group_id, keep)`` for
    EVERY vector, existing and new.

    ``centroids`` must be the base run's FROZEN codebook (coarse
    quantizers are trained once and reused — retraining per batch
    would move cell boundaries and silently change which pairs are
    even candidates); ``existing_labels`` is the base run's
    ``(id_col, group_id)`` output. ``base`` and ``batch`` must be
    id-DISJOINT: a re-ingested id already lives in ``base`` /
    ``existing_labels`` (where ``incremental_components`` contracts it
    to its existing component and stays idempotent) — feeding it
    through ``batch`` as well would emit its cell row twice. Under that contract the result is
    EXACTLY the from-scratch ``semantic_dedup(base ∪ batch,
    centroids=centroids)`` (pinned by tests/test_semdedup.py): the
    batch contributes batch-batch and batch-base within-cell pairs,
    and base-base connectivity is already encoded in the labels, so
    ``incremental_components``' contraction argument applies verbatim
    (group ids are min member ids, the invariant contraction needs).

    Scale: the batch assignment is a projection over the BATCH; the
    only corpus-proportional work is re-deriving the base assignment
    projection for the batch-base candidate join and the final cell
    attach. At production scale persist the base run's ASSIGNED frame
    — ``(id_col, __v float64-cast vector, __n norm, cell)``, exactly
    ``_assign_cells``' output — and hand it in as ``base_assigned``:
    the base is then never re-projected through the codebook fold (the
    per-plan cost of that n_cells × dim expression is what dominates a
    warm incremental run), and ``base`` is ignored. The caller owns
    the invariant that ``base_assigned`` equals
    ``_assign_cells(base, centroids)`` for the SAME frozen codebook —
    a stale or foreign assignment silently changes which pairs are
    candidates (the entry-side asset cache keys it on source+code
    identity for exactly this reason). The candidate joins key on the
    8-byte cell id with the BATCH side broadcast; the fixpoint runs on
    the contracted batch graph only; the corpus-sized label table is
    scanned exactly twice against broadcast batch-sized sides
    (the ``incremental_components`` contract)."""
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if base_assigned is not None:
        base_a = base_assigned.select(id_col, "__v", "__n", "cell")
    else:
        base_a = _assign_cells(base, centroids, id_col, vec_col)
    # the batch is read by three consumers (two pair joins + the cell
    # attach) and is small by definition — materialize once
    batch_a = _assign_cells(batch, centroids, id_col, vec_col)
    batch_a = batch_a.localCheckpoint(eager=True)

    def _side(df: DataFrame, suffix: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"id_{suffix}"),
            F.col("__v").alias(f"__v{suffix}"),
            F.col("__n").alias(f"__n{suffix}"),
            "cell",
        )

    cos = F.round(
        dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 6
    )
    batch_batch = (
        _side(batch_a, "a")
        .join(_side(batch_a, "b"), "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
    # batch x base: orientation is irrelevant to the component merge;
    # the batch side is broadcast so the corpus never shuffles
    batch_base = (
        F.broadcast(_side(batch_a, "a"))
        .join(_side(base_a, "b"), "cell")
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
    pairs = batch_batch.unionByName(batch_base).select("id_a", "id_b")
    labels = incremental_components(
        batch_a.select(id_col),
        pairs,
        existing_labels.select(
            F.col(id_col), F.col("group_id").alias("component_id")
        ),
        id_col=id_col,
    )
    cells = base_a.select(id_col, "cell").unionByName(
        batch_a.select(id_col, "cell")
    )
    return cells.join(labels, id_col).select(
        id_col,
        F.col("cell").cast("long").alias("cell"),
        F.col("component_id").cast("long").alias("group_id"),
        (F.col(id_col) == F.col("component_id")).alias("keep"),
    )


def semantic_contaminated_ids(
    corpus_emb: DataFrame,
    eval_emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str | None = None,
) -> DataFrame:
    """SEMANTIC benchmark decontamination: one row per corpus vector
    whose embedding sits within the cosine threshold of ANY held-out
    eval-set embedding — ``(id_col, n_eval_hits, max_cos_sim)``. This
    is the embedding-tier twin of ``decontaminate.contaminated_ids``:
    word-n-gram overlap cannot see a PARAPHRASED or translated benchmark
    item (zero shared 5-grams), but its embedding still lands next to
    the eval item's — exactly the leak SemDeDup's machinery detects.
    Published pipelines run both sweeps (n-gram for verbatim leakage,
    embedding-similarity for semantic leakage) before training.

    The sweep is CELL-LOCAL, never all-pairs: both sides assign to the
    same FROZEN coarse codebook (a pure projection — the codebook rides
    the plan as literals), and only same-cell (corpus, eval) pairs are
    cosine-verified with the eval side broadcast — eval sets are
    benchmark-suite-sized, so per-corpus-row work is
    |eval ∩ cell|-sized and the corpus never shuffles. An eval item
    whose near-paraphrase fell in a NEIGHBORING cell is missed — the
    same boundary approximation semantic_dedup itself makes; raise
    coverage by probing with a finer codebook or a lower
    ``target_cell_size`` upstream, not by widening this join.

    ``centroids`` must be frozen (train once on the corpus, reuse for
    every eval sweep) so repeated sweeps are comparable; passing an
    empty codebook raises (the semantic_dedup reuse contract).
    ``eval_id_col`` defaults to ``id_col``; corpus and eval ids may
    overlap — identity is never used to prune, only geometry.
    """
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if not centroids:
        raise ValueError("centroids must be a non-empty frozen codebook")
    c = _assign_cells(corpus_emb, centroids, id_col, vec_col)
    e = _assign_cells(
        eval_emb, centroids, eval_id_col or id_col, vec_col
    ).select(
        F.col("__v").alias("__ev"),
        F.col("__n").alias("__en"),
        "cell",
    )
    cos = F.round(
        dot(F.col("__v"), F.col("__ev")) / (F.col("__n") * F.col("__en")), 6
    )
    return (
        c.join(F.broadcast(e), "cell")
        .select(id_col, cos.alias("__cs"))
        .filter(F.col("__cs") >= threshold)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_hits"),
            F.max("__cs").alias("max_cos_sim"),
        )
    )


def semantic_decontaminate(
    corpus: DataFrame,
    corpus_emb: DataFrame,
    eval_emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.3,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus minus semantically contaminated documents — the
    embedding-tier twin of ``decontaminate.decontaminate``: flag ids
    with :func:`semantic_contaminated_ids` over ``corpus_emb`` (rows
    keyed ``vec_id_col`` == the corpus ``id_col``), then drop them with
    a broadcast LEFT ANTI join (the flagged set is bounded by the
    eval-adjacent population — small by construction; the corpus never
    shuffles)."""
    bad = semantic_contaminated_ids(
        corpus_emb, eval_emb, centroids, threshold,
        id_col=vec_id_col, vec_col=vec_col,
    ).select(F.col(vec_id_col).alias(id_col))
    return corpus.join(F.broadcast(bad), id_col, "left_anti")
