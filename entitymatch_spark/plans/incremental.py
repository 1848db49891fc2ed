"""Batch-incremental record linkage: grow a matched corpus without
rescoring it.

At 10^12-document scale (BASELINE.json north_star) the corpus is never
re-matched from scratch — a crawl lands as a batch of new pages and the
pipeline must (a) score only pairs that TOUCH the batch, (b) leave
every already-scored old-old pair alone, and (c) update cluster ids
only for clusters the new matches actually reach. This module does
exactly that over a persisted :class:`MatchState`.

Per-batch cost (B = batch docs, C = corpus docs):

- blocking keys: O(B) narrow column work (token keys + the MinHash
  fold are per-row expressions, zero shuffle);
- old-side lookups: ONE semi-join of the corpus key table against the
  batch's distinct keys (``save_state(key_buckets=)`` persists that
  table hash-bucketed by ``key``, so the corpus side needs no shuffle
  — plan-asserted) — never a scan of old pairs;
- scoring: only new-new and new-old candidate pairs, through the same
  Arrow scorer as the full pipeline;
- clustering: connected components over (new match edges ∪ the star
  edges of AFFECTED prior clusters only) — clusters untouched by any
  new edge keep their rows verbatim via an anti-join.

Exactness contract (tested in tests/test_incremental_batch.py and
value-checked against the full-recompute DuckDB oracle by the
``incremental_match`` contract query): with the IDF dictionary held
fixed (an external snapshot passed to :func:`initial_state` — the
realistic deployment, where the dictionary comes from a reference
corpus and is refreshed on its own cadence, NOT from each batch),

    incremental_match(initial_state(base), batch).state.clusters
        == match_pipeline(base ∪ batch).clusters

row for row, PROVIDED no blocking key crosses the ``max_block`` purge
cap between the base and the union corpus (blocks only ever gain
members; a key that crosses would retroactively purge base-base pairs
the incremental run has already matched — transitive clustering is
monotone and never retracts). New pairs are purged at UNION block
sizes, exactly like the full run: the semi-join pulls every old member
of each batch-touched key, so the single-pass block expansion sees the
whole block.

The reference has no incremental mode (TestMatcher/Program.cs rebuilds
its index per run); this implements the north_star's "resumes without
rescoring completed partitions" requirement at the corpus-growth level.

Relation to streaming/incremental.py: the streaming function of the
same name scores a micro-batched page STREAM against a static indexed
corpus (stream-vs-static joins, no cluster updates); this module is
the batch form that also grows the state — keys, docs, and merged
cluster ids — with a provable full-recompute equivalence.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entitymatch_spark.operators.clustering import assign_clusters, connected_components
from entitymatch_spark.operators.posting import (
    collect_idf_map,
    collect_idf_map_bounded,
)
from entitymatch_spark.operators.scoring import score_pairs
from entitymatch_spark.plans.pipeline import (
    MatchConfig,
    match_pipeline,
    prepare_docs,
)


@dataclass
class MatchState:
    """The persisted artifacts a grown corpus carries between batches.

    ``keys`` is the RAW (un-purged) blocking-key table: the purge cap
    is a property of a block's CURRENT size, so it is re-evaluated per
    batch over union blocks, never baked into the state.
    """

    docs: DataFrame      # (doc_id, norm_text, tokens)
    keys: DataFrame      # (doc_id, key) — raw, pre-purge
    idf: DataFrame       # (token, df, idf) — frozen external dictionary
    clusters: DataFrame  # (doc_id, cluster_id), cluster_id = min member id
    cfg: MatchConfig
    # (id_a, id_b, features..., score): every candidate pair ever
    # scored. Optional — carrying it makes recalibration FREE of the
    # Arrow scorer: a new threshold or blend re-derives matches with
    # pure column math over this table (see rethreshold()). Disjoint
    # across batches by construction: a pair is generated only when a
    # block gains its first batch member, and both endpoints are
    # corpus members from the next batch on (old-old pairs are never
    # re-emitted).
    scored: DataFrame | None = None
    # The state's MATCH PREDICATE when it is not the affine blend: set
    # by rethreshold(model=...) to the CalibratedModel whose logistic
    # blend + probability threshold decided ``clusters``. Every edge
    # re-derivation over ``scored`` (incremental_match, remove_docs,
    # upsert_pages — see _match_edges) applies it, so grown/shrunk
    # clusters stay coherent with the recalibrated ones instead of
    # silently mixing model-derived and affine-derived components.
    # NOT persisted by save_state (the model is the caller's versioned
    # artifact); re-attach after load_state with dataclasses.replace.
    match_model: object | None = None
    # Set by load_state: where this state was read from. save_state
    # refuses that same target — overwrite mode truncates each table
    # before the plan that still reads it executes (state destroyed).
    source_path: str | None = None
    # False once an in-memory mutation (remove_docs, rethreshold)
    # diverges this state from its stored tables: commit_increment's
    # append-only delta commit would silently skip that mutation, so
    # it refuses and directs to save_state on a fresh target.
    storage_synced: bool = True


def _match_edges(state: "MatchState", scored: DataFrame) -> DataFrame:
    """The state's match predicate over a scored-pair frame: the
    calibrated model when the state carries one, else the affine
    ``score >= cfg.threshold`` cut."""
    if state.match_model is not None:
        return state.match_model.matches(scored)
    return scored.filter(F.col("score") >= state.cfg.threshold)


@dataclass
class IncrementalResult:
    state: MatchState     # the grown state (docs/keys/clusters updated)
    new_docs: DataFrame   # prepared batch docs
    new_keys: DataFrame   # the batch's blocking keys — the keys-table delta
    pairs: DataFrame      # candidate pairs touching the batch
    scored: DataFrame     # pairs + features + score — the scored-table delta
    matches: DataFrame    # scored >= threshold
    # the clusters-table delta pair: prior clusters a new edge reached
    # (cluster_id) and their recomputed rows (doc_id, cluster_id) —
    # what commit_increment() deletes and appends on Iceberg
    affected_clusters: DataFrame
    cluster_changed: DataFrame
    # False when the result retired stored rows (upsert_pages): the
    # deltas are then not append-only and commit_increment() refuses
    append_only: bool = True

    def unpersist(self) -> None:
        """Drop this result's cached frames (``new_docs``, ``pairs`` —
        persisted when cfg.cache). A long-lived driver looping
        incremental_match over many batches should call this after
        committing each batch, or dead cached partitions accumulate in
        executor storage for the session's lifetime."""
        for df in (self.new_docs, self.pairs):
            try:
                df.unpersist()
            except Exception:
                pass


def initial_state(
    pages: DataFrame, cfg: MatchConfig | None = None, idf: DataFrame | None = None
) -> MatchState:
    """Full pipeline over the starting corpus, packaged as a state.

    ``idf``: the external dictionary all subsequent batches will be
    scored under. None computes it from ``pages`` — fine operationally,
    but then a later full recompute (which would see batch tokens in
    its own IDF) is no longer the bit-exact oracle of the incremental
    result; pass a fixed snapshot when that equivalence matters.
    """
    cfg = cfg or MatchConfig()
    res = match_pipeline(pages, cfg, idf=idf)
    return MatchState(
        docs=res.docs, keys=res.keys, idf=res.idf,
        clusters=res.clusters, cfg=cfg, scored=res.scored,
    )


def _batch_keys(new_docs: DataFrame, state: MatchState) -> DataFrame:
    # THE pipeline key construction (plans.pipeline.blocking_keys) —
    # the incremental == full-recompute exactness contract REQUIRES
    # batch keys built exactly like full-run keys, so this must not be
    # a hand copy that can drift
    from entitymatch_spark.plans.pipeline import blocking_keys

    return blocking_keys(new_docs, state.idf, state.cfg)


def incremental_match(state: MatchState, new_pages: DataFrame) -> IncrementalResult:
    """Match a batch of new pages against the state without touching
    old-old pairs. See the module docstring for cost and exactness."""
    cfg = state.cfg
    new_docs = prepare_docs(new_pages, cfg)
    if cfg.cache:
        new_docs = new_docs.persist()

    new_keys = _batch_keys(new_docs, state)

    # Blocks that can produce a NEW pair are exactly the blocks holding
    # >= 1 batch doc. The semi-join pulls every old member of those
    # keys, so block sizes (and therefore the max_block purge) are
    # evaluated at UNION size — identical to a full recompute.
    batch_block_keys = new_keys.select("key").distinct()
    old_in_blocks = state.keys.join(batch_block_keys, "key", "semi")
    sub = old_in_blocks.withColumn("is_new", F.lit(False)).unionByName(
        new_keys.withColumn("is_new", F.lit(True))
    )
    if cfg.oversize_policy == "prepurge":
        # bound the collect buffers below BEFORE grouping (same dial as
        # candidate_pairs): count-first at UNION size, broadcast the
        # few oversized keys, anti-join them away — identical output to
        # the post-collect purge filter, bounded reduce memory
        oversized = (
            sub.groupBy("key")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > cfg.max_block)
            .select("key")
        )
        sub = sub.join(F.broadcast(oversized), "key", "left_anti")
    # Asymmetric single-pass block expansion: each block's members are
    # collected into separate old/new lists and only new x old plus
    # new x new pairs are generated — a block of k old + b new members
    # emits b*k + b(b-1)/2 rows instead of the (k+b)^2/2 a generic
    # expansion-then-filter would (measured: a uniform 10% batch at
    # bench scale touches nearly EVERY block, so the filter form
    # regenerated ~all old-old pairs only to drop them — the whole
    # blocking stage's cost for a tenth of the output). Purge is
    # evaluated on the combined size, so it still matches the full
    # run; n_keys counts one per shared block, exactly like
    # candidate_pairs.
    blocks = (
        sub.groupBy("key")
        .agg(
            F.collect_list(F.when(F.col("is_new"), F.col("doc_id"))).alias("new_ids"),
            F.collect_list(F.when(~F.col("is_new"), F.col("doc_id"))).alias("old_ids"),
        )
        .filter(
            (F.size("new_ids") >= 1)
            & ((F.size("new_ids") + F.size("old_ids")) >= 2)
            & ((F.size("new_ids") + F.size("old_ids")) <= cfg.max_block)
        )
    )
    # Both pair kinds come out of ONE chained expansion: each new
    # member pairs with every old member plus the new members greater
    # than itself (the a<b half of new x new). Chaining the explodes
    # keeps the plan LINEAR over `blocks` — a union of two explode
    # branches references `blocks` twice and Spark re-executes the
    # whole semi-join + groupBy subtree per branch (measured: the
    # executed plan contained the entire blocking chain twice; fusing
    # cut the warm pairs leg ~2x).
    pairs = (
        blocks.select("old_ids", "new_ids", F.explode("new_ids").alias("n"))
        .select(
            "n",
            F.explode(
                F.concat(
                    F.col("old_ids"),
                    F.filter("new_ids", lambda b: b > F.col("n")),
                )
            ).alias("m"),
        )
        .select(F.least("n", "m").alias("id_a"), F.greatest("n", "m").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_keys"))
    )
    if cfg.score_partitions is not None:
        n_part = (
            4 * new_pages.sparkSession.sparkContext.defaultParallelism
            if cfg.score_partitions == "auto"
            else int(cfg.score_partitions)
        )
        # same layout as the full pipeline: hash by id_a + local sort
        # keeps the Arrow scorer's per-doc profile memo hot (see the
        # measured rationale in plans/pipeline.py).
        pairs = pairs.repartition(n_part, "id_a").sortWithinPartitions("id_a", "id_b")
    if cfg.cache:
        pairs = pairs.persist()

    # Hydration runs against the full doc table: the scorer's equi-joins
    # on id_a/id_b already touch only docs that appear in a pair, so a
    # prune-first semi-join would just add a pass (measured: a semi-join
    # "optimization" here cost 9.8s vs 3.7s without, re-evaluated once
    # per hydration side). At 10^12 docs, bucket the stored docs table
    # by doc_id AND hydrate the old and batch sides separately — this
    # union voids the bucketed scan's output partitioning (a union's
    # partitioning is unknown), so joining docs_union pays a docs-side
    # shuffle that a split hydration against the bucketed scan itself
    # would not. Locally the docs side broadcasts and the union form
    # is both simpler and measured-equal.
    docs_union = state.docs.unionByName(new_docs)

    if cfg.idf_max_entries is not None:
        idf_map, default_idf = collect_idf_map_bounded(state.idf, cfg.idf_max_entries)
    else:
        idf_map, default_idf = collect_idf_map(state.idf), 1e-5
    scored = score_pairs(
        pairs, docs_union, idf_map,
        weights=cfg.weights, lev_prefix=cfg.lev_prefix,
        cascade_min_jaccard=cfg.cascade_min_jaccard,
        default_idf=default_idf,
    )
    # the STATE's predicate (model when recalibrated, else affine) so
    # grown clusters stay coherent with the stored ones
    matches = _match_edges(state, scored)

    clusters, affected, changed = _merge_clusters(state.clusters, matches, new_docs)

    new_state = MatchState(
        docs=docs_union,
        keys=state.keys.unionByName(new_keys),
        idf=state.idf,
        clusters=clusters,
        cfg=cfg,
        scored=(
            state.scored.unionByName(scored) if state.scored is not None else None
        ),
        match_model=state.match_model,
        source_path=state.source_path,
        storage_synced=state.storage_synced,
    )
    return IncrementalResult(
        state=new_state, new_docs=new_docs, new_keys=new_keys, pairs=pairs,
        scored=scored, matches=matches,
        affected_clusters=affected, cluster_changed=changed,
    )


def _merge_clusters(
    prior: DataFrame, matches: DataFrame, new_docs: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fold new match edges into prior clusters, touching only clusters
    a new edge reaches.

    Prior clusters enter connected components as STAR edges
    (member -> cluster_id): stars preserve both connectivity and the
    component minimum (cluster_id IS the min member id), so CC over
    (affected stars ∪ new edges) reproduces the full-graph components
    for the affected subgraph — in ~1 round, since stars are already
    collapsed. Unaffected clusters never enter the plan: their rows
    pass through an anti-join verbatim.

    ``matches`` sits atop the whole blocking + Arrow-scoring chain and
    is referenced by several branches here (endpoints, affected set,
    CC input) — each branch would re-execute that chain, so the edge
    set is materialized ONCE with an eager localCheckpoint (it is
    small: matched pairs only). ``affected`` gets the same cut: it is
    read by three branches and sits atop a scan of ``prior``.
    ``prior`` itself is deliberately NOT cached — at corpus scale it
    is a stored table, and the few narrow scans of it here are the
    honest cost (measured: without these two cuts the bench's
    incremental leg re-ran the scorer 4x, 63s for a batch whose
    single-pass cost is a few seconds).
    """
    new_edges = matches.select("id_a", "id_b").localCheckpoint(eager=True)
    endpoint_ids = (
        new_edges.select(F.col("id_a").alias("doc_id"))
        .unionByName(new_edges.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    affected = (
        prior.join(endpoint_ids, "doc_id", "semi")
        .select("cluster_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    affected_members = prior.join(affected, "cluster_id", "semi")
    stars = affected_members.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias("id_a"), F.col("cluster_id").alias("id_b")
    )
    components = connected_components(
        stars.unionByName(new_edges), src="id_a", dst="id_b"
    )
    changed_ids = affected_members.select("doc_id").unionByName(
        new_docs.select("doc_id")
    )
    changed = assign_clusters(changed_ids, components)
    unchanged = prior.join(affected, "cluster_id", "left_anti")
    return unchanged.unionByName(changed), affected, changed


# --- state persistence -------------------------------------------------

_PARTS = ("docs", "keys", "idf", "clusters")


def _state_target(path: str, part: str) -> str:
    from entitymatch_spark.sources.readers import is_table_name

    return f"{path}_{part}" if is_table_name(path) else f"{path}/{part}"


def save_state(state: MatchState, path: str, *, key_buckets: int | None = None) -> None:
    """Persist the state's tables under ``path``.

    ``path`` follows the sources.readers convention: a filesystem path
    writes one parquet dir per part; a catalog name prefix (e.g.
    ``db.match_state``) writes Iceberg/catalog tables
    ``db.match_state_docs`` etc. through write_table — on Iceberg each
    save is an atomic snapshot commit, which is also what lets a real
    deployment save in place (the parquet form needs a fresh dir; see
    the CLI's --state-out note).

    ``key_buckets`` (catalog targets only) hash-buckets the ``keys``
    table by ``key``. This is THE standing-state layout decision at
    10^12 docs: every batch's old-side lookup is one semi-join of the
    standing key table (O(corpus) rows, ~10^13 keys) against the
    batch's distinct keys — bucketed, the standing side's scan already
    satisfies the join's required distribution, so Spark Exchanges
    only the batch side and the standing table NEVER moves across the
    network (plan-asserted in tests/test_incremental_batch.py). Pick
    the bucket count once, for the standing table's target partition
    size (e.g. 10^13 keys / 2^14 buckets ≈ 600M keys ≈ a few GB per
    bucket); every later batch reuses it. Keep it >= the session's
    ``spark.sql.shuffle.partitions``: below that, Spark's
    DisableUnnecessaryBucketedScan judges the bucketed read an
    under-parallelized loss and re-shuffles BOTH sides (observed at
    4 buckets vs 8 shuffle partitions) — never a constraint at scale,
    where the bucket count is in the thousands.

    ``clusters`` is an iterative result (connected components), so the
    write doubles as its durable materialization — the natural batch
    boundary a nightly-crawl job commits at.

    ``scored`` (when the state carries it) persists alongside — it is
    what makes post-hoc recalibration free of the Arrow scorer (see
    rethreshold()). States saved before the table existed (or built
    without it) load with ``scored=None``.
    """
    from entitymatch_spark.sources.readers import is_table_name, write_table

    if key_buckets is not None and not is_table_name(path):
        raise ValueError(
            "key_buckets= needs a catalog-name path (bucket metadata "
            f"lives in the metastore); got {path!r}"
        )
    if state.source_path is not None and str(path) == str(state.source_path):
        raise ValueError(
            f"save_state cannot overwrite the state's own source "
            f"({path!r}): overwrite truncates each table before the plan "
            "that still reads it executes, destroying the state mid-save. "
            "Write to a fresh target and swap."
        )
    # persist the CONFIG with the tables: a state built under
    # non-default blocking parameters reloaded with MatchConfig()
    # silently computes batch keys in the wrong key space (missed
    # old-new matches, no error). One row of JSON, via the same
    # write_table path so catalog targets work too.
    import json as _json
    from dataclasses import asdict

    spark = state.docs.sparkSession
    cfg_df = spark.createDataFrame(
        [(_json.dumps(asdict(state.cfg)),)], "cfg_json string"
    )
    write_table(cfg_df, _state_target(path, "cfg"))
    for part in _PARTS:
        kw = (
            {"buckets": key_buckets, "bucket_by": "key"}
            if part == "keys" and key_buckets is not None
            else {}
        )
        write_table(getattr(state, part), _state_target(path, part), **kw)
    if state.scored is not None:
        write_table(state.scored, _state_target(path, "scored"))


def _fs_path_exists(spark: SparkSession, p: str) -> bool:
    """Existence check through Hadoop's FileSystem API, so it answers
    for WHATEVER filesystem the path names (s3a://, hdfs://, file://,
    bare local) — a driver-local ``pathlib.Path.exists()`` is always
    False for remote URIs, which would silently load ``scored=None``
    from a state that has the table."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(p)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def load_state(
    spark: SparkSession, path: str, cfg: MatchConfig | None = None
) -> MatchState:
    """Load a :func:`save_state` save. ``match_model`` is NOT persisted
    (the calibrated model is the caller's versioned artifact): a state
    recalibrated with rethreshold(model=...) loads with the affine
    predicate — re-attach the model with ``dataclasses.replace(state,
    match_model=m)`` before growing or deleting from it."""
    from entitymatch_spark.sources.readers import is_table_name, read_pages

    dfs = {part: read_pages(spark, _state_target(path, part)) for part in _PARTS}

    def _part_exists(part: str) -> bool:
        t = _state_target(path, part)
        return (
            spark.catalog.tableExists(t)
            if is_table_name(path)
            else _fs_path_exists(spark, f"{path}/{part}")
        )

    scored = (
        read_pages(spark, _state_target(path, "scored"))
        if _part_exists("scored")
        else None
    )
    if cfg is None and _part_exists("cfg"):
        # the saved config travels with the state (save_state writes
        # it); an explicit cfg argument still wins. Unknown keys from a
        # newer writer are dropped rather than crashing the load.
        import json as _json
        from dataclasses import fields as _dc_fields

        raw = _json.loads(
            read_pages(spark, _state_target(path, "cfg")).collect()[0]["cfg_json"]
        )
        known = {f.name for f in _dc_fields(MatchConfig)}
        cfg = MatchConfig(**{k: v for k, v in raw.items() if k in known})
    return MatchState(
        cfg=cfg or MatchConfig(), scored=scored, source_path=str(path), **dfs
    )


def commit_increment(result: IncrementalResult, path: str) -> None:
    """Commit an :func:`incremental_match` result IN PLACE at ``path``
    with O(batch) writes — the nightly-crawl commit.

    :func:`save_state` rewrites every table: O(corpus) per batch, which
    at 10^12 docs dwarfs the batch's own compute. The grow step is
    append-only everywhere except clusters, so this commits:

    - ``docs`` / ``keys`` / ``scored``: APPEND the batch deltas
      (``new_docs``, ``new_keys``, ``scored``) — O(batch);
    - ``idf``: untouched — it is the frozen external dictionary the
      state was built under (see :func:`initial_state`);
    - ``clusters``: the one table with in-place mutations. On a catalog
      with row-level deletes (Iceberg), DELETE the affected clusters'
      rows and APPEND their recomputed rows — O(affected clusters).
      CAVEAT: the DELETE and APPEND are two separate commits, not one
      transaction — a driver failure between them leaves the affected
      clusters' rows missing until the batch is recommitted from a
      re-derived result. A deployment wanting single-commit semantics
      should replace the pair with one Iceberg ``MERGE INTO`` (row-level
      upsert in one snapshot); this module keeps the two-verb form
      because the sandbox catalog has no MERGE support to test against.
      The session catalog and parquet dirs have no row-level ops, so
      they fall back to one full overwrite of the clusters table from
      a materialized plan — still O(corpus), but clusters is the
      narrowest table (two ids per doc) and it is the ONLY table that
      pays it; on Iceberg nothing does.

    Ordering is load-bearing: every delta is materialized (eager
    ``localCheckpoint``) BEFORE the first write, because the result's
    plans lazily re-scan the stored tables this function mutates —
    e.g. appending batch docs to the stored docs table before the
    scored delta ran would hydrate batch pairs against doubled rows.
    The deltas are O(batch)-sized, so the cuts are cheap; the parquet
    fallback additionally materializes the merged clusters table.

    Only valid for a result produced by ``incremental_match`` over the
    state as stored at ``path``. :func:`upsert_pages` results RETIRE
    stored rows (their deltas are not append-only) and refuse here —
    commit those with :func:`save_state` to a fresh target, or with
    engine row-level ops once the deployment has them.
    """
    from pyspark.errors import AnalysisException

    from entitymatch_spark.sources.readers import is_table_name, write_table

    if not result.append_only:
        raise ValueError(
            "result retired stored rows (upsert_pages); commit_increment "
            "is append-only — use save_state to a fresh target"
        )
    if not result.state.storage_synced:
        raise ValueError(
            "the result's base state diverged from storage (remove_docs "
            "or rethreshold mutated it in memory after load): an "
            "append-only delta commit would silently skip that mutation "
            "— save_state the full state to a fresh target instead"
        )
    new_docs = result.new_docs.localCheckpoint(eager=True)
    new_keys = result.new_keys.localCheckpoint(eager=True)
    # the scored delta is only written when the state carries the table
    # — don't pay its eager materialization (a full hydration + Arrow
    # pass) for a state built without scored persistence
    scored = (
        result.scored.localCheckpoint(eager=True)
        if result.state.scored is not None
        else None
    )
    spark = new_docs.sparkSession

    clusters_t = _state_target(path, "clusters")
    committed_clusters = False
    if is_table_name(path):
        # affected/cluster_changed are already checkpointed or sit atop
        # checkpointed frames in _merge_clusters; cut them here anyway —
        # the DELETE below mutates the table their lineage references.
        affected = result.affected_clusters.localCheckpoint(eager=True)
        changed = result.cluster_changed.localCheckpoint(eager=True)
        view = "em_commit_affected_clusters"
        affected.createOrReplaceTempView(view)
        try:
            spark.sql(
                f"DELETE FROM {clusters_t} WHERE cluster_id IN "
                f"(SELECT cluster_id FROM {view})"
            )
            write_table(changed, clusters_t, mode="append")
            committed_clusters = True
        except AnalysisException as exc:
            # only the capability gap falls back (session-catalog V1
            # tables have no row-level ops); anything else is a real
            # error — same narrowing discipline as readers.write_table
            cond = (
                exc.getCondition()
                if hasattr(exc, "getCondition")
                else exc.getErrorClass()
            ) or ""
            if not (
                "UNSUPPORTED_FEATURE" in cond
                or "supports_delete" in str(exc)
                or "DELETE is only supported with v2 tables" in str(exc)
            ):
                raise
        finally:
            spark.catalog.dropTempView(view)
    if not committed_clusters:
        # no row-level ops: one full overwrite, from a materialized
        # plan (the lazy merged plan reads the table being replaced)
        write_table(
            result.state.clusters.localCheckpoint(eager=True), clusters_t
        )

    write_table(new_docs, _state_target(path, "docs"), mode="append")
    write_table(new_keys, _state_target(path, "keys"), mode="append")
    if scored is not None:
        write_table(scored, _state_target(path, "scored"), mode="append")


def rethreshold(
    state: MatchState,
    threshold: float | None = None,
    weights: dict[str, float] | None = None,
    model=None,
) -> MatchState:
    """Re-derive matches and clusters from the stored scored-pair table
    WITHOUT re-running blocking or the Arrow scorer.

    Recalibration is the routine operational event this exists for:
    ``operators.calibrate.calibrate_from_labeled_pairs`` hands back a
    new threshold (or a whole new blend over the same five features),
    and applying it is pure column math over ``state.scored`` plus one
    connected-components pass over the resulting edge set. Candidate
    generation is threshold-independent, so the result equals a full
    pipeline re-run at the new setting row for row (value-checked by
    the ``rethreshold_clusters`` contract query; same purge-cap caveat
    as the module contract). Cost at 10^12 docs: one scan of the
    stored scored-pair table + CC over the matches — no doc-table,
    key-table, or Python touch.

    Exactly one calibration shape:
      - ``threshold``: new cut on the existing affine ``score``;
      - ``weights`` (+ optional ``threshold``): re-blend the stored
        feature columns, cut at the new/current threshold;
      - ``model``: an ``operators.calibrate.CalibratedModel`` — its
        logistic blend and probability threshold decide the matches
        (``state.cfg`` keeps the affine settings; the model is the
        caller's artifact to version).

    Retention dial: the scored table is the recalibration asset and
    grows with every batch. If recalibration below some floor will
    never happen, persist ``state.scored.filter(score >= floor)``
    before save_state — every rethreshold at or above the floor stays
    exact (re-BLENDS need the full table: a new weighting can lift a
    pair from any score).
    """
    if state.scored is None:
        raise ValueError(
            "state carries no scored-pair table (loaded from a save made "
            "before scored persistence existed?); rethreshold needs it"
        )
    if model is not None:
        if threshold is not None or weights is not None:
            raise ValueError("pass either model= or threshold=/weights=, not both")
        cfg = state.cfg
        scored = state.scored
        matches = model.matches(scored)
    else:
        from dataclasses import replace

        cfg = replace(
            state.cfg,
            threshold=state.cfg.threshold if threshold is None else threshold,
            weights=dict(state.cfg.weights if weights is None else weights),
        )
        scored = state.scored
        if weights is not None:
            blend = sum(
                (F.col(k) * F.lit(w) for k, w in cfg.weights.items()), F.lit(0.0)
            )
            scored = scored.withColumn("score", blend)
        matches = scored.filter(F.col("score") >= cfg.threshold)
    components = connected_components(
        matches.select("id_a", "id_b"), src="id_a", dst="id_b"
    )
    clusters = assign_clusters(state.docs.select("doc_id"), components)
    # record the predicate that decided these clusters: the model rides
    # the state so later grow/delete re-derivations (_match_edges) stay
    # coherent; a threshold/weights recalibration RESETS to affine —
    # cfg now carries the new blend
    return MatchState(
        docs=state.docs, keys=state.keys, idf=state.idf,
        clusters=clusters, cfg=cfg, scored=scored,
        match_model=model,
        source_path=state.source_path,
        storage_synced=False,  # stored clusters no longer match
    )


def remove_docs(state: MatchState, doc_ids: DataFrame) -> MatchState:
    """Delete docs from the state without rescoring anything — the
    take-down / expired-crawl half of the state lifecycle
    (incremental_match grows it, this shrinks it).

    ``doc_ids``: one-column DataFrame of ids to drop (column name is
    taken as the id; extra columns rejected to catch mistakes).

    Every table shrinks by anti-join; clusters are re-derived ONLY for
    clusters that lose a member: surviving match edges inside those
    clusters (pure column math over the stored scored-pair table — no
    blocking, no Arrow scorer) go through one connected-components
    pass, and every untouched cluster's rows pass through an anti-join
    verbatim. Cost at 10^12 docs: anti-joins against a broadcastable
    delete set + CC over the affected subgraph only.

    Exactness (mirror of the module's grow-side contract, same frozen
    IDF requirement): ``remove_docs(state, D).clusters ==
    match_pipeline(corpus \\ D).clusters`` row for row, PROVIDED no
    blocking key crosses the ``max_block`` purge cap DOWNWARD — blocks
    only lose members on delete, and a block purged in the original
    run that falls back under the cap would contribute pairs the state
    never scored (the full run would score them). Tested in
    tests/test_incremental_batch.py including min-member deletion
    (cluster ids re-anchor to the new min) and whole-cluster deletion.
    """
    if state.scored is None:
        raise ValueError(
            "state carries no scored-pair table; remove_docs re-derives "
            "surviving match edges from it (rescoring nothing)"
        )
    if len(doc_ids.columns) != 1:
        raise ValueError(f"doc_ids must be one column, got {doc_ids.columns}")
    cfg = state.cfg
    gone = (
        doc_ids.select(F.col(doc_ids.columns[0]).alias("doc_id"))
        .distinct()
        .localCheckpoint(eager=True)  # read by 5 anti/semi branches
    )
    gone_a = gone.select(F.col("doc_id").alias("id_a"))
    gone_b = gone.select(F.col("doc_id").alias("id_b"))

    docs = state.docs.join(gone, "doc_id", "anti")
    keys = state.keys.join(gone, "doc_id", "anti")
    scored = (
        state.scored.join(gone_a, "id_a", "anti").join(gone_b, "id_b", "anti")
    )

    prior = state.clusters
    affected = (
        prior.join(gone, "doc_id", "semi")
        .select("cluster_id")
        .distinct()
        .localCheckpoint(eager=True)  # read by 2 branches, sits atop prior
    )
    # Remaining members of affected clusters. Surviving match edges are
    # intra-cluster by construction (matches are transitively connected),
    # so membership of id_a alone decides whether an edge is affected.
    remaining = (
        prior.join(affected, "cluster_id", "semi")
        .join(gone, "doc_id", "anti")
        .select("doc_id")
    )
    edges = (
        _match_edges(state, scored)  # model-aware: must equal the
        # predicate that decided the stored clusters (see MatchState)
        .select("id_a", "id_b")
        .join(remaining.withColumnRenamed("doc_id", "id_a"), "id_a", "semi")
    )
    components = connected_components(edges, src="id_a", dst="id_b")
    changed = assign_clusters(remaining, components)
    unchanged = prior.join(affected, "cluster_id", "left_anti")
    return MatchState(
        docs=docs, keys=keys, idf=state.idf,
        clusters=unchanged.unionByName(changed), cfg=cfg, scored=scored,
        match_model=state.match_model,
        source_path=state.source_path,
        storage_synced=False,  # stored rows were retired in memory only
    )


def upsert_pages(state: MatchState, pages: DataFrame) -> IncrementalResult:
    """Re-crawl upsert: pages whose id already exists in the state are
    REPLACED (their old text, keys, scored pairs, and cluster edges are
    retired), then the whole batch is matched in as new — equal to a
    full recompute over ``(corpus \\ re-crawled ids) ∪ batch`` under
    the same frozen-IDF + purge-cap contracts as remove_docs and
    incremental_match. This is the nightly-crawl shape for a corpus
    keyed by url: the same url at a newer ``warc_ts`` supersedes.
    """
    from dataclasses import replace

    idc = state.cfg.id_col
    # dedup WITHIN the batch first: a nightly crawl can carry the same
    # url twice — unfiltered, both copies match in as new docs and the
    # state gains duplicate doc_id rows every later batch compounds.
    # Newest warc_ts wins (the exact "supersedes" promise), ties broken
    # by text hash for determinism; without a warc_ts column duplicate
    # ids are ambiguous, so refuse loudly.
    if "warc_ts" in pages.columns:
        from pyspark.sql import Window

        order = [F.desc("warc_ts")]
        if state.cfg.text_col in pages.columns:
            order.append(F.desc(F.md5(F.col(state.cfg.text_col))))
        w = Window.partitionBy(idc).orderBy(*order)
        pages = (
            pages.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    elif (
        pages.groupBy(idc).count().filter(F.col("count") > 1).limit(1).count()
        > 0
    ):
        raise ValueError(
            f"batch contains duplicate {idc!r} values and no warc_ts "
            "column to pick the newest — dedup the batch first"
        )

    ids = pages.select(F.col(idc).alias("doc_id"))
    present = state.docs.join(ids, "doc_id", "semi").select("doc_id")
    res = incremental_match(remove_docs(state, present), pages)
    # the remove leg retired stored rows: this result's deltas are not
    # append-only relative to the stored state — commit via save_state
    return replace(res, append_only=False)
