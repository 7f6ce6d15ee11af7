"""The flagship scan pipeline: files -> findings (+ clusters).

Logical DAG (the Ray-Data-first re-expression of the reference's
sequential in-memory pipeline, core/pipeline.py:91-255):

    read_parquet(files)                       # columns pruned at read
      -> map_batches(add_content_sha256)      # per-row invariant
      -> map_batches(extract_units)           # flat-map, stateless
      -> map_batches(generate_snippets)       # flat-map, stateless
      -> map_batches(SignatureStage, actors)  # stateful actor pool
      [checkpoint: signatures]
      -> map_batches(explode_bands)           # 1 row -> num_bands rows
      -> groupby(band_key).map_groups(emit_pairs)     # THE shuffle
      -> groupby(a_id,b_id).map_groups(first)          # pair dedup
      -> join(signatures as a_*) -> join(signatures as b_*)
      -> map_batches(verify_pairs)            # exact Jaccard + filters
      [checkpoint: pairs]
      -> groupby(pair_key).map_groups(rollup) # finding aggregation
      [checkpoint: findings]
      -> union-find clustering (driver; hash-min loop at scale)
      [checkpoint: clusters]                   # labelled findings

Only ids/hashes/shingle arrays cross the shuffles — raw ``content`` /
``text`` columns never enter a wide stage (SURVEY.md §7 "wide rows").
"""

from __future__ import annotations

from dataclasses import dataclass, field

import ray.data

from clonehunter_ray.config import EngineConfig
from clonehunter_ray.stages import clustering as C
from clonehunter_ray.stages.candidates import (
    add_pair_partition_column,
    add_partition_column,
    dedupe_pairs_partition,
    emit_pairs_partition,
    explode_bands,
)
from clonehunter_ray.stages.extract import add_content_sha256, extract_units_batch
from clonehunter_ray.stages.signatures import SignatureStage
from clonehunter_ray.stages.snippets import generate_snippets_batch
from clonehunter_ray.stages.verify import verify_pairs_batch
from clonehunter_ray.state import checkpoint as ckpt

# columns each join side must carry into verification
_JOIN_PAYLOAD = [
    "snippet_id",
    "kind",
    "unit_id",
    "path",
    "qualified_name",
    "unit_start",
    "unit_end",
    "start_line",
    "end_line",
    "shingles",
    "tokens",
    "n_shingles",
    "n_tokens",
]


def _apply_shuffle_strategy(config: EngineConfig, band_rows: int) -> None:
    """Pick the band exchange's sort-shuffle implementation
    (ExecConfig.shuffle_strategy): push-based once the estimated band
    volume would overflow the object store and go spill-I/O-bound
    (measured 3.3x at 1.6M files, BASELINE.md round 5), pull-based
    below it where push costs a few percent. Session-level knob — Ray
    Data has no per-operator strategy — and auto only ever UPGRADES
    the session to push (never silently downgrades a push session)."""
    mode = getattr(config.exec, "shuffle_strategy", "auto")
    if mode == "pull":
        return
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    if mode == "push" or (
        mode == "auto" and band_rows > config.exec.push_shuffle_band_rows
    ):
        ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED


def _join_payload(config: EngineConfig) -> list[str]:
    # token_seq (ordered token hashes) only rides the shuffle when the
    # suffix-array substring rescue needs it
    if config.substring.enabled:
        return _JOIN_PAYLOAD + ["token_seq"]
    return _JOIN_PAYLOAD


@dataclass
class ScanResult:
    files: "ray.data.Dataset"
    units: "ray.data.Dataset"
    snippets: "ray.data.Dataset"
    signatures: "ray.data.Dataset"
    pairs: "ray.data.Dataset"
    findings: "ray.data.Dataset"
    cluster_map: dict[str, int] = field(default_factory=dict)
    stats: dict = field(default_factory=dict)
    # run-metrics actor handle: holding it here ties the actor's life
    # to the result, so lineage re-execution of a pairs block AFTER
    # scan() returns still reaches a live actor (killing it inside
    # scan() failed those tasks with RayActorError)
    metrics_actor: object = None


def _prefixed(
    ds: "ray.data.Dataset", prefix: str, cols: list[str]
) -> "ray.data.Dataset":
    def _rename(t):
        t = t.select(cols)
        return t.rename_columns([f"{prefix}{c}" for c in cols])

    return ds.map_batches(_rename, batch_format="pyarrow")


def build_prefix(
    files_ds: "ray.data.Dataset", config: EngineConfig
) -> tuple["ray.data.Dataset", "ray.data.Dataset", "ray.data.Dataset"]:
    """files -> (hashed, units, snippets): the narrow, embarrassingly-
    parallel chain, built ONCE and shared by build_signatures and the
    ScanResult surfaces (a second parallel definition of the same chain
    previously lived in scan() — confusing and rot-prone)."""
    hashed = files_ds.map_batches(add_content_sha256, batch_format="pyarrow")
    if config.include_langs:
        import pyarrow as pa
        import pyarrow.compute as pc

        langs = pa.array(sorted(config.include_langs), pa.string())
        hashed = hashed.map_batches(
            lambda t: t.filter(pc.is_in(t["lang"], value_set=langs)),
            batch_format="pyarrow",
        )
    units = hashed.map_batches(extract_units_batch, batch_format="pyarrow")
    snippets = units.map_batches(
        generate_snippets_batch,
        fn_kwargs={"window": config.window},
        batch_format="pyarrow",
        batch_size=config.exec.file_batch_size,
    )
    return hashed, units, snippets


def build_signatures(
    files_ds: "ray.data.Dataset",
    config: EngineConfig,
    prefix: tuple | None = None,
) -> "ray.data.Dataset":
    """files -> signatures (the narrow half; ``prefix`` reuses an
    already-built (hashed, units, snippets) chain)."""
    hashed, _units, snippets = prefix or build_prefix(files_ds, config)
    from clonehunter_ray.util import auto_actor_count

    n_actors = config.exec.signature_actors
    if n_actors <= 0:  # auto: the fused chain should own the cluster
        n_actors = auto_actor_count()
    concurrency: int | tuple[int, int] = n_actors
    if config.expansion.enabled:
        # EXP call-expansion snippets (per-repo-local groupby; off by
        # default like the reference, config.py:16). Materialized before
        # the union: the groupby's sort stage and the signature actor
        # pool deadlock when they compete for CPUs inside one plan.
        from clonehunter_ray.stages.expansion import generate_exp_snippets

        snippets = snippets.union(
            generate_exp_snippets(hashed, config.expansion).materialize()
        )
        # the union breaks task->actor operator fusion, so the upstream
        # task chain needs CPU slots WHILE the pool holds its minimum;
        # an autoscaling (1, N) pool keeps the min reservation at one
        # actor and avoids starving the feeder tasks on small clusters.
        concurrency = (1, n_actors)
    return snippets.map_batches(
        SignatureStage,
        fn_constructor_kwargs={
            "config": config.signature,
            "emit_token_seq": config.substring.enabled,
        },
        concurrency=concurrency,
        # the fused files->signatures operator bundles tasks by ITS
        # INPUT rows (files); a small bundle keeps task count >> actor
        # count so the pool actually fills (observed: 2048 capped a
        # 20k-file corpus at 10 tasks regardless of actors)
        batch_size=config.exec.file_batch_size,
        batch_format="pyarrow",
    )


def build_pairs(
    signatures: "ray.data.Dataset",
    config: EngineConfig,
    metrics=None,
) -> "ray.data.Dataset":
    """signatures -> verified pairs (the wide half: LSH shuffle, then
    payload attachment by broadcast lookup or partitioned hash join).

    Below ``broadcast_signatures_limit`` snippets the payload table is
    broadcast ONCE and the band shuffle moves (band_key:u64, sid:i32)
    rows — ~12 bytes instead of a ~64-byte snippet-id string, the
    pipeline's dominant shuffle volume. Above the limit, string ids
    flow and two partitioned hash joins attach the payloads.
    """
    cap = config.signature.max_bucket_pairs_full
    limit = config.exec.broadcast_signatures_limit
    payload_cols = _join_payload(config)

    n_sigs = signatures.count()
    band_rows = n_sigs * config.signature.num_bands
    _apply_shuffle_strategy(config, band_rows)
    nparts = config.exec.shuffle_partitions
    if not nparts:
        # autoscale the band exchange with the corpus: fixed counts go
        # superlinear when per-partition band rows outgrow the target
        # (see ExecConfig.shuffle_target_rows)
        nparts = int(
            max(
                64,
                min(
                    4096,
                    -(-band_rows // max(1, config.exec.shuffle_target_rows)),
                ),
            )
        )

    if limit and n_sigs <= limit:
        return _pairs_broadcast(
            signatures, config, cap, nparts, payload_cols, metrics
        )

    # scale path: string ids + partitioned hash joins
    bands = (
        signatures.select_columns(["snippet_id", "band_keys"])
        .map_batches(explode_bands, batch_format="pyarrow")
        .map_batches(
            add_partition_column,
            fn_kwargs={"num_partitions": nparts},
            batch_format="pyarrow",
        )
    )
    candidates = bands.groupby("part").map_groups(
        lambda g: emit_pairs_partition(
            g,
            cap,
            skew_mode=config.signature.skew_mode,
            salt_rounds=config.signature.salt_rounds,
            metrics=metrics,
        ),
        batch_format="pyarrow",
    )
    deduped = candidates.map_batches(
        add_pair_partition_column,
        fn_kwargs={"num_partitions": nparts},
        batch_format="pyarrow",
    ).groupby("part").map_groups(
        dedupe_pairs_partition, batch_format="pyarrow"
    )

    # narrow pre-gate joins (kind + sizes only, ~20 bytes/row) so the
    # HEAVY payload joins (shingle/token blobs) move only gate
    # survivors — the scale-path twin of the broadcast path's
    # pre_gate_pairs_indexed
    from clonehunter_ray.stages.candidates import pre_gate_pairs_joined
    from clonehunter_ray.util import safe_join, safe_join_partitions

    th = config.thresholds
    narrow_cols = ["snippet_id", "kind", "n_shingles", "n_tokens"]

    # zero candidate pairs (clone-free corpus above the broadcast
    # cutover) leave the join's left sequence globally empty, which
    # crashes Ray's hash join (util.left_attach_or_nulls documents the
    # mechanism); the pair table is ids-only and capped by the banding
    # accountant, so the gating materialize is cheap
    from clonehunter_ray.stages.verify import PAIRS_SCHEMA

    deduped = deduped.materialize()
    n_pairs = deduped.count()
    if n_pairs == 0:
        return ray.data.from_arrow(PAIRS_SCHEMA.empty_table())

    # semi-join prune: only snippet ids that appear in a surviving
    # band pair can contribute to ANY of the four joins below, and the
    # pair table is capped by the banding accountant while signatures
    # are corpus-scale (measured 400k files: 157k pairs vs 2.83M
    # signature rows — the joins were shipping 89% dead payload). The
    # distinct id set broadcasts once via plasma; above the limit
    # (ids no longer broadcastable) the prune is skipped and the
    # joins run unpruned exactly as before.
    if n_pairs <= config.exec.pair_id_prune_limit:
        import pyarrow as pa
        import pyarrow.compute as pc

        # per-block local unique FIRST (a combiner: band-duplicated ids
        # collapse in the workers), then one C-speed Arrow hash-unique
        # over the collected remainder — no driver-side Python-object
        # sort (np.unique on an object array compared ~40M strings
        # element-by-element at the 20M-pair limit)
        def _block_ids(t: pa.Table) -> pa.Table:
            both = pa.chunked_array(
                [t["a_id"].combine_chunks(), t["b_id"].combine_chunks()]
            )
            return pa.table({"snippet_id": pc.unique(both)})

        id_parts = [
            t
            for t in ray.get(
                deduped.select_columns(["a_id", "b_id"])
                .map_batches(_block_ids, batch_format="pyarrow")
                .to_arrow_refs()
            )
            if t.num_rows
        ]
        paired_ids = pc.unique(pa.concat_tables(id_parts)["snippet_id"])
        ids_ref = ray.put(paired_ids)

        def _only_paired(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            wanted = ray.get(ids_ref)
            return t.filter(pc.is_in(t["snippet_id"], value_set=wanted))

        # ONE filter pass, materialized: the four joins below each
        # consume the signature side, and feeding them through four
        # lazy filter chains re-streamed the full payload per join
        # (measured: the heavy joins DOUBLED, 39.7 -> 83.8 s). The
        # pruned table is pair-bounded (~11% of signatures at 400k
        # files), so pinning it is cheap and every join reads the
        # small blocks directly from plasma.
        signatures = signatures.map_batches(
            _only_paired, batch_format="pyarrow", batch_size=8192
        ).materialize()

    nj = safe_join_partitions(nparts)
    gated = (
        safe_join(
            safe_join(
                deduped,
                _prefixed(signatures, "a_", narrow_cols),
                "inner", nj, on=("a_id",), right_on=("a_snippet_id",),
            ),
            _prefixed(signatures, "b_", narrow_cols),
            "inner", nj, on=("b_id",), right_on=("b_snippet_id",),
        )
        .map_batches(
            pre_gate_pairs_joined,
            fn_kwargs={
                "gates": (th.func, th.win, th.exp),
                "lexical_weight": th.lexical_weight,
                "lexical_min_ratio": th.lexical_min_ratio,
                "substr_floor": (
                    config.substring.floor if config.substring.enabled else None
                ),
            },
            batch_format="pyarrow",
        )
        .select_columns(["a_id", "b_id", "capped"])
    )
    joined = _attach_payload_join(
        gated, signatures, config, payload_cols, nparts=nparts
    )
    return joined.map_batches(
        verify_pairs_batch,
        fn_kwargs={
            "thresholds": config.thresholds,
            "substring": config.substring,
        },
        batch_format="pyarrow",
    )


def _pairs_broadcast(
    signatures: "ray.data.Dataset",
    config: EngineConfig,
    cap: int,
    nparts: int,
    payload_cols: list[str],
    metrics=None,
) -> "ray.data.Dataset":
    """Broadcast path: int-sid band shuffle + Table.take payload attach.

    The payload never funnels through the driver: the materialized
    signature BLOCKS stay in the object store (``to_arrow_refs``) and
    each worker process assembles (table, id->row index) once, caching
    it per broadcast key (plasma reads are zero-copy; concat_tables
    only chains chunk references).
    """
    import numpy as np
    import pyarrow as pa

    from clonehunter_ray.stages.candidates import (
        dedupe_pairs_partition_indexed,
        emit_pairs_packed_partition,
        explode_bands_packed,
        make_broadcast_handle,
    )

    # combine ONCE in a task: the combined table lands in plasma a
    # single time and every worker maps it zero-copy (per-worker
    # combining copied the payload into every worker heap). A split
    # light/heavy handle pair was A/B-tested and is NOT faster: the
    # heavy blob combine runs late and contends with the pipeline,
    # while the single combine (num_cpus=0, starts the moment the
    # signature blocks exist) overlaps for free.
    ref = make_broadcast_handle(signatures, payload_cols, "snippet_id")

    # packed band shuffle: each explode task pre-splits its band rows
    # by part and ships P blob rows, so the groupby sort handles
    # thousands of fat rows instead of millions of 12-byte rows (the
    # per-row sort machinery was the slowest, worst-scaling pairs
    # operator — 19 s at 100k files / 16 CPUs; see
    # candidates.explode_bands_packed)
    packed = signatures.select_columns(
        ["snippet_id", "band_keys"]
    ).map_batches(
        explode_bands_packed,
        fn_kwargs={"index_ref": ref, "num_partitions": nparts},
        batch_format="pyarrow",
    )
    candidates = packed.groupby("part").map_groups(
        lambda g: emit_pairs_packed_partition(
            g,
            cap,
            skew_mode=config.signature.skew_mode,
            salt_rounds=config.signature.salt_rounds,
            metrics=metrics,
        ),
        batch_format="pyarrow",
    )

    # numpy size/kind pre-gate runs BEFORE the global pair dedup: a
    # clone pair collides in ~12 bands (measured dup factor 11.7x at
    # 20k files), and the gate is a pure mask over broadcast int
    # columns whose verdict is identical for every duplicate — gating
    # first shrinks the dedup shuffle's input ~13x (emit output ->
    # gate survivors), where gating after only shrank the attach.
    from clonehunter_ray.stages.candidates import pre_gate_pairs_indexed

    th = config.thresholds
    candidates = candidates.map_batches(
        pre_gate_pairs_indexed,
        fn_kwargs={
            "index_ref": ref,
            "gates": (th.func, th.win, th.exp),
            "lexical_weight": th.lexical_weight,
            "lexical_min_ratio": th.lexical_min_ratio,
            "substr_floor": (
                config.substring.floor if config.substring.enabled else None
            ),
        },
        batch_format="pyarrow",
    )
    deduped = candidates.map_batches(
        lambda t: t.append_column(
            "part",
            pa.array(
                (
                    (
                        t["a_sid"].to_numpy(zero_copy_only=False).astype(np.uint64)
                        * np.uint64(0x9E3779B97F4A7C15)
                        ^ t["b_sid"].to_numpy(zero_copy_only=False).astype(np.uint64)
                    )
                    % np.uint64(nparts)
                ).astype(np.int64),
                pa.int64(),
            ),
        ),
        batch_format="pyarrow",
    ).groupby("part").map_groups(
        dedupe_pairs_partition_indexed, batch_format="pyarrow"
    )

    def _attach(batch: pa.Table) -> pa.Table:
        from clonehunter_ray.stages.candidates import get_broadcast_payload

        table, _idx = get_broadcast_payload(ref, need_index=False)
        a_idx = batch["a_sid"].to_numpy(zero_copy_only=False).astype(np.int64)
        b_idx = batch["b_sid"].to_numpy(zero_copy_only=False).astype(np.int64)
        a_side = table.take(pa.array(a_idx, pa.int64()))
        b_side = table.take(pa.array(b_idx, pa.int64()))
        cols: dict[str, pa.Array] = {
            "a_id": a_side["snippet_id"],
            "b_id": b_side["snippet_id"],
            "capped": batch["capped"],
        }
        for cname in payload_cols:
            if cname == "snippet_id":
                continue
            cols[f"a_{cname}"] = a_side[cname]
            cols[f"b_{cname}"] = b_side[cname]
        return pa.table(cols)

    return deduped.map_batches(_attach, batch_format="pyarrow").map_batches(
        verify_pairs_batch,
        fn_kwargs={
            "thresholds": config.thresholds,
            "substring": config.substring,
        },
        batch_format="pyarrow",
    )


def _attach_payload_join(
    deduped: "ray.data.Dataset",
    signatures: "ray.data.Dataset",
    config: EngineConfig,
    payload_cols: list[str],
    nparts: int | None = None,
) -> "ray.data.Dataset":
    """Scale path: two partitioned hash joins pull each side's
    signature payload onto the pair rows. ``nparts`` carries the
    corpus-autoscaled band partition count from build_pairs — the
    payload side is the corpus-sized signature table, so it must scale
    with the same driver (a fixed 16 here would hold ~1/16 of a
    corpus-scale blob table per join aggregator)."""
    from clonehunter_ray.util import safe_join, safe_join_partitions

    nparts = safe_join_partitions(
        nparts or config.exec.shuffle_partitions or 16
    )
    sig_a = _prefixed(signatures, "a_", payload_cols)
    sig_b = _prefixed(signatures, "b_", payload_cols)
    return safe_join(
        safe_join(
            deduped, sig_a, "inner", nparts,
            on=("a_id",), right_on=("a_snippet_id",),
        ),
        sig_b, "inner", nparts, on=("b_id",), right_on=("b_snippet_id",),
    )


def build_findings(
    pairs: "ray.data.Dataset", config: EngineConfig
) -> "ray.data.Dataset":
    """Partitioned rollup: hash(pair_key) -> P groups, every pair group
    processed inside its partition pass (stages/rollup.py — avoids one
    Ray-level UDF call per function pair, which is millions at scale)."""
    from clonehunter_ray.stages.rollup import add_rollup_partition, rollup_partition

    thresholds = config.thresholds
    # rollup input is VERIFIED pairs — bounded by the banding
    # accountant (cap x buckets), orders below the band-row volume the
    # band exchange autoscales for. 64 partitions holds to ~10^8
    # verified pairs (~1.5M/partition); past that set
    # exec.shuffle_partitions explicitly (it feeds this and the
    # cluster-attach join).
    nparts = config.exec.shuffle_partitions or 64
    return (
        pairs.map_batches(
            add_rollup_partition,
            fn_kwargs={"num_partitions": nparts},
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(
            lambda g: rollup_partition(g, thresholds), batch_format="pyarrow"
        )
    )


def _tally_rows(batch, metrics=None, counter: str = "rows"):
    """Pass-through batch map that counts rows into the run's metrics
    actor — lets a lazy (streamed) stage report its cardinality without
    a materialize barrier. Task retries can double-count; the counter
    is a run statistic, not a correctness input."""
    from clonehunter_ray.state import metrics as M

    M.report_metrics(metrics, {counter: batch.num_rows})
    return batch


def scan(
    files_ds: "ray.data.Dataset",
    config: EngineConfig | None = None,
    checkpoint_dir: str | None = None,
) -> ScanResult:
    """Run the full pipeline; heavy intermediates are checkpointed to
    ``checkpoint_dir`` (or materialized in the object store when None).
    """
    import time

    from clonehunter_ray.state import metrics as M

    config = config or EngineConfig()
    config.validate()
    fp = config.fingerprint()
    root = checkpoint_dir or config.exec.checkpoint_dir

    # per-run shared counters (capped LSH buckets etc.) live in a
    # zero-CPU actor whose HANDLE rides the UDF closures
    metrics_handle = M.new_metrics_actor()
    _log = None
    if config.exec.log_progress:
        from clonehunter_ray.progress import get_logger, log_stage

        _log = get_logger()
    timing: dict[str, float] = {}
    ckpt_stats: dict[str, str] = {}
    t_start = time.monotonic()

    hashed, units, snippets = build_prefix(files_ds, config)

    t0 = time.monotonic()
    signatures = ckpt.checkpoint_or_compute(
        lambda: build_signatures(
            files_ds, config, prefix=(hashed, units, snippets)
        ),
        root, "signatures", fp, ckpt_stats,
    )
    timing["signatures"] = round(time.monotonic() - t0, 3)
    if _log:
        log_stage("Build signatures", timing["signatures"])
    t0 = time.monotonic()
    if root is None and not config.exec.materialize_pairs:
        # STREAMING pairs -> findings: without a checkpoint root there
        # is no reason to barrier between the two wide stages — verify
        # output blocks flow straight into the rollup shuffle's map
        # side, overlapping the tail of the pair stage with the head of
        # the findings stage. The verified-pair count for ScanStats is
        # tallied in-stream (counting the lazy dataset afterwards would
        # re-run the whole band shuffle).
        ckpt_stats["pairs"] = "streamed"
        pairs = build_pairs(signatures, config, metrics_handle).map_batches(
            _tally_rows,
            fn_kwargs={"metrics": metrics_handle, "counter": "verified_pairs"},
            batch_format="pyarrow",
        )
        timing["pairs"] = 0.0  # fused into the findings stage below
        if _log:
            _log.info("Verify pairs: streamed (fused into findings)")
    else:
        pairs = ckpt.checkpoint_or_compute(
            lambda: build_pairs(signatures, config, metrics_handle),
            root, "pairs", fp, ckpt_stats,
        )
        timing["pairs"] = round(time.monotonic() - t0, 3)
        if _log:
            log_stage("Verify pairs", timing["pairs"])
    t0 = time.monotonic()
    findings = ckpt.checkpoint_or_compute(
        lambda: build_findings(pairs, config), root, "findings", fp, ckpt_stats,
    )
    timing["findings"] = round(time.monotonic() - t0, 3)
    if _log:
        log_stage("Rollup findings", timing["findings"])

    t0 = time.monotonic()
    n_findings = findings.count()
    cluster_map: dict[str, int] = {}
    n_clusters = 0
    if config.cluster.enabled:
        use_driver = n_findings <= config.cluster.driver_max_edges

        def _compute_labelled() -> "ray.data.Dataset":
            if use_driver:
                labelled, cmap = C.add_cluster_ids(findings, config.cluster)
                _captured.update(cmap)
                return labelled
            # scale path: distributed hash-min labels + partitioned
            # join attach — NO driver-side label dict (the labelled
            # node set grows with the corpus). cluster_map stays empty
            # here by design; consumers needing unit->cluster at this
            # scale should read it off the findings dataset.
            labels_ds = C.hashmin_labels(
                findings.select_columns(["unit_a", "unit_b"])
            )
            return C.attach_cluster_ids_join(
                findings, labels_ds, config.exec.shuffle_partitions or 16
            )

        _captured: dict[str, int] = {}
        if root is None:
            # in-memory path: label lazily, no extra materialization
            findings = _compute_labelled()
        else:
            # checkpoint the CLUSTER MAP as its own stage (labelled
            # findings carry cluster_id): a resumed run skips the
            # union-find / hash-min propagation entirely
            findings = ckpt.checkpoint_or_compute(
                _compute_labelled, root, "clusters", fp, ckpt_stats
            )
        if use_driver:
            if not _captured:
                # resumed from the clusters checkpoint: rebuild the
                # driver-path unit->cluster map from the labelled
                # table (bounded by driver_max_edges rows)
                for r in findings.select_columns(
                    ["unit_a", "unit_b", "cluster_id"]
                ).take_all():
                    _captured[r["unit_a"]] = r["cluster_id"]
                    _captured[r["unit_b"]] = r["cluster_id"]
            cluster_map = _captured
            n_clusters = len(set(cluster_map.values()))
        else:
            n_clusters = (
                findings.select_columns(["cluster_id"])
                .groupby("cluster_id")
                .count()
                .count()
            )
        if config.cluster.min_size > 1:
            findings = C.filter_min_cluster_size(
                findings, config.cluster.min_size
            )
            # the reported findings count must agree with the RETURNED
            # dataset (and the CLI's finding_count), not the pre-filter
            # edge count
            n_findings = findings.count()
            # ...and so must n_clusters and cluster_map: a cluster
            # whose findings were all filtered out must not survive in
            # the stats or the map (dangling ids downstream)
            surviving = set(findings.unique("cluster_id"))
            n_clusters = len(surviving)
            if cluster_map:
                cluster_map = {
                    u: c for u, c in cluster_map.items() if c in surviving
                }
    timing["clustering"] = round(time.monotonic() - t0, 3)
    timing["total"] = round(time.monotonic() - t_start, 3)
    if _log:
        _log.info(
            "Scan: %d findings, %d clusters in %.2fs",
            n_findings,
            n_clusters,
            timing["total"],
        )

    # reference ScanStats/timing parity (core/pipeline.py:124-247):
    # stage wall clock, dataset counts (cheap: signatures/pairs are
    # materialized or checkpointed by now), capped-LSH recall
    # accounting from the run's metrics actor, checkpoint hit/miss
    lsh = {k: int(v) for k, v in M.read_metrics(metrics_handle).items()}
    # in streaming mode the verified-pair count was tallied in-stream
    # (the pairs dataset is a lazy view; counting it would re-run the
    # band shuffle) — it is a run counter, not an LSH stat. Default 0:
    # a clone-free corpus emits only empty blocks, so the counter is
    # never reported, and 0 IS the true count (not a -1 sentinel).
    n_pairs = int(lsh.pop("verified_pairs", 0))
    if ckpt_stats.get("pairs") != "streamed":
        # checkpointed or exec.materialize_pairs: the dataset is
        # concrete, count it directly (no in-stream tally ran)
        n_pairs = pairs.count()
    if root and lsh and ckpt_stats.get("pairs") == "miss":
        ckpt.update_lineage(root, "pairs", {"lsh": lsh})
    stats = {
        "timing": timing,
        "counts": {
            "snippets": signatures.count(),
            "verified_pairs": n_pairs,
            "findings": n_findings,
            "clusters": n_clusters,
        },
        "lsh": lsh,
        "checkpoint": dict(ckpt_stats),
    }

    return ScanResult(
        files=hashed,
        units=units,
        snippets=snippets,
        signatures=signatures,
        pairs=pairs,
        findings=findings,
        cluster_map=cluster_map,
        stats=stats,
        metrics_actor=metrics_handle,
    )
