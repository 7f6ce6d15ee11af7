"""Small execution helpers shared across pipelines."""

from __future__ import annotations


def safe_join_partitions(requested: int) -> int:
    """Cap hash-join partition count to the cluster's CPU budget.

    Ray Data's hash-shuffle join spins up ``num_partitions`` aggregator
    actors; requesting more aggregators than the cluster has CPUs
    deadlocks the streaming executor on small clusters (observed with
    64 partitions on an 8-CPU local node). On a real multi-node cluster
    the CPU count scales with nodes, so this cap loosens exactly when
    more partitions actually help.
    """
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001 - not initialised yet
        cpus = 8
    return max(2, min(requested, max(2, cpus // 2)))


def scrub_empty_blocks(ds, batch_size: int = 4096):
    """Re-bundle a Dataset so zero-column empty blocks disappear.

    Ray's sort/aggregate exchanges emit ZERO-COLUMN blocks for empty
    output partitions, map operators pass them through without ever
    invoking the UDF, and Acero's hash join then dies with "No match
    or multiple matches for key field reference" when one reaches a
    join input (reproduced on Ray 2.49.2 with a tiny groupby feeding
    a join). A map_batches with a NUMERIC batch_size coalesces blocks
    through the batcher, which drops the schema-less empties — one
    streaming pass, no materialization."""

    def _identity(t):
        return t

    return ds.map_batches(
        _identity, batch_format="pyarrow", batch_size=batch_size
    )


def safe_join(
    left,
    right,
    join_type: str,
    num_partitions: int,
    on: tuple,
    right_on: tuple | None = None,
):
    """``Dataset.join`` with both inputs scrubbed of zero-column empty
    blocks (see scrub_empty_blocks) and the partition count capped to
    the cluster (see safe_join_partitions)."""
    return scrub_empty_blocks(left).join(
        scrub_empty_blocks(right),
        join_type,
        safe_join_partitions(num_partitions),
        on=on,
        right_on=right_on,
    )


def read_parquet_clean(path: str, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_parquet`` with the b'pandas' footer metadata
    stripped from the schema at the READ operator.

    pandas-written parquet carries schema metadata whose dict value
    makes ``hash(schema)`` raise — Ray Data then logs "Failed to hash
    the schemas (for deduplication)" from every downstream operator.
    Stripping inside a later map_batches is too late for the read op
    itself, so pass a metadata-free schema (projected to ``columns``,
    which Ray applies AFTER pruning) into the datasource. Footer-only
    read; no data is touched on the driver."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    probe = path
    if os.path.isdir(path):
        with os.scandir(path) as it:
            files = sorted(
                e.path for e in it
                if e.is_file() and e.name.endswith(".parquet")
            )
        probe = files[0] if files else None
    try:
        full = pq.read_schema(probe).remove_metadata() if probe else None
    except Exception:  # noqa: BLE001 - odd layout; fall back to plain read
        full = None
    if full is None:
        return ray.data.read_parquet(path, columns=columns, **kwargs)
    schema = (
        pa.schema([full.field(c) for c in columns]) if columns else full
    )
    return ray.data.read_parquet(path, schema=schema, columns=columns, **kwargs)


class _EmptySchemaBundleFilter:
    """Suppress Ray Data's "RefBundle with a different schema" warning
    ONLY when the divergent schema is the zero-column empty one.

    Ray's sort/groupby exchange emits zero-column blocks for empty
    output partitions (e.g. a final ``groupby(query_id)`` with 3
    distinct keys sorted into 16 partitions leaves 13 empty) and the
    streaming executor then warns "new schema: ." or
    "new schema: PandasBlockSchema(names=[]...)". Reproduced with
    every UDF in the pipeline emitting schema-stable empties — the
    blocks are produced inside Ray's exchange, not by user code — so
    the clean fix is filtering this one benign variant at the driver
    logger. Schema divergences with REAL columns still warn."""

    def filter(self, record) -> bool:  # logging.Filter protocol
        msg = record.getMessage()
        if "Operator produced a RefBundle with a different schema" not in msg:
            return True
        return not (
            "new schema: ." in msg
            or "new schema: PandasBlockSchema(names=[]" in msg
            or "new schema: None" in msg
        )


def silence_empty_schema_warnings() -> None:
    """Install the empty-schema-bundle filter on the Ray Data
    streaming-executor logger (idempotent). Driver-side only: the
    warning is logged by the executor loop in the driver process."""
    import logging

    lg = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    if not any(
        isinstance(f, _EmptySchemaBundleFilter) for f in lg.filters
    ):
        lg.addFilter(_EmptySchemaBundleFilter())


def auto_actor_count(reserve: int = 2, cap: int | None = None) -> int:
    """Size an actor pool to the cluster: CPUs minus ``reserve`` slots
    left for feeder/read tasks (min 2). A fixed small constant (the
    easy default) caps the whole fused stage at that parallelism no
    matter how many cores the cluster has."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001 - not initialised yet
        cpus = 8
    n = max(2, cpus - reserve)
    return min(n, cap) if cap else n
