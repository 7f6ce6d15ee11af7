"""Per-stage partitioned Parquet checkpoints with lineage + metrics.

Replaces the reference's SQLite embedding cache (reference
embedding/cache.py:18-137) with a design that works on a multi-node
cluster: each stage's output is written as a directory of Parquet part
files plus a ``_lineage.json`` manifest recording the stage name, the
semantics-affecting config fingerprint, row count, and wall time; a
``_SUCCESS`` marker makes completion atomic-enough for resume (write
to ``<dir>.tmp``, rename).

Resume semantics (north_rule "resumes mid-pipeline"):

* a stage dir with ``_SUCCESS`` and a matching config fingerprint is
  read back with ``ray.data.read_parquet`` instead of recomputed;
* a partial signature checkpoint can be resumed with an anti-join —
  ``resume_missing`` filters the input to rows whose key is absent
  from the checkpoint (the analogue of the reference's cache
  ``get_many``-then-embed-misses flow, core/pipeline.py:50-88).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import ray.data


def stage_dir(root: str, stage: str) -> str:
    return os.path.join(root, stage)


def is_complete(root: str, stage: str, config_fp: str) -> bool:
    d = stage_dir(root, stage)
    marker = os.path.join(d, "_SUCCESS")
    lineage = os.path.join(d, "_lineage.json")
    if not (os.path.exists(marker) and os.path.exists(lineage)):
        return False
    try:
        with open(lineage) as fh:
            meta = json.load(fh)
        return meta.get("config_fp") == config_fp
    except (OSError, json.JSONDecodeError):
        return False


def write_stage(
    ds: "ray.data.Dataset", root: str, stage: str, config_fp: str
) -> "ray.data.Dataset":
    """Write ``ds`` as the checkpoint for ``stage`` and return a fresh
    Dataset reading it back (so downstream consumers stream from disk
    instead of re-executing the upstream pipeline)."""
    d = stage_dir(root, stage)
    tmp = d + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(d):
        shutil.rmtree(d)
    os.makedirs(tmp, exist_ok=True)
    t0 = time.monotonic()
    ds.write_parquet(tmp)
    wall = time.monotonic() - t0
    out = ray.data.read_parquet(tmp)
    rows = out.count()
    with open(os.path.join(tmp, "_lineage.json"), "w") as fh:
        json.dump(
            {
                "stage": stage,
                "config_fp": config_fp,
                "rows": rows,
                "wall_sec": round(wall, 3),
            },
            fh,
        )
    with open(os.path.join(tmp, "_SUCCESS"), "w") as fh:
        fh.write("")
    os.rename(tmp, d)
    return ray.data.read_parquet(d)


def read_stage(root: str, stage: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(stage_dir(root, stage))


def read_lineage(root: str, stage: str) -> dict:
    with open(os.path.join(stage_dir(root, stage), "_lineage.json")) as fh:
        return json.load(fh)


def update_lineage(root: str, stage: str, extra: dict) -> None:
    """Merge run metrics (e.g. capped-LSH recall accounting) into a
    completed stage's lineage manifest."""
    path = os.path.join(stage_dir(root, stage), "_lineage.json")
    try:
        with open(path) as fh:
            meta = json.load(fh)
    except (OSError, json.JSONDecodeError):
        return
    meta.update(extra)
    with open(path, "w") as fh:
        json.dump(meta, fh)


def checkpoint_or_compute(
    make_ds,
    root: str | None,
    stage: str,
    config_fp: str,
    stats: dict | None = None,
) -> "ray.data.Dataset":
    """Return the checkpointed stage if complete, else compute + write.

    ``make_ds`` is a zero-arg callable producing the stage Dataset so
    the upstream pipeline is only constructed when actually needed.
    Without a checkpoint root the Dataset is materialized in the object
    store instead (test-scale convenience; checkpoints are the scale
    path). ``stats`` (when given) records hit/miss per stage — the
    analogue of the reference cache-hit counters (core/pipeline.py:50-88).
    """
    if root is None:
        if stats is not None:
            stats[stage] = "memory"
        return make_ds().materialize()
    if is_complete(root, stage, config_fp):
        if stats is not None:
            stats[stage] = "hit"
        return read_stage(root, stage)
    if stats is not None:
        stats[stage] = "miss"
    return write_stage(make_ds(), root, stage, config_fp)


def resume_missing(
    input_ds: "ray.data.Dataset",
    checkpoint_ds: "ray.data.Dataset",
    key: str,
) -> "ray.data.Dataset":
    """Anti-join: rows of ``input_ds`` whose ``key`` is not present in
    ``checkpoint_ds`` (broadcast key set; the checkpoint key column is
    small relative to payloads)."""
    import pyarrow as pa
    import ray

    key_type = pa.string()
    chunks = []
    for batch in checkpoint_ds.select_columns([key]).iter_batches(
        batch_format="pyarrow"
    ):
        key_type = batch.schema.field(key).type
        if batch.num_rows:
            chunks.append(batch[key].combine_chunks())
    done = pa.concat_arrays(chunks) if chunks else pa.array([], key_type)
    done_ref = ray.put(done)

    def _filter(batch):
        import pyarrow.compute as pc

        mask = pc.is_in(batch[key], value_set=ray.get(done_ref))
        return batch.filter(pc.invert(pc.fill_null(mask, False)))

    return input_ds.map_batches(_filter, batch_format="pyarrow")
