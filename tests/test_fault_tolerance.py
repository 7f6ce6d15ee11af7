"""Chaos tests: the pipeline survives worker death mid-run.

The north rule claims resumable, fault-tolerant execution on a
multi-node cluster. Checkpoint resume is pinned by
test_checkpoint_resume; these tests pin the OTHER half — Ray's
task-lineage retry keeping a job alive when a worker process dies
mid-batch (on a real cluster: a node loss). A UDF kills its own
worker (os._exit) exactly once per run, gated by an O_EXCL marker
file shared across the node's workers; Ray classifies the death as a
SYSTEM failure (not an application error), reschedules the task from
lineage, and the second attempt sees the marker and completes. The
asserted invariant is equality with the undisturbed run — the retry
must not duplicate or drop a block.

UDFs here are deliberately self-contained closures (imports inside
the body, no references to this module's globals): a RESTARTED worker
deserializes the UDF from the object store and cannot import the
pytest test module.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import ray


def _marker(tag: str) -> str:
    return os.path.join(tempfile.gettempdir(), f"chaos_marker_{tag}")


def _arm(tag: str) -> None:
    try:
        os.unlink(_marker(tag))
    except FileNotFoundError:
        pass


def _make_udf(chaos: bool, tag: str):
    """Self-contained batch UDF: squares ids; when ``chaos``, the
    first caller across ALL workers creates the marker file and kills
    its own worker process (O_EXCL makes the race safe)."""

    def udf(batch: pa.Table) -> pa.Table:
        import os as _os
        import tempfile as _tf

        import pyarrow.compute as _pc

        if chaos:
            path = _os.path.join(_tf.gettempdir(), f"chaos_marker_{tag}")
            try:
                fd = _os.open(path, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
                _os.close(fd)
                _os._exit(1)
            except FileExistsError:
                pass
        return batch.append_column(
            "sq", _pc.multiply(batch["id"], batch["id"])
        )

    return udf


def test_task_survives_worker_death(ray_session):
    """Stateless map_batches task: worker dies mid-run, lineage retry
    completes the job with exactly the undisturbed result."""

    def run(chaos: bool) -> list[tuple[int, int]]:
        ds = ray.data.range(2000, override_num_blocks=8).map_batches(
            _make_udf(chaos, "task"), batch_format="pyarrow"
        )
        return sorted((r["id"], r["sq"]) for r in ds.take_all())

    expected = run(chaos=False)
    _arm("task")
    assert run(chaos=True) == expected
    assert os.path.exists(_marker("task"))  # the kill actually fired


def test_actor_pool_survives_actor_death(ray_session):
    """Stateful actor-pool stage: one actor dies mid-run; Ray Data
    restarts it (state rebuilt in __init__) and the job completes
    identically. This is the signature-stage failure mode on a real
    cluster — a node loss takes the actor AND its in-heap state."""

    class Udf:
        def __init__(self, chaos: bool):
            self.chaos = chaos  # per-actor state rebuilt on restart

        def __call__(self, batch: pa.Table) -> pa.Table:
            import os as _os
            import tempfile as _tf

            import pyarrow.compute as _pc

            if self.chaos:
                path = _os.path.join(_tf.gettempdir(), "chaos_marker_actor")
                try:
                    fd = _os.open(
                        path, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY
                    )
                    _os.close(fd)
                    _os._exit(1)
                except FileExistsError:
                    pass
            return batch.append_column(
                "sq", _pc.multiply(batch["id"], batch["id"])
            )

    def run(chaos: bool) -> list[tuple[int, int]]:
        ds = ray.data.range(2000, override_num_blocks=8).map_batches(
            Udf,
            fn_constructor_kwargs={"chaos": chaos},
            concurrency=2,
            batch_format="pyarrow",
        )
        return sorted((r["id"], r["sq"]) for r in ds.take_all())

    expected = run(chaos=False)
    _arm("actor")
    assert run(chaos=True) == expected
    assert os.path.exists(_marker("actor"))


def test_scan_survives_worker_death(ray_session, tiny_corpus):
    """End-to-end: the flagship clone scan completes with the same
    finding count when a worker dies mid-pipeline. The kill rides a
    pass-through stage fused into the scan's own stateless prefix, so
    the death lands inside the real job's execution."""
    from clonehunter_ray.pipelines.scan import scan

    files_table, _ = tiny_corpus

    def run(chaos: bool) -> int:
        def passthrough(batch: pa.Table) -> pa.Table:
            import os as _os
            import tempfile as _tf

            if chaos:
                path = _os.path.join(_tf.gettempdir(), "chaos_marker_scan")
                try:
                    fd = _os.open(
                        path, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY
                    )
                    _os.close(fd)
                    _os._exit(1)
                except FileExistsError:
                    pass
            return batch

        files_ds = ray.data.from_arrow(files_table).map_batches(
            passthrough, batch_format="pyarrow"
        )
        return scan(files_ds).findings.count()

    expected = run(chaos=False)
    _arm("scan")
    assert run(chaos=True) == expected
    assert os.path.exists(_marker("scan"))
