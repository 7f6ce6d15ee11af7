"""Command-line entry points: ``scan`` and ``diff``.

Reference CLI parity (cli/main.py:137-183, cli/commands/scan.py:106-185,
cli/commands/diff.py:19-82) re-expressed over the Ray Data engine:

* ``scan``: input is ``--files`` (corpus table in parquet / .jsonl /
  .csv, autodetected — sources.read_corpus normalizes to the canonical
  schema), ``--files-parquet`` (the scale path — the corpus IS the
  table, BASELINE.json input_hint), or positional directories
  (convenience walk via sources.files_from_directory).
* ``diff``: run the same scan, then post-filter findings to those
  touching a git-changed file (broadcast semi-join; the reference also
  scans everything and filters output, diff.py:62-75).

This module owns its Ray session (guarded init; the library never
calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="clonehunter_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_common(sp):
        sp.add_argument("paths", nargs="*", help="directories to scan")
        sp.add_argument(
            "--progress",
            action="store_true",
            default=None,
            help="show live per-stage progress bars (Ray Data's native "
            "bars — the analogue of the reference tqdm bar, "
            "core/pipeline.py:97-116) plus per-stage summary log "
            "lines (progress.py); off by default so JSON stdout "
            "stays clean",
        )
        sp.add_argument("--files-parquet", help="parquet files table input")
        sp.add_argument(
            "--files",
            help="corpus table input in any supported format "
            "(parquet dir/file, .jsonl, .csv — autodetected by extension)",
        )
        sp.add_argument("--out", default="clonehunter_ray_report.json")
        sp.add_argument(
            "--format",
            choices=("json", "sarif", "html", "parquet"),
            default="json",
        )
        sp.add_argument("--checkpoint-dir")
        sp.add_argument(
            "--partition-by",
            help="with --format parquet: write a resumable hive-partitioned "
            "directory tree (one <col>=<val>/ dir per value, per-partition "
            "_SUCCESS markers; re-runs skip finished partitions)",
        )
        sp.add_argument("--threshold-func", type=float, dest="t_func")
        sp.add_argument("--threshold-win", type=float, dest="t_win")
        sp.add_argument("--threshold-exp", type=float, dest="t_exp")
        sp.add_argument("--window-lines", type=int)
        sp.add_argument("--stride-lines", type=int)
        sp.add_argument("--min-nonempty", type=int)
        sp.add_argument("--min-window-hits", type=int)
        sp.add_argument("--lexical-min-ratio", type=float)
        sp.add_argument("--lexical-weight", type=float)
        sp.add_argument("--substring", action="store_true", default=None,
                        help="enable the suffix-array substring rescue")
        sp.add_argument("--expansion", "--expand-calls", action="store_true",
                        default=None, dest="expansion",
                        help="enable EXP call-graph expansion snippets")
        sp.add_argument("--expand-depth", type=int,
                        help="call-expansion depth override")
        sp.add_argument("--expand-max-chars", type=int,
                        help="call-expansion size cap override")
        sp.add_argument(
            "--compare",
            action="store_true",
            help="embed per-finding code diffs in JSON/HTML reports",
        )
        sp.add_argument("--cluster-min-size", type=int)
        sp.add_argument("--num-cpus", type=int, default=None)
        sp.add_argument(
            "--ray-address",
            default=None,
            help="Ray address: 'local' (default), 'auto' to attach to "
            "the hosting cluster (ray job submit), or an explicit "
            "address; $RAY_ADDRESS is honored when unset",
        )
        sp.add_argument(
            "--repotype",
            action="append",
            default=None,
            help="language preset(s) for include globs; 'monorepo' = all",
        )
        sp.add_argument(
            "--include",
            action="append",
            default=None,
            help="explicit include glob(s); overrides presets (CLI wins)",
        )
        sp.add_argument(
            "--exclude",
            action="append",
            default=None,
            help="explicit exclude glob(s) appended after the defaults",
        )
        sp.add_argument(
            "--save-tables",
            metavar="DIR",
            help="also write signatures/pairs/findings as Parquet under DIR",
        )

    s = sub.add_parser("scan", help="full corpus scan")
    add_common(s)
    d = sub.add_parser("diff", help="scan, then keep findings touching changed files")
    add_common(d)
    d.add_argument("--base", default="HEAD", help="git base rev for the change set")

    e = sub.add_parser(
        "export",
        help="training-data export: mixture sample -> normalize -> "
        "pack -> resumable hive-partitioned Parquet shards",
    )
    e.add_argument(
        "--documents-parquet",
        required=True,
        help="documents table (columns doc_id, source, text)",
    )
    e.add_argument("--out-dir", required=True, help="shard output directory")
    e.add_argument("--budget", type=int, default=256, help="tokens per packed bin")
    e.add_argument(
        "--shards-per-source",
        type=int,
        default=1,
        help="fan each source out to K parallel writer partitions",
    )
    e.add_argument(
        "--rates",
        help="JSON object of source -> sampling rate (default: keep all)",
    )
    e.add_argument(
        "--default-rate",
        type=float,
        default=1.0,
        help="sampling rate for sources not named in --rates",
    )
    e.add_argument(
        "--shard-format",
        choices=("parquet", "jsonl"),
        default="parquet",
        help="part-file format (jsonl = one JSON object per row)",
    )
    e.add_argument("--num-cpus", type=int, default=None)
    e.add_argument(
        "--ray-address",
        default=None,
        help="Ray address: 'local' (default), 'auto' to attach to the "
        "hosting cluster (ray job submit), or an explicit address; "
        "$RAY_ADDRESS is honored when unset",
    )
    return p


def _overrides(args) -> dict:
    return {
        "thresholds.func": args.t_func,
        "thresholds.win": args.t_win,
        "thresholds.exp": args.t_exp,
        "thresholds.min_window_hits": args.min_window_hits,
        "thresholds.lexical_min_ratio": args.lexical_min_ratio,
        "thresholds.lexical_weight": args.lexical_weight,
        "window.window_lines": args.window_lines,
        "window.stride_lines": args.stride_lines,
        "window.min_nonempty": args.min_nonempty,
        "substring.enabled": args.substring,
        "expansion.enabled": args.expansion,
        "expansion.depth": args.expand_depth,
        "expansion.max_chars": args.expand_max_chars,
        "cluster.min_size": args.cluster_min_size,
        "exec.checkpoint_dir": args.checkpoint_dir,
        # --save-tables re-consumes ScanResult.pairs; a streamed (lazy)
        # pairs view would re-run the band shuffle + verify for the write
        "exec.materialize_pairs": (
            True if getattr(args, "save_tables", None) else None
        ),
        "exec.log_progress": getattr(args, "progress", None),
    }


def _load_files(args):
    import ray.data

    from clonehunter_ray import sources

    if getattr(args, "files", None) and getattr(args, "files_parquet", None):
        raise SystemExit(
            "scan: --files and --files-parquet are mutually exclusive"
        )
    if getattr(args, "files", None):
        return sources.read_corpus(args.files)
    if args.files_parquet:
        from clonehunter_ray.util import read_parquet_clean

        return read_parquet_clean(args.files_parquet)
    if not args.paths:
        raise SystemExit("scan: need directories, --files, or --files-parquet")
    repotype_globs = sources.resolve_repotype_globs(args.repotype or ["python"])
    include = sources.merge_globs(
        (), repotype_globs, tuple(args.include or ())
    )
    exclude = sources.DEFAULT_EXCLUDE + tuple(args.exclude or ())
    table = sources.files_from_directory(
        args.paths, include_globs=include, exclude_globs=exclude
    )
    return ray.data.from_arrow(table)


def main(argv: list[str] | None = None) -> int:
    parser = _build_parser()
    args = parser.parse_args(argv)
    if getattr(args, "partition_by", None) and args.format != "parquet":
        parser.error("--partition-by requires --format parquet")

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        # job-submission contract: under `ray job submit` pass
        # --ray-address auto (or export RAY_ADDRESS) and the driver
        # attaches to the hosting cluster instead of starting a local
        # Ray; num_cpus is only legal when starting locally
        addr = getattr(args, "ray_address", None) or os.environ.get(
            "RAY_ADDRESS", "local"
        )
        if addr == "local":
            ray.init(address="local", **kwargs)
        else:
            ray.init(
                address=addr, include_dashboard=False, logging_level="ERROR"
            )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = bool(
        getattr(args, "progress", False)
    )
    from clonehunter_ray.util import silence_empty_schema_warnings

    silence_empty_schema_warnings()

    if args.cmd == "export":
        from clonehunter_ray.pipelines.training import export_training_shards

        manifest = export_training_shards(
            args.documents_parquet,
            out_dir=args.out_dir,
            budget=args.budget,
            shards_per_source=args.shards_per_source,
            rates=json.loads(args.rates) if args.rates else {},
            default_rate=args.default_rate,
            shard_format=args.shard_format,
        )
        print(
            json.dumps(
                {
                    "out_dir": args.out_dir,
                    "sources": manifest.num_rows,
                    "rows": int(
                        sum(manifest["n_rows"].to_pylist())
                    ),
                    "manifest": {
                        s: n
                        for s, n in zip(
                            manifest["source"].to_pylist(),
                            manifest["n_rows"].to_pylist(),
                        )
                    },
                }
            )
        )
        if owns_ray:
            ray.shutdown()
        return 0

    from clonehunter_ray import reporting, sources
    from clonehunter_ray.config_loader import find_config_root, load_config
    from clonehunter_ray.pipelines.scan import scan

    root = find_config_root(args.paths[0] if args.paths else ".")
    config = load_config(root, _overrides(args))

    files_ds = _load_files(args)
    result = scan(files_ds, config, checkpoint_dir=args.checkpoint_dir)
    findings = result.findings

    if args.cmd == "diff":
        # git runs in each scan root (not the invoker's CWD), and its
        # repo-root-relative paths are rebased onto that root so they
        # compare against findings' root-relative paths. Multi-root
        # scans prefix finding paths with the per-root label
        # (sources.files_from_directory) — the change set gets the SAME
        # prefix, or no finding would ever match. An empty/failed
        # change set FAILS CLOSED (no findings) — a fall-through would
        # emit everything as if diff-scoped.
        roots = [os.path.abspath(p) for p in (args.paths or [os.getcwd()])]
        labels = sources.root_labels(roots)
        multi_root = len(roots) > 1
        changed: set[str] = set()
        for scan_root, label in zip(roots, labels):
            raw_changed = sources.changed_files(args.base, cwd=scan_root)
            top = sources.git_toplevel(scan_root)
            for c in raw_changed:
                rel = (
                    os.path.relpath(os.path.join(top, c), scan_root)
                    if top
                    else c
                )
                if rel.startswith(".."):
                    continue
                changed.add(f"{label}/{rel}" if multi_root else rel)
        if changed:
            import pyarrow as pa
            import ray as _ray

            ref = _ray.put(changed)

            def keep(batch: pa.Table) -> pa.Table:
                ch = _ray.get(ref)
                mask = [
                    a in ch or b in ch
                    for a, b in zip(
                        batch["path_a"].to_pylist(), batch["path_b"].to_pylist()
                    )
                ]
                return batch.filter(pa.array(mask, pa.bool_()))

            findings = findings.map_batches(keep, batch_format="pyarrow")
        else:
            findings = findings.limit(0)

    if args.save_tables:
        for name, ds in (
            ("signatures", result.signatures),
            ("pairs", result.pairs),
            ("findings", findings),
        ):
            out_dir = os.path.join(args.save_tables, name)
            os.makedirs(out_dir, exist_ok=True)
            ds.write_parquet(out_dir)

    if getattr(args, "partition_by", None):
        import glob as _glob

        import pyarrow.parquet as _pq

        from clonehunter_ray.state.checkpoint import write_partitioned_output

        sink_stats = write_partitioned_output(
            findings, args.out, args.partition_by
        )
        # rows already on disk in skipped partitions, from parquet
        # footers only — finding_count stays the corpus total across
        # resumed runs, matching the non-partitioned path's semantics
        skipped_rows = 0
        if sink_stats["skipped"]:
            for part in _glob.glob(
                os.path.join(args.out, f"{args.partition_by}=*", "*.parquet")
            ):
                skipped_rows += _pq.read_metadata(part).num_rows
            skipped_rows -= sink_stats["rows"]
        stats = {
            "file_count": result.files.count(),
            "unit_count": result.units.count(),
            "snippet_count": result.snippets.count(),
            "pair_count": result.stats["counts"]["verified_pairs"],
            "finding_count": sink_stats["rows"] + skipped_rows,
            "findings_written": sink_stats["rows"],
            "partitions_written": sink_stats["written"],
            "partitions_skipped": sink_stats["skipped"],
            **result.stats,
        }
        print(json.dumps(stats))
        if owns_ray:
            ray.shutdown()
        return 0

    findings_df = findings.to_pandas()  # report rendering is driver-side
    stats = {
        "file_count": result.files.count(),
        "unit_count": result.units.count(),
        "snippet_count": result.snippets.count(),
        # streamed pairs are a lazy view — .count() would re-run the
        # band shuffle; the scan already tallied the count in-stream
        "pair_count": result.stats["counts"]["verified_pairs"],
        "finding_count": len(findings_df),
        **result.stats,  # timing / counts / lsh / checkpoint blocks
    }

    unit_code: dict[str, str] | None = None
    if args.compare and args.format in ("json", "html") and len(findings_df):
        # pull source only for units that appear in findings (tiny set)
        import pyarrow as pa
        import ray as _ray

        wanted_ref = _ray.put(
            set(findings_df["unit_a"]) | set(findings_df["unit_b"])
        )

        def _keep_units(batch: pa.Table) -> pa.Table:
            w = _ray.get(wanted_ref)
            mask = [u in w for u in batch["unit_id"].to_pylist()]
            return batch.filter(pa.array(mask, pa.bool_()))

        unit_code = {}
        for b in (
            result.units.select_columns(["unit_id", "code"])
            .map_batches(_keep_units, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        ):
            unit_code.update(zip(b["unit_id"].to_pylist(), b["code"].to_pylist()))

    extra_kwargs: dict = {}
    if args.format == "json":
        extra_kwargs = {
            "stats": stats,
            "config": {"fingerprint": config.fingerprint()},
            "timing": result.stats.get("timing", {}),
            "unit_code": unit_code,
        }
    elif args.format == "html":
        extra_kwargs = {"unit_code": unit_code}
    reporting.write_report(findings_df, args.out, args.format, **extra_kwargs)
    print(json.dumps(stats))
    if owns_ray:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
