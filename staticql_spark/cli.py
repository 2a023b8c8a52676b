"""CLI: index generation, full and incremental — parity with the
reference's ``staticql-gen-index`` (cli/generate-index.ts:19-41):

    python -m staticql_spark.cli generate-index \
        --config config.json --base-dir ./content-root --output ./index \
        [--incremental --diff-file diff.json] [--manifest]

- full mode rebuilds every source's covering index (the reference first
  deletes the index dir, :97-102 — partition overwrite gives the same
  result without the delete).
- incremental mode reads a DiffEntry JSON array [{status, source, slug}]
  and refreshes only affected (field, prefix) partitions (§2.9 T2).
- --export-jsonl additionally writes the reference-layout JSONL index
  tree (+ .gz twins) beside the parquet sink — the artifact a browser /
  CDN client walks (export_jsonl_index).
- --manifest writes staticql-manifest.json listing every prefetchable
  index artifact (:202-214): parquet shards AND the JSONL tree's plain
  logical paths, so a FetchRepository-style client can warm its cache
  from the manifest alone. Parquet-level gzip flags are intentionally
  absent (Parquet compression replaces per-shard gzip, S8); the JSONL
  export gzips its shards itself.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _build_manifest(out_dir: str) -> dict:
    """Manifest of every prefetchable index artifact under ``out_dir``:
    the parquet covering index (the Spark-side sink) AND the exported
    JSONL index tree (the artifact a FetchRepository-style browser/CDN
    client actually prefetches — reference cli/generate-index.ts:202-214
    lists exactly the ``.jsonl`` paths, excluding ``.gz``: the client's
    gzip-first readFile resolves ``path.gz`` per entry itself, so a
    gz-only deployment needs no ``.gz`` rows).  A shard present only as
    its ``.gz`` twin still manifests under its plain logical path."""
    files = set()
    for root, _dirs, names in os.walk(out_dir):
        for n in names:
            rel = os.path.relpath(os.path.join(root, n), out_dir)
            if n.endswith(".parquet"):
                files.add(rel)
            elif n.endswith(".jsonl"):
                files.add(rel)
            elif n.endswith(".jsonl.gz"):
                files.add(rel[: -len(".gz")])
    return {"files": sorted(files)}


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="staticql-spark")
    sub = parser.add_subparsers(dest="command", required=True)
    gen = sub.add_parser("generate-index", help="build covering-index parquet")
    gen.add_argument("--config", required=True, help="staticql config JSON path")
    gen.add_argument("--base-dir", required=True, help="content root directory")
    gen.add_argument("--output", required=True, help="index output directory")
    gen.add_argument("--incremental", action="store_true")
    gen.add_argument("--diff-file", help="DiffEntry JSON (required with --incremental)")
    gen.add_argument("--manifest", action="store_true")
    gen.add_argument(
        "--export-jsonl",
        action="store_true",
        help="also write the reference-layout JSONL index tree (+ .gz twins)",
    )
    dif = sub.add_parser(
        "diff", help="git refs -> DiffEntry JSON for --incremental (§2.9 T1)"
    )
    dif.add_argument("--config", required=True, help="staticql config JSON path")
    dif.add_argument("--repo-dir", required=True, help="content git repository")
    dif.add_argument("--from-ref", required=True)
    dif.add_argument("--to-ref", default="HEAD")
    dif.add_argument("--out", help="output path (default: stdout)")
    comp = sub.add_parser(
        "compact",
        help="parse content sources once and materialize as parquet "
        "(the 100 TB ingest hop — SCALE.md §1)",
    )
    comp.add_argument("--config", required=True, help="staticql config JSON path")
    comp.add_argument("--base-dir", required=True, help="content root directory")
    comp.add_argument("--output", required=True, help="parquet output directory")
    prof = sub.add_parser(
        "profile",
        help="single-pass data-quality audit of every source "
        "(nulls / distinct / min-max per column, JSON to stdout)",
    )
    prof.add_argument("--config", required=True, help="staticql config JSON path")
    prof.add_argument("--base-dir", required=True, help="content root directory")
    prof.add_argument("--approx", action="store_true",
                      help="HLL distinct counts (single pass at any scale)")
    shx = sub.add_parser(
        "export-shards",
        help="export a source as ordered, size-capped training shards "
        "(JSONL or parquet) + _manifest.json",
    )
    shx.add_argument("--config", required=True, help="staticql config JSON path")
    shx.add_argument("--base-dir", required=True, help="content root directory")
    shx.add_argument("--source", required=True, help="source name to export")
    shx.add_argument("--output", required=True, help="shard output directory")
    shx.add_argument("--order-col", default="slug", help="global order key")
    shx.add_argument("--records-per-file", type=int, default=100_000)
    shx.add_argument("--format", default="json", choices=["json", "parquet", "csv"])
    tg = sub.add_parser(
        "generate-types",
        help="emit staticql_types.py TypedDicts from the config schemas "
        "(parity: cli/generate-types.ts)",
    )
    tg.add_argument("--config", required=True, help="staticql config JSON path")
    tg.add_argument("--output", required=True, help="output directory")
    args = parser.parse_args(argv)

    if args.command == "generate-types":
        from .typegen import load_config, write_types

        out_path = write_types(load_config(args.config), args.output)
        print(f"types generated to {out_path}", file=sys.stderr)
        return 0

    if args.command == "export-shards":
        from . import define
        from .operators.shards import export_training_shards

        with open(args.config, encoding="utf-8") as f:
            config = json.load(f)
        sql = define(config)(base_dir=args.base_dir)
        df = sql.df(args.source)
        if "raw" in df.columns:
            df = df.drop("raw")
        # CSV can't carry nested struct/array columns — drop them with a note
        if args.format == "csv":
            flat = [f.name for f in df.schema.fields if not f.dataType.typeName()
                    in ("struct", "array", "map")]
            df = df.select(*flat)
        manifest = export_training_shards(
            df,
            args.output,
            records_per_file=args.records_per_file,
            order_col=args.order_col,
            fmt=args.format,
        )
        print(json.dumps(manifest, indent=2, default=str))
        return 0

    if args.command == "profile":
        from . import define
        from .operators.profile import table_profile

        with open(args.config, encoding="utf-8") as f:
            config = json.load(f)
        sql = define(config)(base_dir=args.base_dir)
        report = {}
        for name in sorted(sql.configs):
            df = sql.df(name)
            cols = [c for c in df.columns if c != "raw"]
            report[name] = [
                r.asDict() for r in table_profile(df, cols, approx=args.approx).collect()
            ]
        print(json.dumps(report, indent=2, ensure_ascii=False, default=str))
        return 0

    if args.command == "compact":
        from . import define
        from .sources.reader import compact_to_parquet

        with open(args.config, encoding="utf-8") as f:
            config = json.load(f)
        sql = define(config)(base_dir=args.base_dir)
        for name, cfg in sorted(sql.configs.items()):
            if cfg.type == "parquet":
                continue
            compact_to_parquet(sql.df(name), f"{args.output.rstrip('/')}/{name}")
            print(f"compacted {name}", file=sys.stderr)
        return 0

    if args.command == "diff":
        from .config import resolve_config
        from .diff import extract_diff

        with open(args.config, encoding="utf-8") as f:
            configs = resolve_config(json.load(f))
        entries = extract_diff(args.repo_dir, args.from_ref, args.to_ref, configs)
        text = json.dumps(entries, indent=2, ensure_ascii=False)
        if args.out:
            with open(args.out, "w", encoding="utf-8") as f:
                f.write(text)
        else:
            print(text)
        return 0

    if args.incremental and not args.diff_file:
        # parity: missing-arg validation exits non-zero (generate-index.test.ts:44-62)
        parser.error("--incremental requires --diff-file")

    from . import define
    from .streaming import DIFF_SCHEMA, refresh_index_partitions

    with open(args.config, encoding="utf-8") as f:
        config = json.load(f)
    sql = define(config)(base_dir=args.base_dir)

    if args.incremental:
        with open(args.diff_file, encoding="utf-8") as f:
            entries = json.load(f)
        diff = sql.spark.createDataFrame(
            [(e["status"], e["source"], e["slug"]) for e in entries], DIFF_SCHEMA
        )
        for source in sorted({e["source"] for e in entries}):
            refresh_index_partitions(sql, source, diff, args.output)
    else:
        sql.save_indexes(args.output)

    if args.export_jsonl:
        from .indexing import export_jsonl_index

        export_jsonl_index(sql, args.output)

    if args.manifest:
        manifest = _build_manifest(args.output)
        with open(os.path.join(args.output, "staticql-manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
