"""CLI — the reference's two entry points, engine-side.

``python -m severless_data_pipeline_aws_spark generate`` mirrors the
generator CLI (iot-data-stream.py:353-401: --devices / --frequency /
--count, console/JSON/CSV outputs); ``... query`` mirrors the dashboard
entry (run a named analytics query over a table directory). ``list``
prints the registry with verification tier.
"""

from __future__ import annotations

import argparse
import sys

from .io import DEFAULT_SF_DIR
from .registry import load_all
from .session import get_spark


def _cmd_generate(args: argparse.Namespace) -> int:
    from .sources import sinks
    from .sources.generator import generate_readings

    spark = get_spark(app_name="iot-generate", cpus=args.cpus)
    df = generate_readings(
        spark,
        n_devices=args.devices,
        n_ticks=args.count,
        frequency_s=args.frequency,
    ).drop("tick")
    if args.format == "console":
        sinks.write_console(df, n=args.devices)
    elif args.format == "json":
        sinks.write_json(df, args.out)
    elif args.format == "csv":
        sinks.write_csv_flat(df, args.out)
    else:
        df.write.mode("overwrite").parquet(args.out)
    print(f"generated {df.count()} readings from {args.devices} devices x {args.count} ticks")
    spark.stop()
    return 0


def _cmd_query(args: argparse.Namespace) -> int:
    specs = load_all()
    if args.name not in specs:
        print(f"unknown query {args.name!r}; run `list` to see all", file=sys.stderr)
        return 2
    spark = get_spark(app_name=f"query-{args.name}", cpus=args.cpus)
    df = specs[args.name].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)
    print(f"rows: {df.count()}")
    spark.stop()
    return 0


def _cmd_profile(args: argparse.Namespace) -> int:
    from .io import TABLES, load_table
    from .operators.dashboard import profile_table

    if args.table not in TABLES:
        print(f"unknown table {args.table!r}; one of {TABLES}", file=sys.stderr)
        return 2
    spark = get_spark(app_name=f"profile-{args.table}", cpus=args.cpus)
    profile_table(load_table(spark, args.sf_dir, args.table)).show(100, truncate=False)
    spark.stop()
    return 0


def _cmd_list(_: argparse.Namespace) -> int:
    specs = load_all()
    width = max(len(n) for n in specs)
    for name, spec in sorted(specs.items()):
        tier = "oracle" if spec.oracle else "rows-only"
        print(f"{name:<{width}}  {tier:<9}  {' '.join(spec.tags)}")
    print(f"{len(specs)} queries ({sum(1 for s in specs.values() if s.oracle)} oracle-verified)")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="severless_data_pipeline_aws_spark")
    p.add_argument("--cpus", type=int, default=None, help="local[N] cores")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="synthetic IoT readings (reference generator CLI)")
    g.add_argument("--devices", type=int, default=10)
    g.add_argument("--count", type=int, default=100, help="number of ticks")
    g.add_argument("--frequency", type=int, default=1, help="seconds between ticks")
    g.add_argument("--format", choices=("console", "json", "csv", "parquet"), default="console")
    g.add_argument("--out", default="/tmp/iot_readings", help="output path (file formats)")
    g.set_defaults(fn=_cmd_generate)

    q = sub.add_parser("query", help="run a registered analytics query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    q.add_argument("--limit", type=int, default=20)
    q.add_argument("--explain", action="store_true")
    q.set_defaults(fn=_cmd_query)

    l = sub.add_parser("list", help="list registered queries")
    l.set_defaults(fn=_cmd_list)

    pr = sub.add_parser("profile", help="column-profile a test table")
    pr.add_argument("table")
    pr.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    pr.set_defaults(fn=_cmd_profile)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
