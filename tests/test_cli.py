"""CLI surface tests (session-free paths; the generate/query paths are
exercised end-to-end by the module smoke run since they manage their
own SparkSession lifecycle)."""

from __future__ import annotations

from severless_data_pipeline_aws_spark.cli import build_parser, main


def test_list_prints_registry(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "flagship_revenue_by_status_year" in out
    assert "oracle" in out and "rows-only" in out


def test_parser_defaults():
    args = build_parser().parse_args(["generate", "--devices", "5"])
    assert args.devices == 5 and args.count == 100 and args.format == "console"
    args = build_parser().parse_args(["query", "pricing_summary", "--explain"])
    assert args.name == "pricing_summary" and args.explain


def test_unknown_query_returns_error_code(capsys):
    assert main(["query", "no_such_query"]) == 2


def test_profile_unknown_table_returns_error_code(capsys):
    from severless_data_pipeline_aws_spark.cli import main

    assert main(["profile", "nonexistent"]) == 2
    assert "unknown table" in capsys.readouterr().err


def test_profile_subcommand_parses():
    from severless_data_pipeline_aws_spark.cli import build_parser

    args = build_parser().parse_args(["profile", "orders", "--sf-dir", "/x"])
    assert args.table == "orders" and args.sf_dir == "/x"
