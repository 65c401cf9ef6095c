"""CLI entry-point tests — the engine twin of the reference's
scripts/run_*.py operational surface (SURVEY §3.4), driven in-process."""

from __future__ import annotations

import json

import pytest

from skiliopay_datapipeline_customer_spark.__main__ import main


def test_cli_list_names_queries(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) > 200
    names = {line.split("\t")[0] for line in out}
    assert "flagship_revenue_by_nation" in names
    assert any(line.endswith("\trows-only") for line in out)


def test_cli_run_outputs_json_rows(capsys, sf_dir):
    assert main(["--sf-dir", sf_dir, "run", "global_kpis", "--json"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rows and rows[0]["n_orders"] > 0


def test_cli_run_unknown_query_errors(capsys):
    assert main(["run", "no_such_query"]) == 2


def test_cli_check_reports_oracle_match(capsys, sf_dir):
    assert main(["--sf-dir", sf_dir, "check", "pricing_summary"]) == 0
    assert "OK" in capsys.readouterr().out


def test_cli_quality_gate_passes_on_clean_orders(capsys, sf_dir):
    assert main(["--sf-dir", sf_dir, "quality"]) == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["passed"] and payload["overall"] >= 0.8
