"""CLI surface tests (reference joern-parse / joern-scan / joern-export /
joern console, `joern-cli/.../JoernParse.scala:81-92`, `JoernScan.scala:
46-120`, `Console.scala`): every subcommand must work against the
multi-root CPG layout the build actually writes (regression: the CLI
read a nonexistent `{out}/nodes` dir after the never-rewrite layout
landed).

The cmd_* functions are called directly (not main()) because main()
owns the Ray session and would shut down the test fixture's."""

import argparse
import json
import os

import pytest


@pytest.fixture(scope="module")
def cli_cpg(ray_session, tmp_path_factory):
    from joern_ray.cli import cmd_parse

    out = str(tmp_path_factory.mktemp("cli") / "cpg")
    args = argparse.Namespace(
        synthetic=150, input=None, out=out, num_cpus=None
    )
    assert cmd_parse(args) == 0
    return out


def test_cli_scan_and_sarif(cli_cpg, tmp_path, capsys):
    from joern_ray.cli import DANGEROUS_DEFAULT, cmd_scan

    sarif = str(tmp_path / "findings.sarif")
    args = argparse.Namespace(
        cpg=cli_cpg,
        names=DANGEROUS_DEFAULT + ",malloc,free,memcpy",
        sarif=sarif,
        num_cpus=None,
    )
    assert cmd_scan(args) == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["findings"] >= 1
    assert os.path.exists(sarif)
    with open(sarif) as f:
        doc = json.load(f)
    assert doc["runs"][0]["results"]


def test_cli_query(cli_cpg, capsys):
    from joern_ray.cli import cmd_query

    args = argparse.Namespace(
        cpg=cli_cpg, starter="method", name=None, call_in=False,
        limit=5, num_cpus=None,
    )
    assert cmd_query(args) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows and all(r["label"] == "METHOD" for r in rows)


def test_cli_console_eval(cli_cpg, capsys):
    from joern_ray.cli import cmd_console

    args = argparse.Namespace(
        cpg=cli_cpg,
        eval=["cpg.call().size()", "cpg.method('.*').l(['name'])"],
        limit=3,
        num_cpus=None,
    )
    assert cmd_console(args) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert int(lines[0]) > 0  # call count
    assert all("name" in json.loads(l) for l in lines[1:])  # method rows


def test_cli_export_graphml(cli_cpg, tmp_path, capsys):
    from joern_ray.cli import cmd_export

    out = str(tmp_path / "g.graphml")
    args = argparse.Namespace(
        cpg=cli_cpg, format="graphml", out=out, num_cpus=None
    )
    assert cmd_export(args) == 0
    assert os.path.exists(out) and os.path.getsize(out) > 0
