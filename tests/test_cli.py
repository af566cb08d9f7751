"""CLI tests (reference: app binary subcommands, app.rs:41-153)."""

import pytest

from graph_tpu.cli import main

from conftest import resource


def run(argv):
    return main(argv)


def test_page_rank_cli(test_el_path):
    assert run(["page-rank", "-p", test_el_path, "-r", "1", "-w", "1"]) == 0


def test_sssp_cli():
    assert run([
        "sssp", "-p", resource("test.wel"), "-r", "1", "-w", "0",
        "--start-node", "0", "--delta", "2.0",
    ]) == 0


def test_wcc_cli(test_el_path):
    assert run(["wcc", "-p", test_el_path, "-r", "1", "-w", "0"]) == 0


def test_triangle_count_cli(scale8_path):
    assert run([
        "triangle-count", "-p", scale8_path, "-f", "graph500",
        "-r", "1", "-w", "0", "--relabel",
    ]) == 0


def test_loading_cli(test_el_path):
    assert run(["loading", "-p", test_el_path, "-r", "2", "-w", "0"]) == 0


def test_serialize_cli(test_el_path, tmp_path):
    out = str(tmp_path / "g.bin")
    assert run(["serialize", "-p", test_el_path, "-o", out, "-r", "1", "-w", "0"]) == 0


def test_missing_subcommand():
    with pytest.raises(SystemExit):
        run([])
