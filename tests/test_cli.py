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


@pytest.mark.slow
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


def test_adjacency_list_cli(test_el_path):
    assert run([
        "page-rank", "-p", test_el_path, "-g", "adjacency-list",
        "-r", "1", "-w", "0",
    ]) == 0


def test_adjacency_list_loads_al_graph(test_el_path):
    import numpy as np

    from graph_tpu.cli import _load, build_parser
    from graph_tpu.graph.csr import DirectedCsrGraph

    args = build_parser().parse_args(
        ["wcc", "-p", test_el_path, "-g", "adjacency-list"])
    g_al = _load(args)
    args2 = build_parser().parse_args(["wcc", "-p", test_el_path])
    g_csr = _load(args2)
    assert isinstance(g_al, DirectedCsrGraph)
    assert g_al.node_count == g_csr.node_count
    assert g_al.edge_count == g_csr.edge_count
    assert np.array_equal(np.asarray(g_al.csr_out.offsets),
                          np.asarray(g_csr.csr_out.offsets))


def test_use_32_bit_flag_switches_id_dtype(test_el_path):
    import jax
    import numpy as np

    from graph_tpu.cli import _id_dtype, build_parser

    args32 = build_parser().parse_args(
        ["wcc", "-p", test_el_path, "--use-32-bit"])
    args64 = build_parser().parse_args(["wcc", "-p", test_el_path])
    assert _id_dtype(args32) == np.int32
    # without the flag: 64-bit when x64 is on (reference default), else 32
    assert _id_dtype(args64) == np.int32  # x64 off in the test env
    with jax.enable_x64(True):
        assert _id_dtype(args64) == np.int64
        assert _id_dtype(args32) == np.int32


def test_profile_flag_writes_trace(test_el_path, tmp_path):
    import os

    d = str(tmp_path / "trace")
    assert run(["page-rank", "-p", test_el_path, "-r", "1", "-w", "1",
                "--profile", d]) == 0
    found = [f for _, _, fs in os.walk(d) for f in fs]
    assert found, "no trace files captured"


def test_verbose_once_keeps_device_loop(test_el_path, monkeypatch):
    """A single -v must not enable log_progress (the per-iteration
    host-synced loop); only -v -v does, as documented in the README."""
    import graph_tpu.cli as cli

    seen = {}

    def fake_page_rank(g, cfg):
        seen["log_progress"] = cfg.log_progress

        class R:
            ran_iterations = 1
            error = 0.0
        return R()

    import graph_tpu.algos.pagerank as pr
    monkeypatch.setattr(pr, "page_rank", fake_page_rank)
    run(["page-rank", "-p", test_el_path, "-r", "1", "-w", "0", "-v"])
    assert seen["log_progress"] is False
    run(["page-rank", "-p", test_el_path, "-r", "1", "-w", "0", "-v", "-v"])
    assert seen["log_progress"] is True
