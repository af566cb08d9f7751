"""Runnable documentation — the analog of the reference's doctests
(every public API there has executable examples, crates/builder/src/
lib.rs:44-251, crates/algos/src/lib.rs:92-141).

* every ```python block in README.md must execute,
* modules with `>>>` examples must pass doctest.
"""

import doctest
import os
import re

import pytest

from conftest import resource

README = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "README.md")


def _readme_blocks():
    text = open(README).read()
    return re.findall(r"```python\n(.*?)```", text, re.S)


@pytest.mark.parametrize("idx", range(len(_readme_blocks())))
def test_readme_block_runs(idx, tmp_path, monkeypatch):
    block = _readme_blocks()[idx]
    # examples reference fixture files by bare name; run them from a
    # directory that has the reference resources linked in
    for name in ("scale_8.graph500", "test.el", "test.wel"):
        src = resource(name)
        if os.path.exists(src):
            os.symlink(src, tmp_path / name)
    monkeypatch.chdir(tmp_path)
    exec(compile(block, f"README.md:block{idx}", "exec"), {})


@pytest.mark.parametrize("modname", [
    "graph_tpu.builder",
    "graph_tpu.algos.pagerank",
    "graph_tpu.algos.wcc",
    "graph_tpu.algos.triangle_count",
    "graph_tpu.api",
    "graph_tpu.graph.ops",
    "graph_tpu.io.binary",
    "graph_tpu.engine.engine",
])
def test_module_doctests(modname):
    import importlib

    mod = importlib.import_module(modname)
    res = doctest.testmod(mod, verbose=False,
                          optionflags=doctest.ELLIPSIS)
    assert res.failed == 0, f"{modname}: {res.failed} doctest failures"
