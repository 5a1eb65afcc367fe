"""README code blocks are executed as tests (the reference's doctests role:
lib.rs:27-211 doctests every public example; pytest is the Python analog).

Blocks run in one shared namespace in order, with workload sizes scaled
down by literal substitution so the suite stays fast — the point is that
every line of user-facing example code actually runs against the current
API, not the statistical quality of tiny runs.
"""

import os
import re

import pytest

_README = os.path.join(os.path.dirname(os.path.dirname(__file__)), "README.md")

# size scaling: README literal -> test literal
_SCALE = [
    ("init_det(4, 2)", "init_det(4, 2)"),
    ("mh.run(1000, 100)", "mh.run(60, 20)"),
    ("init_det(1024, 100)", "init_det(8, 4)"),
    ("nuts.run_progress(1000, 500)", "nuts.run_progress(30, 20, progress=False)"),
    ("run_sharded(nuts, 1000, 500, chain_mesh())", "run_sharded(nuts, 10, 5, chain_mesh())"),
]


def _python_blocks():
    text = open(_README).read()
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


def test_readme_blocks_execute(tmp_path, monkeypatch):
    blocks = _python_blocks()
    assert len(blocks) >= 3, "README lost its quick-start blocks?"
    monkeypatch.chdir(tmp_path)  # artifact writes (parquet) land in tmp
    ns = {}
    for i, block in enumerate(blocks):
        for old, new in _SCALE:
            block = block.replace(old, new)
        try:
            exec(compile(block, f"README.md[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure reporting
            pytest.fail(f"README block {i} failed: {type(e).__name__}: {e}\n{block}")
    # the export block actually wrote the artifact
    assert (tmp_path / "samples.parquet").exists()
