"""The examples/ scripts must stay runnable — they are the porting guide
for reference users (each mirrors a reference examples/ script or shows
an engine addition).  Run in-process against the smoke SF."""

from __future__ import annotations

import runpy
import sys

import pytest

EXAMPLES = [
    "calc_md5",
    "upload_csv",
    "usernames",
    "extract_binaries",
    "ann_search",
    "hybrid_search",
    "daily_increment",
    "dataset_release",
    "multimodal_ingest",
]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name, spark, tmp_path, capsys, monkeypatch):
    # examples default to sf0.001 and a mkdtemp output; pin the output
    # into tmp_path so test runs never collide
    argv = ["prog", "/root/testdata/sf0.001", str(tmp_path / name)]
    if name in ("usernames", "ann_search"):
        argv = argv[:2]
    monkeypatch.setattr(sys, "argv", argv)
    runpy.run_path(f"examples/{name}.py", run_name="__main__")
    out = capsys.readouterr().out
    assert out.strip(), f"{name} produced no output"
    assert "Traceback" not in out
