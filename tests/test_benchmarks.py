"""Smoke tests for the perf/infra parity pieces: the asv benchmark
classes (reference: benchmarks/benchmarks.py asv grid + tracked
dashboard), and the buildable docs target (reference: Sphinx +
readthedocs). Neither asv nor Sphinx exists in this environment, so
these prove the interfaces work: asv-convention classes set up and run,
and the docs generator produces a complete site."""
import importlib.util
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_asv_classes_smoke():
    suite = _load("benchmarks/asv_suite.py", "asv_suite")
    b = suite.TimeEnvs()
    b.steps = 5
    b.setup(8, "xla")
    b.time_run(8, "xla")

    s = suite.TimeSampler()
    s.draws = 5
    s.setup(8)
    s.time_sample(8)

    r = suite.TimeReset()
    r.setup(4)
    r.time_reset(4)

    m = suite.MemState()
    m.setup(8)
    per_env = m.track_state_bytes_per_env(8)
    assert 1_000 < per_env < 100_000, per_env


def test_asv_conf_points_at_suite():
    import json
    with open(os.path.join(ROOT, "asv.conf.json")) as f:
        conf = json.load(f)
    assert conf["benchmark_dir"] == "benchmarks"
    assert os.path.exists(os.path.join(ROOT, "benchmarks", "asv_suite.py"))


def test_docs_site_builds(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "build_docs.py"),
         "--out", str(tmp_path)],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    pages = sorted(p.name for p in tmp_path.iterdir())
    assert pages == ["api.html", "index.html", "perf-history.html",
                     "performance.html", "usage.html"], pages
    text = (tmp_path / "usage.html").read_text()
    assert "<nav>" in text and "rollout_chunked" in text
