"""Demo entry point smoke: ``python demo/demo.py`` with zero arguments.

BASELINE config 1 is "single-image inference on data/example.jpg" (reference
ships the image and demo/demo.ipynb cells 3-11 run it); this pins that the
repo's generated ``data/example.jpg`` + zero-arg ``demo/demo.py`` work out of
the box on a fresh clone.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_demo_zero_arg(tmp_path):
    assert os.path.exists(os.path.join(ROOT, "data", "example.jpg"))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the demo off the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    out = tmp_path / "demo_out.png"
    res = subprocess.run(
        [sys.executable, os.path.join(ROOT, "demo", "demo.py"),
         "--out", str(out)],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert out.exists()
    assert "drawn" in res.stdout
