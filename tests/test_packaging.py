"""Packaging smoke test: `pip install .` must yield a working installed
layout — plain `import seedvr2_tpu` (package-dir mapping bridges the
hyphenated ComfyUI-convention checkout directory, pyproject.toml), the
top-level CLI/bench modules, and the console scripts.

Mirrors the reference's dual deployment surface: a ComfyUI custom-node
checkout AND a standalone CLI install (/root/reference README "Installation").
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def installed(tmp_path_factory):
    target = tmp_path_factory.mktemp("pkg")
    r = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-deps",
         "--no-build-isolation", "--quiet", "--target", str(target), REPO],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"pip install failed:\n{r.stdout}\n{r.stderr}"
    return target


def _run_py(code, target, cwd):
    env = dict(os.environ, PYTHONPATH=str(target))
    return subprocess.run([sys.executable, "-c", code], env=env, cwd=cwd,
                          capture_output=True, text=True, timeout=240)


def test_installed_package_imports_outside_checkout(installed, tmp_path):
    r = _run_py(
        "import seedvr2_tpu, inference_cli, bench, _bootstrap\n"
        f"assert seedvr2_tpu.__file__.startswith({str(installed)!r}), "
        "seedvr2_tpu.__file__\n"
        "from seedvr2_tpu.core import pipeline\n"
        "from seedvr2_tpu.interfaces import nodes\n"
        "print('ok')",
        installed, cwd=tmp_path)
    assert r.returncode == 0, r.stderr
    assert "ok" in r.stdout


def test_console_script_help(installed, tmp_path):
    script = installed / "bin" / "seedvr2"
    assert script.exists(), "console script not generated"
    env = dict(os.environ, PYTHONPATH=str(installed))
    r = subprocess.run([sys.executable, str(script), "--help"], env=env,
                       cwd=tmp_path, capture_output=True, text=True,
                       timeout=240)
    assert r.returncode == 0, r.stderr
    assert "--resolution" in r.stdout and "--preset" in r.stdout
