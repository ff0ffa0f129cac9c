"""Bootstrap loader for the `comfyui-seedvr2_tpu` package.

The package directory is hyphenated (matching the ComfyUI custom-node naming of
the reference project, /root/reference which is loaded by ComfyUI via importlib
the same way). This registers it in sys.modules under the importable name
``seedvr2_tpu`` so that normal ``import seedvr2_tpu.x.y`` statements work from
the CLI, tests, and benchmarks.
"""

import importlib
import importlib.util
import pathlib
import sys

_PKG_NAME = "seedvr2_tpu"
_PKG_DIR = pathlib.Path(__file__).resolve().parent / "comfyui-seedvr2_tpu"


def ensure_package() -> None:
    if _PKG_NAME in sys.modules:
        return
    if not _PKG_DIR.is_dir():
        # pip-installed layout: the package-dir mapping in pyproject.toml
        # already makes `seedvr2_tpu` a plain importable package and this
        # module ships only as the checkout-layout shim — import directly.
        importlib.import_module(_PKG_NAME)
        return
    spec = importlib.util.spec_from_file_location(
        _PKG_NAME,
        _PKG_DIR / "__init__.py",
        submodule_search_locations=[str(_PKG_DIR)],
    )
    module = importlib.util.module_from_spec(spec)
    sys.modules[_PKG_NAME] = module
    spec.loader.exec_module(module)


ensure_package()
