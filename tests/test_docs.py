"""API-reference coverage: every public export must be documented.

``docs/gen_api.py`` generates docs/api/*.md from docstrings; this test
regenerates into a tmp dir and asserts that every class exported from the
public ``models``, ``ops``, ``signal``, ``data``, ``train`` and
``parallel`` namespaces appears, and that the committed docs/api/index.md
is in sync (mentions the same symbols).
"""

import importlib
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent


def _gen(tmp_path):
    sys.path.insert(0, str(REPO / "docs"))
    try:
        import gen_api
    finally:
        sys.path.pop(0)
    return gen_api.generate(tmp_path / "api")


def test_every_public_export_documented(tmp_path):
    covered = _gen(tmp_path)
    documented = {name for names in covered.values() for name in names}
    missing = []
    for modname in (
        "pytorch_geometric_temporal_tpu.models",
        "pytorch_geometric_temporal_tpu.ops",
        "pytorch_geometric_temporal_tpu.signal",
        "pytorch_geometric_temporal_tpu.data",
        "pytorch_geometric_temporal_tpu.train",
        "pytorch_geometric_temporal_tpu.parallel",
    ):
        mod = importlib.import_module(modname)
        for name in getattr(mod, "__all__", []):
            obj = getattr(mod, name, None)
            underlying = getattr(obj, "__name__", None)
            if name not in documented and underlying not in documented:
                missing.append(f"{modname}.{name}")
    assert not missing, f"undocumented exports: {missing}"


def test_committed_docs_in_sync(tmp_path):
    covered = _gen(tmp_path)
    committed = (REPO / "docs" / "api" / "index.md").read_text()
    stale = [
        name
        for names in covered.values()
        for name in names
        if f"`{name}`" not in committed
    ]
    assert not stale, (
        f"docs/api/index.md is stale (regenerate with python docs/gen_api.py); "
        f"missing: {stale}"
    )
