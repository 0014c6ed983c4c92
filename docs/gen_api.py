"""Generate the Markdown API reference from package docstrings.

Self-contained (no sphinx/mkdocs in this environment): introspects the
public package surface and writes one page per module group into
``docs/api/``, plus an index.  Regenerate with ``python docs/gen_api.py``;
the test suite asserts every exported class is covered.
"""

from __future__ import annotations

import importlib
import inspect
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGES = {
    "ops": [
        "pytorch_geometric_temporal_tpu.ops.graph",
        "pytorch_geometric_temporal_tpu.ops.spmm",
        "pytorch_geometric_temporal_tpu.ops.bcsr",
        "pytorch_geometric_temporal_tpu.ops.operators",
    ],
    "models_conv": ["pytorch_geometric_temporal_tpu.models.conv"],
    "models_recurrent": [
        "pytorch_geometric_temporal_tpu.models.recurrent.gconv_gru",
        "pytorch_geometric_temporal_tpu.models.recurrent.gconv_lstm",
        "pytorch_geometric_temporal_tpu.models.recurrent.gc_lstm",
        "pytorch_geometric_temporal_tpu.models.recurrent.lrgcn",
        "pytorch_geometric_temporal_tpu.models.recurrent.dygrae",
        "pytorch_geometric_temporal_tpu.models.recurrent.evolvegcn",
        "pytorch_geometric_temporal_tpu.models.recurrent.dcrnn",
        "pytorch_geometric_temporal_tpu.models.recurrent.temporalgcn",
        "pytorch_geometric_temporal_tpu.models.recurrent.attentiontemporalgcn",
        "pytorch_geometric_temporal_tpu.models.recurrent.agcrn",
        "pytorch_geometric_temporal_tpu.models.recurrent.mpnn_lstm",
    ],
    "models_attention": [
        "pytorch_geometric_temporal_tpu.models.attention.stgcn",
        "pytorch_geometric_temporal_tpu.models.attention.astgcn",
        "pytorch_geometric_temporal_tpu.models.attention.mstgcn",
        "pytorch_geometric_temporal_tpu.models.attention.gman",
        "pytorch_geometric_temporal_tpu.models.attention.mtgnn",
        "pytorch_geometric_temporal_tpu.models.attention.tsagcn",
        "pytorch_geometric_temporal_tpu.models.attention.dnntsp",
    ],
    "models_hetero": [
        "pytorch_geometric_temporal_tpu.models.hetero.heterogclstm",
    ],
    "signal": [
        "pytorch_geometric_temporal_tpu.signal.homogeneous",
        "pytorch_geometric_temporal_tpu.signal.heterogeneous",
        "pytorch_geometric_temporal_tpu.signal.split",
        "pytorch_geometric_temporal_tpu.signal.index_dataset",
        "pytorch_geometric_temporal_tpu.signal.stacked",
        "pytorch_geometric_temporal_tpu.signal.snapshot",
    ],
    "data": [
        "pytorch_geometric_temporal_tpu.data.chickenpox",
        "pytorch_geometric_temporal_tpu.data.pedalme",
        "pytorch_geometric_temporal_tpu.data.wikimath",
        "pytorch_geometric_temporal_tpu.data.windmill",
        "pytorch_geometric_temporal_tpu.data.encovid",
        "pytorch_geometric_temporal_tpu.data.twitter_tennis",
        "pytorch_geometric_temporal_tpu.data.montevideo_bus",
        "pytorch_geometric_temporal_tpu.data.mtm",
        "pytorch_geometric_temporal_tpu.data.metr_la",
        "pytorch_geometric_temporal_tpu.data.pems_bay",
        "pytorch_geometric_temporal_tpu.data.pems",
        "pytorch_geometric_temporal_tpu.data.synthetic_pde",
        "pytorch_geometric_temporal_tpu.data._io",
        "pytorch_geometric_temporal_tpu.data._common",
    ],
    "train": [
        "pytorch_geometric_temporal_tpu.train.trainer",
        "pytorch_geometric_temporal_tpu.train.losses",
        "pytorch_geometric_temporal_tpu.train.checkpoint",
        "pytorch_geometric_temporal_tpu.train.state",
        "pytorch_geometric_temporal_tpu.train.precision",
        "pytorch_geometric_temporal_tpu.train.scaler",
        "pytorch_geometric_temporal_tpu.train.guards",
    ],
    "parallel": [
        "pytorch_geometric_temporal_tpu.parallel.mesh",
        "pytorch_geometric_temporal_tpu.parallel.data_parallel",
        "pytorch_geometric_temporal_tpu.parallel.partition",
        "pytorch_geometric_temporal_tpu.parallel.partitioned_dcrnn",
        "pytorch_geometric_temporal_tpu.parallel.multihost",
    ],
    "utils": [
        "pytorch_geometric_temporal_tpu.utils.profiling",
        "pytorch_geometric_temporal_tpu.config",
        "pytorch_geometric_temporal_tpu.native",
    ],
}


def _signature(obj) -> str:
    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"
    # default reprs like "<object at 0x7f...>" embed process addresses —
    # strip them so regeneration is deterministic
    return re.sub(r" at 0x[0-9a-f]+", "", sig)


def _doc(obj) -> str:
    d = inspect.getdoc(obj)
    # dataclass auto-docstrings embed default-object reprs with process
    # addresses — strip for deterministic regeneration
    return re.sub(r" at 0x[0-9a-f]+", "", d) if d else ""


def _public_members(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    out = []
    for n in names:
        obj = getattr(mod, n, None)
        if obj is None:
            continue
        if inspect.ismodule(obj):
            continue
        if getattr(obj, "__module__", None) != mod.__name__:
            continue  # re-exports documented at their home module
        if inspect.isclass(obj) or inspect.isfunction(obj):
            out.append((n, obj))
    # module-level instances of classes defined here (e.g. precision
    # policies) — documented as constants
    for n in names:
        obj = getattr(mod, n, None)
        if obj is None or inspect.isclass(obj) or inspect.isfunction(obj):
            continue
        if inspect.ismodule(obj):
            continue
        if getattr(type(obj), "__module__", None) == mod.__name__:
            out.append((n, obj))
    return out


def _render_class(name, cls) -> str:
    lines = [f"### class `{name}`", ""]
    doc = _doc(cls)
    if doc:
        lines += [doc, ""]
    # dataclass/flax fields
    fields = getattr(cls, "__dataclass_fields__", None)
    if fields:
        rows = [
            f"- `{fname}`" for fname in fields
            if fname not in ("parent", "name")
        ]
        if rows:
            lines += ["**Fields:**", ""] + rows + [""]
    for mname in ("__call__", "__init__"):
        m = cls.__dict__.get(mname)
        if m is not None and callable(m):
            lines += [f"`{name}{_signature(m)}`", ""]
            mdoc = _doc(m)
            if mdoc and mdoc != doc:
                lines += [mdoc, ""]
            break
    for mname, m in sorted(vars(cls).items()):
        if mname.startswith("_") or not callable(m):
            continue
        if isinstance(m, (staticmethod, classmethod)):
            m = m.__func__
        lines += [f"#### `{name}.{mname}{_signature(m)}`", ""]
        mdoc = _doc(m)
        if mdoc:
            lines += [mdoc, ""]
    return "\n".join(lines)


def _render_function(name, fn) -> str:
    lines = [f"### `{name}{_signature(fn)}`", ""]
    doc = _doc(fn)
    if doc:
        lines += [doc, ""]
    return "\n".join(lines)


def generate(out_dir: Path) -> dict:
    out_dir.mkdir(parents=True, exist_ok=True)
    index = ["# API reference", "",
             "Generated by `python docs/gen_api.py` from the package "
             "docstrings.", ""]
    covered = {}
    for page, modules in PAGES.items():
        parts = [f"# `{page}`", ""]
        entries = []
        for modname in modules:
            mod = importlib.import_module(modname)
            parts += [f"## module `{modname}`", ""]
            mdoc = _doc(mod)
            if mdoc:
                parts += [mdoc, ""]
            for name, obj in _public_members(mod):
                entries.append(name)
                if inspect.isclass(obj):
                    parts.append(_render_class(name, obj))
                elif inspect.isfunction(obj):
                    parts.append(_render_function(name, obj))
                else:
                    parts.append(
                        f"### `{name}`\n\nConstant instance of "
                        f"`{type(obj).__name__}`: `{obj!r}`\n"
                    )
        (out_dir / f"{page}.md").write_text("\n".join(parts))
        covered[page] = entries
        index.append(
            f"- [{page}]({page}.md) — " + ", ".join(f"`{e}`" for e in entries)
        )
    (out_dir / "index.md").write_text("\n".join(index) + "\n")
    return covered


if __name__ == "__main__":
    here = Path(__file__).parent
    if "--check" in sys.argv:
        # CI mode: regenerate into a scratch dir and diff against the
        # committed docs/api — exits non-zero if they drifted.
        import filecmp
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            generate(Path(tmp))
            committed = here / "api"
            fresh = sorted(p.name for p in Path(tmp).glob("*.md"))
            stale = [
                n for n in fresh
                if not (committed / n).exists()
                or not filecmp.cmp(committed / n, Path(tmp) / n, shallow=False)
            ]
            extra = sorted(
                p.name for p in committed.glob("*.md")
                if p.name not in fresh
            )
            if stale or extra:
                print(f"docs/api out of sync: stale={stale} extra={extra}\n"
                      "run `python docs/gen_api.py` and commit the result")
                sys.exit(1)
            print("docs/api in sync")
            sys.exit(0)
    covered = generate(here / "api")
    total = sum(len(v) for v in covered.values())
    print(f"wrote docs/api: {len(covered)} pages, {total} documented symbols")
