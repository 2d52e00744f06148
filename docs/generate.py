"""Generate markdown API documentation from the package docstrings.

The reference renders pdoc3 HTML from the same docstring corpus
(reference pdoc.sh, doctest examples doubling as the documentation).
This generator is dependency-free: it walks the public surface and
emits one markdown file per module into docs/api/.

Run: python docs/generate.py
"""

import inspect
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

OUT = Path(__file__).resolve().parent / "api"

MODULES = [
    "pygraphblas_tpu",
    "pygraphblas_tpu.matrix",
    "pygraphblas_tpu.vector",
    "pygraphblas_tpu.scalar",
    "pygraphblas_tpu.types",
    "pygraphblas_tpu.unaryop",
    "pygraphblas_tpu.binaryop",
    "pygraphblas_tpu.monoid",
    "pygraphblas_tpu.semiring",
    "pygraphblas_tpu.selectop",
    "pygraphblas_tpu.descriptor",
    "pygraphblas_tpu.base",
    "pygraphblas_tpu.algorithms",
    "pygraphblas_tpu.fused",
    "pygraphblas_tpu.gviz",
    "pygraphblas_tpu.parallel.dist",
    "pygraphblas_tpu.parallel.checkpoint",
]


def _doc(obj):
    d = inspect.getdoc(obj)
    return d or ""


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def render_module(modname):
    import importlib

    mod = importlib.import_module(modname)
    lines = [f"# `{modname}`", "", _doc(mod), ""]
    members = getattr(mod, "__all__", None)
    if members is None:
        members = [n for n in dir(mod) if not n.startswith("_")]
    for name in members:
        obj = getattr(mod, name, None)
        if obj is None:
            continue
        if inspect.isclass(obj) and obj.__module__ == modname:
            lines += [f"## class `{name}`", "", _doc(obj), ""]
            for mname, m in inspect.getmembers(obj):
                if mname.startswith("_"):
                    continue
                if inspect.isfunction(m) or inspect.ismethod(m):
                    lines += [f"### `{name}.{mname}{_sig(m)}`", "",
                              _doc(m), ""]
                elif isinstance(m, property):
                    lines += [f"### property `{name}.{mname}`", "",
                              _doc(m), ""]
        elif inspect.isfunction(obj) and obj.__module__ == modname:
            lines += [f"## `{name}{_sig(obj)}`", "", _doc(obj), ""]
    return "\n".join(lines) + "\n"


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    index = ["# pygraphblas_tpu API documentation", ""]
    for modname in MODULES:
        fname = modname.replace(".", "_") + ".md"
        (OUT / fname).write_text(render_module(modname))
        index.append(f"- [{modname}]({fname})")
        print("wrote", OUT / fname)
    (OUT / "index.md").write_text("\n".join(index) + "\n")
    print("wrote", OUT / "index.md")


if __name__ == "__main__":
    main()
