"""Test-only parity harness: load individual functions from the reference
implementation at /root/reference without importing its modules (which
require sentinelhub/bottleneck/etc. that are absent here).

We parse the source file with ast, extract the named function defs, and
exec them in a minimal namespace. Used exclusively to generate golden
outputs for numerical parity tests.
"""
from __future__ import annotations

import ast
import math
from pathlib import Path

import numpy as np

REF = Path("/root/reference")


def load_reference_fns(relpath: str, names: list[str], extra_ns=None):
    """Extract function definitions `names` from reference file `relpath`."""
    src = (REF / relpath).read_text()
    tree = ast.parse(src)
    selected = [n for n in tree.body
                if isinstance(n, (ast.FunctionDef, ast.ClassDef))
                and n.name in names]
    missing = set(names) - {n.name for n in selected}
    if missing:
        raise KeyError(f"{missing} not found in {relpath}")
    mod = ast.Module(body=selected, type_ignores=[])
    code = compile(ast.fix_missing_locations(mod), f"<ref:{relpath}>", "exec")
    from scipy.ndimage import (
        binary_dilation,
        distance_transform_edt,
        generate_binary_structure,
        grey_closing,
    )

    class _NumpyCompat:
        """numpy proxy restoring the removed np.bool/np.float aliases
        that old reference code uses."""

        bool = bool
        float = float
        int = int

        def __getattr__(self, item):
            return getattr(np, item)

    from numpy.lib.stride_tricks import sliding_window_view

    ns = {"np": _NumpyCompat(), "math": math, "sqrt": math.sqrt,
          "distance": distance_transform_edt,
          "binary_dilation": binary_dilation,
          "generate_binary_structure": generate_binary_structure,
          "grey_closing": grey_closing,
          "sliding_window_view": sliding_window_view}
    if extra_ns:
        ns.update(extra_ns)
    exec(code, ns)
    return {name: ns[name] for name in names}


def reference_available() -> bool:
    return REF.exists()
