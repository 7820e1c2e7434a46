"""Shared environment-compat for running the unmodified reference in
this image: numpy-2 alias restoration, py3.11+ dataclass mutable-default
tolerance, and sys.path wiring for `shaDow` / `graph_engine` / the
compiled C++ engine / the dependency shims.  Used by ref_launcher.py,
reference_ab.py and ref_sampler_bench.py."""
import copy as _copy
import dataclasses as _dc
import os
import sys

import numpy as np


def apply(ref_root=None, engine_dir=None):
    for _name, _val in (("int", int), ("float", float), ("object", object),
                        ("bool", bool), ("str", str)):
        if not hasattr(np, _name):
            setattr(np, _name, _val)

    # Python >= 3.11 rejects unhashable (e.g. np.ndarray) dataclass
    # defaults, which the reference uses (frontend/graph.py:67).
    orig = _dc._get_field
    if getattr(_dc, "_shadow_compat", None) is None:
        def _get_field_compat(cls, a_name, a_type, *rest):
            try:
                return orig(cls, a_name, a_type, *rest)
            except ValueError as e:
                if "mutable default" not in str(e):
                    raise
                default = getattr(cls, a_name)
                setattr(cls, a_name, _dc.field(
                    default_factory=lambda d=default: _copy.copy(d)))
                return orig(cls, a_name, a_type, *rest)

        _dc._get_field = _get_field_compat
        _dc._shadow_compat = True

    here = os.path.dirname(os.path.abspath(__file__))
    ref_root = ref_root or os.environ.get("REF_ROOT", "/root/reference")
    engine_dir = engine_dir or os.environ.get(
        "REF_ENGINE_DIR",
        os.path.join(here, os.pardir, os.pardir, "tmp", "ref_engine"))
    for p in (os.path.join(ref_root, "para_graph_sampler"), ref_root,
              here, engine_dir):
        if p not in sys.path:
            sys.path.insert(0, p)
