"""Launch the UNMODIFIED reference (`/root/reference/shaDow/main.py`)
in-process with the compatibility shims this environment needs:

* numpy 2.x removed the ``np.int``/``np.float``/``np.object`` aliases the
  reference still uses (e.g. frontend/graph.py:129) — restore them;
* ``torch_scatter`` / ``torch_geometric`` / ``ogb`` are not installed —
  `scripts/ref_shims/` provides functional stand-ins for exactly the
  symbols the reference imports;
* the C++ ``ParallelSampler`` pybind module is compiled out-of-tree by
  `scripts/reference_ab.py` (torch's vendored pybind11 headers) into
  ``$REF_ENGINE_DIR``.

Run from a directory containing CONFIG.yml and ./data/<dataset>/, with
the same CLI the reference documents, e.g.::

    python scripts/ref_launcher.py --dataset flickr --configs cfg.yml \
        --gpu -1 --seed 0 --no_pbar

This file launches the reference for A/B comparison; it contains no
reference code.
"""
import os
import runpy
import sys

import numpy as np

for _name, _val in (("int", int), ("float", float), ("object", object),
                    ("bool", bool), ("str", str)):
    if not hasattr(np, _name):
        setattr(np, _name, _val)

# Python >= 3.11 rejects unhashable (e.g. np.ndarray) dataclass defaults,
# which the reference uses (frontend/graph.py:67).  Convert such defaults
# to per-instance default_factory copies on the fly.
import copy as _copy
import dataclasses as _dc

_orig_get_field = _dc._get_field


def _get_field_compat(cls, a_name, a_type, *rest):
    try:
        return _orig_get_field(cls, a_name, a_type, *rest)
    except ValueError as e:
        if "mutable default" not in str(e):
            raise
        default = getattr(cls, a_name)
        setattr(cls, a_name,
                _dc.field(default_factory=lambda d=default: _copy.copy(d)))
        return _orig_get_field(cls, a_name, a_type, *rest)


_dc._get_field = _get_field_compat

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.environ.get(
    "REF_ENGINE_DIR", os.path.join(_HERE, os.pardir, "tmp", "ref_engine")))
sys.path.insert(0, os.path.join(_HERE, "ref_shims"))
sys.path.insert(0, os.environ.get("REF_ROOT", "/root/reference"))
sys.path.insert(0, os.path.join(
    os.environ.get("REF_ROOT", "/root/reference"), "para_graph_sampler"))

runpy.run_module("shaDow.main", run_name="__main__")
