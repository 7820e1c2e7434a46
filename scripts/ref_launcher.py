"""Launch the UNMODIFIED reference (`/root/reference/shaDow/main.py`)
in-process with the compatibility shims this environment needs:

* numpy 2.x removed the ``np.int``/``np.float``/``np.object`` aliases the
  reference still uses (e.g. frontend/graph.py:129) — restored;
* Python 3.12 rejects the ndarray dataclass defaults in
  frontend/graph.py:67 — tolerated via a dataclasses patch;
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

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "ref_shims"))
import compat

compat.apply()
runpy.run_module("shaDow.main", run_name="__main__")
