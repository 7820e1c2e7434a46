"""Functional stand-in for the ``torch_geometric`` bits the reference
imports (`shaDow/layers.py:14`, `shaDow/minibatch.py:17`,
`frontend/data_converter.py:22`).  See scripts/reference_ab.py."""
from . import nn, utils  # noqa: F401
