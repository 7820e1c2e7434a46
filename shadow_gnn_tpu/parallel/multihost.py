"""Multi-host runtime glue: jax.distributed init + global mesh + IO.

The reference is a single python process with no distributed backend at
all (SURVEY §2: zero torch.distributed imports).  On TPU pods the
scale-out unit is one process per host, all participating in a single
global device mesh; this module provides the three pieces the rest of
``parallel/`` assumes exist:

* :func:`initialize` — `jax.distributed.initialize` from explicit args,
  standard JAX env vars, or TPU-pod auto-detection; idempotent and a
  no-op for single-process runs so the same entry point works
  everywhere.
* :func:`global_dp_mesh` — a 1-D ``('dp',)`` mesh over every device in
  the job (all hosts), the mesh `parallel/dp.py` and
  `parallel/partition.py` steps shard over.
* :func:`process_local_batch` — build a globally-sharded array where
  each process contributes only ITS rows.  Per-host data loading: every
  host samples/loads its own slice of the epoch's roots/labels and no
  host ever materializes the global batch (the host-side analog of the
  device-side all-to-all feature exchange).

Single-host behavior is exercised by tests/test_parallel.py on the
8-virtual-device CPU mesh; multi-process bring-up needs only
``initialize(...)`` before first jax use on each host.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> bool:
    """Bring up the jax.distributed runtime.  Returns True if a
    multi-process runtime was (or already had been) initialized.

    Resolution order for each field: explicit argument > standard JAX
    env var (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID) > TPU-pod metadata auto-detection (when any of the
    coordinates are present).  With no configuration at all this is a
    no-op — single-process runs never pay for it.

    Must be called before the first JAX backend use on every host.
    Idempotent: repeated calls return the recorded state.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if (coordinator_address is None and num_processes is None
            and process_id is None):
        return False                     # single-process: nothing to do
    if num_processes == 1:
        return False
    import jax
    # Multi-process CPU jobs (CI smoke, dev boxes) need a cross-process
    # collectives backend; TPU pods ride ICI and ignore this flag.
    if jax.config.jax_platforms == "cpu":
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # older/newer jax without the option
            pass
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    _initialized = True
    return True


def global_dp_mesh(axis: str = "dp"):
    """1-D mesh over ALL devices in the job (every host's chips)."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (axis,))


def process_local_batch(mesh, x_local: np.ndarray, axis: str = "dp"):
    """Globally-sharded array from this process's local rows.

    ``x_local``'s leading dim is this host's slice of the global batch
    (global batch = num_processes x local rows, in process order).  In a
    single-process job this is just a device_put over the mesh.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    spec = P(axis, *([None] * (np.ndim(x_local) - 1)))
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding,
                                                  np.asarray(x_local))


def process_local_epoch(mesh, x_local: np.ndarray, axis: str = "dp"):
    """Globally-sharded whole-epoch array ``[nb, B, ...]`` where the
    BATCH dim (dim 1) is sharded over ``axis`` and each process
    contributes only its local batch columns (``process_slice(B)`` of
    every scan step).  This is the epoch-scan analog of
    :func:`process_local_batch`: N hosts feed one monolithic
    scan-over-batches program and pay ONE dispatch per epoch instead of
    one per step."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    x_local = np.asarray(x_local)
    spec = P(None, axis, *([None] * (x_local.ndim - 2)))
    sharding = NamedSharding(mesh, spec)
    global_shape = ((x_local.shape[0],
                     x_local.shape[1] * jax.process_count())
                    + x_local.shape[2:])
    return jax.make_array_from_process_local_data(sharding, x_local,
                                                  global_shape)


def process_slice(n_rows_global: int) -> slice:
    """This process's row range of a globally ordered epoch array.
    Hosts shard the epoch's roots by contiguous range; with one process
    this is the whole epoch."""
    import jax
    pc, pi = jax.process_count(), jax.process_index()
    per = -(-n_rows_global // pc)
    return slice(pi * per, min((pi + 1) * per, n_rows_global))
