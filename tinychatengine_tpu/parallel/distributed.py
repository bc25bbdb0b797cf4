"""Multi-host initialization + mesh construction.

The reference is single-process (SURVEY.md §2.8: no MPI/NCCL/sockets at all).
This is the TPU-native multi-host layer: ``jax.distributed`` process group
init and a mesh builder that puts the tensor-parallel ("model") axis on
ICI-adjacent devices within each host and the data axis across hosts (DCN) —
the topology the scaling-book recipe prescribes (TP wants the fast links).

Typical multi-host launch (one process per host, same program):

    from tinychatengine_tpu.parallel import distributed
    distributed.initialize()                 # env-driven (TPU pods autoconf)
    mesh = distributed.make_multihost_mesh(n_model=4)

Single-host callers can skip initialize() — make_multihost_mesh degrades to
the local-device mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with TPU-pod auto-config when args are None
    (on Cloud TPU the runtime provides coordinator/count/id via metadata).
    Safe to call once per process; no-op if already initialized.

    MUST run before any backend-touching jax call. The pre-r5 version
    probed ``jax.process_count()`` first — which itself initializes the
    backend, turning the real initialize into a swallowed RuntimeError and
    silently degrading every caller to single-process (caught by
    scripts/dryrun_multiprocess.py, the 2-process x 4-CPU-device check).
    The already-initialized probe now reads jax.distributed's own client
    state, which never touches the backend."""
    global _initialized
    if _initialized or getattr(jax._src.distributed.global_state, "client",
                               None) is not None:
        _initialized = True
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
        _initialized = True
    except (RuntimeError, ValueError) as exc:
        if coordinator_address is not None:
            raise  # explicit multi-process setup must not degrade silently
        # env-driven call outside a pod/coordinator: single-process mode
        _initialized = True


def make_multihost_mesh(n_model: int | None = None,
                        devices=None) -> Mesh:
    """("data", "model") mesh: model axis within a host (ICI), data across
    hosts (DCN). n_model defaults to local device count (whole-host TP)."""
    devices = devices if devices is not None else jax.devices()
    local = jax.local_device_count()
    n_model = n_model or local
    assert local % n_model == 0 or n_model % local == 0, (local, n_model)
    n_total = len(devices)
    assert n_total % n_model == 0, (n_total, n_model)
    n_data = n_total // n_model
    # jax.devices() orders by process then local id → reshaping keeps each
    # model group within one process (host) when n_model <= local
    dev = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def process_info() -> dict:
    return {"process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "local_devices": jax.local_device_count(),
            "global_devices": jax.device_count()}
