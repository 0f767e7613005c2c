"""Multi-host (multi-worker) setup helpers.

Single-slice multi-chip needs nothing beyond `make_mesh` — XLA collectives
ride ICI inside one process. Across HOSTS (a v5e pod slice spanning
workers, or multi-slice over DCN), each worker process must join the
distributed runtime before first device use; this wraps the two-line
recipe with the Mellow conventions (SURVEY.md section 2.4/5.8: the
reference has no distributed machinery at all; this is the TPU-native
equivalent of a NCCL/MPI launcher, except the compiler owns the
collectives).

Typical worker entrypoint:

    from mellow_tpu.parallel import multihost, sharding
    multihost.initialize()                    # env-driven (TPU pods: zero-config)
    mesh = sharding.make_mesh()               # all global devices
    wrapper = MellowWrapper(..., mesh=mesh)   # params sharded over the mesh

On a Cloud TPU pod each worker discovers its coordinator/rank from the
TPU environment automatically; elsewhere pass them explicitly.
"""

from __future__ import annotations

from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Join the JAX distributed runtime (idempotent). Must run before the
    first jax device use in the process. Returns a summary dict."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        msg = str(e).lower()
        benign = "already initialized" in msg or (
            # backend already up in this process and no coordinator was
            # requested: we are (and stay) single-process — nothing to join.
            coordinator_address is None and "before any jax calls" in msg
        )
        if not benign:
            raise
    except ValueError:
        # No coordinator given and none discoverable from the environment
        # (not on a pod): single-process mode, nothing to join.
        if coordinator_address is not None:
            raise
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_primary() -> bool:
    """True on the process that should write checkpoints / logs."""
    import jax

    return jax.process_index() == 0
