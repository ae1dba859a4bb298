"""Multi-host serving entry points.

SURVEY.md §2.4: the reference has no distributed runtime; the TPU-native
replacement is single-controller JAX — every host runs the same jitted step
over a global mesh, host 0 owns the engine/scheduler and feeds per-step
batch arrays via `multihost_utils` broadcast, and only host 0 serves HTTP.

This module provides the initialization + broadcast glue. It is exercised
for real by tests/test_multihost.py: two OS processes form a
jax.distributed CPU cluster and run the full engine with a TP mesh spanning
both processes (host-0 request broadcast, greedy parity vs HF on each host).
"""

from __future__ import annotations

from typing import Any


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize wrapper (no-op when single-process)."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0


def broadcast_step_inputs(tree: Any) -> Any:
    """Broadcast host-0's step arrays to all hosts (the engine/scheduler run
    on host 0 only; other hosts execute the same jitted step on the shared
    global arrays)."""
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def make_global_mesh(dp: int = 1, sp: int = 1, tp: int | None = None):
    """Mesh over ALL processes' devices (ICI within a slice, DCN across)."""
    import jax

    from mistralrs_tpu.parallel.mesh import make_mesh

    return make_mesh(jax.devices(), dp=dp, sp=sp, tp=tp)
