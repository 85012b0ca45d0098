"""Multi-host initialisation.

Single-host meshes need nothing; on a multi-host TPU slice call
:func:`initialize` once per process before any jax call and every host
sees the global device set — the same trainers then span slices
unchanged (the mesh's ``data`` axis covers all chips; XLA routes
intra-slice collectives over ICI and cross-slice over DCN).

This replaces the reference's ``torch.distributed.launch`` + NCCL
``init_process_group`` rendezvous (``sr/train.py:23-24,36-41``); the
reference's rank-0-only duties (checkpointing, logging) map to
:func:`is_coordinator`.
"""
from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with TPU auto-detection defaults."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def is_coordinator() -> bool:
    """True on the process that should write checkpoints/logs
    (the reference's ``rank == 0``)."""
    return jax.process_index() == 0


def global_device_count() -> int:
    return jax.device_count()


def local_device_count() -> int:
    return jax.local_device_count()
