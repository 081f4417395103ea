"""Multi-host bootstrap.

Replaces the reference's env-var discovery + init_process_group
(`training/distributed.py:35-114`): on TPU pods `jax.distributed.initialize`
autodetects from the TPU environment; for manual launches the same env vars
the reference honours (MASTER_ADDR/PORT, RANK/WORLD_SIZE, SLURM_*) are
mapped onto coordinator_address/process_id/num_processes.
"""
from __future__ import annotations

import os
from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    import jax

    if coordinator_address is None:
        # torchrun-style env (distributed.py:43-62)
        if "MASTER_ADDR" in os.environ and "RANK" in os.environ:
            coordinator_address = (
                f"{os.environ['MASTER_ADDR']}:{os.environ.get('MASTER_PORT', '1234')}"
            )
            process_id = int(os.environ["RANK"])
            num_processes = int(os.environ["WORLD_SIZE"])
        # SLURM env (distributed.py:64-79)
        elif "SLURM_PROCID" in os.environ:
            process_id = int(os.environ["SLURM_PROCID"])
            num_processes = int(os.environ["SLURM_NTASKS"])
            nodelist = os.environ.get("SLURM_NODELIST", "localhost")
            coordinator_address = nodelist.split(",")[0].split("[")[0] + ":1234"

    if coordinator_address is not None and num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        # TPU pod autodetection; a no-op single-process fallback otherwise
        try:
            jax.distributed.initialize()
        except Exception:
            pass
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_master() -> bool:
    import jax

    return jax.process_index() == 0
