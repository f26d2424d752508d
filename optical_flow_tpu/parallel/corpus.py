"""Multi-host / multi-worker corpus sharding.

The reference's only scale-out story is replicating Docker containers with
`.done` files as a poor-man's distributed lock (SURVEY.md 2e).  Here corpus
sharding is first-class: deterministic round-robin assignment of videoids
to workers, with the byte-compatible `.done` sentinels still providing
idempotent resume, so any worker can crash and be restarted (elastic
recovery, SURVEY.md section 5).

Multi-host: `maybe_init_distributed` wires `jax.distributed.initialize`
(the TPU-native slot of the comm backend the reference lacks — its corpus
loop is sequential, `optical_flow.py:137`; SURVEY.md 2e names DCN
multi-host as the NCCL-equivalent).  Each process maps its process index
to a corpus shard; no cross-host collectives are needed because the
workload is embarrassingly parallel at video granularity with `.done`
idempotency, so DCN carries only the control-plane handshake.

Recipe (one line per host/process):

    OFT_COORDINATOR_ADDRESS=host0:9801 OFT_NUM_PROCESSES=4 \
    OFT_PROCESS_ID=<k> python -m optical_flow_tpu.cli.optical_flow \
        /data vid0 vid1 ...   # each process takes videoids[k::4]
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple


def maybe_init_distributed() -> Tuple[int, int]:
    """Initialize JAX's distributed runtime when env-configured.

    Triggered by OFT_COORDINATOR_ADDRESS (with OFT_NUM_PROCESSES and
    OFT_PROCESS_ID).  Returns (process_id, num_processes); (0, 1) when not
    configured.  Idempotent: a second call returns the stored identity.
    """
    addr = os.environ.get("OFT_COORDINATOR_ADDRESS")
    if not addr:
        return 0, 1
    num = int(os.environ["OFT_NUM_PROCESSES"])
    pid = int(os.environ["OFT_PROCESS_ID"])
    import jax
    if jax._src.distributed.global_state.client is None:
        from jax._src import xla_bridge
        if xla_bridge.backends_are_initialized():
            # an interpreter-startup plugin (sitecustomize) may have
            # initialized a backend already; distributed init must precede
            # backend creation, so drop the stale set (no arrays exist yet
            # when this is called at CLI entry)
            from jax.extend.backend import clear_backends
            clear_backends()
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=num, process_id=pid)
    return pid, num


def shard_videoids(videoids: Sequence[str], worker_index: int,
                   n_workers: int) -> list:
    """Deterministic round-robin shard of the corpus for one worker."""
    if n_workers < 1:
        raise ValueError("n_workers must be >= 1")
    if not (0 <= worker_index < n_workers):
        raise ValueError(f"worker_index {worker_index} not in [0, {n_workers})")
    return list(videoids[worker_index::n_workers])
