"""Multi-host runtime setup — the distributed "communication backend" layer.

The reference has no distribution (SURVEY §2.7); its closest analogs are the
Vulkan async upload queue and timeline semaphores. On TPU pods the transport
is ICI within a slice and DCN across slices, and the runtime is
`jax.distributed`: every host runs the same program, jit/shard_map insert the
collectives. This module wraps the startup/teardown handshake and the
host-placement conventions the serving layer uses:

  * TP axes are laid out within a host's ICI domain (all-reduces per decoded
    token stay off DCN — the latency rule from the survey's §7 risk list);
  * DP (request-level) spans hosts, coordinated by sharding the request
    stream by host id, so no cross-host tensor traffic exists outside
    checkpoint loading.
"""

from __future__ import annotations

import jax


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bring up the multi-host runtime (clean startup; idempotent).

    With no arguments, relies on the TPU environment's auto-detection
    (megascale / GKE metadata); arguments override for manual clusters.
    """
    if jax.distributed.is_initialized():
        return  # (checked first: jax.process_count() would init local backends)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def shutdown() -> None:
    """Clean teardown (the 'at least clean multi-host startup/teardown'
    requirement from SURVEY §5)."""
    if jax.distributed.is_initialized():
        jax.distributed.shutdown()


def local_devices_first() -> list[jax.Device]:
    """Device list with this host's devices first — mesh construction puts TP
    axes over local (ICI-connected) devices so per-token collectives never
    cross DCN."""
    local = jax.local_devices()
    rest = [d for d in jax.devices() if d not in local]
    return local + rest


def host_shard(items: list, process_id: int | None = None) -> list:
    """Round-robin shard a request list across hosts (DP over DCN: each host
    serves its own slice; no tensor traffic crosses hosts at decode time)."""
    pid = jax.process_index() if process_id is None else process_id
    n = max(jax.process_count(), 1)
    return items[pid::n]
