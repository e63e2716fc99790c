"""Multi-host (DCN) corpus processing: per-host input sharding + host-0 merge.

TPU-native counterpart of the reference's NCCL DDP corpus compression
(reference: src/compress.py:33-55 env-var rank setup, 206-246 sampler
sharding, 293-306 rank-0 barrier + FAISS merge).  There is no hand-rolled
communication backend: process discovery goes through JAX's coordination
service (``jax.distributed.initialize``), the barrier is a device-level
``sync_global_devices``, and the merge is a host-0 filesystem scan over the
shared output directory — exactly the reference's recovery-friendly design
(every rank persists its shard; the index is rebuilt from disk).

Environment parity: ``WORLD_SIZE`` / ``RANK`` select the process grid and
``MASTER_ADDR`` / ``MASTER_PORT`` the coordinator, the same variables
torchrun feeds the reference (compress.py:43-51).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple


def env_world() -> Tuple[int, int, Optional[str]]:
    """(rank, world_size, coordinator) from the torchrun-style environment."""
    world = int(os.environ.get("WORLD_SIZE", "1"))
    rank = int(os.environ.get("RANK", "0"))
    addr = os.environ.get("MASTER_ADDR")
    port = os.environ.get("MASTER_PORT")
    coordinator = f"{addr}:{port}" if addr and port else None
    return rank, world, coordinator


def setup_distributed(rank: Optional[int] = None, world: Optional[int] = None,
                      coordinator: Optional[str] = None) -> Tuple[int, int]:
    """Initialize the JAX process group when world > 1; returns (rank, world).

    Safe to call single-process (no-op).  Must run before the first jax
    computation so the coordination service can claim the local devices.
    """
    env_rank, env_world_size, env_coord = env_world()
    rank = env_rank if rank is None else rank
    world = env_world_size if world is None else world
    coordinator = coordinator or env_coord
    if world <= 1:
        return 0, 1
    if coordinator is None:
        raise ValueError(
            "multi-process run needs a coordinator address "
            "(--coordinator or MASTER_ADDR/MASTER_PORT)")
    import jax
    # The default CPU collectives implementation is single-process: without
    # gloo, jax.process_count() stays 1 after initialize and every barrier
    # silently no-ops (a rank-0 merge could then race ahead of the other
    # ranks' writes).  Set it unconditionally — it only affects the cpu
    # backend, which may be selected in ways the environment doesn't show
    # (no accelerator present, JAX_PLATFORM_NAME, in-code config).
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older jax without the option
    # generous handshake window: co-scheduled processes on a loaded 1-CPU
    # host can be minutes apart reaching initialize (measured under full
    # parallel suite load); the default 5 min is exactly at the flake edge
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=world, process_id=rank,
                                   initialization_timeout=900)
    except TypeError:  # older jax without the kwarg
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=world, process_id=rank)
    warmup_collectives()
    return rank, world


def warmup_collectives() -> None:
    """Create the cross-process collective context NOW, while the ranks
    are still aligned in time.

    Gloo's context bootstrap has a hard ~30 s key-exchange deadline and
    runs lazily at the FIRST collective execution.  In real runs that
    first execution sits after a multi-minute train-step compile whose
    finish time skews arbitrarily between ranks (shared caches, shared
    cores) — rank 0 then times out waiting for rank 1's key and the
    whole job dies.  A trivial all-reduce right after ``initialize``
    executes within seconds on every rank, so the context exists before
    any expensive compile can skew the processes."""
    import jax
    import jax.numpy as jnp
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.process_allgather(jnp.zeros((1,), jnp.int32))


def barrier(tag: str = "sic_tpu_barrier") -> None:
    """Block until every process reaches this point (reference:
    dist.barrier(), compress.py:293).  No-op single-process.

    Prefers the coordination-service barrier (works regardless of the
    device backend); falls back to a device-level all-reduce."""
    import jax
    try:
        from jax._src import distributed
        client = getattr(distributed.global_state, "client", None)
    except Exception:
        client = None  # private API moved/removed: use the public fallback
    if client is not None:
        client.wait_at_barrier(f"sic_tpu:{tag}", timeout_in_ms=600_000)
        return
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(tag)


def shard_list(items, rank: int, world: int):
    """Round-robin shard, the DistributedSampler split (compress.py:210-215)."""
    return list(items)[rank::world]
