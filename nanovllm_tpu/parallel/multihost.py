"""Multi-host serving: jax.distributed + a replicated deterministic engine.

The reference is single-node: rank 0 drives TP workers through a POSIX
shared-memory RPC channel (reference nanovllm/engine/llm_engine.py:39-49,
model_runner.py:91-193), with the invariant that every rank derives
bit-identical block tables from the same scheduler outputs (encoded in
reference ut/test_multi_rank_block_manager.py).

The TPU-native multi-host design needs NO control-plane RPC at all:

  * every host process runs the SAME LLMEngine on the same request stream;
  * the scheduler + block manager are deterministic pure-host state
    machines, so all hosts compute identical plans/batches independently
    (the reference's invariant, promoted from "tested property" to "the
    entire control plane");
  * the jitted step runs under ONE global mesh spanning every host's
    devices — XLA lowers the per-layer psums onto ICI/DCN;
  * sampling is in-jit and seeded (fold_in(step_counter)), so every host
    reads back identical tokens and postprocesses in lockstep.

Usage (same script started on every host):

    from nanovllm_tpu.parallel import multihost
    multihost.init()                       # env-driven jax.distributed
    llm = LLM(model, tensor_parallel_size=multihost.device_count())
    out = llm.generate(prompts, sp)        # identical on every host

Validated hardware-free by tests/test_multihost.py: two CPU processes x 4
virtual devices, global tp=8 mesh over gloo collectives, engine outputs
bit-identical across processes and equal to the single-process run.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)


def init(coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None,
         local_device_ids=None) -> None:
    """Initialize jax.distributed. Arguments default to the standard
    environment (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or
    the TPU pod metadata when running on a real slice, where calling with
    no arguments is the norm)."""
    import jax

    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"])
    if num_processes is not None or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes if num_processes is not None
            else os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ["JAX_PROCESS_ID"])
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    logger.info("jax.distributed up: process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())


def device_count() -> int:
    import jax

    return jax.device_count()


def is_multihost() -> bool:
    import jax

    return jax.process_count() > 1


def replicate(mesh):
    """Returns put(host_array) -> fully-replicated global array on `mesh`.

    Under a single process this is jnp.asarray; across processes it uses
    make_array_from_process_local_data, which requires (and here relies on)
    every process passing identical data — exactly what the replicated
    scheduler guarantees."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if not is_multihost():
        return jnp.asarray
    sharding = NamedSharding(mesh, P())

    def put(a):
        import numpy as np

        a = np.asarray(a)
        return jax.make_array_from_process_local_data(sharding, a, a.shape)

    return put


def shard_put(mesh):
    """Returns put(host_array, pspec) -> global array sharded by pspec.
    Every process passes the FULL array (identical everywhere); each
    device keeps only its own shard."""
    import jax
    from jax.sharding import NamedSharding

    if not is_multihost():
        def put_local(a, pspec):
            return jax.device_put(a, NamedSharding(mesh, pspec))

        return put_local

    def put(a, pspec):
        import numpy as np

        a = np.asarray(a)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, pspec), a, a.shape)

    return put
