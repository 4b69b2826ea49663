"""Multi-host initialization helpers.

One process per host (SURVEY.md §2.3): call ``init_multihost()`` before any
jax op; the ("data","model") mesh from parallel/sharding.make_mesh then spans
every host's devices -- data-axis collectives ride DCN across hosts, the
model axis stays on intra-slice ICI.
"""

import logging
import os

logger = logging.getLogger(__name__)


def init_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed.initialize with env-var fallbacks (JAX_COORDINATOR_
    ADDRESS / NUM_PROCESSES / PROCESS_ID). No-op for single-process runs."""
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        logger.info("single-process run (no coordinator configured)")
        return False
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(num_processes or os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None else os.environ["JAX_PROCESS_ID"]
        )
    jax.distributed.initialize(**kwargs)
    logger.info(
        "multihost initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def local_batch_slice(global_batch: int):
    """(start, size) of this host's shard of a data-parallel batch."""
    import jax

    per = global_batch // jax.process_count()
    return jax.process_index() * per, per
