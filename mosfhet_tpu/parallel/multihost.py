"""Multi-host (DCN) scaffolding for batched bootstrapping.

The reference is a single process (SURVEY.md §2.2); this module is the
framework's own multi-host story, following the standard JAX recipe:

- `initialize()` wraps `jax.distributed.initialize` (coordinator + process
  rank from args or env: MOSFHET_COORDINATOR, MOSFHET_NUM_PROCESSES,
  MOSFHET_PROCESS_ID);
- a global `Mesh` spans every process's local devices; the ciphertext
  batch is sharded over the global `data` axis, so each host feeds its own
  shard (DCN scatter is implicit in `make_array_from_process_local_data`);
- bootstrap keys are replicated to every device (`replicate`): key
  distribution crosses DCN once at setup, never during blind rotation;
- results return to hosts with `process_allgather` (DCN gather).

Layout principle (scaling-book style): the blind rotate is embarrassingly
parallel over the batch, so `data` spans BOTH ICI and DCN with zero
collectives in the hot loop; only the optional gadget-axis (`model`)
sharding adds per-step psums, and those must stay *within* a host's ICI
domain — `make_global_mesh` therefore puts `model` on the fastest-varying
(intra-host) axis.

Single-process use works unchanged (initialize() is a no-op when no
coordinator is configured); `benchmarks/multihost_dryrun.py` runs the same
code path with N simulated processes over TCP on localhost.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_count: int | None = None) -> bool:
    """Join (or skip) the multi-process runtime.

    Returns True if distributed mode is active.  Arguments default to the
    MOSFHET_COORDINATOR / MOSFHET_NUM_PROCESSES / MOSFHET_PROCESS_ID env
    vars; with no coordinator configured this is a no-op (single process).
    """
    coordinator = coordinator or os.environ.get("MOSFHET_COORDINATOR")
    if not coordinator:
        return False
    num_processes = num_processes or int(os.environ["MOSFHET_NUM_PROCESSES"])
    process_id = (process_id if process_id is not None
                  else int(os.environ["MOSFHET_PROCESS_ID"]))
    kwargs = {}
    if local_device_count is not None:
        kwargs["num_local_devices"] = local_device_count
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    return True


def make_global_mesh(model: int = 1, names=("data", "model")) -> Mesh:
    """Mesh over every device of every process.

    `jax.devices()` orders devices process-major, so reshaping to
    (data, model) keeps each `model` group inside one host — gadget-axis
    psums ride ICI, never DCN."""
    devs = np.array(jax.devices())
    assert devs.size % model == 0
    return Mesh(devs.reshape(devs.size // model, model), names)


def distribute_batch(local_arr, mesh: Mesh, data_axis: str = "data"):
    """Per-host batch shard -> one global array sharded over `data`.

    Each process passes ITS slice of the logical batch (equal sizes); the
    global batch is num_processes * local_batch.  DCN scatter analog."""
    ndim = np.asarray(local_arr).ndim
    sharding = NamedSharding(mesh, P(data_axis, *([None] * (ndim - 1))))
    return jax.make_array_from_process_local_data(sharding, local_arr)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (keys, test vectors) onto every device of the
    mesh — one DCN broadcast at setup time."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def gather_results(global_arr):
    """Fetch the full value of a sharded result to every host (DCN
    gather).  Works in single-process mode too."""
    if jax.process_count() == 1:
        return np.asarray(global_arr)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(
        global_arr, tiled=True))


def pbs_on_global_mesh(mesh: Mesh, bk, torus_base: int,
                       model_axis: str | None = None, impl: str = "auto",
                       interpret: bool = False):
    """Mesh-sharded batched PBS whose inputs are global arrays built with
    `distribute_batch` / `replicate`.  Same kernel as
    `mesh.pbs_on_mesh` — the sharding machinery is identical; only the
    array construction differs across hosts."""
    from . import mesh as _mesh
    return _mesh.pbs_on_mesh(mesh, bk, torus_base,
                             model_axis=model_axis, impl=impl,
                             interpret=interpret)
