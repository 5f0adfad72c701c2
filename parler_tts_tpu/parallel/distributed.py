"""Multi-host runtime: initialization, per-host data sharding, barriers.

The TPU-native replacement for the reference's NCCL/Accelerate process-group
plumbing (SURVEY.md §5.8; reference ``training/run_parler_tts_training.py:
819-830`` init, ``:1068, 1172, 1432`` barriers, ``:679, 1091``
main-process-first, ``:1137-1161`` distributed preprocessing):

* ``initialize()``            — ``jax.distributed.initialize`` (env-driven);
* ``process_shard(seq)``      — this host's slice of a dataset (replaces
                                Accelerate's dispatch);
* ``barrier(tag)``            — ``sync_global_devices`` (replaces
                                ``wait_for_everyone``);
* ``main_process_first()``    — context manager serializing cache writes;
* ``host_local_to_global``    — assemble per-host batches into one global
                                array over the mesh's data axis.

Single-host (and single-chip) environments degrade to no-ops, so the same
training script runs everywhere.
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, Sequence

import jax


def initialize(coordinator_address: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize the multi-host runtime.  No-op when single-process and no
    coordinator is configured (env: JAX_COORDINATOR_ADDRESS / SLURM / TPU
    metadata are auto-detected by jax.distributed)."""
    if jax.process_count() > 1:
        return  # already initialized
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_shard(items: Sequence, *, process_index: int | None = None,
                  process_count: int | None = None) -> list:
    """This host's strided shard of a dataset (replaces the reference's
    Accelerate-prepared DataLoader sharding, ``:1137-1145``)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(items[pi::pc])


def barrier(tag: str = "barrier") -> None:
    """Global device sync (replaces ``accelerator.wait_for_everyone``)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)


@contextlib.contextmanager
def main_process_first(tag: str = "main_first"):
    """Process 0 runs the body first (dataset cache writes), others wait —
    the reference's ``accelerator.main_process_first`` (``:679, 1091``)."""
    if jax.process_index() == 0:
        try:
            yield True
        finally:
            barrier(tag)
    else:
        barrier(tag)
        yield False


def host_local_to_global(batch: Any, mesh) -> Any:
    """Per-host batch arrays -> one global jax.Array sharded on the mesh's
    data axis (multi-host input pipeline)."""
    if jax.process_count() == 1:
        from parler_tts_tpu.parallel.mesh import shard_batch

        return shard_batch(batch, mesh)
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return multihost_utils.host_local_array_to_global_array(x, mesh, spec)

    return jax.tree.map(put, batch)


def all_gather_metrics(metrics: dict, weight: float = 1.0) -> dict:
    """Weighted-mean-reduce scalar metrics across hosts (replaces
    ``gather_for_metrics``, reference ``:1662, 1687-1689``).  ``weight`` is
    this host's sample count for metrics that are per-host means over
    differently-sized shards (eval WER/CLAP).  Hosts may report different
    key sets (e.g. an empty shard reports ``{}``); each key is averaged over
    the hosts that reported it."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    shards = allgather_object((dict(metrics), float(weight)))
    out: dict[str, float] = {}
    for key in {k for m, _ in shards for k in m}:
        num = sum(m[key] * w for m, w in shards if key in m)
        den = sum(w for m, w in shards if key in m)
        out[key] = float(num / max(den, 1e-9))
    return out


def _allreduce(values: Sequence[float], op) -> list[float]:
    import numpy as np

    if jax.process_count() == 1:
        return [float(v) for v in values]
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(values, np.float64))
    return op(gathered, axis=0).tolist()


def global_max(values: Sequence[float]) -> list[float]:
    """Element-wise max across hosts (collator shape agreement: every host
    must compile identical batch shapes or ``host_local_to_global`` hangs)."""
    import numpy as np

    return _allreduce(values, np.max)


def global_min(values: Sequence[float]) -> list[float]:
    """Element-wise min across hosts (lockstep loop bounds)."""
    import numpy as np

    return _allreduce(values, np.min)


def global_sum(values: Sequence[float]) -> list[float]:
    """Element-wise sum across hosts (global sample counts)."""
    import numpy as np

    return _allreduce(values, np.sum)


def allgather_object(obj: Any) -> list[Any]:
    """All-gather an arbitrary picklable object; returns the per-host list
    (index = process_index).  Used to exchange per-host prepared dataset
    shards (the reference gathers encoded codes to the main process and
    persists the full dataset, ``:1151-1161``)."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    import numpy as np
    from jax.experimental import multihost_utils

    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(np.asarray([data.size], np.int64))
    m = int(sizes.max())
    padded = np.zeros((m,), np.uint8)
    padded[: data.size] = data
    all_data = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(all_data[h, : int(sizes[h])].tobytes())
        for h in range(jax.process_count())
    ]


def gather_prepared(samples: list[dict]) -> list[dict]:
    """Merge per-host prepared-sample shards into the full dataset, restoring
    the source row order via each sample's ``_idx`` (global raw row index,
    attached by ``prepare_hf``).  Every host returns the identical full list —
    the TPU equivalent of the reference's gather + ``save_to_disk`` of the
    complete processed dataset (``:1151-1161, 1251-1257``), which lets every
    rank sample from the full set during training."""
    shards = allgather_object(samples)
    merged = [s for shard in shards for s in shard]
    merged.sort(key=lambda s: s.get("_idx", 0))
    return merged
