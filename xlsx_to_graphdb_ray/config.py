"""Engine-wide Ray Data execution tuning.

Called (idempotently) by the pipeline modules — never calls ``ray.init``;
it only adjusts the ``DataContext`` of whatever session the driver owns.
"""

from __future__ import annotations

_TUNED = False


def tune_context() -> None:
    """Apply the engine's DataContext settings once per process.

    - hash-based shuffle for groupby/map_groups: measured ~3× faster than
      the sort-based default for the engine's bucketed exchanges (int keys,
      many small groups).
    - progress bars off (harness/bench output hygiene).
    """
    global _TUNED
    if _TUNED:
        return
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # bound shuffle-aggregator actors so small sessions (tests run with
    # num_cpus=4) can't deadlock on actor-pool resource starvation
    try:
        import ray
        ncpu = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
    except Exception:
        ncpu = 8
    # measured: a handful of aggregator actors beats one-per-2-cores — each
    # shuffle op spawns a fresh aggregator pool, and actor startup + CPU
    # reservation starve the map tasks that feed the shuffle
    ctx.max_hash_shuffle_aggregators = max(1, min(4, ncpu // 2))
    # measured (sf0.1, 32 cpus): 8 shuffle partitions 15.7s vs 32 → 36s —
    # partition count should track DATA volume, not cores; at this sandbox's
    # block sizes ≤8 partitions keeps aggregator coordination cheap while
    # each partition stays well under a worker's heap. (On a real multi-node
    # cluster size this to ~bytes/64MB instead.)
    parallelism = max(2, min(ncpu, 8))
    ctx.default_hash_shuffle_parallelism = parallelism
    try:
        # bound TOTAL shuffle-actor CPU reservation to a fraction of the
        # session, assuming up to ~4 shuffle ops can be live in one streaming
        # execution (anaphora + key-res + two joins on the partitioned
        # resolve path). A flat 0.25/partition deadlocks 4-CPU sessions:
        # 4 ops x 4 partitions x 0.25 = every CPU reserved, none left for
        # the map tasks feeding the shuffles. Measured: 0.25 at 32 CPUs
        # (unchanged), 0.0625 at 4 CPUs unblocks the chain.
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = \
            max(0.05, min(0.25, ncpu / (16 * parallelism)))
    except Exception:
        pass
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    _TUNED = True
