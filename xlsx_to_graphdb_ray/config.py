"""Engine-wide Ray Data execution tuning.

Called (idempotently) by the pipeline modules — never calls ``ray.init``;
it only adjusts the ``DataContext`` of whatever session the driver owns.
"""

from __future__ import annotations


def tune_context() -> None:
    """Apply the engine's DataContext settings to the CURRENT context.

    - hash-based shuffle for the bucketed exchanges: measured ~3× faster
      than the sort-based default (int keys, many small groups), and
      REQUIRED by ``shuffle.partition_map``'s keyed repartition.
    - progress bars off (harness/bench output hygiene).

    Idempotence is keyed on the DataContext OBJECT (not a process global):
    a fresh ``ray.init`` creates a fresh context that must be re-tuned.
    """
    from ray.data import DataContext

    tune_context_obj(DataContext.get_current())


def tune_context_obj(ctx) -> None:
    """Apply the engine's settings to a specific ``DataContext`` object.

    Needed because every ``Dataset`` SNAPSHOTS the current context at
    creation: a dataset built by a caller before ``tune_context()`` ran
    (tests, external users handing us a ``from_pandas`` dataset) plans its
    shuffles against the stale copy. ``shuffle.partition_map`` therefore
    re-tunes ``ds.context`` directly.
    """
    if getattr(ctx, "_graft_tuned", False):
        return
    from ray.data.context import ShuffleStrategy

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
    ctx._graft_tuned = True
