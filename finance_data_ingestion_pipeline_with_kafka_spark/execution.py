"""Execution-level DataFrame utilities shared across operator modules.

Home of :func:`materialize` — the single switch point every operator
that eagerly materializes an intermediate (dedup pipeline stages, the
shared PQ distance subtree) routes through, so the fault posture of the
whole engine flips with one env var.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly materialize a (small) intermediate and truncate its
    lineage. Default: ``localCheckpoint`` — blocks live on executors, the
    fastest option, and the right one for interactive/bench sessions
    where losing an executor fails the query and the retry IS the rerun.
    On a long 1000-executor run, executor loss mid-pipeline would kill a
    localCheckpoint-truncated job with no lineage to recompute from —
    set ``ENGINE_RELIABLE_CHECKPOINT=<dir>`` to route through Spark's
    reliable ``checkpoint()`` (HDFS-class storage) so materialized
    intermediates survive executor churn. Same dataframe either way;
    every materialization point goes through here, so the deployment
    flips with one env var.

    Reliable-path mechanics: ``checkpoint(eager=True)`` runs the action
    job and then a SECOND job that re-executes the lineage to write the
    checkpoint files — so the frame is persisted first and unpersisted
    after, the documented Spark idiom that makes the write job read the
    cached blocks instead of recomputing the subtree (on the cluster
    runs this switch targets, the subtree is exactly the expensive
    part). Iterative callers (connected components) should also enable
    ``spark.cleaner.referenceTracking.cleanCheckpoints`` so superseded
    per-iteration checkpoint files are garbage-collected with their
    RDDs; see SCALE.md.
    """
    ckpt_dir = os.environ.get("ENGINE_RELIABLE_CHECKPOINT")
    if ckpt_dir:
        sc = df.sparkSession.sparkContext
        # setCheckpointDir stores <dir>/<random-uuid>; compare the parent
        # so a CHANGED env dir re-routes instead of being silently kept
        current = sc.getCheckpointDir()
        parent = (
            os.path.abspath(os.path.dirname(current.removeprefix("file:")))
            if current
            else None
        )
        if parent != os.path.abspath(ckpt_dir):
            sc.setCheckpointDir(ckpt_dir)
        df = df.persist()
        try:
            return df.checkpoint(eager=True)
        finally:
            df.unpersist()
    return df.localCheckpoint(eager=True)
