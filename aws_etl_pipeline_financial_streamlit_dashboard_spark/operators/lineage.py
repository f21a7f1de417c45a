"""Lineage truncation with an executor-loss-survivable option.

The iterative / forked-lineage operators (connected components,
PageRank, k-means, BPE merge rounds, global_rank's range-partitioned
enumeration) must truncate lineage each round — otherwise the plan
grows O(rounds) and re-evaluation of a forked branch could observe a
DIFFERENT nondeterministic upstream (sampling-based range partitioner,
shuffles over nondeterministic sources).

Two truncation tiers, chosen by the ``reliable`` knob every such
operator now exposes (VERDICT r6 item 2):

- ``reliable=False`` (default): ``DataFrame.localCheckpoint`` — blocks
  live in executor-local storage. Cheapest, right for local mode and
  for short-lived intermediates, but an executor loss AFTER the
  checkpoint kills the job (the lineage needed to recompute the lost
  blocks was just truncated).
- ``reliable=True``: ``DataFrame.checkpoint`` against the session's
  configured checkpoint directory (``SparkContext.setCheckpointDir`` —
  HDFS/S3 in production). A lost executor's partitions are re-read
  from durable storage instead of killing the job: the right tier when
  a corpus-scale intermediate (x42's ranged lineage, x80's per-round
  sequences, components' edge closure at 100 TB) sits on a preemptible
  cluster. Costs one write of the data to reliable storage per call.

  Storage footprint: Spark never deletes reference checkpoints unless
  ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (OFF in
  stock Spark) — inside an iterative loop that would accumulate up to
  ``max_iter`` full copies of the frame in the checkpoint dir, and
  they would OUTLIVE the job. The house session (session.py) sets the
  flag, so each round's files are deleted once the loop drops the
  round's reference (the ContextCleaner fires on driver GC; bounded at
  ~2 live rounds in steady state). On a foreign session, either set
  the same flag before the context starts or clean
  ``getCheckpointDir()`` after the job.

See docs/SCALE.md "Lineage truncation and executor loss".
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_lineage(
    df: DataFrame, reliable: bool = False, eager: bool = True
) -> DataFrame:
    """Truncate ``df``'s lineage; see module docstring for the tiers.

    ``reliable=True`` requires a checkpoint directory on the session
    (``spark.sparkContext.setCheckpointDir(...)``); we fail fast with
    instructions rather than silently picking a local temp dir — a
    non-durable default would defeat the only reason to flip the knob.
    """
    if not reliable:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    ckpt_dir = sc._jsc.sc().getCheckpointDir()
    if ckpt_dir.isEmpty():
        raise ValueError(
            "reliable=True needs a durable checkpoint directory: call "
            "spark.sparkContext.setCheckpointDir('<hdfs/s3/shared path>') "
            "before running this operator"
        )
    return df.checkpoint(eager=eager)
