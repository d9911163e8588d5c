"""Lineage truncation policy for iterative operators.

Fixpoint loops (connected components, Lloyd rounds, BPE merges) nest
their plan once per round; without truncation the plan tree — and
re-computation on any partition loss — grows unboundedly. Two honest
options, chosen by one parameter:

- ``checkpoint_dir=None`` (default): ``localCheckpoint`` — blocks are
  pinned to executor storage. Fast (no FS round-trip) and exactly
  right in local mode / short-lived jobs, but the pinned blocks die
  with their executor, so a lost node forfeits the whole job.
- ``checkpoint_dir=<path>``: reliable ``checkpoint()`` to that
  directory (HDFS/object store on a cluster) — survives executor loss;
  the per-round write cost is bounded by the state size, which for
  these operators is the label/vocab relation, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(
    df: DataFrame,
    checkpoint_dir: str | None = None,
    eager: bool = True,
) -> DataFrame:
    """Cut lineage: reliable checkpoint into `checkpoint_dir` when
    given, else localCheckpoint.

    ``eager=False`` defers the materializing job to the caller's next
    action over the returned frame (the lineage cut is unchanged —
    the checkpoint populates when first computed). Fixpoint loops that
    follow each round's checkpoint with a control-flow action (the
    convergence count) use this to pay ONE job per round instead of
    two: the count materializes the checkpoint as a side effect."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=eager)
