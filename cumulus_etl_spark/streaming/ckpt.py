"""Checkpoint-identity pinning for persistent sketches with
NON-idempotent folds (round-11 ADVICE, generalized round 12 from the
drift monitor to the whole sibling family).

Structured Streaming batch ids are PER-CHECKPOINT: pointing an
established sketch/monitor at a fresh ``--checkpoint`` dir restarts
ids at 0, so the replay watermark (``batch_id <= stored last_batch``)
silently drops the early batches as "replays" — and a later id above
the watermark re-folds files already counted.  For a count-addition
fold (CMS cells, HDR buckets, PSI histograms) that is silent state
corruption with no error.  Sketches whose folds are idempotent
(reservoir top-k dedup, dedup-index set insert) don't need this, and
the ANN index keeps its checkpoint INSIDE its own root so the pair
can never diverge — the other safe design.

The fix: the first checkpoint path used against a state root is pinned
in a sidecar there (via the Hadoop FileSystem API, like the rest of
the sidecar state); any later mismatch is rejected loudly.
Re-baseline by starting a fresh state root.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from cumulus_etl_spark.sources import hadoop_io

CHECKPOINT_IDENTITY_FILE = "_checkpoint_identity.json"


def pin_checkpoint_identity(
    spark: SparkSession, state_root: str, checkpoint_dir: str
) -> None:
    """Record ``checkpoint_dir`` as ``state_root``'s checkpoint on
    first use; raise ValueError if the root was built against a
    different one."""
    sidecar = os.path.join(state_root, CHECKPOINT_IDENTITY_FILE)
    if hadoop_io.exists(spark, sidecar):
        stored = json.loads(hadoop_io.read_text(spark, sidecar))
        if stored["checkpoint_dir"] != checkpoint_dir:
            raise ValueError(
                f"state root {state_root!r} was built against checkpoint "
                f"{stored['checkpoint_dir']!r}; reopened with "
                f"{checkpoint_dir!r} — stream batch ids are per-checkpoint, "
                "so a new checkpoint would corrupt the replay watermark "
                "(early batches dropped as replays, later ids re-folded). "
                "Keep the original checkpoint dir or start a fresh root."
            )
    else:
        hadoop_io.write_text(
            spark, sidecar, json.dumps({"checkpoint_dir": checkpoint_dir})
        )
