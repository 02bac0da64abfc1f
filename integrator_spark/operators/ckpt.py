"""Lineage truncation for iterative DataFrame loops.

``localCheckpoint(eager=True)`` truncates the *execution* lineage but
Spark's ``LogicalRDD`` PRESERVES the origin plan's Catalyst statistics,
and the size-only stats visitor estimates a join as the PRODUCT of its
children's ``sizeInBytes``. In a loop whose next state joins the
previous checkpointed state with frames derived from it, the stat's
digit count therefore grows geometrically per round (measured ×3/round
in k-core peeling: 57 → 169 → 505 → 1513 digits …) until BigInteger
multiplication inside stats estimation dominates the driver — minutes
per round past ~15 rounds, hours past ~20. Fixed 10-round loops never
noticed; convergence-detected loops die on it.

:func:`truncated_checkpoint` adds the missing half: checkpoint, then
rebuild the frame from the checkpointed RDD so the leaf reports the
conservative default size instead of the inherited product. Join
results are unchanged; join strategy for these loop frames is
unchanged too (the inherited products were already far above every
broadcast threshold, and AQE re-plans from runtime shuffle sizes).
Measured: flat 19-digit stats and flat per-round wall over 14+ rounds
where plain ``localCheckpoint`` doubled the wall every round.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

_log = logging.getLogger(__name__)
_warned_fallback = False


def truncated_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Eager localCheckpoint + Catalyst-stats reset (see module doc).

    ``eager=False`` defers materialization to the first downstream
    action while still truncating lineage and resetting stats: the
    checkpointed RDD is persisted on first computation, so a frame
    referenced from SEVERAL branches of one downstream plan (e.g. the
    keep-list joined twice per k-core peel round) is still computed
    once — without paying a separate driver action/job barrier per
    loop round to materialize it."""
    global _warned_fallback
    ck = df.localCheckpoint(eager=eager)
    spark = df.sparkSession
    try:
        jdf = ck._jdf
        jnew = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False)
        return DataFrame(jnew, spark)
    except Exception as exc:
        # Fall back to the plain checkpoint — correct, just re-exposed
        # to the stats compounding for convergence-length loops. Two
        # distinct triggers: AttributeError when there are no py4j
        # internals at all (Spark Connect), and Py4JError when the
        # private internalCreateDataFrame JVM API is renamed/removed in
        # a future Spark (py4j only discovers missing methods at call
        # time). Catch broadly so iterative operators degrade instead
        # of crashing; warn once so the degradation is visible.
        if not _warned_fallback:
            _warned_fallback = True
            _log.warning(
                "truncated_checkpoint: Catalyst-stats reset unavailable "
                "(%s: %s); falling back to plain localCheckpoint — "
                "convergence-length iterative loops may slow down",
                type(exc).__name__, exc)
        return ck
