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
